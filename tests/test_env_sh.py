import numpy as np
import jax.numpy as jnp

from raytracedggx_tpu.trace.env import (pack_mips, build_mips, sample_env,
                                        dir_to_face_uv, face_uv_to_dir,
                                        procedural_env)
from raytracedggx_tpu.sh import project_sh9, evaluate_sh_irradiance


def test_face_uv_roundtrip(rng):
    d = rng.standard_normal((256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    face, u, v = dir_to_face_uv(jnp.asarray(d))
    face = np.asarray(face)
    u = np.asarray(u)
    v = np.asarray(v)
    for f in range(6):
        m = face == f
        if not m.any():
            continue
        back = np.asarray(face_uv_to_dir(
            f, jnp.asarray(u[m]), jnp.asarray(v[m])))
        dots = np.sum(back * d[m], axis=1)
        assert dots.min() > 0.9999


def test_sample_env_constant():
    base = np.full((6, 8, 8, 3), 2.5, np.float32)
    env = pack_mips(build_mips(base))
    d = np.array([[1, 0.2, 0.1], [0, 1, 0], [-0.3, -0.4, -0.5]], np.float32)
    for lvl in [0.0, 1.3, 3.0]:
        out = np.asarray(sample_env(env, jnp.asarray(d), lvl))
        np.testing.assert_allclose(out, 2.5, rtol=1e-6)


def test_sample_env_face_isolation():
    # each face a distinct constant; sampling along an axis returns it
    base = np.zeros((6, 4, 4, 3), np.float32)
    for f in range(6):
        base[f] = f + 1
    env = pack_mips([base])
    axes = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                     [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)
    out = np.asarray(sample_env(env, jnp.asarray(axes), 0.0))
    np.testing.assert_allclose(out[:, 0], np.arange(1, 7), rtol=1e-6)


def test_sh_constant_roundtrip():
    base = np.full((6, 16, 16, 3), 3.0, np.float32)
    coeffs = project_sh9(jnp.asarray(base))
    n = np.array([[0, 1, 0], [1, 0, 0], [0.6, -0.48, 0.64]], np.float32)
    irr = np.asarray(evaluate_sh_irradiance(coeffs, jnp.asarray(n)))
    # constant radiance L -> irradiance pi*L -> eval/pi == L
    np.testing.assert_allclose(irr / np.pi, 3.0, rtol=2e-2)


def test_sh_directional_matches_numeric(rng):
    # random low-frequency env; compare SH irradiance vs numeric integral
    env = procedural_env(32)
    # rebuild faces from env for projection
    S = 32
    from raytracedggx_tpu.trace.env import procedural_sky
    uv = (np.arange(S) + 0.5) / S
    u, v = np.meshgrid(uv, uv, indexing="xy")
    faces = np.stack([
        np.asarray(procedural_sky(face_uv_to_dir(
            f, jnp.asarray(u, jnp.float32), jnp.asarray(v, jnp.float32))))
        for f in range(6)])
    coeffs = project_sh9(jnp.asarray(faces))

    # numeric irradiance at a few normals via uniform sphere sampling
    m = 200000
    d = rng.standard_normal((m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    L = np.asarray(procedural_sky(jnp.asarray(d)))
    for n in [np.array([0, 1, 0], np.float32),
              np.array([0.8, 0.6, 0.0], np.float32)]:
        cos = np.maximum(d @ n, 0.0)
        irr_num = (L * cos[:, None]).mean(axis=0) * 4 * np.pi
        irr_sh = np.asarray(evaluate_sh_irradiance(coeffs,
                                                   jnp.asarray(n[None])))[0]
        # SH order-3 truncation + sun disk -> loose tolerance
        np.testing.assert_allclose(irr_sh, irr_num, rtol=0.15, atol=0.4)


def test_pcg_matches_reference_scalars():
    from raytracedggx_tpu.trace.sampling import pcg
    # scalar reference values computed by hand from the integer recurrence
    def ref(seed):
        seed = (seed * 747796405 + 1) & 0xFFFFFFFF
        seed = ((seed >> ((seed >> 28) + 4)) ^ seed) * 277803737 & 0xFFFFFFFF
        seed = (seed >> 22) ^ seed
        return seed

    xs = np.array([0, 1, 2, 12345, 0xDEADBEEF, 0xFFFFFFFF], np.uint32)
    got = np.asarray(pcg(jnp.asarray(xs)))
    want = np.array([ref(int(x)) for x in xs], np.uint32)
    assert np.array_equal(got, want)


def test_sampling_distributions(rng):
    from raytracedggx_tpu.trace.sampling import cos_dir, ggx_dir
    n = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (20000, 1)), jnp.float32)
    xi = jnp.asarray(rng.random((20000, 2)), jnp.float32)
    d = np.asarray(cos_dir(n, xi))
    # cosine-weighted: E[cos] = 2/3
    assert abs(d[:, 2].mean() - 2 / 3) < 0.02
    assert d[:, 2].min() > -1e-6
    h = np.asarray(ggx_dir(jnp.float32(0.25**2), n, xi))
    # GGX a=rough^2 small -> concentrated around n
    assert h[:, 2].mean() > 0.98
