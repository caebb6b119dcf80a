"""Lock the BRDF terms against hand-computed reference values
(BRDFModels.hlsli formulas) and physical sanity checks."""

import numpy as np
import jax.numpy as jnp

from raytracedggx_tpu.trace import brdf


def test_d_ggx_values():
    # m = r^2; D = m^2 / (pi ((NoH^2 (m^2-1) + 1))^2)
    r, noh = 0.5, 0.8
    m2 = (r * r) ** 2
    d = (noh * m2 - noh) * noh + 1.0
    want = m2 / (np.pi * d * d)
    got = float(brdf.d_ggx(jnp.float32(r), jnp.float32(noh)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_d_ggx_normalization():
    # integral over hemisphere of D * cos = 1 (Monte Carlo, loose)
    rng = np.random.default_rng(0)
    n = 400000
    # uniform hemisphere
    u = rng.random((n, 2))
    ct = u[:, 0]
    st = np.sqrt(1 - ct * ct)
    r = 0.6
    d = np.asarray(brdf.d_ggx(jnp.float32(r), jnp.asarray(ct, jnp.float32)))
    integral = (d * ct).mean() * 2 * np.pi
    np.testing.assert_allclose(integral, 1.0, rtol=0.05)


def test_vis_smith_matches_formula():
    r, nov, nol = 0.3, 0.7, 0.4
    a2 = (r * r) ** 2
    vv = nov + np.sqrt(nov * (nov - nov * a2) + a2)
    vl = nol + np.sqrt(nol * (nol - nol * a2) + a2)
    want = 1.0 / (vv * vl)
    got = float(brdf.vis_smith(jnp.float32(r), jnp.float32(nov),
                               jnp.float32(nol)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_f_schlick_limits():
    f0 = jnp.asarray([[0.95, 0.93, 0.88]], jnp.float32)
    # normal incidence -> f0; grazing -> ~1
    at0 = np.asarray(brdf.f_schlick(f0, jnp.asarray([1.0], jnp.float32)))
    np.testing.assert_allclose(at0[0], [0.95, 0.93, 0.88], atol=1e-6)
    at90 = np.asarray(brdf.f_schlick(f0, jnp.asarray([0.0], jnp.float32)))
    np.testing.assert_allclose(at90[0], 1.0, atol=1e-6)
    # the 2% shadowing floor: black f0 stays black at grazing
    black = jnp.zeros((1, 3), jnp.float32)
    g = np.asarray(brdf.f_schlick(black, jnp.asarray([0.0], jnp.float32)))
    np.testing.assert_allclose(g[0], 0.0, atol=1e-6)


def test_env_brdf_approx_range():
    # split-sum fit stays within a sane reflectance envelope
    rng = np.random.default_rng(1)
    f0 = jnp.asarray(rng.random((256, 3)), jnp.float32)
    rough = jnp.asarray(rng.random(256), jnp.float32)
    nov = jnp.asarray(rng.random(256), jnp.float32)
    out = np.asarray(brdf.env_brdf_approx(f0, rough, nov))
    assert out.min() > -0.05 and out.max() < 1.5
    # smooth mirror at normal incidence ~ f0
    out0 = np.asarray(brdf.env_brdf_approx(
        jnp.asarray([[0.9, 0.9, 0.9]], jnp.float32),
        jnp.asarray([0.02], jnp.float32), jnp.asarray([1.0], jnp.float32)))
    np.testing.assert_allclose(out0[0], 0.9, atol=0.1)
