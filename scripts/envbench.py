"""Price env-probe sampling strategies on the real TPU (chained loops).

The round-3 frame ablation charges ~42 ms to the mip-filtered env lookup
in the secondary shade (dbg_env_mode=no_env diff) — ~5 ms per tap gather,
~250x over the measured 660 GB/s gather ceiling.  Hypothesis: scattered
row gathers from the 6.3 MB packed probe degrade to per-row DMA.  This
prices: (a) the production 8-gather trilinear, (b) a quad-packed layout
(each row carries its 2x2 bilinear footprint -> 2 gathers), (c) both on
UNSORTED vs morton-sorted directions, (d) a one-gather nearest-mip probe.

Usage: python scripts/envbench.py [iters]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

R = 921600


def quad_pack(env):
    """(N, 12) per-texel 2x2 footprint [c00 c10 c01 c11] with edge clamp."""
    data = np.asarray(env.data)
    offs = np.asarray(env.offsets)
    sizes = np.asarray(env.sizes)
    out = np.zeros((data.shape[0], 12), np.float32)
    for off, s in zip(offs, sizes):
        m = data[off:off + 6 * s * s].reshape(6, s, s, 3)
        x1 = np.minimum(np.arange(s) + 1, s - 1)
        c00 = m
        c10 = m[:, :, x1]
        c01 = m[:, x1, :]
        c11 = m[:, x1][:, :, x1]
        out[off:off + 6 * s * s] = np.concatenate(
            [c00, c10, c01, c11], axis=-1).reshape(-1, 12)
    return jnp.asarray(out)


def sample_env_quad(env, quad, d, level):
    from raytracedggx_tpu.trace.env import dir_to_face_uv

    face, u, v = dir_to_face_uv(d)
    level = jnp.clip(jnp.asarray(level, jnp.float32), 0.0,
                     env.num_mips - 1.0)
    m0 = jnp.floor(level).astype(jnp.int32)
    m1 = jnp.minimum(m0 + 1, env.num_mips - 1)
    f = (level - m0.astype(jnp.float32))[..., None]

    def bil(mip):
        s = env.sizes[mip]
        off = env.offsets[mip]
        sf = s.astype(jnp.float32)
        x = jnp.clip(u * sf - 0.5, 0.0, sf - 1.0)
        y = jnp.clip(v * sf - 0.5, 0.0, sf - 1.0)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        idx = off + (face * s + y0.astype(jnp.int32)) * s \
            + x0.astype(jnp.int32)
        q = quad[idx]
        return (q[..., 0:3] * (1 - fx) * (1 - fy)
                + q[..., 3:6] * fx * (1 - fy)
                + q[..., 6:9] * (1 - fx) * fy
                + q[..., 9:12] * fx * fy)

    return bil(m0) * (1 - f) + bil(m1) * f


def chain(fn, d, lvl, iters):
    @jax.jit
    def run(d, lvl):
        def body(i, acc):
            r = fn(d + acc * 1e-30, lvl)
            return jnp.sum(r) * 1e-30

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    np.asarray(run(d, lvl))
    t0 = time.time()
    np.asarray(run(d, lvl))
    return (time.time() - t0) / iters * 1e3


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from raytracedggx_tpu.io.dds import load_cubemap_env
    from raytracedggx_tpu.trace.env import sample_env, dir_to_face_uv

    env = load_cubemap_env("/root/reference/Bin/Assets/rnl_cross.dds")
    quad = quad_pack(env)
    print(f"probe rows {env.data.shape[0]}, quad {quad.nbytes >> 20} MB",
          flush=True)

    rng = np.random.default_rng(7)
    d_rand = rng.normal(size=(R, 3)).astype(np.float32)
    d_rand /= np.linalg.norm(d_rand, axis=1, keepdims=True)
    # morton/octant-sorted = what the sorted shading domain sees
    from raytracedggx_tpu.ops.traverse_pallas import sort_rays_morton
    order, _ = sort_rays_morton(jnp.asarray(d_rand) * 0.5 + 0.5,
                                jnp.asarray(d_rand),
                                jnp.zeros(3), jnp.ones(3))
    d_sort = jnp.asarray(d_rand)[order]
    lvl = jnp.asarray(rng.uniform(2.0, 5.0, R).astype(np.float32))

    for name, dd in (("unsorted", jnp.asarray(d_rand)), ("sorted", d_sort)):
        ms = chain(lambda d, l: sample_env(env, d, l), dd, lvl, iters)
        print(f"trilinear-8g {name:9s} {ms:7.2f} ms", flush=True)
        ms = chain(lambda d, l: sample_env_quad(env, quad, d, l), dd, lvl,
                   iters)
        print(f"quad-2g      {name:9s} {ms:7.2f} ms", flush=True)
        ms = chain(lambda d, l: sample_env(env, d, 0.0), dd, lvl, iters)
        print(f"bilinear-4g  {name:9s} {ms:7.2f} ms (static mip0)",
              flush=True)

        def nearest(d, l):
            face, u, v = dir_to_face_uv(d)
            m = jnp.round(l).astype(jnp.int32)
            s = env.sizes[m]
            off = env.offsets[m]
            sf = s.astype(jnp.float32)
            xi = jnp.clip((u * sf).astype(jnp.int32), 0, s - 1)
            yi = jnp.clip((v * sf).astype(jnp.int32), 0, s - 1)
            return env.data[off + (face * s + yi) * s + xi]

        ms = chain(nearest, dd, lvl, iters)
        print(f"nearest-1g   {name:9s} {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
