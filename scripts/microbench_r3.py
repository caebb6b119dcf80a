"""Round-3 micro pricing: TAA tent vs gather, packed trilinear vs
2-gather, and a decomposition of sample_env lod0 (the 12.5 ms isolated
cost at 921k rows vs the ~3.6 ms raw-gather floor, scripts/
profile_branch.py r3).  Chained-loop timing.

Usage: python scripts/microbench_r3.py [iters]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

H, W = 720, 1280
R = H * W


def chain(name, fn, *args, iters=10):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            return jnp.sum(fn(*a, acc)) * 1e-30

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    np.asarray(loop(*args))
    t0 = time.time()
    np.asarray(loop(*args))
    print(f"{name:52s} {(time.time() - t0) / iters * 1e3:8.2f} ms",
          flush=True)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rng = np.random.default_rng(0)

    # --- TAA history resample ------------------------------------------
    from raytracedggx_tpu.denoise.temporal import (_tent_resample,
                                                   _bilinear_clamp_pix)
    img = jnp.asarray(rng.standard_normal((H, W, 4)), jnp.float32)
    dx = jnp.asarray(rng.uniform(-3, 3, (H, W)), jnp.float32)
    dy = jnp.asarray(rng.uniform(-3, 3, (H, W)), jnp.float32)
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    for D in (3, 4, 6):
        chain(f"TAA tent D={D} ({(2 * D + 2) ** 2} taps)",
              lambda i, a, b, s, D=D: _tent_resample(i + s, a, b, D),
              img, dx, dy, iters=iters)
    chain("TAA gather bilinear (921k rows)",
          lambda i, a, b, s: _bilinear_clamp_pix(i + s, xs + a, ys + b),
          img, dx, dy, iters=iters)

    # --- env sampling ---------------------------------------------------
    from raytracedggx_tpu.trace.env import (pack_mips, build_mips,
                                            sample_env, dir_to_face_uv)
    base = rng.standard_normal((6, 256, 256, 3)).astype(np.float32)
    env = pack_mips(build_mips(base))
    env_nt = env._replace(tri=None)
    N = 352256
    d_b = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    d_b = d_b / jnp.linalg.norm(d_b, axis=-1, keepdims=True)
    lv = jnp.asarray(rng.uniform(0, 8, N), jnp.float32)
    d_f = jnp.asarray(rng.standard_normal((R, 3)), jnp.float32)
    d_f = d_f / jnp.linalg.norm(d_f, axis=-1, keepdims=True)

    chain("trilinear packed 1-gather (352k)",
          lambda d_, l, s: sample_env(env, d_ + s, l), d_b, lv,
          iters=iters)
    chain("trilinear 2-gather (352k)",
          lambda d_, l, s: sample_env(env_nt, d_ + s, l), d_b, lv,
          iters=iters)
    chain("bilinear lod0 (352k)",
          lambda d_, s: sample_env(env, d_ + s, 0.0), d_b, iters=iters)
    chain("bilinear lod0 (921k)",
          lambda d_, s: sample_env(env, d_ + s, 0.0), d_f, iters=iters)

    # decomposition of the lod0 bilinear at 921k rows
    s0 = 256

    def face_math(d_, s):
        f, u, v = dir_to_face_uv(d_ + s)
        return u + v + f.astype(jnp.float32)

    chain("  lod0 part: dir->face/uv math only", face_math, d_f,
          iters=iters)

    def to_idx(d_):
        f, u, v = dir_to_face_uv(d_)
        x = jnp.clip(u * s0 - 0.5, 0.0, s0 - 1.0)
        y = jnp.clip(v * s0 - 0.5, 0.0, s0 - 1.0)
        return ((f * s0 + jnp.floor(y).astype(jnp.int32)) * s0
                + jnp.floor(x).astype(jnp.int32)), x, y

    idx0, _, _ = to_idx(d_f)
    idx0 = jax.block_until_ready(idx0)
    chain("  lod0 part: quad gather only (fixed idx)",
          lambda i, s: env.quad[i] + s, idx0, iters=iters)

    def launder(x):
        return jax.lax.optimization_barrier(x.reshape(-1)).reshape(x.shape)

    chain("  lod0 part: LAUNDERED quad gather (fixed idx)",
          lambda i, s: launder(env.quad)[i] + s, idx0, iters=iters)

    def full_split(d_, s):
        # same ops as sample_env but barriered between idx math and gather
        idx, x, y = to_idx(d_ + s)
        idx = jax.lax.optimization_barrier(idx)
        q = env.quad[idx]
        fx = (x - jnp.floor(x))[..., None]
        fy = (y - jnp.floor(y))[..., None]
        return (q[..., 0:3] * (1 - fx) * (1 - fy) + q[..., 3:6] * fx
                * (1 - fy) + q[..., 6:9] * (1 - fx) * fy
                + q[..., 9:12] * fx * fy)

    chain("  lod0: idx math BARRIER gather+lerp", full_split, d_f,
          iters=iters)

    # gather straight from data (3-col) x4 taps for reference
    def four_tap(i, s):
        return (env.data[i] + env.data[i + 1] + env.data[i + 256]
                + env.data[i + 257]) + s

    chain("  lod0 alt: 4 narrow gathers from (N,3)", four_tap, idx0,
          iters=iters)


if __name__ == "__main__":
    main()
