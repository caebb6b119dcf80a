"""Price the pieces INSIDE the reflection bucket branch (the 22.6 ms/frame
self-time in the xplane re-baseline, docs/PERF.md): bucket kernel alone,
sorted-domain shading alone, env-lookup variants, and TAA.  Chained-loop
timing (fori_loop with a data dependency per iteration).

Usage: python scripts/profile_branch.py [iters]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

W, H = 1280, 720


def chain(name, fn, *args, iters=10):
    """fn(*args, salt) -> array; chained by salting an input each iter."""
    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(*a, acc)
            return jnp.sum(out) * 1e-30

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    np.asarray(loop(*args))
    t0 = time.time()
    np.asarray(loop(*args))
    ms = (time.time() - t0) / iters * 1e3
    print(f"{name:52s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from raytracedggx_tpu.scene import Scene
    from raytracedggx_tpu.engine import Renderer, RenderConfig
    from raytracedggx_tpu.io.dds import load_cubemap_env
    from raytracedggx_tpu.ops.scene_wide import trace_scene_wide_fused
    from raytracedggx_tpu.ops.traverse_pallas import sort_rays_morton
    from raytracedggx_tpu.trace.raygen import (primary_surface,
                                               _shade_secondary)
    from raytracedggx_tpu.trace.env import sample_env
    from raytracedggx_tpu.trace.sampling import sample_param, ggx_dir
    from raytracedggx_tpu.trace.traverse import HitRecord
    from raytracedggx_tpu.utils.math3d import reflect
    from raytracedggx_tpu.bvh import build_tlas
    from raytracedggx_tpu.denoise import temporal_ss

    env = load_cubemap_env("/root/reference/Bin/Assets/rnl_cross.dds")
    scene = Scene.create("/root/reference/Bin/Assets/bunny.obj")
    r = Renderer(scene, env=env,
                 config=RenderConfig(width=W, height=H, traversal="wide"))
    state = r.init_state()
    consts, worlds, _ = r._constants(state, state.angle)
    tlas = build_tlas(list(r.geom.blas), worlds, mesh_ids=scene.mesh_ids)
    sw = r.swide

    def fused(o, d, tmin, tmax):
        return trace_scene_wide_fused(sw, o, d, tmin, tmax)

    surf = jax.jit(lambda c: primary_surface(
        r.geom, tlas, c, r.materials, W, H, trace_fused=fused,
        ray_order=r.ray_order))(consts)
    surf = jax.block_until_ready(surf)

    hit, n, v, p = surf["hit"], surf["n"], surf["v"], surf["p"]
    rough = surf["rough"]
    px = jnp.tile(jnp.arange(W, dtype=jnp.int32), H)
    py = jnp.repeat(jnp.arange(H, dtype=jnp.int32), W)
    xi = sample_param(px, py, W, consts.frame_index)
    hv = ggx_dir(rough * rough, n, xi)
    r_dir = reflect(-v, hv)
    nol = jnp.sum(n * r_dir, axis=-1)
    trace_dir = jnp.where(hit[..., None], r_dir, -v)
    tmax_r = jnp.where(hit & (nol > 0.0), 1e4, -1.0)

    boxes0 = sw.nodes[0, :24, 0].reshape(4, 6)
    lo = jnp.min(boxes0[:, 0:3], axis=0)
    hi = jnp.max(boxes0[:, 3:6], axis=0)
    order, _ = sort_rays_morton(p, trace_dir, lo, hi, active=tmax_r > 0,
                                with_inverse=False)
    R = W * H
    bucket = -(-int(0.375 * R) // 8192) * 8192
    idx = order[:bucket]
    o_k = jax.block_until_ready(p[idx])
    d_k = jax.block_until_ready(trace_dir[idx])
    tm_k = jax.block_until_ready(tmax_r[idx])
    live = int(np.asarray(tm_k > 0).sum())
    print(f"bucket rows {bucket}, live {live}", flush=True)

    # 0. live-count distribution over 30 animated frames (sizes the bucket)
    st = state
    lives = []
    for _ in range(30):
        st, _f, aux = r.step(st, dt=1 / 60)
        hitf = np.asarray(aux["normal"][..., 3]) > 0.5
        lives.append(int(hitf.sum()))
    print(f"primary hits over 30 frames: min {min(lives)} max {max(lives)}",
          flush=True)
    c2, _w2, _ = r._constants(st, st.angle)
    xi2 = sample_param(px, py, W, c2.frame_index)
    hv2 = ggx_dir(rough * rough, n, xi2)
    rd2 = reflect(-v, hv2)
    live2 = int(np.asarray(
        (hit & (jnp.sum(n * rd2, axis=-1) > 0.0))).sum())
    print(f"refl live (frame {int(np.asarray(c2.frame_index))}): {live2}",
          flush=True)

    # 1. bucket kernel alone
    chain("refl bucket kernel (352k rows)",
          lambda o, d, tm, s: fused(o, d + s, 1e-5, tm)[0].t,
          o_k, d_k, tm_k, iters=iters)

    # 1b. smaller bucket (128k rows) — live prefix only
    bk2 = 131072
    o_k2, d_k2, tm_k2 = o_k[:bk2], d_k[:bk2], tm_k[:bk2]
    chain("refl bucket kernel (128k rows)",
          lambda o, d, tm, s: fused(o, d + s, 1e-5, tm)[0].t,
          o_k2, d_k2, tm_k2, iters=iters)

    # 2. kernel at FULL 921k-lane sorted wave (pre-bucket shape)
    o_s = jax.block_until_ready(p[order])
    d_s = jax.block_until_ready(trace_dir[order])
    tm_s = jax.block_until_ready(tmax_r[order])
    chain("refl kernel FULL sorted wave (921k rows)",
          lambda o, d, tm, s: fused(o, d + s, 1e-5, tm)[0].t,
          o_s, d_s, tm_s, iters=iters)

    # 3. shading alone on bucket hits
    rec, nrm = jax.block_until_ready(fused(o_k, d_k, 1e-5, tm_k))

    def shade(o, d, t, u, vv, prim, inst, hitk, nrm_, s):
        rec_ = HitRecord(t=t + s, prim=prim, u=u, v=vv, hit=hitk,
                         inst=inst)
        return _shade_secondary(r.geom, scene.mesh_ids, consts,
                                r.materials, env, r.sh_coeffs, rec_, d,
                                damp_diffuse_albedo=False, fused_n=nrm_,
                                ray_o=o)

    chain("bucket shade (hit paths: uv/spec-env/SH)",
          shade, o_k, d_k, rec.t, rec.u, rec.v, rec.prim, rec.inst,
          rec.hit, nrm, iters=iters)

    def shade_noenv(o, d, t, u, vv, prim, inst, hitk, nrm_, s):
        rec_ = HitRecord(t=t + s, prim=prim, u=u, v=vv, hit=hitk,
                         inst=inst)
        return _shade_secondary(r.geom, scene.mesh_ids, consts,
                                r.materials, env, r.sh_coeffs, rec_, d,
                                damp_diffuse_albedo=False, fused_n=nrm_,
                                ray_o=o, dbg_env_mode="no_env")

    chain("bucket shade WITHOUT env lookup (math only)",
          shade_noenv, o_k, d_k, rec.t, rec.u, rec.v, rec.prim,
          rec.inst, rec.hit, nrm, iters=iters)

    # full bucket path as production composes it (kernel+shade+env+where)
    def branch(o, d, tm, s):
        rec_, nrm_ = fused(o, d + s, 1e-5, tm)
        sh = shade(o, d, rec_.t, rec_.u, rec_.v, rec_.prim, rec_.inst,
                   rec_.hit, nrm_, 0.0)
        ev = sample_env(env, d, 0.0)
        return jnp.where(rec_.hit[..., None], sh, ev)

    chain("bucket branch TOTAL (kernel+shade+miss-env)",
          branch, o_k, d_k, tm_k, iters=iters)

    # 4. env components
    chain("sample_env bucket trilinear (rough mips)",
          lambda d, rg, s: sample_env(env, d + s,
                                      3.0 * jnp.ones_like(rg)),
          d_k, tm_k, iters=iters)
    chain("sample_env bucket lod0 (miss lanes)",
          lambda d, s: sample_env(env, d + s, 0.0), d_k, iters=iters)
    chain("sample_env full-width lod0 (miss_all)",
          lambda d, s: sample_env(env, d + s, 0.0), trace_dir,
          iters=iters)

    # 5. TAA alone
    cur = jnp.concatenate([surf["p"] * 0.1,
                           hit[..., None].astype(jnp.float32)], axis=-1
                          ).reshape(H, W, 4)
    vel = surf["velocity"].reshape(H, W, 2)
    chain("temporal_ss (TAA)",
          lambda c, h_, v_, s: temporal_ss(c + s, h_, v_),
          cur, state.history, vel, iters=iters)

    # 5b. TAA history row-gather vs flat-gather forms (layout probe):
    # xplane shows the production quad gather reading a COLUMN-major
    # {0,1} table at ~6 ns/row while row-major microbench gathers run
    # ~0.2 ms; the flat 1-D form is layout-proof
    hist = state.history
    quad = jnp.concatenate([hist, hist * 0.5, hist * 0.25, hist * 2.0],
                           axis=-1).reshape(H * W, 16)
    ridx = jnp.argsort(jnp.sin(jnp.arange(H * W, dtype=jnp.float32)))

    def row_gather(q, i, s):
        return q[i] + s

    def flat_gather(q, i, s):
        flat = q.reshape(-1)
        f = i[:, None] * 16 + jnp.arange(16, dtype=i.dtype)[None, :]
        return flat[f.reshape(-1)].reshape(-1, 16) + s

    chain("row gather (921k x 16, fresh quad table)", row_gather, quad,
          ridx, iters=iters)
    chain("flat gather (14.7M flat idx, same quad)", flat_gather, quad,
          ridx, iters=iters)

    # 6. un-permute gather (argsort + 921k-row fetch)
    back = jnp.concatenate([o_k, tm_k[:, None]], axis=1)

    def unperm(b, s):
        inv = jnp.argsort(order)
        return b[jnp.minimum(inv, bucket - 1)] + s

    chain("bucket un-permute (argsort + 921k gather)", unperm, back,
          iters=iters)


if __name__ == "__main__":
    main()
