"""Fine-grained TPU timing of the fused ray-trace internals: refit,
primary/reflection traversal (fused kernel), ray sort, shading, env
sampling, and a kernel tile-size sweep.
Usage: python scripts/profile_trace.py [WxH]"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def bench(name, fn, *args, reps=5):
    """Report the MIN over reps: the tunneled backend injects sporadic
    ~30-100 ms dispatch stalls (docs/PERF.md), and min is robust to
    them while mean is not."""
    jitted = jax.jit(fn)
    out = jax.block_until_ready(jitted(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(jitted(*args))
        best = min(best, time.time() - t0)
    print(f"{name:44s} {best * 1e3:8.1f} ms", flush=True)
    return out


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "1280x720"
    w, h = (int(v) for v in res.split("x"))

    from raytracedggx_tpu.scene import Scene
    from raytracedggx_tpu.engine import Renderer, RenderConfig
    from raytracedggx_tpu.io.dds import load_cubemap_env
    from raytracedggx_tpu.ops.scene_wide import (refit_scene_wide,
                                                 trace_scene_wide_fused)
    from raytracedggx_tpu.trace.raygen import (primary_surface,
                                               _shade_secondary,
                                               _trace_ordered_fused)
    from raytracedggx_tpu.trace.env import sample_env
    from raytracedggx_tpu.trace.sampling import sample_param, ggx_dir
    from raytracedggx_tpu.trace.traverse import HitRecord
    from raytracedggx_tpu.utils.math3d import reflect
    from raytracedggx_tpu.bvh import build_tlas
    from raytracedggx_tpu.sh import evaluate_sh_irradiance

    env = load_cubemap_env("/root/reference/Bin/Assets/rnl_cross.dds")
    scene = Scene.create("/root/reference/Bin/Assets/bunny.obj")
    r = Renderer(scene, env=env,
                 config=RenderConfig(width=w, height=h, traversal="wide"))
    state = r.init_state()
    consts, worlds, _ = r._constants(state, state.angle)
    tlas = build_tlas(list(r.geom.blas), worlds, mesh_ids=scene.mesh_ids)

    sw = bench("refit_scene_wide",
               lambda ww: refit_scene_wide(r.swide, ww), worlds)

    def fused(o, d, tmin, tmax, tile_s=8):
        return trace_scene_wide_fused(sw, o, d, tmin, tmax, tile_s=tile_s)

    surf = bench("primary_surface (fused trace+gbuffer)",
                 lambda c: primary_surface(
                     r.geom, tlas, c, r.materials, w, h,
                     trace_fused=fused, ray_order=r.ray_order), consts)

    hit, n, v, p = surf["hit"], surf["n"], surf["v"], surf["p"]
    rough, metal = surf["rough"], surf["metal"]
    px = jnp.tile(jnp.arange(w, dtype=jnp.int32), h)
    py = jnp.repeat(jnp.arange(h, dtype=jnp.int32), w)
    xi = sample_param(px, py, w, consts.frame_index)
    a = rough * rough
    hv = ggx_dir(a, n, xi)
    r_dir = reflect(-v, hv)
    nol = jnp.sum(n * r_dir, axis=-1)
    trace_dir = jnp.where(hit[..., None], r_dir, -v)
    tmax_r = jnp.where(hit & (nol > 0.0), 1e4, -1.0)

    from raytracedggx_tpu.ops.traverse_pallas import sort_rays_morton
    lo = jnp.min(tlas.aabb_min, axis=0)
    hi = jnp.max(tlas.aabb_max, axis=0)

    order, inv = bench("morton sort (reflection wave)",
                       lambda pp, td, tm: sort_rays_morton(
                           pp, td, lo, hi, active=tm > 0),
                       p, trace_dir, tmax_r)

    def refl_trace(pp, td, tm, o, i, tile_s=8):
        rec, nr = _trace_ordered_fused(
            lambda a_, b_, c_, d_: fused(a_, b_, c_, d_, tile_s=tile_s),
            pp, td, 1e-5, tm, (o, i))
        return tuple(rec) + (nr,)

    out = bench("reflection fused (sorted)",
                lambda pp, td, tm, o, i: refl_trace(pp, td, tm, o, i),
                p, trace_dir, tmax_r, order, inv)
    rec = HitRecord(*out[:6])
    fn_r = out[6]

    bench("reflection fused (UNSORTED)",
          lambda pp, td, tm: tuple(fused(pp, td, 1e-5, tm)[0]),
          p, trace_dir, tmax_r)

    for ts in (4, 2):
        bench(f"reflection fused (sorted, tile_s={ts})",
              lambda pp, td, tm, o, i, ts=ts: refl_trace(pp, td, tm, o, i,
                                                         tile_s=ts),
              p, trace_dir, tmax_r, order, inv)
        bench(f"primary fused (tile_s={ts})",
              lambda c, ts=ts: primary_surface(
                  r.geom, tlas, c, r.materials, w, h,
                  trace_fused=lambda o, d, a_, b_: fused(o, d, a_, b_,
                                                         tile_s=ts),
                  ray_order=r.ray_order), consts)

    bench("_shade_secondary (fused attrs)",
          lambda rc, nr, td, pp: _shade_secondary(
              r.geom, tlas.mesh_ids, consts, r.materials, r.env,
              r.sh_coeffs, HitRecord(*rc), td, False, fused_n=nr, ray_o=pp),
          tuple(rec), fn_r, trace_dir, p)

    bench("sample_env mip0 (miss env lookup)",
          lambda td: sample_env(r.env, td, 0.0), trace_dir)

    bench("sample_env mip-filtered (rough lookup)",
          lambda td, lv: sample_env(r.env, td, lv),
          trace_dir, jnp.full(trace_dir.shape[:1], 4.2))

    bench("evaluate_sh_irradiance",
          lambda nn: evaluate_sh_irradiance(r.sh_coeffs, nn), n)


if __name__ == "__main__":
    main()
