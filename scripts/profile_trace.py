"""Fine-grained TPU timing of the ray_trace_pass internals: which of
traversal / attribute gathers / env sampling / SH eval actually costs the
milliseconds.  Usage: python scripts/profile_trace.py [WxH]"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def bench(name, fn, *args):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.time()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    print(f"{name:38s} {(time.time() - t0) * 1e3:8.1f} ms", flush=True)
    return out


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "1280x720"
    w, h = (int(v) for v in res.split("x"))

    from raytracedggx_tpu.scene import Scene
    from raytracedggx_tpu.engine import Renderer, RenderConfig
    from raytracedggx_tpu.io.dds import load_cubemap_env
    from raytracedggx_tpu.ops.scene_wide import (refit_scene_wide,
                                                 trace_scene_wide)
    from raytracedggx_tpu.trace.raygen import (primary_surface,
                                               _shade_secondary)
    from raytracedggx_tpu.trace.env import sample_env
    from raytracedggx_tpu.trace.sampling import sample_param, ggx_dir
    from raytracedggx_tpu.trace.geometry import interp_attribs
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

    surf = bench("primary_surface (trace+gbuffer)",
                 lambda c: primary_surface(
                     r.geom, tlas, c, r.materials, w, h,
                     trace_fn=lambda _t, o, d, a, b: trace_scene_wide(
                         sw, o, d, a, b),
                     ray_order=r.ray_order), consts)

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

    from raytracedggx_tpu.trace.raygen import _trace_ordered
    rec = bench("reflection trace (sorted, wide)",
                lambda pp, td, tm, o, i: tuple(_trace_ordered(
                    lambda _t, a, b, c, dd: trace_scene_wide(sw, a, b, c,
                                                             dd),
                    None, pp, td, 1e-5, tm, (o, i))),
                p, trace_dir, tmax_r, order, inv)
    from raytracedggx_tpu.trace.traverse import HitRecord
    rec = HitRecord(*rec)

    bench("reflection trace (UNSORTED, wide)",
          lambda pp, td, tm: tuple(trace_scene_wide(sw, pp, td, 1e-5, tm)),
          p, trace_dir, tmax_r)

    bench("interp_attribs (hit gather)",
          lambda i, pr, u, v: interp_attribs(r.geom, tlas.mesh_ids, i, pr,
                                             u, v),
          rec.inst, rec.prim, rec.u, rec.v)

    bench("_shade_secondary (full hit shading)",
          lambda rc, td: _shade_secondary(r.geom, tlas.mesh_ids, consts,
                                          r.materials, r.env, r.sh_coeffs,
                                          HitRecord(*rc), td, False),
          tuple(rec), trace_dir)

    bench("sample_env mip0 (miss env lookup)",
          lambda td: sample_env(r.env, td, 0.0), trace_dir)

    bench("sample_env mip-filtered (rough lookup)",
          lambda td, lv: sample_env(r.env, td, lv),
          trace_dir, jnp.full(trace_dir.shape[:1], 4.2))

    bench("evaluate_sh_irradiance",
          lambda nn: evaluate_sh_irradiance(r.sh_coeffs, nn), n)


if __name__ == "__main__":
    main()
