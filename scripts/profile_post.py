"""TPU timing: octant-kernel A/B (timing only) + denoiser/TAA/tonemap
stages, with a tiny-op calibration to subtract the tunnel dispatch floor.
Usage: python scripts/profile_post.py [WxH]"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


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
    from raytracedggx_tpu.trace.raygen import primary_surface
    from raytracedggx_tpu.trace.sampling import sample_param, ggx_dir
    from raytracedggx_tpu.utils.math3d import reflect
    from raytracedggx_tpu.bvh import build_tlas

    env = load_cubemap_env("/root/reference/Bin/Assets/rnl_cross.dds")
    scene = Scene.create("/root/reference/Bin/Assets/bunny.obj")
    r = Renderer(scene, env=env,
                 config=RenderConfig(width=w, height=h, traversal="wide"))
    state = r.init_state()
    consts, worlds, _ = r._constants(state, state.angle)
    tlas = build_tlas(list(r.geom.blas), worlds, mesh_ids=scene.mesh_ids)
    sw = jax.jit(lambda ww: refit_scene_wide(r.swide, ww))(worlds)
    sw = sw._replace(num_nodes=r.swide.num_nodes,
                     leaf_size=r.swide.leaf_size, stack=r.swide.stack,
                     inst_tri_ranges=r.swide.inst_tri_ranges)

    tiny = jnp.ones((8, 128), jnp.float32)
    bench("CALIBRATION tiny op", lambda t: t + 1.0, tiny, reps=5)

    surf = jax.jit(lambda c: primary_surface(
        r.geom, tlas, c, r.materials, w, h,
        trace_fused=lambda o, d, a, b: trace_scene_wide_fused(sw, o, d, a,
                                                              b),
        ray_order=r.ray_order))(consts)
    hit, n, v, p = surf["hit"], surf["n"], surf["v"], surf["p"]
    rough = surf["rough"]
    px = jnp.tile(jnp.arange(w, dtype=jnp.int32), h)
    py = jnp.repeat(jnp.arange(h, dtype=jnp.int32), w)
    xi = sample_param(px, py, w, consts.frame_index)
    hv = ggx_dir(rough * rough, n, xi)
    r_dir = reflect(-v, hv)
    nol = jnp.sum(n * r_dir, axis=-1)
    trace_dir = jnp.where(hit[..., None], r_dir, -v)
    tmax_r = jnp.where(hit & (nol > 0.0), 1e4, -1.0)

    from raytracedggx_tpu.ops.traverse_pallas import sort_rays_morton
    lo = jnp.min(tlas.aabb_min, axis=0)
    hi = jnp.max(tlas.aabb_max, axis=0)
    order, inv = jax.jit(lambda pp, td, tm: sort_rays_morton(
        pp, td, lo, hi, active=tm > 0))(p, trace_dir, tmax_r)
    po, do_, tmo = p[order], trace_dir[order], tmax_r[order]

    bench("reflection sorted (instanced kernel)",
          lambda pp, dd, tm: tuple(trace_scene_wide_fused(
              sw, pp, dd, 1e-5, tm)[0]),
          po, do_, tmo)

    # ---- denoiser stages -------------------------------------------------
    from raytracedggx_tpu.denoise import (reflection_spatial_filter,
                                          diffuse_spatial_filter,
                                          temporal_ss)
    from raytracedggx_tpu.post import tone_map

    rng = np.random.default_rng(0)
    refl = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
    diff = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
    normal = jnp.asarray(rng.random((h, w, 4)), jnp.float32)
    roughm = jnp.asarray(rng.random((h, w)), jnp.float32)
    metal = jnp.ones((h, w), jnp.float32)
    depth = jnp.asarray(rng.random((h, w)), jnp.float32)
    velocity = jnp.zeros((h, w, 2), jnp.float32)
    history = jnp.asarray(rng.random((h, w, 4)), jnp.float32)

    for impl in ("xla", "pallas"):
        fr = bench(f"spatial refl [{impl}]",
                   lambda a, b, c, d: reflection_spatial_filter(
                       a, b, c, d, w, h, impl=impl),
                   refl, normal, roughm, depth)
        bench(f"spatial diff [{impl}]",
              lambda a, b, c, d, e: diffuse_spatial_filter(
                  a, b, c, d, e, impl=impl),
              diff, fr, normal, metal, depth)

    flt = jnp.concatenate([diff, jnp.ones((h, w, 1))], axis=-1)
    bench("temporal_ss (TAA)",
          lambda a, b, c: temporal_ss(a, b, c), flt, history, velocity)
    bench("tone_map", tone_map, history)

    bench("CALIBRATION tiny op (end)", lambda t: t + 1.0, tiny, reps=5)


if __name__ == "__main__":
    main()
