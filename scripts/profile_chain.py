"""Chained-loop stage timing: each iteration's inputs are barrier-chained
to the previous output, so the device must execute every iteration —
the only per-stage methodology that survives this tunnel's unreliable
block_until_ready (docs/PERF.md).  Usage: profile_chain.py [WxH] [iters]"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def chain(name, step_fn, state0, iters):
    """step_fn: state -> state (jitted once); reports ms/iteration."""
    jitted = jax.jit(step_fn)
    s = jax.block_until_ready(jitted(state0))      # compile
    np.asarray(jax.tree.leaves(s)[0].ravel()[0:1])
    t0 = time.time()
    for _ in range(iters):
        s = jitted(s)
    np.asarray(jax.tree.leaves(s)[0].ravel()[0:1])
    print(f"{name:46s} {(time.time() - t0) / iters * 1e3:8.1f} ms/iter",
          flush=True)


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "1280x720"
    w, h = (int(v) for v in res.split("x"))
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 15

    from raytracedggx_tpu.scene import Scene
    from raytracedggx_tpu.engine import Renderer, RenderConfig
    from raytracedggx_tpu.io.dds import load_cubemap_env
    from raytracedggx_tpu.ops.scene_wide import (refit_scene_wide,
                                                 trace_scene_wide_fused)
    from raytracedggx_tpu.trace.raygen import (_shade_secondary,
                                               primary_surface)
    from raytracedggx_tpu.trace.env import sample_env
    from raytracedggx_tpu.trace.traverse import HitRecord
    from raytracedggx_tpu.bvh import build_tlas
    from raytracedggx_tpu.denoise import temporal_ss
    from raytracedggx_tpu.sh import evaluate_sh_irradiance

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

    surf = jax.jit(lambda c: primary_surface(
        r.geom, tlas, c, r.materials, w, h,
        trace_fused=lambda o, d, a, b: trace_scene_wide_fused(sw, o, d, a,
                                                              b),
        ray_order=r.ray_order))(consts)
    hit, n, p = surf["hit"], surf["n"], surf["p"]
    R = hit.shape[0]
    rng = np.random.default_rng(0)
    dirs = jnp.asarray(rng.standard_normal((R, 3)), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    tmax = jnp.where(hit, 1e4, -1.0)

    def dep(x, out):
        """Barrier-chain: x's value is unchanged but ordered after out."""
        return jax.lax.optimization_barrier((x, out))[0]

    mesh_ids = tlas.mesh_ids
    rec0 = HitRecord(t=jnp.ones(R), prim=jnp.zeros(R, jnp.int32),
                     u=jnp.zeros(R), v=jnp.zeros(R), hit=hit,
                     inst=jnp.zeros(R, jnp.int32))

    for mode in ("full", "no_env", "bilinear"):
        def shade_step(d, mode=mode):
            out = _shade_secondary(r.geom, mesh_ids, consts, r.materials,
                                   r.env, r.sh_coeffs, rec0, d, False,
                                   fused_n=n, ray_o=p, dbg_env_mode=mode)
            return dep(d, out)
        chain(f"_shade_secondary [{mode}]", shade_step, dirs, iters)

    def env_step(d):
        return dep(d, sample_env(r.env, d, 0.0))
    chain("sample_env static mip0", env_step, dirs, iters)

    def env_dyn_step(d):
        return dep(d, sample_env(r.env, d,
                                 jnp.full(d.shape[:1], 4.2)))
    chain("sample_env dynamic trilinear", env_dyn_step, dirs, iters)

    def sh_step(d):
        return dep(d, evaluate_sh_irradiance(r.sh_coeffs, d))
    chain("evaluate_sh_irradiance", sh_step, dirs, iters)

    def trace_step(d):
        rec, nr = trace_scene_wide_fused(sw, p, d, 1e-5, tmax)
        return dep(d, nr)
    chain("reflection-like trace (unsorted rand)", trace_step, dirs, iters)

    # TAA chained via its own history
    flt = jnp.asarray(rng.random((h, w, 4)), jnp.float32)
    vel = jnp.zeros((h, w, 2), jnp.float32)

    def taa_step(hist):
        return temporal_ss(flt, hist, vel)
    chain("temporal_ss (self-chained)", taa_step, flt, iters)

    # tone map chained
    from raytracedggx_tpu.post import tone_map

    def tm_step(x):
        return dep(x, tone_map(x))
    chain("tone_map", tm_step, flt, iters)


if __name__ == "__main__":
    main()
