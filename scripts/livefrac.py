"""Measure the live secondary-wave fraction across meshes and animation
angles — sizes RenderConfig.secondary_bucket (the static live-prefix
bucket; trace cost, in-branch shading, and the bucket permute all scale
with it, and the runtime lax.cond falls back to the full wave if a frame
ever exceeds it).

Replays the exact reflection-wave construction of
trace/raygen.ray_trace_pass (GGX sample, NoL cull — RayTracing.hlsl:459)
over one full model rotation.

Usage: python scripts/livefrac.py [mesh ...]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import numpy as np  # noqa: E402

MESHES = {
    "bunny": ("/root/reference/Bin/Assets/bunny.obj", (0, 0, 0, 1)),
    "dragon": ("/root/reference/Bin/Assets/dragon.obj", (0, 0, 0, 1)),
    "TuringBowl": ("/root/reference/Bin/Assets/TuringBowl.obj",
                   (0, 2.8, 0, 0.03)),
}
W, H = 1280, 720


def main():
    import jax
    import jax.numpy as jnp

    from raytracedggx_tpu.scene import Scene
    from raytracedggx_tpu.engine import Renderer, RenderConfig
    from raytracedggx_tpu.io.dds import load_cubemap_env
    from raytracedggx_tpu.trace.raygen import primary_surface
    from raytracedggx_tpu.trace.sampling import sample_param, ggx_dir
    from raytracedggx_tpu.utils.math3d import reflect

    names = sys.argv[1:] or list(MESHES)
    env = load_cubemap_env("/root/reference/Bin/Assets/rnl_cross.dds")
    for name in names:
        path, ps = MESHES[name]
        scene = Scene.create(path, pos_scale=ps)
        r = Renderer(scene, env=env,
                     config=RenderConfig(width=W, height=H))
        state = r.init_state()

        @jax.jit
        def live_at(angle, frame):
            from raytracedggx_tpu.ops.scene_wide import (
                trace_scene_wide_fused)
            consts, worlds, _wvp = r._constants(state, angle)
            consts = consts._replace(frame_index=frame)
            tlas, wide_arrays = r._refit_as(worlds)
            sw = r.swide._replace(nodes=wide_arrays[0],
                                  inv_mats=wide_arrays[1])
            trace_fused = (lambda o, d, tmin, tmax:
                           trace_scene_wide_fused(sw, o, d, tmin, tmax))
            surf = primary_surface(
                r.geom, tlas, consts, r.materials, W, H,
                trace_fused=trace_fused, ray_order=r.ray_order)
            hit, n, v = surf["hit"], surf["n"], surf["v"]
            px = jnp.tile(jnp.arange(W, dtype=jnp.int32), H)
            py = jnp.repeat(jnp.arange(H, dtype=jnp.int32), W)
            xi = sample_param(px, py, W, consts.frame_index)
            a = surf["rough"] * surf["rough"]
            r_dir = reflect(-v, ggx_dir(a, n, xi))
            nol = jnp.sum(n * r_dir, axis=-1)
            live_r = jnp.sum((hit & (nol > 0.0)).astype(jnp.int32))
            # diffuse wave gate (metallic < 1 after checkerboard)
            live_d = jnp.sum((hit & (surf["metal"] < 1.0)
                              ).astype(jnp.int32))
            return live_r, live_d

        worst_r = worst_d = 0
        for k in range(24):
            angle = np.float32(k * (2 * np.pi / 24))
            lr, ld = live_at(angle, jnp.uint32(k * 11 % 256))
            lr, ld = int(np.asarray(lr)), int(np.asarray(ld))
            worst_r, worst_d = max(worst_r, lr), max(worst_d, ld)
            if k % 6 == 0:
                print(f"{name}: angle {float(angle):5.2f} refl {lr} "
                      f"({100 * lr / (W * H):.1f}%) diff {ld}",
                      flush=True)
        print(f"{name}: WORST refl {worst_r} "
              f"({100 * worst_r / (W * H):.2f}%)  diff {worst_d} "
              f"({100 * worst_d / (W * H):.2f}%)", flush=True)


if __name__ == "__main__":
    main()
