"""Decompose the non-traversal frame costs: the gather microbench showed
XLA gathers are ~0.25 ns/row (memory-bound), so the 48 ms interp_attribs /
98 ms shade measurements must come from elsewhere.  Time each candidate."""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def bench(name, fn, *args, reps=3):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(jax.jit(fn)(*args))
    print(f"{name:44s} {(time.time() - t0) / reps * 1e3:8.2f} ms",
          flush=True)
    return out


def main():
    w, h = 1280, 720
    R = w * h
    rng = np.random.default_rng(0)

    from raytracedggx_tpu.scene import Scene
    from raytracedggx_tpu.engine import Renderer, RenderConfig
    from raytracedggx_tpu.io.dds import load_cubemap_env
    from raytracedggx_tpu.trace.geometry import (interp_attribs,
                                                 fetch_vertices)
    from raytracedggx_tpu.trace.env import sample_env
    from raytracedggx_tpu.trace.raygen import take_small
    from raytracedggx_tpu.sh import evaluate_sh_irradiance

    env = load_cubemap_env("/root/reference/Bin/Assets/rnl_cross.dds")
    scene = Scene.create("/root/reference/Bin/Assets/bunny.obj")
    r = Renderer(scene, env=env,
                 config=RenderConfig(width=w, height=h, traversal="wide"))

    T = r.geom.attrib.shape[0]
    inst = jnp.zeros((R,), jnp.int32)
    prim = jnp.asarray(rng.integers(0, T - 10, R), jnp.int32)
    u = jnp.asarray(rng.random(R), jnp.float32)
    v = jnp.asarray(rng.random(R), jnp.float32) * (1.0 - u)
    dirs = jnp.asarray(rng.standard_normal((R, 3)), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    bench("interp_attribs (geom closure)",
          lambda i, p, uu, vv: interp_attribs(r.geom, scene.mesh_ids,
                                              i, p, uu, vv),
          inst, prim, u, v)
    bench("fetch_vertices only",
          lambda i, p: fetch_vertices(r.geom, scene.mesh_ids, i, p),
          inst, prim)
    bench("raw attrib gather (arg table)",
          lambda tab, p: jax.lax.optimization_barrier(tab[p]),
          r.geom.attrib, prim)
    bench("take_small worlds (R,4,4)",
          lambda i: take_small(jnp.eye(4)[None], i, 1), inst)

    bench("sample_env level0 static",
          lambda d: sample_env(r.env, d, 0.0), dirs)
    bench("sample_env level (R,) dynamic",
          lambda d, l: sample_env(r.env, d, l),
          dirs, jnp.full((R,), 4.2, jnp.float32))
    bench("evaluate_sh_irradiance",
          lambda n: evaluate_sh_irradiance(r.sh_coeffs, n), dirs)

    # env internals: face/uv + single bilinear at a STATIC mip
    from raytracedggx_tpu.trace.env import dir_to_face_uv, _bilinear
    bench("dir_to_face_uv only",
          lambda d: jax.lax.optimization_barrier(dir_to_face_uv(d)), dirs)

    def bil0(d):
        f, uu, vv = dir_to_face_uv(d)
        return _bilinear(r.env, 0, f, uu, vv)

    bench("bilinear mip0", bil0, dirs)


if __name__ == "__main__":
    main()
