"""Traversal-kernel experiment matrix on real TPU.

Measures the bunny primary + incoherent waves across kernel variants so a
perf round can pick winners quickly:
  - node fetch: onehot lane-reduce vs dynamic roll
  - leaf collapse: 4 vs 8 triangles
  - secondary sorting: on/off

Usage: python scripts/perf_matrix.py [WxH]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from raytracedggx_tpu.bvh import build_lbvh  # noqa: E402
from raytracedggx_tpu.io.obj import load_obj  # noqa: E402
from raytracedggx_tpu.ops import flatten_bvh, trace_rays_pallas  # noqa: E402
from raytracedggx_tpu.ops.traverse_pallas import block_order  # noqa: E402
from raytracedggx_tpu.scene import Camera  # noqa: E402


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "1280x720"
    w, h = (int(v) for v in res.split("x"))
    m = load_obj("/root/reference/Bin/Assets/bunny.obj")
    tri = m.positions[m.indices.reshape(-1, 3)]
    v0 = jnp.asarray(tri[:, 0])
    e1 = jnp.asarray(tri[:, 1] - tri[:, 0])
    e2 = jnp.asarray(tri[:, 2] - tri[:, 0])
    bvh = jax.block_until_ready(jax.jit(build_lbvh)(m.positions, m.indices))

    cam = Camera(width=w, height=h)
    vp = np.asarray(cam.view_proj())
    inv = np.linalg.inv(vp)
    xs = (np.arange(w) + 0.5) / w * 2 - 1
    ys = -((np.arange(h) + 0.5) / h * 2 - 1)
    sx, sy = np.meshgrid(xs, ys, indexing="xy")
    ndc = np.stack([sx.ravel(), sy.ravel(), np.zeros(w * h),
                    np.ones(w * h)], -1).astype(np.float32)
    w4 = ndc @ inv
    pn = (w4[:, :3] / w4[:, 3:4]).astype(np.float32)
    d = pn - np.asarray(cam.eye)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    order, _ = block_order(w, h)
    o_b = jnp.asarray(pn[order])
    d_b = jnp.asarray(d[order])

    rng = np.random.default_rng(0)
    dr = rng.standard_normal((w * h, 3)).astype(np.float32)
    dr /= np.linalg.norm(dr, axis=1, keepdims=True)
    dr_b = jnp.asarray(dr[order])

    # 4-wide kernel variants
    from raytracedggx_tpu.ops.wide import flatten_bvh4, trace_rays_pallas4
    for leaf in (4, 8):
        wide = flatten_bvh4(bvh, v0, e1, e2, leaf_size=leaf)
        try:
            f = jax.jit(lambda o, dd, w=wide:
                        trace_rays_pallas4(w, o, dd, 0.0, 1e4))
            jax.block_until_ready(f(o_b, d_b))
            t0 = time.time()
            jax.block_until_ready(f(o_b, d_b))
            t_pri = time.time() - t0
            jax.block_until_ready(f(o_b, dr_b))
            t0 = time.time()
            jax.block_until_ready(f(o_b, dr_b))
            t_inc = time.time() - t0
            print(f"BVH4 leaf={leaf:2d}: primary {t_pri*1e3:7.1f} ms  "
                  f"incoherent {t_inc*1e3:7.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"BVH4 leaf={leaf}: FAILED {e}", flush=True)

    for leaf in (4, 8, 16):
        flat = flatten_bvh(bvh, v0, e1, e2, leaf_size=leaf)
        for fetch in ("onehot", "roll"):
            try:
                f = jax.jit(lambda o, dd, flat=flat, fetch=fetch:
                            trace_rays_pallas(flat, o, dd, 0.0, 1e4,
                                              fetch=fetch))
                jax.block_until_ready(f(o_b, d_b))
                t0 = time.time()
                jax.block_until_ready(f(o_b, d_b))
                t_pri = time.time() - t0
                jax.block_until_ready(f(o_b, dr_b))
                t0 = time.time()
                jax.block_until_ready(f(o_b, dr_b))
                t_inc = time.time() - t0
                print(f"leaf={leaf:2d} fetch={fetch:7s}: "
                      f"primary {t_pri*1e3:7.1f} ms  "
                      f"incoherent {t_inc*1e3:7.1f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"leaf={leaf} fetch={fetch}: FAILED {e}", flush=True)


if __name__ == "__main__":
    main()
