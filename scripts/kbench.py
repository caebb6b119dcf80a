"""Traversal-kernel micro-bench (round 3): price each ops/lab/fused_lab
variant on the real TPU with chained-loop timing (the only reliable
methodology on the tunneled backend — docs/PERF.md).

Workload: bunny @720p.  Two ray sets:
  primary    — camera rays in screen-block order (coherent)
  reflection — GGX bounce rays from the real primary surface, morton+
               octant sorted with dead rays compacted to the tail
               (matches what ray_trace_pass feeds the kernel)

Usage: python scripts/kbench.py [frames-per-variant] [variant...]
Variants: stats base smem npop1 npop4 unordered tile16 tile32 alldead
(default: all).
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_res = os.environ.get("KB_RES", "1280x720")   # r5: 1080p re-sweep knob
W, H = (int(v) for v in _res.split("x"))
T_MAX = 10000.0


def build():
    from raytracedggx_tpu.scene import Scene
    from raytracedggx_tpu.scene.camera import Camera
    from raytracedggx_tpu.trace.geometry import upload_scene
    from raytracedggx_tpu.ops.scene_wide import build_scene_wide
    from raytracedggx_tpu.ops.traverse_pallas import block_order
    from raytracedggx_tpu.utils import math3d as m3

    scene = Scene.create("/root/reference/Bin/Assets/bunny.obj")
    geom = upload_scene(scene, leaf_size=8)
    # lab kernels price the fat (19L) layout and strip it themselves.
    # worlds(0) matters: identity transforms leave the ground a unit cube
    # instead of the 8x plate, which halved the hit count and cut the
    # live reflection wave to ~65k vs the production frame's ~177k —
    # every r3 kbench verdict was priced on that lighter wave (r4 fix)
    worlds = scene.worlds(0.0)
    sw = build_scene_wide(geom, scene.mesh_ids, leaf_size=8, lean=False,
                          worlds=worlds)

    cam = Camera(width=W, height=H)
    view_proj = jnp.asarray(cam.view_proj())
    proj_to_world = m3.inverse(view_proj)
    eye = jnp.asarray(cam.eye, jnp.float32)

    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W * 2.0 - 1.0
    ys = -((jnp.arange(H, dtype=jnp.float32) + 0.5) / H * 2.0 - 1.0)
    sx, sy = jnp.meshgrid(xs, ys, indexing="xy")
    ndc = jnp.stack([sx.reshape(-1), sy.reshape(-1)], axis=-1)
    ndc_h = jnp.concatenate(
        [ndc, jnp.zeros_like(ndc[..., :1]), jnp.ones_like(ndc[..., :1])],
        axis=-1)
    world = ndc_h @ proj_to_world
    p_near = world[..., :3] / world[..., 3:4]
    d = p_near - eye
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    order, _inv = block_order(W, H)
    o_p = p_near[jnp.asarray(order)]
    d_p = d[jnp.asarray(order)]
    return scene, geom, sw, worlds, o_p, d_p


def reflection_rays(sw, o_p, d_p):
    """Trace the primary set once, then build morton-sorted GGX bounce
    rays from the hits (mirrors ray_trace_pass's reflection wave)."""
    from raytracedggx_tpu.ops.fused import trace_tiles_instanced
    from raytracedggx_tpu.ops.traverse_pallas import sort_rays_morton
    from raytracedggx_tpu.trace.sampling import sample_param, ggx_dir
    from raytracedggx_tpu.utils.math3d import reflect

    t, u, v, nrm, prim, inst = trace_tiles_instanced(
        sw.nodes, sw.tris, sw.inv_mats, o_p, d_p, 0.0, T_MAX,
        leaf_size=8, stack=int(sw.stack), lean=False)
    hit = prim >= 0
    n = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True),
                          1e-20)
    p = o_p + t[..., None] * d_p
    px = jnp.tile(jnp.arange(W, dtype=jnp.int32), H)
    py = jnp.repeat(jnp.arange(H, dtype=jnp.int32), W)
    xi = sample_param(px, py, W, jnp.uint32(0))
    # default a = 0.25 (rough 0.5) — the headline scene's real material
    # (RayTracer.cpp:134-139 silver rough 0.5), so the wave's live count
    # and divergence match the production bucket trace.  Round-3 runs
    # used a=0.16 (68k live); production is ~177k live — override via
    # KB_ROUGH_A for comparisons against r3 tables.
    a = jnp.float32(float(os.environ.get("KB_ROUGH_A", "0.25")))
    h_vec = ggx_dir(jnp.full(p.shape[:1], a), n, xi)
    r_dir = reflect(d_p, h_vec)
    tmax = jnp.where(hit & (jnp.sum(n * r_dir, axis=-1) > 0), T_MAX, -1.0)

    boxes0 = sw.nodes[0, :24, 0].reshape(4, 6)   # root supernode children
    lo = jnp.min(boxes0[:, 0:3], axis=0)
    hi = jnp.max(boxes0[:, 3:6], axis=0)
    order, _inv = sort_rays_morton(p, r_dir, lo, hi, active=tmax > 0)
    return p[order], r_dir[order], tmax[order]


def time_chain(launch, o, d, tmax, frames):
    @jax.jit
    def chain(o, d, tmax):
        def body(i, acc):
            t = launch(o, d, tmax + acc)
            return jnp.sum(t) * 1e-30

        return jax.lax.fori_loop(0, frames, body, jnp.float32(0.0))

    np.asarray(chain(o, d, tmax))      # compile + warm
    t0 = time.time()
    np.asarray(chain(o, d, tmax))
    return (time.time() - t0) / frames * 1e3


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = set(sys.argv[2:])
    from raytracedggx_tpu.ops.lab.fused_lab import (trace_tiles_lab,
                                                nodes_flat_for_smem)

    from raytracedggx_tpu.ops.lab.fused_lab import lean_tris
    from raytracedggx_tpu.ops.scene_wide import build_scene_wide

    scene, geom, sw, worlds, o_p, d_p = build()
    o_r, d_r, tm_r = reflection_rays(sw, o_p, d_p)
    live = int(np.asarray(tm_r > 0).sum())
    print(f"rays: primary {o_p.shape[0]}, reflection live {live}",
          flush=True)
    nodes_flat = nodes_flat_for_smem(sw)
    sw16 = None
    sw16_lbvh = None

    _parity_cache = {}

    def parity_ref(s):
        """Production-kernel t on the reflection rays for the SAME tree
        (cached) — the parity oracle for every lab variant."""
        key = id(s)
        if key not in _parity_cache:
            from raytracedggx_tpu.ops.fused import trace_tiles_instanced
            t, *_ = trace_tiles_instanced(
                s.nodes, s.tris, s.inv_mats, o_r, d_r, 0.0, tm_r,
                leaf_size=int(s.leaf_size), stack=int(s.stack),
                lean=False)
            _parity_cache[key] = np.asarray(t)
        return _parity_cache[key]

    def variant(name, **kw):
        nonlocal sw16, sw16_lbvh
        if only and name not in only:
            return
        s = sw
        L = 8
        if kw.pop("l16", False):
            if sw16 is None:
                sw16 = build_scene_wide(geom, scene.mesh_ids,
                                        leaf_size=16, lean=False,
                                        worlds=worlds)
            s = sw16
            L = 16
        if kw.pop("l32", False):
            if not hasattr(main, "sw32"):
                main.sw32 = build_scene_wide(geom, scene.mesh_ids,
                                             leaf_size=32, lean=False,
                                             worlds=worlds)
            s = main.sw32
            L = 32
        if kw.pop("l64", False):
            if not hasattr(main, "sw64"):
                main.sw64 = build_scene_wide(geom, scene.mesh_ids,
                                             leaf_size=64, lean=False,
                                             worlds=worlds)
            s = main.sw64
            L = 64
        if kw.pop("l128", False):
            if not hasattr(main, "sw128"):
                main.sw128 = build_scene_wide(geom, scene.mesh_ids,
                                              leaf_size=128, lean=False,
                                              worlds=worlds)
            s = main.sw128
            L = 128
        if kw.pop("lbvh16", False):
            if sw16_lbvh is None:
                sw16_lbvh = build_scene_wide(geom, scene.mesh_ids,
                                             leaf_size=16, lean=False,
                                             builder="lbvh", worlds=worlds)
            s = sw16_lbvh
            L = 16
        smem = kw.pop("smem_nodes", False)
        nodes = nodes_flat_for_smem(s) if smem else s.nodes
        if kw.get("sub"):
            from raytracedggx_tpu.ops.lab.fused_lab import sub_tris
            tris = sub_tris(s, kw["sub"])
        else:
            tris = lean_tris(s) if kw.get("lean") else s.tris
        tile_s = kw.pop("tile_s", 8)
        stk = int(s.stack) * (3 if kw.get("leaf_stack") else 1)

        if kw.pop("stats", False):
            try:
                out = trace_tiles_lab(
                    nodes, tris, s.inv_mats, o_p, d_p, 0.0, T_MAX,
                    leaf_size=L, stack=stk, tile_s=tile_s,
                    stats=True, smem_nodes=smem, **kw)
                st = np.asarray(out[6])[:, :2, 0]
                out_r = trace_tiles_lab(
                    nodes, tris, s.inv_mats, o_r, d_r, 0.0, tm_r,
                    leaf_size=L, stack=stk, tile_s=tile_s,
                    stats=True, smem_nodes=smem, **kw)
                st_r = np.asarray(out_r[6])[:, :2, 0]
            except Exception as e:  # noqa: BLE001
                print(f"{name:12s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
                return
            print(f"{name:12s} prim iters/tile mean {st[:, 0].mean():7.1f}"
                  f" max {st[:, 0].max()} leaf/tile {st[:, 1].mean():7.1f}"
                  f" total iters {st[:, 0].sum()}", flush=True)
            print(f"{name:12s} refl iters/tile mean "
                  f"{st_r[:, 0].mean():7.1f} max {st_r[:, 0].max()} "
                  f"leaf/tile {st_r[:, 1].mean():7.1f} total "
                  f"{st_r[:, 0].sum()}", flush=True)
            return

        def launch(o, d, tmax):
            t, *_ = trace_tiles_lab(
                nodes, tris, s.inv_mats, o, d, 0.0, tmax,
                leaf_size=L, stack=stk, tile_s=tile_s,
                smem_nodes=smem, **kw)
            return t

        try:
            ms_p = time_chain(launch, o_p, d_p,
                              jnp.full(o_p.shape[:1], T_MAX), frames)
            ms_r = time_chain(launch, o_r, d_r, tm_r, frames)
            par = ""
            if os.environ.get("KB_PARITY", "1") != "0":
                # one-frame parity gate vs the production kernel on the
                # SAME tree: a silent numeric bug in a new variant must
                # not produce meaningless-but-plausible timings
                t_v = np.asarray(launch(o_r, d_r, tm_r))
                err = np.abs(t_v - parity_ref(s))
                rel = err / np.maximum(np.abs(parity_ref(s)), 1e-3)
                par = f"   parity {np.minimum(err, rel).max():.2e}"
                if np.minimum(err, rel).max() > 1e-3:
                    par += " MISMATCH"
            print(f"{name:12s} primary {ms_p:7.2f} ms   "
                  f"reflection {ms_r:7.2f} ms{par}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and move on
            print(f"{name:12s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    variant("stats", stats=True)
    variant("base")
    variant("smem", smem_nodes=True)
    variant("npop1", npop=1)
    variant("npop4", npop=4)
    variant("unordered", ordered=False)
    variant("tile16", tile_s=16)
    variant("tile32", tile_s=32)
    variant("smem_tile16", smem_nodes=True, tile_s=16)
    variant("lean", lean=True)
    variant("l16", l16=True)
    variant("lean_l16", lean=True, l16=True)
    variant("lbvh_lean16", lean=True, lbvh16=True)
    variant("stats_lbvh16", stats=True, lbvh16=True)
    variant("smem_l16", smem_nodes=True, l16=True)
    variant("lean_smem_l16", lean=True, smem_nodes=True, l16=True)
    variant("stats_l16", stats=True, l16=True)
    # tile-size re-sweep under the SAH tree (the fixed-cost/union balance
    # shifts with tree quality; round-3 LBVH sweep said 8 was optimal)
    variant("lean_l16_t2", lean=True, l16=True, tile_s=2)
    variant("lean_l16_t4", lean=True, l16=True, tile_s=4)
    variant("lean_l16_t16", lean=True, l16=True, tile_s=16)
    variant("lean_l8", lean=True)            # SAH tree, leaf_size 8
    variant("lean_l32", lean=True, l32=True)
    variant("lean_l64", lean=True, l64=True)
    variant("lean_l128", lean=True, l128=True)
    variant("stats_l64", stats=True, l64=True)
    variant("lean_l32_t16", lean=True, l32=True, tile_s=16)
    variant("stats_l32", stats=True, l32=True)
    variant("slim_l16", lean=True, l16=True, slim=True)
    variant("recip_l16", lean=True, l16=True, recip=True)
    variant("recip_l64", lean=True, l64=True, recip=True)
    variant("slim_l64", lean=True, l64=True, slim=True)
    variant("recip_slim_l64", lean=True, l64=True, recip=True, slim=True)
    variant("recip_slim_l64_t16", lean=True, l64=True, recip=True,
            slim=True, tile_s=16)
    variant("fold_l16", lean=True, l16=True, fold=True)
    variant("recip_fold_l16", lean=True, l16=True, recip=True, fold=True)
    # round-3b: precomputed per-tag ray state (pre) + octant folding on
    # the production L64 SAH tree; recip everywhere (it's in production)
    variant("recip_l64_t4", lean=True, l64=True, recip=True, tile_s=4)
    variant("recip_l64_t2", lean=True, l64=True, recip=True, tile_s=2)
    variant("recip_l64_t16", lean=True, l64=True, recip=True, tile_s=16)
    variant("pre_l64", lean=True, l64=True, recip=True, pre=True)
    variant("fold_l64", lean=True, l64=True, recip=True, fold=True)
    variant("prefold_l64", lean=True, l64=True, recip=True, pre=True,
            fold=True)
    # tile re-sweep under the lower per-iteration fixed cost (the
    # fixed-cost/union balance shifts again)
    variant("prefold_l64_t4", lean=True, l64=True, recip=True, pre=True,
            fold=True, tile_s=4)
    variant("prefold_l64_t16", lean=True, l64=True, recip=True, pre=True,
            fold=True, tile_s=16)
    variant("prefold_l32", lean=True, l32=True, recip=True, pre=True,
            fold=True)
    # round-4: hierarchical leaves — sub-AABB-gated chunks inside L64
    # leaves (L16-granularity Möller–Trumbore at L64 pop count)
    variant("sub4_l64", lean=True, l64=True, recip=True, sub=4)
    variant("sub8_l64", lean=True, l64=True, recip=True, sub=8)
    variant("sub4_fold_l64", lean=True, l64=True, recip=True, sub=4,
            fold=True)
    variant("sub4_l64_t16", lean=True, l64=True, recip=True, sub=4,
            tile_s=16)
    variant("sub4_l32", lean=True, l32=True, recip=True, sub=4)
    variant("sub8_l128", lean=True, l128=True, recip=True, sub=8)
    # round-5: deferred-attribute endpoint — strip the winner-tracking
    # selects to (t, slot): slim drops u/v, noinst drops the instance
    variant("slim_l64r", lean=True, l64=True, recip=True, slim=True)
    variant("noinst_l64", lean=True, l64=True, recip=True, noinst=True)
    variant("defer_l64", lean=True, l64=True, recip=True, slim=True,
            noinst=True)
    variant("defer_l32", lean=True, l32=True, recip=True, slim=True,
            noinst=True)
    variant("ls", leaf_stack=True)
    variant("ls_lean", leaf_stack=True, lean=True)
    variant("ls_lean_l16", leaf_stack=True, lean=True, l16=True)
    variant("ls_lean_smem16", leaf_stack=True, lean=True, l16=True,
            smem_nodes=True)

    def mxu_variant(name, leaf, tile_s=8):
        if only and name not in only:
            return
        from raytracedggx_tpu.ops.lab.fused_mxu import (mxu_stream,
                                                    trace_tiles_mxu)
        s = build_scene_wide(geom, scene.mesh_ids, leaf_size=leaf,
                             lean=True, worlds=worlds)
        C = mxu_stream(s)
        print(f"{name}: stream {C.nbytes / 2**20:.1f} MiB, "
              f"{s.nodes.shape[0] * 128} node slots", flush=True)

        def launch(o, d, tmax):
            t, *_ = trace_tiles_mxu(s.nodes, C, s.inv_mats, o, d, 0.0,
                                    tmax, leaf_size=leaf,
                                    stack=int(s.stack), tile_s=tile_s)
            return t

        try:
            ms_p = time_chain(launch, o_p, d_p,
                              jnp.full(o_p.shape[:1], T_MAX), frames)
            ms_r = time_chain(launch, o_r, d_r, tm_r, frames)
            print(f"{name:12s} primary {ms_p:7.2f} ms   "
                  f"reflection {ms_r:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    mxu_variant("mxu32", 32)
    mxu_variant("mxu16", 16)
    mxu_variant("mxu32_t16", 32, tile_s=16)
    variant("lean_l16_t2", lean=True, l16=True, tile_s=2)
    variant("lean_l16_t4", lean=True, l16=True, tile_s=4)
    variant("lean_l16_t16", lean=True, l16=True, tile_s=16)
    variant("lean_l16_t32", lean=True, l16=True, tile_s=32)
    if not only or "alldead" in only:
        dead = jnp.full(o_p.shape[:1], -1.0)

        def launch0(o, d, tmax):
            from raytracedggx_tpu.ops.lab.fused_lab import trace_tiles_lab
            t, *_ = trace_tiles_lab(sw.nodes, sw.tris, sw.inv_mats, o, d,
                                    0.0, tmax, leaf_size=8,
                                    stack=int(sw.stack))
            return t

        ms = time_chain(launch0, o_p, d_p, dead, frames)
        print(f"{'alldead':12s} launch+prep floor {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
