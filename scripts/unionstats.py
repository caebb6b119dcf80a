"""Union over-visiting diagnostic (round 5, VERDICT item 2).

The packet kernel's remaining waste is the UNION effect: a 1024-ray tile
visits the union of its rays' leaf sets (docs/PERF.md r4).  Before
building any re-binning/entry-cut formulation, measure its CEILING:

  ideal   = sum over live rays of the number of leaves whose AABB the
            ray segment [t_min, t_hit] intersects (perfect per-ray
            traversal with perfect pruning — no formulation can test
            fewer leaves without missing hits)
  packet  = leaf visits the production kernel actually performs
            (kbench stats on the same tree/wave)

  packet / ideal = the union factor = the max speedup any visit-set
  reduction (re-binning, entry cuts, finer tiles) could buy on the
  Möller–Trumbore floor.

Method: enumerate every leaf's object-space AABB per mesh (host side,
from the padded supernode records), transform the wave's rays into each
instance's object space, and count slab hits in [0, t_final] — chunked
over leaves on the TPU.  Also prints the distribution (mean/p50/p95) of
per-ray leaf counts and anchors (nearest leaf entry-t), for the sort-key
experiments.

Usage: python scripts/unionstats.py [leaf_size]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import kbench  # noqa: E402


def leaf_boxes_per_mesh(geom, mesh_ids, leaf_size):
    """Host-build the same padded records as build_scene_wide and return
    {mesh: (lo (Nl,3), hi (Nl,3))} leaf AABBs."""
    from raytracedggx_tpu.bvh.sah import build_sah
    from raytracedggx_tpu.ops.fused import build_records4_padded

    out = {}
    for m in sorted(set(mesh_ids)):
        g = geom.meshes[m]
        bvh = build_sah(np.asarray(g.positions), np.asarray(g.tri),
                        chain_cutoff=leaf_size)
        recs, _stream = build_records4_padded(bvh, leaf_size)
        lo, hi = [], []
        for rec in recs:
            for c in rec:
                if c["kind"] == 1:
                    lo.append(c["lo"])
                    hi.append(c["hi"])
        out[m] = (np.asarray(lo, np.float32), np.asarray(hi, np.float32))
    return out


def count_leaf_hits(o, d, tmax, lo, hi, chunk=128):
    """Per-ray count + nearest-entry argmin over one instance's leaves
    (object space).  Returns (count (R,), best_t (R,), best_leaf (R,))."""
    R = o.shape[0]
    nl = lo.shape[0]

    def one_chunk(carry, idx):
        cnt, bt, bl = carry
        lo_c = jax.lax.dynamic_slice(lo_p, (idx, 0), (chunk, 3))
        hi_c = jax.lax.dynamic_slice(hi_p, (idx, 0), (chunk, 3))
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
        t0 = (lo_c[None] - o[:, None]) * inv[:, None]   # (R, C, 3)
        t1 = (hi_c[None] - o[:, None]) * inv[:, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        valid = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) \
            + idx < nl
        ok = (tn <= tf) & (tf >= 0.0) & (tn <= tmax[:, None]) & valid
        cnt = cnt + jnp.sum(ok, axis=1)
        tn_ok = jnp.where(ok, tn, jnp.inf)
        j = jnp.argmin(tn_ok, axis=1)
        tn_best = jnp.take_along_axis(tn_ok, j[:, None], 1)[:, 0]
        upd = tn_best < bt
        bt = jnp.where(upd, tn_best, bt)
        bl = jnp.where(upd, idx + j, bl)
        return (cnt, bt, bl), None

    npad = -(-nl // chunk) * chunk
    lo_p = jnp.asarray(np.pad(lo, ((0, npad - nl), (0, 0))))
    hi_p = jnp.asarray(np.pad(hi, ((0, npad - nl), (0, 0))))
    init = (jnp.zeros((R,), jnp.int32), jnp.full((R,), jnp.inf),
            jnp.full((R,), -1, jnp.int32))
    (cnt, bt, bl), _ = jax.lax.scan(
        jax.jit(one_chunk), init, jnp.arange(0, npad, chunk))
    return cnt, bt, bl


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    scene, geom, sw, worlds, o_p, d_p = kbench.build()
    o_r, d_r, tm_r = kbench.reflection_rays(sw, o_p, d_p)
    # the morton sort compacts dead rays last — the live wave is a
    # prefix; slice it (keeps the (R, chunk, 3) slab-test tensors small)
    n_live = int(np.asarray(tm_r > 0).sum())
    Rl = min(-(-n_live // 8192) * 8192, o_r.shape[0])
    o_r, d_r, tm_r = o_r[:Rl], d_r[:Rl], tm_r[:Rl]
    live = np.asarray(tm_r > 0)
    print(f"reflection wave: {live.sum()} live rays "
          f"(prefix {Rl}); leaf_size {L}")

    # final hit t from the production kernel (for [0, t_hit] pruning)
    from raytracedggx_tpu.ops.fused import trace_tiles_instanced
    from raytracedggx_tpu.ops.scene_wide import build_scene_wide
    swL = build_scene_wide(geom, scene.mesh_ids, leaf_size=L, lean=True,
                           worlds=worlds)
    t, u, v, sidx, inst = trace_tiles_instanced(
        swL.nodes, swL.tris, swL.inv_mats, o_r, d_r, 0.0, tm_r,
        leaf_size=L, stack=int(swL.stack), lean=True)
    hit = np.asarray(sidx) >= 0
    t_fin = np.where(hit, np.asarray(t), 1e30)       # miss: full segment
    print(f"wave hits: {hit[live].sum()} of {live.sum()}")

    boxes = leaf_boxes_per_mesh(geom, scene.mesh_ids, L)
    worlds_np = np.asarray(worlds)

    total = np.zeros(o_r.shape[0], np.int64)
    best_t = np.full(o_r.shape[0], np.inf, np.float32)
    best_leaf = np.full(o_r.shape[0], -1, np.int64)
    leaf_base = 0
    for i, m in enumerate(scene.mesh_ids):
        lo, hi = boxes[m]
        w = worlds_np[i]
        a3 = np.linalg.inv(w[:3, :3])
        tr = -w[3, :3] @ a3
        o_obj = jnp.asarray(np.asarray(o_r) @ a3 + tr)
        d_obj = jnp.asarray(np.asarray(d_r) @ a3)
        cnt, bt, bl = count_leaf_hits(o_obj, d_obj, jnp.asarray(t_fin),
                                      jnp.asarray(lo), jnp.asarray(hi))
        cnt = np.asarray(cnt)
        bt_np, bl_np = np.asarray(bt), np.asarray(bl)
        total += cnt
        upd = bt_np < best_t
        best_t = np.where(upd, bt_np, best_t)
        best_leaf = np.where(upd, leaf_base + bl_np, best_leaf)
        leaf_base += lo.shape[0]
        print(f"instance {i} (mesh {m}, {lo.shape[0]} leaves): "
              f"live-ray mean leaf hits {cnt[live].mean():.2f}")

    tl = total[live]
    ideal = int(tl.sum())
    print(f"\nIDEAL leaf visits (perfect per-ray, pruned to t_hit): "
          f"{ideal}")
    print(f"per live ray: mean {tl.mean():.2f}  p50 {np.percentile(tl, 50):.0f}"
          f"  p95 {np.percentile(tl, 95):.0f}  max {tl.max()}")
    print(f"ideal MT tests/ray at L{L}: {tl.mean() * L:.0f}")
    print("\nCompare with kbench stats_l64 refl 'leaf/tile * tiles' for "
          "the packet number; packet/ideal = union factor = re-binning "
          "ceiling.")
    # anchor distribution: how many rays share each nearest-leaf anchor
    # (a proxy for how coherent an anchor-sorted wave could be)
    anchors = best_leaf[live]
    uniq, cnts = np.unique(anchors[anchors >= 0], return_counts=True)
    print(f"\nanchors: {len(uniq)} distinct nearest leaves; "
          f"rays per anchor p50 {np.percentile(cnts, 50):.0f} "
          f"p95 {np.percentile(cnts, 95):.0f} max {cnts.max()}")


if __name__ == "__main__":
    main()
