"""Anchor-augmented sort key A/B (round 5, VERDICT item 2c "frontier
re-binning" priced the cheap way).

Hypothesis: the packet kernel pays the UNION of its tile's rays' leaf
sets; the current bounce sort key (dead | octant | morton-of-origin)
groups rays by where they START, not by where they GO.  Augmenting the
key with an ANCHOR — the id of the first subtree (from a K-node BVH cut)
the ray enters — should group rays that descend the same subtrees into
the same tiles, tightening unions with ZERO kernel changes, no wave
expansion, and no merge pass.

This prices it directly: same production kernel, same wave, three
orders —
  base    dead | octant3 | morton            (production)
  anchor  dead | anchor | octant3 | morton
  anchor_only  dead | anchor | morton
and reports kernel ms + leaf-visit stats (via the lab stats kernel) for
each.

Usage: python scripts/anchorbench.py [frames] [K_cut]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import kbench  # noqa: E402


def bvh_cut(sw, worlds, k_per_mesh=32):
    """BFS each mesh subtree from its root to a ~k_per_mesh-node cut.
    Returns per-instance (boxes (K, 6) OBJECT space, inv 3x4) lists
    flattened to global anchor ids."""
    cols = np.asarray(sw.static_cols)      # (Npad, 12) kind[4] a[4] b[4]
    boxes = np.concatenate(
        [np.zeros((sw.n_top, 24), np.float32), np.asarray(sw.mesh_boxes)])

    def cut_of(root):
        frontier = [root]
        cut_boxes = []
        while frontier and len(frontier) + len(cut_boxes) < k_per_mesh:
            n = frontier.pop(0)
            kids = []
            for k in range(4):
                kind = int(cols[n, k])
                if kind == 2:
                    kids.append(int(cols[n, 4 + k]))
                elif kind == 1:
                    cut_boxes.append(boxes[n, k * 6:k * 6 + 6])
            if not kids:
                # all children leaves — the node is fully expanded
                continue
            frontier.extend(kids)
        for n in frontier:
            live = cols[n, 0:4] > 0
            b = boxes[n].reshape(4, 6)[live]
            lo = b[:, 0:3].min(axis=0)
            hi = b[:, 3:6].max(axis=0)
            cut_boxes.append(np.concatenate([lo, hi]))
        return np.asarray(cut_boxes, np.float32)

    # instance entry nodes live in the top records (kind=3: a = mesh root)
    roots = {}
    for r in range(sw.n_top):
        for k in range(4):
            if int(cols[r, k]) == 3:
                inst = int(cols[r, 8 + k]) - 1
                roots[inst] = int(cols[r, 4 + k])
    inv = np.asarray(sw.inv_mats)          # (1+I, 12)
    per_inst = []
    for i in sorted(roots):
        per_inst.append((cut_of(roots[i]), inv[i + 1]))
    return per_inst


def anchor_ids(per_inst, o, d, tmax):
    """Nearest-entry cut-node id per ray (global over instances)."""
    best_t = jnp.full(o.shape[:1], jnp.inf)
    best_id = jnp.zeros(o.shape[:1], jnp.uint32)
    base = 0
    for cut, m in per_inst:
        oo = o @ jnp.asarray(m[:9].reshape(3, 3)) + jnp.asarray(m[9:])
        dd = d @ jnp.asarray(m[:9].reshape(3, 3))
        inv = 1.0 / jnp.where(jnp.abs(dd) < 1e-20, 1e-20, dd)
        t0 = (jnp.asarray(cut[:, 0:3])[None] - oo[:, None]) * inv[:, None]
        t1 = (jnp.asarray(cut[:, 3:6])[None] - oo[:, None]) * inv[:, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        ok = (tn <= tf) & (tf >= 0.0)
        tn = jnp.where(ok, jnp.maximum(tn, 0.0), jnp.inf)
        j = jnp.argmin(tn, axis=1)
        tn_b = jnp.take_along_axis(tn, j[:, None], 1)[:, 0]
        upd = tn_b < best_t
        best_t = jnp.where(upd, tn_b, best_t)
        best_id = jnp.where(upd, (base + j).astype(jnp.uint32), best_id)
        base += cut.shape[0]
    return best_id, base


def make_order(key):
    return jnp.argsort(key)


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    k_cut = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    scene, geom, sw, worlds, o_p, d_p = kbench.build()
    # UNSORTED wave: rebuild the reflection rays in screen order, then
    # apply each candidate order here
    from raytracedggx_tpu.ops.scene_wide import build_scene_wide
    sw64 = build_scene_wide(geom, scene.mesh_ids, leaf_size=64, lean=True,
                            worlds=worlds)
    o_r, d_r, tm_r = kbench.reflection_rays(sw, o_p, d_p)  # morton-sorted
    live = int(np.asarray(tm_r > 0).sum())
    print(f"live reflection rays: {live}; cut {k_cut}/mesh")

    from raytracedggx_tpu.bvh.morton import morton3d
    boxes0 = sw64.nodes[0, :24, 0].reshape(4, 6)
    lo = jnp.min(boxes0[:, 0:3], axis=0)
    hi = jnp.max(boxes0[:, 3:6], axis=0)
    code = morton3d(o_r, lo, hi)
    octant = ((d_r[:, 0] >= 0).astype(jnp.uint32)
              | ((d_r[:, 1] >= 0).astype(jnp.uint32) << 1)
              | ((d_r[:, 2] >= 0).astype(jnp.uint32) << 2))
    dead = (tm_r <= 0).astype(jnp.uint32) << 31

    per_inst = bvh_cut(sw64, worlds, k_per_mesh=k_cut)
    aid, n_anchor = anchor_ids(per_inst, o_r, d_r, tm_r)
    ab = max(1, int(np.ceil(np.log2(max(n_anchor, 2)))))
    print(f"anchors: {n_anchor} ({ab} bits)")

    # field layout (morton3d emits 30 bits): bit31 dead | anchor ab |
    # octant 3 | morton fills the rest — shifts keep fields disjoint
    keys = {
        "base": dead | (octant << 28) | (code >> 2),          # production
        "anchor": dead | (aid << jnp.uint32(31 - ab))
        | (octant << jnp.uint32(28 - ab))
        | (code >> jnp.uint32(2 + ab)),
        "anchor_only": dead | (aid << jnp.uint32(31 - ab))
        | (code >> jnp.uint32(max(ab - 1, 0))),
    }

    from raytracedggx_tpu.ops.fused import trace_tiles_instanced
    from raytracedggx_tpu.ops.lab.fused_lab import trace_tiles_lab

    ref_t = None
    for name, key in keys.items():
        order = make_order(key)
        o_s, d_s, tm_s = o_r[order], d_r[order], tm_r[order]

        def launch(o, d, tmax):
            t, *_ = trace_tiles_instanced(
                sw64.nodes, sw64.tris, sw64.inv_mats, o, d, 0.0, tmax,
                leaf_size=64, stack=int(sw64.stack), lean=True)
            return t

        ms = kbench.time_chain(launch, o_s, d_s, tm_s, frames)
        # stats via the lab kernel on the FAT L64 tree (same topology)
        if not hasattr(main, "sw64f"):
            main.sw64f = build_scene_wide(geom, scene.mesh_ids,
                                          leaf_size=64, lean=False,
                                          worlds=worlds)
        swf = main.sw64f
        from raytracedggx_tpu.ops.lab.fused_lab import lean_tris
        out = trace_tiles_lab(swf.nodes, lean_tris(swf), swf.inv_mats,
                              o_s, d_s, 0.0, tm_s, leaf_size=64,
                              stack=int(swf.stack), stats=True, lean=True)
        st = np.asarray(out[6])[:, :2, 0]
        # parity: same hit set regardless of order
        t_v = np.asarray(launch(o_s, d_s, tm_s))
        inv_o = np.argsort(np.asarray(order))
        t_row = t_v[inv_o]
        if ref_t is None:
            ref_t = t_row
            par = "ref"
        else:
            err = np.abs(t_row - ref_t).max()
            par = f"parity {err:.2e}" + (" MISMATCH" if err > 1e-3 else "")
        print(f"{name:12s} {ms:7.2f} ms   pops/tile {st[:, 0].mean():6.1f}"
              f"  leaf visits total {int(st[:, 1].sum())}   {par}",
              flush=True)


if __name__ == "__main__":
    main()
