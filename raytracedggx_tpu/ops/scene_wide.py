"""Unified scene BVH: single-launch multi-instance traversal with SHARED
object-space mesh subtrees (the TopLevelAS semantics of the reference,
XUSGRayTracing.h:195-237, re-designed TPU-first).

Round-2 final design ("instanced"): a small top-level supernode tree over
INSTANCE world boxes enters shared per-MESH object-space subtrees through
tagged instance nodes; the kernel transforms the ray tile by the tag's
inverse world on every stack pop (ops/fused.py:_instanced_kernel).
Because object directions are not renormalized, the ray parameter t stays
world-metric and closest-hit comparisons hold across instances.

Wins over the earlier world-space refit layout:
- VMEM holds each mesh ONCE regardless of instance count (a 4K scene
  with 8 bunny instances fits comfortably; the old layout replicated
  leaf streams per instance and fell back to per-instance launches);
- per-frame refit touches only instance world boxes + the inverse-world
  table — the triangle/normal streams are STATIC (the old refit rewrote
  every stream every frame);
- leaf columns carry OBJECT-space normals; shading transforms them by
  the instance normal matrix (trace/raygen.py fused paths).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..trace.traverse import HitRecord
from .fused import build_records4_padded, trace_tiles_instanced

TAG_SHIFT = 20                      # stack entry = node | (tag << 20)
MAX_NODES = 1 << TAG_SHIFT


class SceneWideBVH(NamedTuple):
    # device arrays
    nodes: jnp.ndarray        # (Nt, 36, 128) f32 (refit fills top boxes)
    tris: jnp.ndarray         # (Lt, 9L, 128) f32 STATIC object leaves
    #                           (19L rows when built with lean=False)
    inv_mats: jnp.ndarray     # (1 + I, 12) f32 inverse worlds (refit)
    attrs: jnp.ndarray        # (S, 10) f32 per-stream-slot side table:
    #                           n0.xyz n1.xyz n2.xyz prim  (lean path;
    #                           None when lean=False)
    # static build products
    static_cols: jnp.ndarray  # (Npad, 12) f32: kind[4], a[4], b[4]
    mesh_boxes: jnp.ndarray   # (N - n_top, 24) f32 object-space boxes
    root_corners: jnp.ndarray  # (I, 8, 3) mesh-root object box corners
    # python metadata
    top_children: tuple       # per top node: 4x (kind, a, b) or None pads
    n_top: int
    num_nodes: int
    leaf_size: int
    stack: int
    # frontier re-binning support (round 5): a ~K-node object-space BVH
    # cut per instance; the bounce sort key is augmented with each ray's
    # nearest-entry cut id so rays that descend the same subtrees land in
    # the same kernel tiles (measured -19% on the reflection kernel,
    # scripts/anchorbench.py — the packet kernel pays the UNION of its
    # tile's leaf sets, and origin-morton alone groups rays by where
    # they START, not where they GO)
    anchor_boxes: jnp.ndarray = None  # (I, K, 6) f32 object-space cut
    anchor_base: tuple = ()           # per-instance first anchor id + total


def _instance_tree(num_inst: int):
    """4-ary grouping of instance indices into top-level records.
    Returns a list of records; records[i] = list of child descriptors
    ('inst', i) | ('node', j).  Children nodes have larger indices than
    their parents (preorder)."""
    if num_inst <= 4:
        return [[("inst", i) for i in range(num_inst)]]

    level = [("inst", i) for i in range(num_inst)]
    while len(level) > 4:
        level = [("group", level[i:i + 4])
                 for i in range(0, len(level), 4)]

    records = []

    def emit(children):
        idx = len(records)
        records.append(None)
        childs = []
        for c in children:
            if c[0] == "inst":
                childs.append(("inst", c[1]))
            else:
                childs.append(("node", c[1]))   # resolved below
        records[idx] = childs
        for k, c in enumerate(childs):
            if c[0] == "node":
                records[idx][k] = ("node", emit(c[1]))
        return idx

    emit(level)
    return records


def _mesh_cut(recs, k_cut: int):
    """BFS a mesh subtree's records from its root into a ~k_cut-node
    frontier of object-space AABBs (the anchor cut).  recs[r] = 4 child
    dicts with kind (0 pad / 1 leaf / 2 internal), a, lo, hi."""
    frontier = [0]
    boxes = []
    while frontier and len(frontier) + len(boxes) < k_cut:
        n = frontier.pop(0)
        kids = []
        for c in recs[n]:
            if c["kind"] == 2:
                kids.append(c["a"])
            elif c["kind"] == 1:
                boxes.append(np.concatenate([c["lo"], c["hi"]]))
        frontier.extend(kids)
    for n in frontier:
        live = [c for c in recs[n] if c["kind"] > 0]
        lo = np.min([c["lo"] for c in live], axis=0)
        hi = np.max([c["hi"] for c in live], axis=0)
        boxes.append(np.concatenate([lo, hi]))
    return np.asarray(boxes, np.float32)


def build_scene_wide(geom, mesh_ids, leaf_size: int = 16,
                     worlds=None, lean: bool = True,
                     builder: str = "sah",
                     anchor_cut: int = 32) -> SceneWideBVH:
    """geom: SceneGeometry (per-mesh LBVH built); mesh_ids: instance ->
    mesh index.  All topology + object-space geometry is host-built once;
    refit_scene_wide(sw, worlds) fills instance world boxes + inverse
    matrices each frame.

    lean=True (production): 9L-row leaf columns (geometry only) plus a
    static (S, 10) attrs side table (vertex normals + prim per stream
    slot) resolved post-kernel with one gather; lean=False keeps the
    round-2 19L fat layout with in-kernel attribute interpolation.
    Defaults (L=16, lean) are the measured TPU winner — see
    ops/fused.py module docs / scripts/kbench.py."""
    L = leaf_size
    num_inst = len(mesh_ids)
    assert num_inst < (1 << 11), "instance tag field is 11 bits"

    mesh_set = sorted(set(mesh_ids))

    def mesh_tree(m):
        """Static object-space subtree: binned-SAH host build by default
        (bvh/sah.py — ~1.5-2x fewer node+leaf visits than Morton LBVH on
        incoherent bounce waves); builder="lbvh" reuses the on-device
        Karras tree (geom.blas) for A/B."""
        if builder == "sah":
            from ..bvh.sah import build_sah
            g = geom.meshes[m]
            return build_sah(np.asarray(g.positions), np.asarray(g.tri),
                             chain_cutoff=L)
        return geom.blas[m]

    mesh_recs = {m: build_records4_padded(mesh_tree(m), L)
                 for m in mesh_set}

    top_records = _instance_tree(num_inst)
    n_top = len(top_records)

    # mesh node / leaf offsets (each mesh stored ONCE)
    node_off, leaf_off = {}, {}
    n_nodes, n_leaves = n_top, 0
    for m in mesh_set:
        recs, stream = mesh_recs[m]
        node_off[m] = n_nodes
        leaf_off[m] = n_leaves
        n_nodes += len(recs)
        n_leaves += len(stream) // L
    N = n_nodes
    assert N < MAX_NODES

    kind = np.zeros((N, 4), np.int32)
    a_col = np.zeros((N, 4), np.int32)
    b_col = np.zeros((N, 4), np.int32)
    boxes = np.zeros((N, 24), np.float32)
    for k in range(4):                   # empty children never intersect
        boxes[:, k * 6:k * 6 + 3] = 3e38
        boxes[:, k * 6 + 3:k * 6 + 6] = -3e38

    # top records: kind=3 instance entries (b = tag) / kind=2 internal
    top_children = []
    for r, rec in enumerate(top_records):
        childs = []
        for k, c in enumerate(rec):
            if c[0] == "inst":
                i = c[1]
                kind[r, k] = 3
                a_col[r, k] = node_off[mesh_ids[i]]
                b_col[r, k] = i + 1
                childs.append((3, i, i + 1))
            else:
                kind[r, k] = 2
                a_col[r, k] = c[1]
                childs.append((2, c[1], 0))
        top_children.append(tuple(childs))

    # mesh records (object space, static boxes)
    for m in mesh_set:
        recs, _ = mesh_recs[m]
        off, loff = node_off[m], leaf_off[m]
        for r, rec in enumerate(recs):
            for k, c in enumerate(rec):
                kind[off + r, k] = c["kind"]
                a_col[off + r, k] = (loff + c["a"] if c["kind"] == 1
                                     else off + c["a"])
                b_col[off + r, k] = c["b"]
                boxes[off + r, k * 6:k * 6 + 3] = c["lo"]
                boxes[off + r, k * 6 + 3:k * 6 + 6] = c["hi"]

    # static leaf columns: lean [geom 9L] + (S, 10) attrs side table, or
    # fat [geom 9L | object normals 9L | prim L]
    cols = []
    attr_rows = []
    for m in mesh_set:
        _, stream = mesh_recs[m]
        perm = np.asarray(stream, np.int64)
        pad = perm < 0
        perm_c = np.clip(perm, 0, None)
        g = geom.meshes[m]
        v0 = np.asarray(g.v0)[perm_c].astype(np.float32)
        v0[pad] = np.nan                     # pad slots never intersect
        e1 = np.asarray(g.e1)[perm_c].astype(np.float32)
        e2 = np.asarray(g.e2)[perm_c].astype(np.float32)
        tri = np.asarray(g.tri)[perm_c]
        nrm = np.asarray(g.normals)[tri].reshape(-1, 9).astype(np.float32)
        geom9 = np.concatenate([v0, e1, e2], axis=1)       # (T, 9)
        prim = np.where(pad, 0, perm_c).astype(np.float32)
        nl = len(perm) // L
        if lean:
            cols.append(geom9.reshape(nl, 9 * L))
            # (T, 19): [n0 n1 n2 | prim | v0 e1 e2] — the geometry tail
            # (cols 10..18) lets the slim kernel path recompute the
            # winner's u/v post-kernel (gathers are row-count-bound, so
            # the extra width is free)
            attr_rows.append(
                np.concatenate([nrm, prim[:, None], geom9], axis=1))
        else:
            cols.append(np.concatenate([
                geom9.reshape(nl, 9 * L),
                nrm.reshape(nl, 9 * L),
                prim.reshape(nl, L),
            ], axis=1))
    cols = np.concatenate(cols)              # (leaves, 9L) | (leaves, 19L)
    l_pad = -(-n_leaves // 128) * 128 - n_leaves
    cols = np.concatenate(
        [cols, np.zeros((l_pad, cols.shape[1]), np.float32)])
    tris = jnp.asarray(
        cols.reshape(-1, 128, cols.shape[1]).transpose(0, 2, 1))
    attrs = (jnp.asarray(np.concatenate(attr_rows)) if lean else None)

    # per-instance mesh-root object box corners (for world-box refit)
    corners = np.zeros((num_inst, 8, 3), np.float32)
    for i, m in enumerate(mesh_ids):
        root = node_off[m]
        live = kind[root] > 0
        ch = boxes[root].reshape(4, 6)[live]
        lo = ch[:, 0].min(), ch[:, 1].min(), ch[:, 2].min()
        hi = ch[:, 3].max(), ch[:, 4].max(), ch[:, 5].max()
        for c in range(8):
            corners[i, c] = [hi[0] if c & 1 else lo[0],
                             hi[1] if c & 2 else lo[1],
                             hi[2] if c & 4 else lo[2]]

    n_pad = -(-N // 128) * 128
    static_cols = np.zeros((n_pad, 12), np.float32)
    static_cols[:N, 0:4] = kind
    static_cols[:N, 4:8] = a_col
    static_cols[:N, 8:12] = b_col

    # stack bound: two-pop DFS over the merged graph (kind=3 edges jump
    # from top nodes to mesh roots, always to larger indices)
    depth = np.ones(N, np.int32)
    for r in range(N - 1, -1, -1):
        d = 1
        for k in range(4):
            if kind[r, k] >= 2:
                d = max(d, 1 + depth[a_col[r, k]])
        depth[r] = d
    stack = max(128, int(6 * depth[0] + 16))

    # anchor cuts: one object-space cut per unique mesh, instanced per
    # instance with cumulative id bases (cap the total at 256 anchors =
    # 8 key bits so dense-instance scenes keep enough Morton bits)
    anchor_boxes = None
    anchor_base = ()
    if anchor_cut:
        k_eff = max(4, min(anchor_cut, 256 // num_inst))
        cuts = {m: _mesh_cut(mesh_recs[m][0], k_eff) for m in mesh_set}
        k_max = max(c.shape[0] for c in cuts.values())
        empty = np.concatenate([np.full(3, 3e38, np.float32),
                                np.full(3, -3e38, np.float32)])
        per_inst = np.tile(empty, (num_inst, k_max, 1))
        base, bases = 0, []
        for i, m in enumerate(mesh_ids):
            c = cuts[m]
            per_inst[i, :c.shape[0]] = c
            bases.append(base)
            base += c.shape[0]
        bases.append(base)                     # [-1] = total anchors
        anchor_boxes = jnp.asarray(per_inst)
        anchor_base = tuple(bases)

    sw = SceneWideBVH(
        nodes=None, tris=tris, inv_mats=None, attrs=attrs,
        static_cols=jnp.asarray(static_cols),
        mesh_boxes=jnp.asarray(boxes[n_top:]),
        root_corners=jnp.asarray(corners),
        top_children=tuple(top_children),
        n_top=n_top,
        num_nodes=N,
        leaf_size=L,
        stack=stack,
        anchor_boxes=anchor_boxes,
        anchor_base=anchor_base,
    )
    if worlds is None:
        worlds = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                  (num_inst, 4, 4))
    return refit_scene_wide(sw, worlds)


def refit_scene_wide(sw: SceneWideBVH, worlds) -> SceneWideBVH:
    """Per-frame refit (jit-friendly, tiny): instance world boxes from
    the 8 transformed root corners, top-tree unions, inverse-world table.
    The object-space streams are static — this IS the TLAS-only update
    of the reference (RayTracer::UpdateAccelerationStructure,
    RayTracer.cpp:326-341)."""
    num_inst = sw.root_corners.shape[0]
    # (I, 8, 3) -> world
    wc = (jnp.einsum("icd,ide->ice", sw.root_corners,
                     worlds[:, :3, :3]) + worlds[:, None, 3, :3])
    inst_lo = wc.min(axis=1)                       # (I, 3)
    inst_hi = wc.max(axis=1)

    # top boxes bottom-up (children have larger record indices)
    n_top = sw.n_top
    lo_rows = [None] * n_top
    hi_rows = [None] * n_top
    node_lo = [None] * n_top
    node_hi = [None] * n_top
    big = jnp.float32(3e38)
    for r in range(n_top - 1, -1, -1):
        lows, highs = [], []
        for (knd, a, _b) in sw.top_children[r]:
            if knd == 3:
                lows.append(inst_lo[a])
                highs.append(inst_hi[a])
            else:
                lows.append(node_lo[a])
                highs.append(node_hi[a])
        while len(lows) < 4:
            lows.append(jnp.full((3,), big))
            highs.append(jnp.full((3,), -big))
        lo_rows[r] = jnp.stack(lows)               # (4, 3)
        hi_rows[r] = jnp.stack(highs)
        node_lo[r] = jnp.stack(lows[:len(sw.top_children[r])]).min(axis=0)
        node_hi[r] = jnp.stack(
            highs[:len(sw.top_children[r])]).max(axis=0)

    top_boxes = jnp.stack([
        jnp.concatenate([lo_rows[r], hi_rows[r]],
                        axis=1).reshape(24)
        for r in range(n_top)]) if n_top else jnp.zeros((0, 24))

    boxes = jnp.concatenate([top_boxes, sw.mesh_boxes])
    n_pad = sw.static_cols.shape[0]
    boxes = jnp.concatenate(
        [boxes, jnp.zeros((n_pad - boxes.shape[0], 24), jnp.float32)])
    node_arr = jnp.concatenate([boxes, sw.static_cols], axis=1)
    nodes = node_arr.reshape(-1, 128, 36).transpose(0, 2, 1)

    # inverse worlds, row 0 identity (tag 0 = world space)
    a3 = worlds[:, :3, :3]
    inv3 = jnp.linalg.inv(a3)                      # (I, 3, 3)
    t_inv = -jnp.einsum("ic,icd->id", worlds[:, 3, :3], inv3)
    rows = jnp.concatenate([inv3.reshape(num_inst, 9), t_inv], axis=1)
    ident = jnp.concatenate([jnp.eye(3).reshape(9), jnp.zeros(3)]
                            )[None].astype(jnp.float32)
    inv_mats = jnp.concatenate([ident, rows])

    return sw._replace(nodes=nodes, inv_mats=inv_mats)


def anchor_ids_scene(sw: SceneWideBVH, ray_o, ray_d):
    """Nearest-entry anchor id per WORLD-space ray over the per-instance
    object-space BVH cuts (slab tests through the refit inverse-world
    table, so animation keeps anchors correct).  Rays that miss every cut
    box keep id 0 — they are dead or sky rays whose key slot is
    irrelevant (the dead bit dominates the sort)."""
    n_inst, _k, _ = sw.anchor_boxes.shape
    best_t = jnp.full(ray_o.shape[:1], jnp.inf)
    best_id = jnp.zeros(ray_o.shape[:1], jnp.uint32)
    for i in range(n_inst):
        m = sw.inv_mats[i + 1]
        oo = ray_o @ m[:9].reshape(3, 3) + m[9:]
        dd = ray_d @ m[:9].reshape(3, 3)
        inv = 1.0 / jnp.where(jnp.abs(dd) < 1e-20, 1e-20, dd)
        cut = sw.anchor_boxes[i]
        # (K, R) layout: the ray axis stays minor-most so every slab op
        # runs at full (8, 128) lane utilization — the natural
        # (R, K, 3) broadcast puts 3 in the lane dim and ran ~30x
        # slower in-frame (r5 bench regression 45 -> 83 ms)
        tn = None
        tf = None
        for ax in range(3):
            a = (cut[:, ax, None] - oo[None, :, ax]) * inv[None, :, ax]
            b = (cut[:, 3 + ax, None] - oo[None, :, ax]) * inv[None, :, ax]
            n_ax = jnp.minimum(a, b)
            f_ax = jnp.maximum(a, b)
            tn = n_ax if tn is None else jnp.maximum(tn, n_ax)
            tf = f_ax if tf is None else jnp.minimum(tf, f_ax)
        ok = (tn <= tf) & (tf >= 0.0)
        tn = jnp.where(ok, jnp.maximum(tn, 0.0), jnp.inf)   # (K, R)
        j = jnp.argmin(tn, axis=0)
        tn_b = jnp.min(tn, axis=0)
        upd = tn_b < best_t
        best_t = jnp.where(upd, tn_b, best_t)
        best_id = jnp.where(
            upd, (sw.anchor_base[i] + j).astype(jnp.uint32), best_id)
    return best_id


def anchor_bits(sw: SceneWideBVH) -> int:
    """Key bits needed for the scene's anchor ids."""
    total = sw.anchor_base[-1] if sw.anchor_base else 0
    return max(1, int(np.ceil(np.log2(max(total, 2))))) if total else 0


def trace_scene_wide_fused(sw: SceneWideBVH, ray_o, ray_d, t_min, t_max,
                           interpret: bool = False, tile_s: int = 8,
                           slim: bool = False):
    """Closest hit for WORLD-space rays across all instances in ONE
    kernel launch (the DispatchRays TLAS walk, RayTracer.cpp:807-809).
    Returns (HitRecord, normal): normal is the UNNORMALIZED OBJECT-space
    interpolated surface normal (zero where missed); callers transform by
    the instance normal matrix.

    slim=True runs the deferred-attribute kernel (2 fewer vector selects
    per Möller–Trumbore test): the kernel returns only (t, slot, inst)
    and the winner's u/v are recomputed here from the slot's geometry
    (attrs cols 10..18) with one extra fused MT evaluation — barycentrics
    are affine-invariant, so the object-space recompute matches the
    in-kernel values to fp reassociation."""
    lean = sw.attrs is not None
    if lean and slim:
        import jax

        t, sidx, inst = trace_tiles_instanced(
            sw.nodes, sw.tris, sw.inv_mats, ray_o, ray_d, t_min, t_max,
            leaf_size=int(sw.leaf_size), interpret=interpret,
            stack=int(sw.stack), tile_s=tile_s, lean=True, slim=True)
        hit = sidx >= 0
        att = sw.attrs[jnp.clip(sidx, 0, sw.attrs.shape[0] - 1)]
        # object-space ray via the winner instance's inverse world
        tags = jnp.clip(inst + 1, 0, sw.inv_mats.shape[0] - 1)
        oh = jax.nn.one_hot(tags, sw.inv_mats.shape[0],
                            dtype=jnp.float32)
        m = oh @ sw.inv_mats                              # (R, 12)
        o_obj = (jnp.einsum("rj,rja->ra", ray_o,
                            m[:, :9].reshape(-1, 3, 3)) + m[:, 9:12])
        d_obj = jnp.einsum("rj,rja->ra", ray_d,
                           m[:, :9].reshape(-1, 3, 3))
        v0, e1, e2 = att[:, 10:13], att[:, 13:16], att[:, 16:19]
        pv = jnp.cross(d_obj, e2)
        inv_det = 1.0 / jnp.sum(e1 * pv, axis=-1)
        tv = o_obj - v0
        u = jnp.sum(tv * pv, axis=-1) * inv_det
        qv = jnp.cross(tv, e1)
        v = jnp.sum(d_obj * qv, axis=-1) * inv_det
        u = jnp.where(hit, u, 0.0)
        v = jnp.where(hit, v, 0.0)
        w0 = (1.0 - u - v)[..., None]
        nrm = (w0 * att[:, 0:3] + u[..., None] * att[:, 3:6]
               + v[..., None] * att[:, 6:9])
        nrm = jnp.where(hit[..., None], nrm, 0.0)
        prim = jnp.where(hit, att[:, 9].astype(jnp.int32), -1)
    elif lean:
        t, u, v, sidx, inst = trace_tiles_instanced(
            sw.nodes, sw.tris, sw.inv_mats, ray_o, ray_d, t_min, t_max,
            leaf_size=int(sw.leaf_size), interpret=interpret,
            stack=int(sw.stack), tile_s=tile_s, lean=True)
        hit = sidx >= 0
        # one gather resolves the winner's vertex normals + prim; cols
        # 10..18 (the slim path's geometry tail) are sliced off BEFORE
        # the gather — the full-width gather forced a (R, 19) layout
        # copy downstream (~0.6 ms @720p, r5 xplane)
        att = sw.attrs[:, :10][jnp.clip(sidx, 0, sw.attrs.shape[0] - 1)]
        w0 = (1.0 - u - v)[..., None]
        nrm = (w0 * att[:, 0:3] + u[..., None] * att[:, 3:6]
               + v[..., None] * att[:, 6:9])
        nrm = jnp.where(hit[..., None], nrm, 0.0)
        prim = jnp.where(hit, att[:, 9].astype(jnp.int32), -1)
    else:
        t, u, v, nrm, prim, inst = trace_tiles_instanced(
            sw.nodes, sw.tris, sw.inv_mats, ray_o, ray_d, t_min, t_max,
            leaf_size=int(sw.leaf_size), interpret=interpret,
            stack=int(sw.stack), tile_s=tile_s, lean=False)
        hit = prim >= 0
    rec = HitRecord(t=t, prim=prim, u=u, v=v, hit=hit, inst=inst)
    return rec, nrm


def trace_scene_wide(sw: SceneWideBVH, ray_o, ray_d, t_min, t_max,
                     interpret: bool = False) -> HitRecord:
    """Compatibility wrapper returning only the HitRecord."""
    rec, _ = trace_scene_wide_fused(sw, ray_o, ray_d, t_min, t_max,
                                    interpret=interpret)
    return rec
