"""Fused leaf-major packet traversal — round-2 hot kernel.

Round-2 TPU profiling (docs/PERF.md) found two dominating costs beyond the
traversal loop itself:

1. XLA per-row gather latency (~50 ns/row): the post-trace attribute
   gathers (vertex/normal interp, tri->instance mapping) cost as much as
   the traversal.  Fix: the kernel already holds the triangle data when it
   finds a hit — store world-space normals and prim/instance ids IN the
   leaf record and interpolate at hit time, so traversal returns fully
   resolved surface attributes and shading needs NO per-ray table gather.

2. Per-visit scalar sync latency: the previous kernel issued 4 tile-wide
   any() reductions + 1 column fetch + sequential per-triangle fetches per
   supernode visit.  Fix: (a) leaf-major layout — ONE column fetch yields
   an entire leaf (all L triangles + normals + ids), statically unrolled;
   (b) the 4 child hit tests reduce via TWO packed integer sums (counts in
   bit-fields) instead of 4 any()s; (c) near-first ordered descent using
   scalar mid-ray distance keys and a 5-exchange sorting network (pure
   scalar ALU, overlaps vector work) tightens best-t sooner.

This is the TPU-native replacement for the DXR DispatchRays traversal +
closest-hit attribute fetch (XUSGRayTracing.h:306-341 with the hit-group
vertex fetch, RayTracing.hlsl:230-244).

Layout (instanced, built by ops/scene_wide.build_scene_wide)
------------------------------------------------------------
nodes: (Nt, 36, 128) f32 supernode columns, node i at tile i>>7 lane
i&127.  The first n_top nodes are the TOP tree over instance WORLD
boxes; the rest are shared per-mesh OBJECT-space subtrees:
  rows 0..23  4 children x (lo.xyz, hi.xyz) — world space in top rows,
              object space inside a mesh subtree
  rows 24..27 child kind (0 empty / 1 leaf / 2 internal / 3 instance
              entry into a mesh subtree)
  rows 28..31 child addr: supernode index (kind 2/3) | leaf index (1)
  rows 32..35 kind=3: instance tag (1-based; tag 0 = world/identity);
              kind=1: triangle count (metadata; kernel ignores)
tris: (Lt, RW, 128) f32 STATIC object-space leaf columns, leaf j at
tile j>>7 lane j&127.

Round-3 production layout is LEAN (RW = 9L):
  rows 0 .. 9L-1   tri k: v0.xyz e1.xyz e2.xyz at 9k (OBJECT space)
The winner's attributes are NOT in the stream: the kernel returns the
STREAM slot index (leaf*L + k, computed in-kernel) and the caller
resolves vertex normals + the mesh-local prim id with ONE XLA gather
from a static (S, 10) side table (scene_wide.trace_scene_wide_fused).
Measured on TPU (scripts/kbench.py, bunny@720p): lean+L16 cut the
reflection wave 31.2 -> 18.8 ms and the primary wave 11.6 -> 8.6 ms vs
the round-2 19L layout — leaf visits are VMEM-bandwidth-bound, and the
9L stream halves the bytes per visit while one 921k-row gather costs
~0.2 ms.

lean=False keeps the round-2 fat layout (RW = 19L: + object-space
vertex normals at 9L+9k and prim ids at 18L+k, interpolated at hit
time in-kernel) for A/B and for callers without a side table.

The hit's instance id is derived from the stack tag (tag - 1), not
stored per leaf.  Padding triangles carry v0 = NaN so every
intersection test fails (u/v/t become NaN, all comparisons false).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_L = 128


def build_records4_padded(bvh, leaf_size: int = 8, compact: bool = True):
    """Collapse a binary LBVH into 4-wide supernodes with every leaf
    padded to exactly `leaf_size` stream slots (pad slot = -1).  Returns
    (records, tri_stream): records[i] = child dicts {kind, a, b} where a
    is a LEAF ORDINAL for kind=1 (not a stream position) and a supernode
    index for kind=2; b = real triangle count.  Leaf ordinal j covers
    stream slots [j*L, (j+1)*L).  Mirrors ops/wide.build_records4 but
    with the fixed-size-leaf invariant the fused kernel needs.

    compact=True is the TPU analog of the reference's acceleration-
    structure compaction flow (build -> COMPACTED_SIZE query -> pack ->
    copy, RayTracer.cpp:163-212 / XUSGRayTracing.h:51-66): sibling leaf
    children whose triangle counts bin-pack into one leaf_size slot are
    merged (box = union), shrinking the padded stream and the per-tile
    leaf-visit count.  compaction_stats() is the size-query analog."""
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    amin = np.asarray(bvh.aabb_min)
    amax = np.asarray(bvh.aabb_max)
    leaf_tri = np.asarray(bvh.leaf_tri)
    n = len(leaf_tri)
    n_int = n - 1
    L = leaf_size

    counts = np.ones(2 * n - 1, np.int64)
    for _ in range(4096):      # fixed point after `depth` rounds
        new = counts[left] + counts[right]
        if np.array_equal(new, counts[:n_int]):
            break
        counts[:n_int] = new
    else:
        raise ValueError("BVH deeper than 4096 — malformed tree?")

    def leaves_of(node):
        out = []
        stack = [node]
        while stack:
            v = stack.pop()
            if v >= n_int:
                out.append(leaf_tri[v - n_int])
            else:
                stack.append(right[v])
                stack.append(left[v])
        return out

    def expand4(node):
        kids = [left[node], right[node]]
        while len(kids) < 4:
            best, best_c = -1, L
            for i, k in enumerate(kids):
                if k < n_int and counts[k] > best_c:
                    best, best_c = i, counts[k]
            if best < 0:
                break
            k = kids.pop(best)
            kids[best:best] = [left[k], right[k]]
        return kids

    records = []
    tri_stream = []

    def emit_leaf(tris):
        j = len(tri_stream) // L
        tri_stream.extend(tris)
        tri_stream.extend([-1] * (L - len(tris)))
        return j

    def emit(node):
        idx = len(records)
        records.append(None)
        childs = []
        leafs = []
        for k in expand4(node):
            if k >= n_int or counts[k] <= L:
                leafs.append(k)
            else:
                childs.append(dict(kind=2, a=None, b=0, node=k,
                                   lo=amin[k], hi=amax[k]))
        if compact and len(leafs) > 1:
            # pack -> copy: greedy first-fit-decreasing bin pack of
            # sibling leaves into leaf_size-slot bins
            leafs.sort(key=lambda k: -counts[k] if k < n_int else -1)
            bins = []                 # [(count, [subtree...])]
            for k in leafs:
                c = counts[k] if k < n_int else 1
                for b in bins:
                    if b[0] + c <= L:
                        b[0] += c
                        b[1].append(k)
                        break
                else:
                    bins.append([c, [k]])
            for _cnt, ks in bins:
                tris = [t for k in ks for t in leaves_of(k)]
                lo = np.min([amin[k] for k in ks], axis=0)
                hi = np.max([amax[k] for k in ks], axis=0)
                childs.append(dict(kind=1, a=emit_leaf(tris),
                                   b=len(tris), lo=lo, hi=hi))
        else:
            for k in leafs:
                tris = leaves_of(k)
                childs.append(dict(kind=1, a=emit_leaf(tris),
                                   b=len(tris), lo=amin[k], hi=amax[k]))
        records[idx] = childs
        for c in childs:
            if c["kind"] == 2:
                c["a"] = emit(c["node"])
        return idx

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(10 ** 5)
    try:
        if n == 1 or counts[0] <= L:
            root = 0 if n > 1 else n_int
            tris = leaves_of(root)
            records.append([dict(kind=1, a=emit_leaf(tris), b=len(tris),
                                 lo=amin[root], hi=amax[root])])
        else:
            emit(0)
    finally:
        sys.setrecursionlimit(old)
    return records, tri_stream


def compaction_stats(records, tri_stream, leaf_size: int):
    """COMPACTED_SIZE-query analog (XUSGRayTracing.h:51-66): occupancy of
    the padded leaf stream.  Returns dict(tris, slots, leaves, nodes,
    fill, stream_bytes) — `fill` is real triangles / padded slots; the
    compact=True bin-pack is what closes the gap the reference closes
    with its query -> pack -> CopyRaytracingAccelerationStructure flow
    (RayTracer.cpp:163-212)."""
    slots = len(tri_stream)
    tris = sum(1 for t in tri_stream if t >= 0)
    return dict(tris=tris, slots=slots,
                leaves=slots // leaf_size, nodes=len(records),
                fill=tris / max(slots, 1),
                stream_bytes=slots * 9 * 4)


def _instanced_kernel(nodes_ref, tris_ref, rays_ref, inv_ref, mids_ref,
                      *refs, t_min, L, RW, TILE_S, lean,
                      slim: bool = False):
    """Instanced variant: shared OBJECT-space mesh subtrees entered via
    tagged instance nodes (the reference TopLevelAS semantics,
    XUSGRayTracing.h:195-237, done the TPU way).

    Stack entries pack (node index | instance tag << 20).  On every pop
    the tile's world rays are transformed by the tag's inverse-world
    matrix (tag 0 = identity = world space for the top tree); because the
    object direction is NOT renormalized, the ray parameter t stays in
    world metric, so best-t comparisons are valid across instances.
    Node columns: rows 0..23 child boxes (object space inside a mesh,
    world space for top-tree rows), 24..27 kind (1 leaf / 2 internal /
    3 instance entry), 28..31 child addr, 32..35: instance tag for
    kind=3 (tri count for kind=1, unused otherwise).
    Leaf columns (tris_ref): [geom 9L | object normals 9L | prim L].
    inv_ref: (tags, 12) SMEM — rows of the inverse world (3x3 row-major
    + translation), row 0 identity."""
    if slim:
        # deferred-attribute kernel (round 5): the carry tracks only
        # (best t, winner slot, instance) — u/v of the winner are
        # recomputed post-kernel from the slot's geometry in the attrs
        # side gather that already runs (trace_scene_wide_fused).  Two
        # fewer vector selects per Möller–Trumbore test.
        t_ref, prim_ref, inst_ref, stack_ref = refs
        u_ref = v_ref = n_ref = None
    elif lean:
        t_ref, u_ref, v_ref, prim_ref, inst_ref, stack_ref = refs
        n_ref = None
    else:
        t_ref, u_ref, v_ref, n_ref, prim_ref, inst_ref, stack_ref = refs
    wox, woy, woz = rays_ref[0, 0], rays_ref[0, 1], rays_ref[0, 2]
    wdx, wdy, wdz = rays_ref[0, 3], rays_ref[0, 4], rays_ref[0, 5]
    tmax0 = rays_ref[0, 6]

    eps = jnp.float32(1e-20)

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < eps,
                               jnp.where(d >= 0, eps, -eps), d)

    def fetch(ref, idx, rows):
        tile = ref[idx >> 7]
        lanes = lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        return jnp.sum(jnp.where(lanes == (idx & 127), tile, 0.0), axis=1)

    # live-ray mid scalars (world space; transformed per pop for keys).
    # Computed OUTSIDE the kernel (one fused XLA pass over all tiles) and
    # passed via SMEM: the in-kernel version was 12 full-tile masked
    # reductions in the prologue — measured ~3 us/tile of launch floor
    # (scripts/kbench.py alldead, round 3).  The whole (G, 8) table lives
    # in SMEM unblocked (blocked SMEM specs need lane-aligned shapes);
    # each program reads its own row.
    g = pl.program_id(0)
    wm_ox, wm_oy, wm_oz = mids_ref[g, 0], mids_ref[g, 1], mids_ref[g, 2]
    wm_dx, wm_dy, wm_dz = mids_ref[g, 3], mids_ref[g, 4], mids_ref[g, 5]

    def ray_state(tag):
        """Transform the tile's world rays into the tag's object space
        (12 SMEM scalar reads + broadcast FMAs; tag 0 is identity)."""
        m = [inv_ref[tag, j] for j in range(12)]
        ox = wox * m[0] + woy * m[3] + woz * m[6] + m[9]
        oy = wox * m[1] + woy * m[4] + woz * m[7] + m[10]
        oz = wox * m[2] + woy * m[5] + woz * m[8] + m[11]
        dx = wdx * m[0] + wdy * m[3] + wdz * m[6]
        dy = wdx * m[1] + wdy * m[4] + wdz * m[7]
        dz = wdx * m[2] + wdy * m[5] + wdz * m[8]
        # scalar mid ray for ordered-descent keys
        s_ox = wm_ox * m[0] + wm_oy * m[3] + wm_oz * m[6] + m[9]
        s_oy = wm_ox * m[1] + wm_oy * m[4] + wm_oz * m[7] + m[10]
        s_oz = wm_ox * m[2] + wm_oy * m[5] + wm_oz * m[8] + m[11]
        s_dx = wm_dx * m[0] + wm_dy * m[3] + wm_dz * m[6]
        s_dy = wm_dx * m[1] + wm_dy * m[4] + wm_dz * m[7]
        s_dz = wm_dx * m[2] + wm_dy * m[5] + wm_dz * m[8]

        def s_inv(v):
            return 1.0 / jnp.where(jnp.abs(v) < eps,
                                   jnp.where(v >= 0, eps, -eps), v)

        return ((ox, oy, oz, dx, dy, dz,
                 safe_inv(dx), safe_inv(dy), safe_inv(dz)),
                (s_ox, s_oy, s_oz, s_inv(s_dx), s_inv(s_dy), s_inv(s_dz)))

    def leaf_fn(lf, inst_f, rs, carry):
        if slim:
            bt, bpr, bin_ = carry
        elif lean:
            bt, bu, bv, bpr, bin_ = carry
        else:
            bt, bu, bv, bnx, bny, bnz, bpr, bin_ = carry
        ox, oy, oz, dx, dy, dz = rs[:6]
        colT = fetch(tris_ref, lf, RW)
        if lean:
            # stream slot of tri 0 in this leaf (float; exact < 2^24)
            base = (lf * L).astype(jnp.float32)
        for j in range(L):
            o9 = 9 * j
            v0x, v0y, v0z = colT[o9 + 0], colT[o9 + 1], colT[o9 + 2]
            e1x, e1y, e1z = colT[o9 + 3], colT[o9 + 4], colT[o9 + 5]
            e2x, e2y, e2z = colT[o9 + 6], colT[o9 + 7], colT[o9 + 8]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            # approx reciprocal + one Newton step (~2^-28 rel error) in
            # place of the VPU's slow-path divide; det=0 -> r0=inf ->
            # inv=NaN -> ok False, same as the divide (kbench: ~-0.4 ms
            # on the reflection wave, bit-identical goldens at 1e-6 tol)
            r0 = pl.reciprocal(det, approx=True)
            inv_det = r0 * (2.0 - det * r0)
            tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
            u = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (t >= t_min) & (t <= bt))
            bt = jnp.where(ok, t, bt)
            if not slim:
                bu = jnp.where(ok, u, bu)
                bv = jnp.where(ok, v, bv)
            if lean:
                bpr = jnp.where(ok, base + j, bpr)
            else:
                on = 9 * L + 9 * j
                w0 = 1.0 - u - v
                nx = (w0 * colT[on + 0] + u * colT[on + 3]
                      + v * colT[on + 6])
                ny = (w0 * colT[on + 1] + u * colT[on + 4]
                      + v * colT[on + 7])
                nz = (w0 * colT[on + 2] + u * colT[on + 5]
                      + v * colT[on + 8])
                bnx = jnp.where(ok, nx, bnx)
                bny = jnp.where(ok, ny, bny)
                bnz = jnp.where(ok, nz, bnz)
                bpr = jnp.where(ok, colT[18 * L + j], bpr)
            bin_ = jnp.where(ok, inst_f, bin_)
        if slim:
            return bt, bpr, bin_
        if lean:
            return bt, bu, bv, bpr, bin_
        return bt, bu, bv, bnx, bny, bnz, bpr, bin_

    def process_node(entry, valid, carry8):
        """Pop-transform-test one tagged node; returns the updated carry
        plus (key, push_value, push_flag) scalars for internal children."""
        idx = entry & 0xFFFFF
        tag = entry >> 20
        rs, sm = ray_state(tag)
        ox, oy, oz = rs[0], rs[1], rs[2]
        ix, iy, iz = rs[6], rs[7], rs[8]
        s_ox, s_oy, s_oz, s_ix, s_iy, s_iz = sm
        bt = carry8[0]
        col = fetch(nodes_ref, idx, 36)

        hits = []
        for k in range(4):
            o = k * 6
            t0x = (col[o + 0] - ox) * ix
            t1x = (col[o + 3] - ox) * ix
            t0y = (col[o + 1] - oy) * iy
            t1y = (col[o + 4] - oy) * iy
            t0z = (col[o + 2] - oz) * iz
            t1z = (col[o + 5] - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            hits.append((tn <= tf) & (tf >= t_min) & (tn <= bt))

        c01 = jnp.sum(hits[0].astype(jnp.int32)
                      + (hits[1].astype(jnp.int32) << 16))
        c23 = jnp.sum(hits[2].astype(jnp.int32)
                      + (hits[3].astype(jnp.int32) << 16))
        hk = (((c01 & 0xFFFF) > 0) & valid, ((c01 >> 16) > 0) & valid,
              ((c23 & 0xFFFF) > 0) & valid, ((c23 >> 16) > 0) & valid)

        items = []
        for k in range(4):
            kind = col[24 + k].astype(jnp.int32)
            a = col[28 + k].astype(jnp.int32)
            b = col[32 + k].astype(jnp.int32)
            carry8 = lax.cond(hk[k] & (kind == 1),
                              functools.partial(leaf_fn, a,
                                                (tag - 1).astype(
                                                    jnp.float32), rs),
                              lambda c: c, carry8)
            o = k * 6
            kx0 = (col[o + 0] - s_ox) * s_ix
            kx1 = (col[o + 3] - s_ox) * s_ix
            ky0 = (col[o + 1] - s_oy) * s_iy
            ky1 = (col[o + 4] - s_oy) * s_iy
            kz0 = (col[o + 2] - s_oz) * s_iz
            kz1 = (col[o + 5] - s_oz) * s_iz
            key = jnp.maximum(jnp.maximum(jnp.minimum(kx0, kx1),
                                          jnp.minimum(ky0, ky1)),
                              jnp.minimum(kz0, kz1))
            # child tag: kind=3 carries its instance tag in b; kind=2
            # inherits the current tag
            child_tag = jnp.where(kind == 3, b, tag)
            items.append((key, a + (child_tag << 20),
                          hk[k] & (kind >= 2)))
        return carry8, items

    def sort4_desc(items):
        def cswap(p, q):
            swap = p[0] < q[0]

            def sel(x, y):
                return jnp.where(swap, y, x), jnp.where(swap, x, y)

            k1, k2 = sel(p[0], q[0])
            a1, a2 = sel(p[1], q[1])
            f1, f2 = sel(p[2], q[2])
            return (k1, a1, f1), (k2, a2, f2)

        items[0], items[1] = cswap(items[0], items[1])
        items[2], items[3] = cswap(items[2], items[3])
        items[0], items[2] = cswap(items[0], items[2])
        items[1], items[3] = cswap(items[1], items[3])
        items[1], items[2] = cswap(items[1], items[2])
        return items

    def body(carry):
        sp = carry[0]
        carry8 = carry[1:]
        has2 = sp >= 2
        e1_ = stack_ref[sp - 1]
        e2_ = stack_ref[jnp.maximum(sp - 2, 0)]
        sp = jnp.where(has2, sp - 2, sp - 1)

        carry8, items1 = process_node(e1_, jnp.bool_(True), carry8)
        carry8, items2 = process_node(e2_, has2, carry8)
        sp_ref = sp
        cap = stack_ref.shape[0] - 1
        for key, a, push in sort4_desc(items2) + sort4_desc(items1):
            # clamp: scene_wide sizes the stack for the two-pop DFS bound,
            # but a direct caller with an undersized stack must degrade to
            # a dropped subtree, never a silent OOB SMEM write
            @pl.when(push)
            def _():
                stack_ref[jnp.minimum(sp_ref, cap)] = a

            sp_ref = jnp.where(push, jnp.minimum(sp_ref + 1, cap),
                               sp_ref)

        return (sp_ref,) + tuple(carry8)

    def cond(carry):
        return carry[0] > 0

    stack_ref[0] = 0
    zeros = jnp.zeros((TILE_S, TILE_L), jnp.float32)
    miss = jnp.full((TILE_S, TILE_L), -1.0, jnp.float32)
    if slim:
        init = (jnp.int32(1), tmax0, miss, zeros)
        (_, bt, bpr, bin_) = lax.while_loop(cond, body, init)
    elif lean:
        init = (jnp.int32(1), tmax0, zeros, zeros, miss, zeros)
        (_, bt, bu, bv, bpr, bin_) = lax.while_loop(cond, body, init)
    else:
        init = (jnp.int32(1), tmax0, zeros, zeros, zeros, zeros, zeros,
                miss, zeros)
        (_, bt, bu, bv, bnx, bny, bnz, bpr, bin_) = lax.while_loop(
            cond, body, init)
        n_ref[0, 0] = bnx
        n_ref[0, 1] = bny
        n_ref[0, 2] = bnz

    t_ref[0] = bt
    if not slim:
        u_ref[0] = bu
        v_ref[0] = bv
    prim_ref[0] = bpr
    inst_ref[0] = bin_


def trace_tiles_instanced(nodes, tris, inv_mats, ray_o, ray_d, t_min,
                          t_max, leaf_size: int, interpret: bool = False,
                          stack: int = 128, tile_s: int = 8,
                          lean: bool = True, slim: bool = False):
    """Launch the instanced kernel over (R, 3) WORLD-space rays.
    inv_mats: (tags, 12) f32, row 0 identity, row i+1 = instance i's
    inverse world (3x3 row-major + translation).

    lean=True (production): returns flat (t, u, v, sidx, inst) with sidx
    the winner's LEAF-STREAM slot (leaf*L + k; -1 on miss) — resolve
    normals/prim via scene_wide's static attribute table.
    lean=False (round-2 fat layout): returns
    (t, u, v, normal(R, 3) OBJECT-space, prim, inst)."""
    L = leaf_size
    RW = tris.shape[1]
    R = ray_o.shape[0]
    TILE = tile_s * TILE_L
    G = max(1, -(-R // TILE))
    pad = G * TILE - R

    def to_tiles(x):
        x = jnp.pad(x, ((0, pad), (0, 0)))
        return x.reshape(G, tile_s, TILE_L, 3).transpose(0, 3, 1, 2)

    tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    tmax_t = jnp.pad(tmax_arr, (0, pad), constant_values=-1.0
                     ).reshape(G, 1, tile_s, TILE_L)
    rays = jnp.concatenate([to_tiles(ray_o), to_tiles(ray_d), tmax_t],
                           axis=1)

    # per-tile live mid-ray scalars for the ordered-descent keys,
    # computed here in ONE fused pass instead of 12 in-kernel reductions
    # per tile (the bulk of the ~3 us/tile launch floor)
    live = rays[:, 6:7] >= 0.0
    big = jnp.float32(3e38)
    lo = jnp.min(jnp.where(live, rays[:, :6], big), axis=(2, 3))
    hi = jnp.max(jnp.where(live, rays[:, :6], -big), axis=(2, 3))
    mids = jnp.pad((lo + hi) * 0.5, ((0, 0), (0, 2)))      # (G, 8)

    tile_spec = lambda: pl.BlockSpec((1, tile_s, TILE_L),
                                     lambda g: (g, 0, 0),
                                     memory_space=pltpu.VMEM)
    scalar_shape = jax.ShapeDtypeStruct((G, tile_s, TILE_L), jnp.float32)
    if slim:
        assert lean, "slim requires the lean layout"
        out_specs = [tile_spec()]
        out_shape = [scalar_shape]
    else:
        out_specs = [tile_spec(), tile_spec(), tile_spec()]
        out_shape = [scalar_shape, scalar_shape, scalar_shape]
    if not lean:
        out_specs.append(pl.BlockSpec((1, 3, tile_s, TILE_L),
                                      lambda g: (g, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((G, 3, tile_s, TILE_L), jnp.float32))
    out_specs += [tile_spec(), tile_spec()]
    out_shape += [scalar_shape, scalar_shape]

    outs = pl.pallas_call(
        functools.partial(_instanced_kernel, t_min=float(t_min), L=L,
                          RW=RW, TILE_S=tile_s, lean=lean, slim=slim),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 7, tile_s, TILE_L),
                         lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((stack,), jnp.int32)],
        interpret=interpret,
    )(nodes, tris, rays, inv_mats, mids)

    def fl(x):
        return x.reshape(G * TILE)[:R]

    if slim:
        t, prim_f, inst_f = outs
        prim_f = fl(prim_f)
        hit = prim_f >= 0.0
        sidx = jnp.where(hit, prim_f.astype(jnp.int32), -1)
        inst = jnp.where(hit, fl(inst_f).astype(jnp.int32), -1)
        return fl(t), sidx, inst
    if lean:
        t, u, v, prim_f, inst_f = outs
        prim_f = fl(prim_f)
        hit = prim_f >= 0.0
        sidx = jnp.where(hit, prim_f.astype(jnp.int32), -1)
        inst = jnp.where(hit, fl(inst_f).astype(jnp.int32), -1)
        return fl(t), fl(u), fl(v), sidx, inst

    t, u, v, nrm, prim_f, inst_f = outs
    nrm = nrm.transpose(0, 2, 3, 1).reshape(G * TILE, 3)[:R]
    prim_f = fl(prim_f)
    hit = prim_f >= 0.0
    prim = jnp.where(hit, prim_f.astype(jnp.int32), -1)
    inst = jnp.where(hit, fl(inst_f).astype(jnp.int32), -1)
    return fl(t), fl(u), fl(v), nrm, prim, inst
