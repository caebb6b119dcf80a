"""Experimental variants of the instanced traversal kernel (ops/fused.py).

This is the round-3 perf lab: each variant isolates ONE structural change
so scripts/kbench.py can price it on the real TPU with chained-loop
timing.  Winners graduate into ops/fused.py; losers stay here with their
measured numbers in docs/PERF.md.

Variants (static python flags on `_lab_kernel`):
  stats       — count (pops, leaf visits) per tile; prices the loop itself
  smem_nodes  — supernode columns live in SMEM as (Npad, 36) scalars:
                node fetch = 36 scalar loads instead of a 128-lane
                masked-sum + 36 vector->scalar extracts
  npop        — nodes popped per while-loop iteration (1/2/4): amortizes
                the vector->scalar sync (packed hit reductions) across
                more vector work
  ordered     — near-first ordered descent on/off (prices the scalar
                mid-ray keys + sorting network)
  recip       — leaf Moller-Trumbore uses pl.reciprocal(approx) + one
                Newton step instead of the full-precision divide (the
                divide runs 16x per leaf visit on the VPU's slow path)
  fold        — octant-folded slab tests: tiles whose LIVE rays share
                direction signs on all 3 axes (per instance tag,
                precomputed outside and passed via SMEM) take a branch
                with sign-selected near/far bounds — 12 mul/sub instead
                of 12 mul/sub + 12 min/max per box
  pre         — per-tag ray state precomputed OUTSIDE the kernel: the
                tile's object-space origins/directions/inverse
                directions for every instance tag ride a (tags*9, S, L)
                VMEM block and the transformed mid-ray scalars (incl.
                reciprocals) a (G, tags*8) SMEM table, so every stack
                pop's ray_state() is 9 vector loads + 6 SMEM reads —
                no vector FMAs, no vector/scalar divides, no in-kernel
                mid-ray reductions in the hot loop.
                NOTE: pre scales VMEM/HBM linearly with the instance-tag
                count (tags*9 fp32 planes per ray ≈ 33 MB/tag @720p);
                cap or chunk tags before graduating it to ops/fused.py.
  noinst      — (round 5) drop the per-triangle instance select from the
                leaf loop (1 of the ~5 vector selects per MT test).
                Prices the "defer everything but (t, slot)" endpoint:
                production would pack the instance into the slot id (or
                re-derive it from the winner leaf's mesh range + stack
                replay) and resolve it post-kernel with the attrs gather
                that already runs.  Combine with slim for the full
                deferred-attribute kernel.
  sub         — hierarchical leaves (round 4): the leaf column carries 4
                sub-AABBs over its 4 contiguous L/4-slot chunks (rows
                9L..9L+23); a leaf visit tests the 4 sub-boxes on the
                tile (2 packed reductions, like the node visit) and runs
                each chunk's Möller–Trumbore under a lax.cond — one more
                tree level without stack/sort/pop cost, attacking the
                union over-visit where the wave is leaf-MT-bound
                (docs/PERF.md r4).  Requires lean; winner's stream slot
                is computed in-kernel (production ops/fused.py
                semantics), so no prim rows ride the stream.

Layout contracts are identical to ops/fused.py (instanced scene-wide
columns from ops/scene_wide.build_scene_wide).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_L = 128


def _lab_kernel(nodes_ref, tris_ref, rays_ref, inv_ref, fold_ref,
                pre_ref, mids_ref,
                t_ref, u_ref, v_ref, n_ref, prim_ref, inst_ref,
                stats_ref, stack_ref, *, t_min, L, RW, TILE_S,
                stats: bool, smem_nodes: bool, npop: int, ordered: bool,
                lean: bool = False, recip: bool = False,
                fold: bool = False, slim: bool = False,
                pre: bool = False, sub: int = 0,
                noinst: bool = False):
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

    def fetch_rows(ref, idx, r0, nrows):
        """Column fetch restricted to rows [r0, r0+nrows) — chunks of a
        hierarchical leaf load only their own geometry."""
        tile = ref[idx >> 7, r0:r0 + nrows]
        lanes = lax.broadcasted_iota(jnp.int32, (nrows, 128), 1)
        return jnp.sum(jnp.where(lanes == (idx & 127), tile, 0.0), axis=1)

    if not pre:
        live = tmax0 >= 0.0
        big = jnp.float32(3e38)

        def mid(v):
            return (jnp.min(jnp.where(live, v, big))
                    + jnp.max(jnp.where(live, v, -big))) * 0.5

        wm_ox, wm_oy, wm_oz = mid(wox), mid(woy), mid(woz)
        wm_dx, wm_dy, wm_dz = mid(wdx), mid(wdy), mid(wdz)

    def ray_state_pre(tag):
        base = tag * 9
        rows = [pre_ref[0, base + r] for r in range(9)]
        g = pl.program_id(0)
        mb = tag * 8
        sm = tuple(mids_ref[g, mb + j] for j in range(6))
        return tuple(rows), sm

    def ray_state(tag):
        if pre:
            return ray_state_pre(tag)
        m = [inv_ref[tag, j] for j in range(12)]
        ox = wox * m[0] + woy * m[3] + woz * m[6] + m[9]
        oy = wox * m[1] + woy * m[4] + woz * m[7] + m[10]
        oz = wox * m[2] + woy * m[5] + woz * m[8] + m[11]
        dx = wdx * m[0] + wdy * m[3] + wdz * m[6]
        dy = wdx * m[1] + wdy * m[4] + wdz * m[7]
        dz = wdx * m[2] + wdy * m[5] + wdz * m[8]
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

    def leaf_fn_sub(lf, inst_f, rs, carry):
        """Hierarchical leaf visit: test the `sub` sub-AABBs (leaf column
        rows 9L..9L+6*sub-1) against the tile, then run each live chunk's
        L/sub Möller–Trumbore tests under a lax.cond.  Winner id is the
        stream slot (production ops/fused.py lean semantics)."""
        ox, oy, oz, dx, dy, dz = rs[:6]
        ix, iy, iz = rs[6], rs[7], rs[8]
        bt0 = carry[0]
        nq = sub
        Lq = L // nq
        boxc = fetch_rows(tris_ref, lf, 9 * L, 6 * nq)
        raw = []
        for q in range(nq):
            o = 6 * q
            t0x = (boxc[o + 0] - ox) * ix
            t1x = (boxc[o + 3] - ox) * ix
            t0y = (boxc[o + 1] - oy) * iy
            t1y = (boxc[o + 4] - oy) * iy
            t0z = (boxc[o + 2] - oz) * iz
            t1z = (boxc[o + 5] - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            raw.append((tn <= tf) & (tf >= t_min) & (tn <= bt0))
        hq = []
        for q in range(0, nq, 2):       # packed pairs, like the node visit
            c = jnp.sum(raw[q].astype(jnp.int32)
                        + (raw[q + 1].astype(jnp.int32) << 16))
            hq.append((c & 0xFFFF) > 0)
            hq.append((c >> 16) > 0)
        base = (lf * L).astype(jnp.float32)

        for q in range(nq):
            def chunk(c, q=q):
                bt, bu, bv, bnx, bny, bnz, bpr, bin_ = c
                colT = fetch_rows(tris_ref, lf, 9 * Lq * q, 9 * Lq)
                for j in range(Lq):
                    o9 = 9 * j
                    v0x, v0y, v0z = colT[o9 + 0], colT[o9 + 1], colT[o9 + 2]
                    e1x, e1y, e1z = colT[o9 + 3], colT[o9 + 4], colT[o9 + 5]
                    e2x, e2y, e2z = colT[o9 + 6], colT[o9 + 7], colT[o9 + 8]
                    px = dy * e2z - dz * e2y
                    py = dz * e2x - dx * e2z
                    pz = dx * e2y - dy * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    if recip:
                        r0 = pl.reciprocal(det, approx=True)
                        inv_det = r0 * (2.0 - det * r0)
                    else:
                        inv_det = 1.0 / det
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
                    bu = jnp.where(ok, u, bu)
                    bv = jnp.where(ok, v, bv)
                    bpr = jnp.where(ok, base + (q * Lq + j), bpr)
                    bin_ = jnp.where(ok, inst_f, bin_)
                return (bt, bu, bv, bnx, bny, bnz, bpr, bin_)

            carry = lax.cond(hq[q], chunk, lambda c: c, carry)
        return carry

    def leaf_fn(lf, inst_f, rs, carry):
        if sub:
            return leaf_fn_sub(lf, inst_f, rs, carry)
        bt, bu, bv, bnx, bny, bnz, bpr, bin_ = carry
        ox, oy, oz, dx, dy, dz = rs[:6]
        colT = fetch(tris_ref, lf, RW)
        for j in range(L):
            o9 = 9 * j
            v0x, v0y, v0z = colT[o9 + 0], colT[o9 + 1], colT[o9 + 2]
            e1x, e1y, e1z = colT[o9 + 3], colT[o9 + 4], colT[o9 + 5]
            e2x, e2y, e2z = colT[o9 + 6], colT[o9 + 7], colT[o9 + 8]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            if recip:
                # approx reciprocal + one Newton step ~= fp32 exact
                # (error ~2^-28); det=0 -> r0=inf -> 2-det*r0=NaN ->
                # inv=NaN -> ok False; padding-NaN propagates the same
                # way as with the divide
                r0 = pl.reciprocal(det, approx=True)
                inv_det = r0 * (2.0 - det * r0)
            else:
                inv_det = 1.0 / det
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
                # slim mode: u,v of the winner are NOT tracked in-kernel
                # (2 fewer vector selects per tri); the caller recomputes
                # them from the winner's stream slot in one XLA fusion
                bu = jnp.where(ok, u, bu)
                bv = jnp.where(ok, v, bv)
            if lean:
                # lean layout [geom 9L | prim L]: normals are NOT in the
                # stream; the caller reconstructs the winner's normal with
                # one XLA gather (round-2 microbench: 0.21 ms / 921k rows)
                bpr = jnp.where(ok, colT[9 * L + j], bpr)
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
            if not noinst:
                bin_ = jnp.where(ok, inst_f, bin_)
        return bt, bu, bv, bnx, bny, bnz, bpr, bin_

    def process_node(entry, valid, carry8, lp):
        idx = entry & 0xFFFFF
        tag = entry >> 20
        rs, sm = ray_state(tag)
        ox, oy, oz = rs[0], rs[1], rs[2]
        ix, iy, iz = rs[6], rs[7], rs[8]
        s_ox, s_oy, s_oz, s_ix, s_iy, s_iz = sm
        bt = carry8[0]
        if smem_nodes:
            col = [nodes_ref[idx, r] for r in range(36)]
        else:
            colv = fetch(nodes_ref, idx, 36)
            col = [colv[r] for r in range(36)]

        def pack(hits):
            c01 = jnp.sum(hits[0].astype(jnp.int32)
                          + (hits[1].astype(jnp.int32) << 16))
            c23 = jnp.sum(hits[2].astype(jnp.int32)
                          + (hits[3].astype(jnp.int32) << 16))
            return c01, c23

        def slab_generic(_):
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
            return pack(hits)

        if fold:
            # per-(tile, tag) SMEM flags: [can_fold, sx, sy, sz] — the
            # tile's LIVE rays share direction signs on all 3 axes in
            # this tag's object space, so near/far bounds are a scalar
            # sign-select and the 12 vector min/max per box fold away.
            # The cond returns the two packed int32 SCALAR counts (the
            # bool-vector tuple return tripped Mosaic's compile helper).
            g = pl.program_id(0)
            fbase = tag * 4
            can_fold = fold_ref[g, fbase] > 0
            sx = fold_ref[g, fbase + 1] > 0
            sy = fold_ref[g, fbase + 2] > 0
            sz = fold_ref[g, fbase + 3] > 0

            def slab_folded(_):
                hits = []
                for k in range(4):
                    o = k * 6
                    nbx = jnp.where(sx, col[o + 0], col[o + 3])
                    fbx = jnp.where(sx, col[o + 3], col[o + 0])
                    nby = jnp.where(sy, col[o + 1], col[o + 4])
                    fby = jnp.where(sy, col[o + 4], col[o + 1])
                    nbz = jnp.where(sz, col[o + 2], col[o + 5])
                    fbz = jnp.where(sz, col[o + 5], col[o + 2])
                    tn = jnp.maximum(jnp.maximum((nbx - ox) * ix,
                                                 (nby - oy) * iy),
                                     (nbz - oz) * iz)
                    tf = jnp.minimum(jnp.minimum((fbx - ox) * ix,
                                                 (fby - oy) * iy),
                                     (fbz - oz) * iz)
                    hits.append((tn <= tf) & (tf >= t_min) & (tn <= bt))
                return pack(hits)

            c01, c23 = lax.cond(can_fold, slab_folded, slab_generic, 0)
        else:
            c01, c23 = slab_generic(0)
        hk = (((c01 & 0xFFFF) > 0) & valid, ((c01 >> 16) > 0) & valid,
              ((c23 & 0xFFFF) > 0) & valid, ((c23 >> 16) > 0) & valid)

        items = []
        for k in range(4):
            kind = col[24 + k].astype(jnp.int32)
            a = col[28 + k].astype(jnp.int32)
            b = col[32 + k].astype(jnp.int32)
            is_leaf = hk[k] & (kind == 1)
            carry8 = lax.cond(is_leaf,
                              functools.partial(leaf_fn, a,
                                                (tag - 1).astype(
                                                    jnp.float32), rs),
                              lambda c: c, carry8)
            if stats:
                lp = lp + is_leaf.astype(jnp.int32)
            if ordered:
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
            else:
                key = jnp.float32(0.0)
            child_tag = jnp.where(kind == 3, b, tag)
            items.append((key, a + (child_tag << 20),
                          hk[k] & (kind >= 2)))
        return carry8, items, lp

    def sort4_desc(items):
        if not ordered:
            return items

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
        sp, it, lp, bt, bu, bv, bnx, bny, bnz, bpr, bin_ = carry
        carry8 = (bt, bu, bv, bnx, bny, bnz, bpr, bin_)
        entries = []
        for p in range(npop):
            has = sp >= (p + 1)
            e = stack_ref[jnp.maximum(sp - 1 - p, 0)]
            entries.append((e, has))
        sp = jnp.maximum(sp - npop, 0)

        all_items = []
        for e, has in entries:
            carry8, items, lp = process_node(e, has, carry8, lp)
            all_items = sort4_desc(items) + all_items

        sp_ref = sp
        cap = stack_ref.shape[0] - 1
        for key, a, push in all_items:
            @pl.when(push)
            def _():
                stack_ref[jnp.minimum(sp_ref, cap)] = a

            sp_ref = jnp.where(push, jnp.minimum(sp_ref + 1, cap), sp_ref)

        bt, bu, bv, bnx, bny, bnz, bpr, bin_ = carry8
        return (sp_ref, it + 1, lp, bt, bu, bv, bnx, bny, bnz, bpr, bin_)

    def cond(carry):
        return carry[0] > 0

    stack_ref[0] = 0
    zeros = jnp.zeros((TILE_S, TILE_L), jnp.float32)
    init = (jnp.int32(1), jnp.int32(0), jnp.int32(0), tmax0,
            zeros, zeros, zeros, zeros, zeros,
            jnp.full((TILE_S, TILE_L), -1.0, jnp.float32), zeros)
    (_, it, lp, bt, bu, bv, bnx, bny, bnz, bpr, bin_) = lax.while_loop(
        cond, body, init)

    t_ref[0] = bt
    u_ref[0] = bu
    v_ref[0] = bv
    n_ref[0, 0] = bnx
    n_ref[0, 1] = bny
    n_ref[0, 2] = bnz
    prim_ref[0] = bpr
    inst_ref[0] = bin_
    # (8,128)-aligned stats tile (Mosaic needs aligned output blocks):
    # row 0 = pops, row 1 = leaf visits; host reads [:, :, 0]
    stats_ref[0] = jnp.stack(
        [jnp.full((TILE_L,), it, jnp.int32),
         jnp.full((TILE_L,), lp, jnp.int32)] +
        [jnp.zeros((TILE_L,), jnp.int32)] * 6)


LEAF_BIT = 1 << 30       # stack entry: [30]=leaf [29:20]=tag [19:0]=addr


def _ls_kernel(nodes_ref, tris_ref, rays_ref, inv_ref,
               fold_ref, pre_ref, mids_ref,
               t_ref, u_ref, v_ref, n_ref, prim_ref, inst_ref,
               stats_ref, stack_ref, *, t_min, L, RW, TILE_S,
               stats: bool, smem_nodes: bool, ordered: bool, lean: bool):
    """Leaf-on-stack variant: every child (leaf or internal) is pushed as
    a tagged stack entry; a pop scalar-branches ONCE between a node visit
    (fetch + 4 box tests + packed reductions + ordered pushes) and a leaf
    visit (fetch + L triangle tests, no reductions, no pushes).  This
    removes the 4 sequential per-child lax.conds of the production kernel
    from every node visit — the round-3 latency suspect."""
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

    live = tmax0 >= 0.0
    big = jnp.float32(3e38)

    def mid(v):
        return (jnp.min(jnp.where(live, v, big))
                + jnp.max(jnp.where(live, v, -big))) * 0.5

    wm_ox, wm_oy, wm_oz = mid(wox), mid(woy), mid(woz)
    wm_dx, wm_dy, wm_dz = mid(wdx), mid(wdy), mid(wdz)

    def ray_state(tag):
        m = [inv_ref[tag, j] for j in range(12)]
        ox = wox * m[0] + woy * m[3] + woz * m[6] + m[9]
        oy = wox * m[1] + woy * m[4] + woz * m[7] + m[10]
        oz = wox * m[2] + woy * m[5] + woz * m[8] + m[11]
        dx = wdx * m[0] + wdy * m[3] + wdz * m[6]
        dy = wdx * m[1] + wdy * m[4] + wdz * m[7]
        dz = wdx * m[2] + wdy * m[5] + wdz * m[8]
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

    nothing = (jnp.float32(-1.0), jnp.int32(0), jnp.bool_(False))

    def leaf_visit(lf, tag, rs, carry8):
        bt, bu, bv, bnx, bny, bnz, bpr, bin_ = carry8
        inst_f = (tag - 1).astype(jnp.float32)
        ox, oy, oz, dx, dy, dz = rs[:6]
        colT = fetch(tris_ref, lf, RW)
        for j in range(L):
            o9 = 9 * j
            v0x, v0y, v0z = colT[o9 + 0], colT[o9 + 1], colT[o9 + 2]
            e1x, e1y, e1z = colT[o9 + 3], colT[o9 + 4], colT[o9 + 5]
            e2x, e2y, e2z = colT[o9 + 6], colT[o9 + 7], colT[o9 + 8]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = 1.0 / det
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
            bu = jnp.where(ok, u, bu)
            bv = jnp.where(ok, v, bv)
            if lean:
                bpr = jnp.where(ok, colT[9 * L + j], bpr)
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
        carry8 = (bt, bu, bv, bnx, bny, bnz, bpr, bin_)
        return carry8, [nothing] * 4

    def node_visit(idx, tag, rs, sm, carry8):
        ox, oy, oz = rs[0], rs[1], rs[2]
        ix, iy, iz = rs[6], rs[7], rs[8]
        s_ox, s_oy, s_oz, s_ix, s_iy, s_iz = sm
        bt = carry8[0]
        if smem_nodes:
            col = [nodes_ref[idx, r] for r in range(36)]
        else:
            colv = fetch(nodes_ref, idx, 36)
            col = [colv[r] for r in range(36)]

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
        hk = (((c01 & 0xFFFF) > 0), ((c01 >> 16) > 0),
              ((c23 & 0xFFFF) > 0), ((c23 >> 16) > 0))

        items = []
        for k in range(4):
            kind = col[24 + k].astype(jnp.int32)
            a = col[28 + k].astype(jnp.int32)
            b = col[32 + k].astype(jnp.int32)
            if ordered:
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
            else:
                key = jnp.float32(0.0)
            child_tag = jnp.where(kind == 3, b, tag)
            entry = (a + (child_tag << 20)
                     + jnp.where(kind == 1, LEAF_BIT, 0))
            items.append((key, entry, hk[k] & (kind >= 1)))
        return carry8, items

    def process(e, valid, carry8, it, lp):
        idx = e & 0xFFFFF
        tag = (e >> 20) & 0x3FF
        is_leaf = (e & LEAF_BIT) != 0
        rs, sm = ray_state(tag)
        carry8, items = lax.cond(
            valid & is_leaf,
            lambda c: leaf_visit(idx, tag, rs, c),
            lambda c: lax.cond(valid,
                               lambda c2: node_visit(idx, tag, rs, sm, c2),
                               lambda c2: (c2, [nothing] * 4), c),
            carry8)
        if stats:
            lp = lp + (valid & is_leaf).astype(jnp.int32)
            it = it + (valid & ~is_leaf).astype(jnp.int32)
        return carry8, items, it, lp

    def sort4_desc(items):
        if not ordered:
            return items

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
        sp, it, lp, bt, bu, bv, bnx, bny, bnz, bpr, bin_ = carry
        has2 = sp >= 2
        e1_ = stack_ref[sp - 1]
        e2_ = stack_ref[jnp.maximum(sp - 2, 0)]
        sp = jnp.where(has2, sp - 2, sp - 1)

        carry8 = (bt, bu, bv, bnx, bny, bnz, bpr, bin_)
        carry8, items1, it, lp = process(e1_, jnp.bool_(True), carry8,
                                         it, lp)
        carry8, items2, it, lp = process(e2_, has2, carry8, it, lp)

        sp_ref = sp
        cap = stack_ref.shape[0] - 1
        for key, a, push in sort4_desc(items2) + sort4_desc(items1):
            @pl.when(push)
            def _():
                stack_ref[jnp.minimum(sp_ref, cap)] = a

            sp_ref = jnp.where(push, jnp.minimum(sp_ref + 1, cap), sp_ref)

        bt, bu, bv, bnx, bny, bnz, bpr, bin_ = carry8
        return (sp_ref, it, lp, bt, bu, bv, bnx, bny, bnz, bpr, bin_)

    def cond(carry):
        return carry[0] > 0

    stack_ref[0] = 0
    zeros = jnp.zeros((TILE_S, TILE_L), jnp.float32)
    init = (jnp.int32(1), jnp.int32(0), jnp.int32(0), tmax0,
            zeros, zeros, zeros, zeros, zeros,
            jnp.full((TILE_S, TILE_L), -1.0, jnp.float32), zeros)
    (_, it, lp, bt, bu, bv, bnx, bny, bnz, bpr, bin_) = lax.while_loop(
        cond, body, init)

    t_ref[0] = bt
    u_ref[0] = bu
    v_ref[0] = bv
    n_ref[0, 0] = bnx
    n_ref[0, 1] = bny
    n_ref[0, 2] = bnz
    prim_ref[0] = bpr
    inst_ref[0] = bin_
    stats_ref[0] = jnp.stack(
        [jnp.full((TILE_L,), it, jnp.int32),
         jnp.full((TILE_L,), lp, jnp.int32)] +
        [jnp.zeros((TILE_L,), jnp.int32)] * 6)


def trace_tiles_lab(nodes, tris, inv_mats, ray_o, ray_d, t_min,
                    t_max, leaf_size: int, interpret: bool = False,
                    stack: int = 128, tile_s: int = 8,
                    stats: bool = False, smem_nodes: bool = False,
                    npop: int = 2, ordered: bool = True,
                    lean: bool = False, leaf_stack: bool = False,
                    recip: bool = False, fold: bool = False,
                    slim: bool = False, pre: bool = False,
                    sub: int = 0, noinst: bool = False):
    """Lab launcher mirroring ops/fused.trace_tiles_instanced, plus a
    (G, 2) int32 stats output (while-loop iterations, leaf visits per
    tile).  `nodes` must be the flat (Npad, 36) host-order array when
    smem_nodes=True (ops/scene_wide keeps it as (Nt, 36, 128) columns
    otherwise)."""
    if leaf_stack and pre:
        raise ValueError("leaf_stack + pre is not implemented: _ls_kernel "
                         "has no pre path and would silently time the "
                         "non-pre kernel")
    if sub and (not lean or slim or leaf_stack or leaf_size % sub):
        raise ValueError("sub requires lean, no slim/leaf_stack, and "
                         "leaf_size divisible by sub; pass tris from "
                         "sub_tris()")
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

    # per-(tile, tag) octant-fold flags [can_fold, sx, sy, sz]: the
    # tile's live rays share direction signs on all 3 axes in that tag's
    # object space (tag 0 = world).  One fused XLA pass, like the mids.
    tags = inv_mats.shape[0]
    if fold:
        live = rays[:, 6:7, :, :] >= 0.0                    # (G,1,S,L)
        d_t = rays[:, 3:6]                                  # (G,3,S,L)
        m = inv_mats.reshape(tags, 4, 3)                    # rows of inv
        # object dir per tag: od[g,tag,ax] = sum_j d[g,j] * m[tag,j,ax]
        od = jnp.einsum("gjsl,tja->gtasl", d_t, m[:, :3, :])
        big = jnp.float32(3e38)
        lo = jnp.min(jnp.where(live[:, None], od, big), axis=(3, 4))
        hi = jnp.max(jnp.where(live[:, None], od, -big), axis=(3, 4))
        any_live = jnp.any(live, axis=(1, 2, 3))[:, None, None]
        pos = lo >= 0.0
        uni = (pos | (hi < 0.0)) & any_live                 # (G,tags,3)
        can = jnp.all(uni, axis=-1, keepdims=True)
        fold_tbl = jnp.concatenate(
            [can, pos & can], axis=-1).astype(jnp.int32).reshape(
                G, tags * 4)
    else:
        fold_tbl = jnp.zeros((G, tags * 4), jnp.int32)

    # per-(tile, tag) precomputed object-space ray state: one fused XLA
    # pass builds [o | d | 1/d] for every tag (rows tag*9 .. tag*9+8)
    # plus the transformed mid-ray scalars (with reciprocals) in SMEM
    eps = jnp.float32(1e-20)

    def _safe_inv(v):
        return 1.0 / jnp.where(jnp.abs(v) < eps,
                               jnp.where(v >= 0, eps, -eps), v)

    if pre:
        m = inv_mats.reshape(tags, 4, 3)                    # rows of inv
        o3, d3 = rays[:, 0:3], rays[:, 3:6]                 # (G,3,S,L)
        oo = (jnp.einsum("gjsl,tja->gtasl", o3, m[:, :3])
              + m[:, 3][None, :, :, None, None])
        od = jnp.einsum("gjsl,tja->gtasl", d3, m[:, :3])
        prerays = jnp.concatenate([oo, od, _safe_inv(od)], axis=2
                                  ).reshape(G, tags * 9, tile_s, TILE_L)
        livep = rays[:, 6:7] >= 0.0                         # (G,1,S,L)
        big = jnp.float32(3e38)
        lo = jnp.min(jnp.where(livep, rays[:, :6], big), axis=(2, 3))
        hi = jnp.max(jnp.where(livep, rays[:, :6], -big), axis=(2, 3))
        wm = (lo + hi) * 0.5                                # (G,6)
        s_o = (jnp.einsum("gj,tja->gta", wm[:, 0:3], m[:, :3])
               + m[None, :, 3])
        s_i = _safe_inv(jnp.einsum("gj,tja->gta", wm[:, 3:6], m[:, :3]))
        mids_tbl = jnp.concatenate(
            [s_o, s_i, jnp.zeros((G, tags, 2), jnp.float32)],
            axis=-1).reshape(G, tags * 8)
    else:
        prerays = jnp.zeros((G, 1, tile_s, TILE_L), jnp.float32)
        mids_tbl = jnp.zeros((G, 8), jnp.float32)

    node_space = pltpu.SMEM if smem_nodes else pltpu.VMEM
    tile_spec = lambda: pl.BlockSpec((1, tile_s, TILE_L),
                                     lambda g: (g, 0, 0),
                                     memory_space=pltpu.VMEM)
    if leaf_stack:
        kern = functools.partial(_ls_kernel, t_min=float(t_min), L=L,
                                 RW=RW, TILE_S=tile_s, stats=stats,
                                 smem_nodes=smem_nodes, ordered=ordered,
                                 lean=lean)
    else:
        kern = functools.partial(_lab_kernel, t_min=float(t_min), L=L,
                                 RW=RW, TILE_S=tile_s, stats=stats,
                                 smem_nodes=smem_nodes, npop=npop,
                                 ordered=ordered, lean=lean,
                                 recip=recip, fold=fold, slim=slim,
                                 pre=pre, sub=sub, noinst=noinst)
    pre_rows = prerays.shape[1]
    t, u, v, nrm, prim_f, inst_f, st = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=node_space),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 7, tile_s, TILE_L),
                         lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, pre_rows, tile_s, TILE_L),
                         lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[tile_spec(), tile_spec(), tile_spec(),
                   pl.BlockSpec((1, 3, tile_s, TILE_L),
                                lambda g: (g, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   tile_spec(), tile_spec(),
                   pl.BlockSpec((1, 8, TILE_L), lambda g: (g, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((G, tile_s, TILE_L), jnp.float32),
            jax.ShapeDtypeStruct((G, tile_s, TILE_L), jnp.float32),
            jax.ShapeDtypeStruct((G, tile_s, TILE_L), jnp.float32),
            jax.ShapeDtypeStruct((G, 3, tile_s, TILE_L), jnp.float32),
            jax.ShapeDtypeStruct((G, tile_s, TILE_L), jnp.float32),
            jax.ShapeDtypeStruct((G, tile_s, TILE_L), jnp.float32),
            jax.ShapeDtypeStruct((G, 8, TILE_L), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((stack,), jnp.int32)],
        interpret=interpret,
    )(nodes, tris, rays, inv_mats, fold_tbl, prerays, mids_tbl)

    def fl(x):
        return x.reshape(G * TILE)[:R]

    nrm = nrm.transpose(0, 2, 3, 1).reshape(G * TILE, 3)[:R]
    prim_f = fl(prim_f)
    hit = prim_f >= 0.0
    prim = jnp.where(hit, prim_f.astype(jnp.int32), -1)
    inst = jnp.where(hit, fl(inst_f).astype(jnp.int32), -1)
    return fl(t), fl(u), fl(v), nrm, prim, inst, st


def nodes_flat_for_smem(sw):
    """Rebuild the flat (Npad, 36) row-major node table from a refit
    SceneWideBVH's column layout (inverse of the reshape in
    ops/scene_wide.refit_scene_wide)."""
    return sw.nodes.transpose(0, 2, 1).reshape(-1, 36)


def lean_tris(sw):
    """Strip the 9L normal rows from scene_wide leaf columns:
    (Lt, 19L, 128) -> (Lt, 10L, 128) [geom 9L | prim L]."""
    L = int(sw.leaf_size)
    return jnp.concatenate(
        [sw.tris[:, :9 * L], sw.tris[:, 18 * L:19 * L]], axis=1)


def sub_tris(sw, nq: int = 4):
    """Hierarchical-leaf stream for the `sub` variant: [geom 9L |
    sub-AABBs 6*nq] columns, where sub-box q bounds the leaf's stream
    slots [q*L/nq, (q+1)*L/nq).  Pad slots carry NaN vertices; an
    all-pad chunk gets a NaN box, which fails every slab comparison in
    the kernel the same way pad triangles fail Möller–Trumbore."""
    import numpy as np

    L = int(sw.leaf_size)
    tris = np.asarray(sw.tris)               # (Lt, 19L, 128) fat columns
    geom = tris[:, :9 * L]
    Lt = geom.shape[0]
    g = geom.reshape(Lt, L, 9, 128)
    v0 = g[:, :, 0:3]
    verts = np.stack([v0, v0 + g[:, :, 3:6], v0 + g[:, :, 6:9]],
                     axis=2)                 # (Lt, L, 3, 3, 128)
    Lq = L // nq
    vq = verts.reshape(Lt, nq, Lq * 3, 3, 128)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN chunks
        lo = np.nanmin(vq, axis=2)           # (Lt, nq, 3, 128)
        hi = np.nanmax(vq, axis=2)
    boxes = np.concatenate([lo, hi], axis=2)  # (Lt, nq, 6, 128)
    boxes = boxes.reshape(Lt, 6 * nq, 128).astype(np.float32)
    return jnp.concatenate([jnp.asarray(geom), jnp.asarray(boxes)], axis=1)
