"""MXU-leaf instanced traversal: the leaf intersection test as a matmul.

Round-3 pricing (scripts/kbench.py, /tmp/pb2.log) showed the fused
kernel's cost is per-VISIT latency, not ray throughput: each leaf visit
fetches a (9L, 128) column via a 128-lane masked reduce and then issues
9L vector->scalar extracts to broadcast triangle constants — the
extracts serialize on the scalar unit and dominate the ~2 us/visit.

This variant removes BOTH, the TPU-native way: Möller–Trumbore's
det / u_num / v_num / t_num are all LINEAR in the 10-dim per-ray feature
vector

    f = [o, d, c = o x d, 1]

(scalar triple-product identities:
    det   = d . (e2 x e1)
    u_num = c . e2        - d . (e2 x v0)
    v_num = -c . e1       + d . (e1 x v0)
    t_num = o . n - v0 . n,          n = e1 x e2
verified to 1e-14 against classic MT).  So a whole leaf of L triangles
becomes ONE static (16, 4L) coefficient block and the entire
tile-vs-leaf test is a single MXU `dot_general` per ray sublane-row:

    out[4L, 128] = C[feat, out]^T-contract f_s[feat, 128]

followed by ~15 (L, 128) vector ops (reciprocal, bounds tests, sublane
min-reduce for the winner).  Zero masked reduces, zero lane extracts.
L = 32 makes the block exactly (16, 128) — two native (8, 128) tiles,
no padding.

Node processing, two-pop ordered descent, instance tags, and the lean
output contract (t, u, v, stream-slot, inst) are identical to
ops/fused.py:_instanced_kernel.  Reference semantics: DispatchRays
closest-hit over a TLAS (XUSGRayTracing.h:306-341).

MEASURED VERDICT (scripts/kbench.py, bunny@720p, real v5e): LOSES.
mxu32 primary 41.6 ms / reflection 34.4 ms vs the production lean+L16
kernel's 8.0 / 17.0.  Root cause: the MXU is EMIT-rate-bound here — each
leaf needs a (4L x 1024) result with contraction depth only 10, so MXU
time scales with output size (~3 bf16 passes x 128 rows per sublane-row
= ~3000 cycles/leaf) while the VPU broadcast form computes the same
65k results in ~720 fused (8, 128) ops.  Matmul leaf tests only pay when
K is deep; MT's K=10 is not.  Kept as a priced negative result; output
parity with ops/fused.py is exact (same hit set, t within 1e-5 — the
numerical form differs only by the triple-product rearrangement).
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


def mxu_stream(sw):
    """Build the (NL, 16, 128) leaf coefficient stream from a lean
    SceneWideBVH (ops/scene_wide.build_scene_wide(..., lean=True)).
    Requires 4 * leaf_size <= 128; leaf_size=32 fills the block exactly.
    Lane layout per leaf: [det x L | u x L | v x L | t x L]; feature rows
    0..9 = [o, d, o x d, 1] coefficients, rows 10..15 zero.

    Padding slots inherit v0 = NaN from the lean stream, so their
    u/v/t coefficients are NaN and every comparison fails in-kernel."""
    L = int(sw.leaf_size)
    assert 4 * L <= 128, "coefficient block needs 4L lanes <= 128"
    tris = np.asarray(sw.tris)                   # (Lt, 9L, 128)
    lt = tris.shape[0]
    g = tris.transpose(0, 2, 1).reshape(lt * 128, L, 9)
    v0, e1, e2 = g[..., 0:3], g[..., 3:6], g[..., 6:9]
    n = np.cross(e1, e2)

    C = np.zeros((lt * 128, 16, 128), np.float32)

    def put(rows, grp, val):                     # val: (NL, L, 3) | (NL, L)
        if val.ndim == 3:
            C[:, rows:rows + 3, grp * L:(grp + 1) * L] = \
                val.transpose(0, 2, 1)
        else:
            C[:, rows, grp * L:(grp + 1) * L] = val

    put(3, 0, np.cross(e2, e1))                  # det  <- d
    put(6, 1, e2)                                # u    <- c
    put(3, 1, -np.cross(e2, v0))                 # u    <- d
    put(6, 2, -e1)                               # v    <- c
    put(3, 2, np.cross(e1, v0))                  # v    <- d
    put(0, 3, n)                                 # t    <- o
    put(9, 3, -(v0 * n).sum(-1))                 # t    <- 1
    return jnp.asarray(C)


def _mxu_kernel(nodes_ref, tris_ref, rays_ref, inv_ref,
                t_ref, u_ref, v_ref, prim_ref, inst_ref, stack_ref,
                *, t_min, L, TILE_S):
    """Instanced two-pop kernel with the MXU leaf test.  Layout contracts
    match ops/fused.py:_instanced_kernel except tris_ref, which is the
    (NL, 16, 128) coefficient stream from mxu_stream."""
    wox, woy, woz = rays_ref[0, 0], rays_ref[0, 1], rays_ref[0, 2]
    wdx, wdy, wdz = rays_ref[0, 3], rays_ref[0, 4], rays_ref[0, 5]
    tmax0 = rays_ref[0, 6]

    eps = jnp.float32(1e-20)
    big = jnp.float32(3e38)

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < eps,
                               jnp.where(d >= 0, eps, -eps), d)

    def fetch(ref, idx, rows):
        tile = ref[idx >> 7]
        lanes = lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        return jnp.sum(jnp.where(lanes == (idx & 127), tile, 0.0), axis=1)

    live = tmax0 >= 0.0

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

    def leaf_fn(lf, inst_f, rs, carry):
        bt, bu, bv, bpr, bin_ = carry
        ox, oy, oz, dx, dy, dz = rs[:6]
        cx = oy * dz - oz * dy
        cy = oz * dx - ox * dz
        cz = ox * dy - oy * dx
        ones = jnp.ones_like(ox)
        Cb = tris_ref[lf]                        # (16, 128)
        base = (lf * L).astype(jnp.float32)
        kio = lax.broadcasted_iota(jnp.int32, (L, TILE_L), 0)

        rows = ([], [], [], [], [])
        for s in range(TILE_S):
            F = jnp.concatenate(
                [x[s:s + 1] for x in (ox, oy, oz, dx, dy, dz,
                                      cx, cy, cz, ones)], axis=0)
            out = lax.dot_general(
                Cb[0:10], F, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (128 out, 128 ray)
            det = out[0 * L:1 * L]
            rcp = 1.0 / det
            u = out[1 * L:2 * L] * rcp
            v = out[2 * L:3 * L] * rcp
            t = out[3 * L:4 * L] * rcp
            btr = bt[s:s + 1]
            ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (t >= t_min) & (t <= btr))
            tsel = jnp.where(ok, t, big)
            tmin = jnp.min(tsel, axis=0, keepdims=True)      # (1, 128)
            hitk = ok & (tsel == tmin)
            ksel = jnp.min(jnp.where(hitk, kio, 127), axis=0,
                           keepdims=True)
            onek = kio == ksel
            uw = jnp.sum(jnp.where(onek, u, 0.0), axis=0, keepdims=True)
            vw = jnp.sum(jnp.where(onek, v, 0.0), axis=0, keepdims=True)
            upd = tmin < big
            rows[0].append(jnp.where(upd, tmin, btr))
            rows[1].append(jnp.where(upd, uw, bu[s:s + 1]))
            rows[2].append(jnp.where(upd, vw, bv[s:s + 1]))
            rows[3].append(jnp.where(upd, base + ksel.astype(jnp.float32),
                                     bpr[s:s + 1]))
            rows[4].append(jnp.where(upd, inst_f, bin_[s:s + 1]))
        return tuple(jnp.concatenate(r, axis=0) for r in rows)

    def process_node(entry, valid, carry5):
        idx = entry & 0xFFFFF
        tag = entry >> 20
        rs, sm = ray_state(tag)
        ox, oy, oz = rs[0], rs[1], rs[2]
        ix, iy, iz = rs[6], rs[7], rs[8]
        s_ox, s_oy, s_oz, s_ix, s_iy, s_iz = sm
        bt = carry5[0]
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
            carry5 = lax.cond(hk[k] & (kind == 1),
                              functools.partial(leaf_fn, a,
                                                (tag - 1).astype(
                                                    jnp.float32), rs),
                              lambda c: c, carry5)
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
            child_tag = jnp.where(kind == 3, b, tag)
            items.append((key, a + (child_tag << 20),
                          hk[k] & (kind >= 2)))
        return carry5, items

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
        carry5 = carry[1:]
        has2 = sp >= 2
        e1_ = stack_ref[sp - 1]
        e2_ = stack_ref[jnp.maximum(sp - 2, 0)]
        sp = jnp.where(has2, sp - 2, sp - 1)

        carry5, items1 = process_node(e1_, jnp.bool_(True), carry5)
        carry5, items2 = process_node(e2_, has2, carry5)
        sp_ref = sp
        cap = stack_ref.shape[0] - 1
        for key, a, push in sort4_desc(items2) + sort4_desc(items1):
            @pl.when(push)
            def _():
                stack_ref[jnp.minimum(sp_ref, cap)] = a

            sp_ref = jnp.where(push, jnp.minimum(sp_ref + 1, cap),
                               sp_ref)

        return (sp_ref,) + tuple(carry5)

    def cond(carry):
        return carry[0] > 0

    stack_ref[0] = 0
    zeros = jnp.zeros((TILE_S, TILE_L), jnp.float32)
    miss = jnp.full((TILE_S, TILE_L), -1.0, jnp.float32)
    init = (jnp.int32(1), tmax0, zeros, zeros, miss, zeros)
    (_, bt, bu, bv, bpr, bin_) = lax.while_loop(cond, body, init)

    t_ref[0] = bt
    u_ref[0] = bu
    v_ref[0] = bv
    prim_ref[0] = bpr
    inst_ref[0] = bin_


def trace_tiles_mxu(nodes, tris_mxu, inv_mats, ray_o, ray_d, t_min,
                    t_max, leaf_size: int, interpret: bool = False,
                    stack: int = 128, tile_s: int = 8):
    """Launch the MXU-leaf instanced kernel over (R, 3) WORLD-space rays.
    Same contract as ops/fused.trace_tiles_instanced(lean=True): returns
    flat (t, u, v, sidx, inst) with sidx the winner's leaf-stream slot
    (leaf * L + k; -1 on miss)."""
    L = leaf_size
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

    tile_spec = lambda: pl.BlockSpec((1, tile_s, TILE_L),
                                     lambda g: (g, 0, 0),
                                     memory_space=pltpu.VMEM)
    scalar_shape = jax.ShapeDtypeStruct((G, tile_s, TILE_L), jnp.float32)

    outs = pl.pallas_call(
        functools.partial(_mxu_kernel, t_min=float(t_min), L=L,
                          TILE_S=tile_s),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 7, tile_s, TILE_L),
                         lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[tile_spec() for _ in range(5)],
        out_shape=[scalar_shape for _ in range(5)],
        scratch_shapes=[pltpu.SMEM((stack,), jnp.int32)],
        interpret=interpret,
    )(nodes, tris_mxu, rays, inv_mats)

    def fl(x):
        return x.reshape(G * TILE)[:R]

    t, u, v, prim_f, inst_f = outs
    prim_f = fl(prim_f)
    hit = prim_f >= 0.0
    sidx = jnp.where(hit, prim_f.astype(jnp.int32), -1)
    inst = jnp.where(hit, fl(inst_f).astype(jnp.int32), -1)
    return fl(t), fl(u), fl(v), sidx, inst
