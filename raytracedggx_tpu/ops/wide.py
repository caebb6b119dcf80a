"""4-wide BVH flattening + Pallas packet traversal ("pallas4" backend).

Motivation (docs/PERF.md lever #2): the binary packet kernel pays one
scalar node fetch + one tile-wide any() reduction PER NODE.  Collapsing the
radix tree into 4-wide supernodes tests 4 sibling AABBs per fetch, so the
fetch/reduction overhead amortizes over ~4x the pruning work.  Traversal
uses a small per-tile scalar stack (SMEM scratch) instead of skip links.

Supernode record, lane-tiled like flatten.py — (Nt, 36, 128) f32:
  rows 0..23   4 children x (lo.xyz, hi.xyz)
  rows 24..27  child kind: 0 empty, 1 leaf, 2 internal
  rows 28..31  per child: supernode index (internal) / tri_start (leaf)
  rows 32..35  per child: tri_count (leaf) / 0
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..trace.traverse import HitRecord

TILE_S, TILE_L = 8, 128
TILE = TILE_S * TILE_L
STACK = 64


class WideBVH(NamedTuple):
    nodes: jnp.ndarray     # (Nt, 36, 128) float32
    tris: jnp.ndarray      # (Tt, 9, 128) float32
    tri_perm: jnp.ndarray  # (T,) int32
    num_nodes: int


def build_records4(bvh, leaf_size: int = 4):
    """Collapse a binary LBVH into 4-wide supernode topology records
    (host side, geometry-independent).  Returns (records, tri_stream):
    records[i] = list of child dicts {kind, lo, hi, a, b}; tri_stream =
    stream position -> original triangle id.  Every child (leaf or
    internal subtree) covers a CONTIGUOUS tri_stream range — the property
    the device refit's range-min/max queries rely on."""
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    amin = np.asarray(bvh.aabb_min)
    amax = np.asarray(bvh.aabb_max)
    leaf_tri = np.asarray(bvh.leaf_tri)
    n = len(leaf_tri)
    n_int = n - 1

    counts = np.ones(2 * n - 1, np.int64)
    for _ in range(64):
        new = counts[left] + counts[right]
        if np.array_equal(new, counts[:n_int]):
            break
        counts[:n_int] = new

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
        """Binary node -> up to 4 subtree roots (children/grandchildren)."""
        kids = [left[node], right[node]]
        while len(kids) < 4:
            # split the expandable child with the largest subtree
            best, best_c = -1, leaf_size
            for i, k in enumerate(kids):
                if k < n_int and counts[k] > best_c:
                    best, best_c = i, counts[k]
            if best < 0:
                break
            k = kids.pop(best)
            kids[best:best] = [left[k], right[k]]
        return kids

    records = []   # per supernode: list of child dicts
    tri_stream = []

    def emit(node):
        """Emit the supernode for binary `node`; returns its index."""
        idx = len(records)
        records.append(None)
        kids = expand4(node)
        childs = []
        for k in kids:
            if k >= n_int or counts[k] <= leaf_size:
                tris = leaves_of(k)
                childs.append(dict(kind=1, lo=amin[k], hi=amax[k],
                                   a=len(tri_stream), b=len(tris)))
                tri_stream.extend(tris)
            else:
                childs.append(dict(kind=2, lo=amin[k], hi=amax[k],
                                   a=None, b=0, node=k))
        records[idx] = childs
        for c in childs:
            if c["kind"] == 2:
                c["a"] = emit(c["node"])
        return idx

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(10 ** 5)
    try:
        if n == 1 or counts[0] <= leaf_size:
            tris = leaves_of(0 if n > 1 else n_int)
            records.append([dict(kind=1, lo=amin[0], hi=amax[0],
                                 a=0, b=len(tris))])
            tri_stream.extend(tris)
        else:
            emit(0)
    finally:
        sys.setrecursionlimit(old)
    return records, tri_stream


def flatten_bvh4(bvh, tri_v0, tri_e1, tri_e2, leaf_size: int = 4) -> WideBVH:
    records, tri_stream = build_records4(bvh, leaf_size)
    N = len(records)
    arr = np.zeros((N, 36), np.float32)
    arr[:, 0:24:6] = np.inf       # default empty boxes: lo=+inf
    for i, childs in enumerate(records):
        for k, c in enumerate(childs):
            arr[i, k * 6:k * 6 + 3] = c["lo"]
            arr[i, k * 6 + 3:k * 6 + 6] = c["hi"]
            arr[i, 24 + k] = c["kind"]
            arr[i, 28 + k] = c["a"]
            arr[i, 32 + k] = c["b"]
        for k in range(len(childs), 4):
            arr[i, k * 6:k * 6 + 3] = np.inf
            arr[i, k * 6 + 3:k * 6 + 6] = -np.inf

    perm = np.asarray(tri_stream, np.int64)
    v0 = np.asarray(tri_v0)[perm]
    e1 = np.asarray(tri_e1)[perm]
    e2 = np.asarray(tri_e2)[perm]
    tris = np.concatenate([v0, e1, e2], axis=1).astype(np.float32)

    def lane_tile(a, pad):
        rows, cols = a.shape
        pr = -(-rows // 128) * 128
        out = np.full((pr, cols), pad, a.dtype)
        out[:rows] = a
        return out.reshape(-1, 128, cols).transpose(0, 2, 1).copy()

    return WideBVH(nodes=jnp.asarray(lane_tile(arr, 0.0)),
                   tris=jnp.asarray(lane_tile(tris, 0.0)),
                   tri_perm=jnp.asarray(perm, jnp.int32),
                   num_nodes=N)


def _kernel(nodes_ref, tris_ref, rays_ref, t_ref, u_ref, v_ref, prim_ref,
            stack_ref, *, t_min):
    ox, oy, oz = rays_ref[0, 0], rays_ref[0, 1], rays_ref[0, 2]
    dx, dy, dz = rays_ref[0, 3], rays_ref[0, 4], rays_ref[0, 5]
    tmax0 = rays_ref[0, 6]

    eps = jnp.float32(1e-20)

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < eps,
                               jnp.where(d >= 0, eps, -eps), d)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    def fetch(ref, idx, rows):
        tile = ref[idx >> 7]
        lanes = lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        return jnp.sum(jnp.where(lanes == (idx & 127), tile, 0.0), axis=1)

    def mt(k, c, tstart):
        bt, bu, bv, bp = c
        ti = tstart + k
        tr = fetch(tris_ref, ti, 9)
        px = dy * tr[8] - dz * tr[7]
        py = dz * tr[6] - dx * tr[8]
        pz = dx * tr[7] - dy * tr[6]
        det = tr[3] * px + tr[4] * py + tr[5] * pz
        inv_det = 1.0 / det
        tx, ty, tz = ox - tr[0], oy - tr[1], oz - tr[2]
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * tr[5] - tz * tr[4]
        qy = tz * tr[3] - tx * tr[5]
        qz = tx * tr[4] - ty * tr[3]
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (tr[6] * qx + tr[7] * qy + tr[8] * qz) * inv_det
        ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t >= t_min) & (t <= bt))
        return (jnp.where(ok, t, bt), jnp.where(ok, u, bu),
                jnp.where(ok, v, bv), jnp.where(ok, ti, bp))

    def body(carry):
        sp, bt, bu, bv, bp = carry
        sp = sp - 1
        i = stack_ref[sp]
        col = fetch(nodes_ref, i, 36)          # (36,)

        def child(k, c):
            sp, bt, bu, bv, bp = c
            kind = col[24 + k].astype(jnp.int32)
            a = col[28 + k].astype(jnp.int32)
            b = col[32 + k].astype(jnp.int32)
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
            anyhit = jnp.any((tn <= tf) & (tf >= t_min) & (tn <= bt))

            def leaf(c):
                return lax.fori_loop(
                    0, b, functools.partial(mt, tstart=a), c)

            hit_leaf = anyhit & (kind == 1)
            bt, bu, bv, bp = lax.cond(hit_leaf, leaf, lambda c: c,
                                      (bt, bu, bv, bp))
            push = anyhit & (kind == 2)

            @pl.when(push)
            def _():
                stack_ref[sp] = a

            sp = jnp.where(push, sp + 1, sp)
            return sp, bt, bu, bv, bp

        # children pushed in order 3..0 so child 0 pops first
        for k in (3, 2, 1, 0):
            sp, bt, bu, bv, bp = child(k, (sp, bt, bu, bv, bp))
        return sp, bt, bu, bv, bp

    def cond(carry):
        return carry[0] > 0

    stack_ref[0] = 0
    init = (jnp.int32(1),
            tmax0,
            jnp.zeros((TILE_S, TILE_L), jnp.float32),
            jnp.zeros((TILE_S, TILE_L), jnp.float32),
            jnp.full((TILE_S, TILE_L), -1, jnp.int32))
    _, bt, bu, bv, bp = lax.while_loop(cond, body, init)

    t_ref[0] = bt
    u_ref[0] = bu
    v_ref[0] = bv
    prim_ref[0] = bp


def trace_tiles4(nodes, tris, ray_o, ray_d, t_min, t_max,
                 interpret: bool = False, stack: int = STACK):
    """Launch the 4-wide packet kernel over (R, 3) rays against a
    lane-tiled supernode/tri stream.  Returns flat (t, u, v, stream_pos)
    with stream_pos = -1 for misses — callers map stream positions to
    prim/instance ids."""
    R = ray_o.shape[0]
    G = max(1, -(-R // TILE))
    pad = G * TILE - R

    def to_tiles(x):
        x = jnp.pad(x, ((0, pad), (0, 0)))
        return x.reshape(G, TILE_S, TILE_L, 3).transpose(0, 3, 1, 2)

    tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    tmax_t = jnp.pad(tmax_arr, (0, pad), constant_values=-1.0
                     ).reshape(G, 1, TILE_S, TILE_L)
    rays = jnp.concatenate([to_tiles(ray_o), to_tiles(ray_d), tmax_t],
                           axis=1)

    tile_spec = lambda: pl.BlockSpec((1, TILE_S, TILE_L),
                                     lambda g: (g, 0, 0),
                                     memory_space=pltpu.VMEM)
    t, u, v, prim = pl.pallas_call(
        functools.partial(_kernel, t_min=float(t_min)),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 7, TILE_S, TILE_L),
                         lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[tile_spec()] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((G, TILE_S, TILE_L), jnp.float32),
            jax.ShapeDtypeStruct((G, TILE_S, TILE_L), jnp.float32),
            jax.ShapeDtypeStruct((G, TILE_S, TILE_L), jnp.float32),
            jax.ShapeDtypeStruct((G, TILE_S, TILE_L), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((stack,), jnp.int32)],
        interpret=interpret,
    )(nodes, tris, rays)

    def fl(x):
        return x.reshape(G * TILE)[:R]

    return fl(t), fl(u), fl(v), fl(prim)


def trace_rays_pallas4(wide: WideBVH, ray_o, ray_d, t_min, t_max,
                       interpret: bool = False) -> HitRecord:
    t, u, v, ps = trace_tiles4(wide.nodes, wide.tris, ray_o, ray_d,
                               t_min, t_max, interpret=interpret)
    hit = ps >= 0
    prim_orig = jnp.where(hit, wide.tri_perm[jnp.clip(ps, 0, None)], -1)
    return HitRecord(t=t, prim=prim_orig.astype(jnp.int32), u=u, v=v,
                     hit=hit, inst=jnp.where(hit, 0, -1).astype(jnp.int32))


def trace_scene_pallas4(wides, tlas, ray_o, ray_d, t_min, t_max,
                        interpret: bool = False) -> HitRecord:
    """Closest hit across TLAS instances with the 4-wide kernel (mirrors
    traverse_pallas.trace_scene_pallas)."""
    best = None
    for i, mesh_id in enumerate(tlas.mesh_ids):
        inv_w = tlas.inv_worlds[i]
        o = ray_o @ inv_w[:3, :3] + inv_w[3, :3]
        d = ray_d @ inv_w[:3, :3]
        tm = t_max if best is None else best.t
        rec = trace_rays_pallas4(wides[mesh_id], o, d, t_min, tm,
                                 interpret=interpret)
        rec = rec._replace(inst=jnp.where(rec.hit, i, -1).astype(jnp.int32))
        if best is None:
            best = rec
        else:
            closer = rec.hit & (rec.t < best.t)
            best = HitRecord(
                t=jnp.where(closer, rec.t, best.t),
                prim=jnp.where(closer, rec.prim, best.prim),
                u=jnp.where(closer, rec.u, best.u),
                v=jnp.where(closer, rec.v, best.v),
                hit=best.hit | rec.hit,
                inst=jnp.where(closer, rec.inst, best.inst),
            )
    return best
