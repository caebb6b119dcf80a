"""Flatten an LBVH into the stream layout the Pallas kernel traverses.

TPU has no efficient per-lane gather, so per-ray pointer chasing is out.
The Pallas kernel instead runs *packet traversal*: a whole tile of rays
walks the tree together in depth-first order with skip links —

  node hit by ANY ray in the tile ? advance to node+1 (its first child)
                                  : jump to skip[node] (past the subtree)

All per-node data is read as scalars and broadcast across the ray tile
(VPU-friendly; zero gathers).  Subtrees with <= leaf_size triangles are
collapsed into multi-triangle leaves; triangles are re-ordered so every
leaf is a contiguous [tri_start, tri_count) range of the streamed
triangle array.

Layout: the kernel fetches one node per step with a one-hot lane
reduction (Mosaic only allows 128-aligned dynamic lane indices), so
streams are stored lane-tiled; node fields INCLUDING the int links are
fused into one f32 tile so a visit costs a single load + reduction:
  nodes  (ceil(N/128), 9, 128) f32: node i -> [i//128,
           (lo.xyz, hi.xyz, skip, tri_start, tri_count), i%128]
  tris   (ceil(T/128), 9, 128) f32: rows v0, e1, e2, leaf-stream order
Padding nodes have empty AABBs (+inf/-inf) and skip = N.  `tri_perm`
maps stream position -> original triangle id (for prim ids / attributes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class FlatBVH(NamedTuple):
    nodes: jnp.ndarray     # (Nt, 9, 128) float32: lo.xyz, hi.xyz, skip,
                           #   tri_start, tri_count (ints stored exactly
                           #   as f32 — counts < 2^24)
    tris: jnp.ndarray      # (Tt, 9, 128) float32
    tri_perm: jnp.ndarray  # (T,) int32 stream -> original triangle id
    num_nodes: int         # true node count (pre-padding)
    # refit support (refit_flat_bvh): every DFS node covers a contiguous
    # triangle-stream range; its AABB is a range min/max over per-triangle
    # AABBs answered by two power-of-two sparse-table windows whose
    # (level, starts) are precomputed here
    refit_level: jnp.ndarray = None  # (N,) int32
    refit_a: jnp.ndarray = None      # (N,) int32
    refit_b: jnp.ndarray = None      # (N,) int32
    links: jnp.ndarray = None        # (Npad, 3) f32 static skip/start/count


def flatten_bvh(bvh, tri_v0, tri_e1, tri_e2, leaf_size: int = 4) -> FlatBVH:
    """bvh: LBVH (device or host); tri data in ORIGINAL triangle order."""
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    amin = np.asarray(bvh.aabb_min)
    amax = np.asarray(bvh.aabb_max)
    leaf_tri = np.asarray(bvh.leaf_tri)
    n = len(leaf_tri)
    n_int = n - 1

    # leaf count of each subtree (Karras internal nodes cover contiguous
    # ranges; count via post-order accumulation)
    counts = np.ones(2 * n - 1, np.int64)
    # iterate until stable (height <= 64)
    for _ in range(64):
        new = counts[left] + counts[right]
        if np.array_equal(new, counts[:n_int]):
            break
        counts[:n_int] = new

    # DFS with subtree collapse
    nodes = []
    meta = []
    tri_stream = []

    def leaves_of(node):
        """Collect leaf triangle ids of a subtree (iterative)."""
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

    ranges = []

    def emit(node):
        idx = len(nodes)
        nodes.append((amin[node], amax[node]))
        meta.append([0, 0, 0, 0])
        ranges.append([len(tri_stream), 0])
        is_leaf = node >= n_int
        if is_leaf or counts[node] <= leaf_size:
            tris = leaves_of(node)
            meta[idx][1] = len(tri_stream)
            meta[idx][2] = len(tris)
            tri_stream.extend(tris)
        else:
            emit(left[node])
            emit(right[node])
        meta[idx][0] = len(nodes)
        ranges[idx][1] = len(tri_stream)
        return idx

    # recursion depth == tree height <= 64, but leave headroom
    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(10 ** 5)
    try:
        root = 0 if n > 1 else n_int
        emit(root)
    finally:
        sys.setrecursionlimit(old)

    N = len(nodes)
    # skip[i] = index after i's subtree; emit recorded len(nodes) AFTER the
    # subtree was emitted, which is exactly that.
    meta_arr = np.asarray(meta, np.int32)
    node_arr = np.zeros((N, 9), np.float32)
    for i, (lo, hi) in enumerate(nodes):
        node_arr[i, :3] = lo
        node_arr[i, 3:6] = hi
    node_arr[:, 6] = meta_arr[:, 0].astype(np.float32)   # skip
    node_arr[:, 7] = meta_arr[:, 1].astype(np.float32)   # tri_start
    node_arr[:, 8] = meta_arr[:, 2].astype(np.float32)   # tri_count

    perm = np.asarray(tri_stream, np.int64)
    v0 = np.asarray(tri_v0)[perm]
    e1 = np.asarray(tri_e1)[perm]
    e2 = np.asarray(tri_e2)[perm]
    tris = np.concatenate([v0, e1, e2], axis=1).astype(np.float32)

    def lane_tile(arr, pad_value):
        rows, cols = arr.shape
        padded_rows = -(-rows // 128) * 128
        out = np.full((padded_rows, cols), pad_value, arr.dtype)
        out[:rows] = arr
        # (rows, cols) -> (tiles, cols, 128)
        return out.reshape(-1, 128, cols).transpose(0, 2, 1).copy()

    # padding nodes: empty AABB (never hit), skip = N (terminates)
    n_pad_rows = (-(-N // 128)) * 128 - N
    if n_pad_rows:
        node_pad = np.zeros((n_pad_rows, 9), np.float32)
        node_pad[:, :3] = np.inf
        node_pad[:, 3:6] = -np.inf
        node_pad[:, 6] = N
        node_arr = np.concatenate([node_arr, node_pad])

    # refit metadata: per-node RMQ windows over the triangle stream
    rng_arr = np.asarray(ranges, np.int64)
    length = np.maximum(rng_arr[:, 1] - rng_arr[:, 0], 1)
    level = np.floor(np.log2(length)).astype(np.int32)
    refit_a = rng_arr[:, 0].astype(np.int32)
    refit_b = (rng_arr[:, 1] - (1 << level.astype(np.int64))
               ).astype(np.int32)

    return FlatBVH(nodes=jnp.asarray(lane_tile(node_arr, 0.0)),
                   tris=jnp.asarray(lane_tile(tris, 0.0)),
                   tri_perm=jnp.asarray(perm, jnp.int32),
                   num_nodes=N,
                   refit_level=jnp.asarray(level),
                   refit_a=jnp.asarray(refit_a),
                   refit_b=jnp.asarray(refit_b),
                   links=jnp.asarray(node_arr[:, 6:9]))


def refit_flat_bvh(flat: FlatBVH, positions, indices) -> FlatBVH:
    """Refit the flattened BVH for deformed vertices (topology unchanged) —
    the DXR BLAS-update analog for the Pallas traversal path.  Fully
    vectorized: per-triangle AABBs in stream order, a log2(T) sparse
    min/max table, two-window range queries per node, then repack the
    lane-tiled node/tri streams."""
    tri = jnp.asarray(indices, jnp.int32).reshape(-1, 3)
    pos = jnp.asarray(positions, jnp.float32)
    v = pos[tri][flat.tri_perm]                  # (T, 3, 3) stream order
    t_lo = v.min(axis=1)
    t_hi = v.max(axis=1)
    T = t_lo.shape[0]

    # sparse tables
    max_level = int(np.floor(np.log2(max(T, 1)))) if T > 1 else 0
    lo_tabs = [t_lo]
    hi_tabs = [t_hi]
    for k in range(1, max_level + 1):
        half = 1 << (k - 1)
        prev_lo, prev_hi = lo_tabs[-1], hi_tabs[-1]
        n_k = T - (1 << k) + 1
        if n_k <= 0:
            break
        lo_tabs.append(jnp.minimum(prev_lo[:n_k], prev_lo[half:half + n_k]))
        hi_tabs.append(jnp.maximum(prev_hi[:n_k], prev_hi[half:half + n_k]))

    N = flat.num_nodes
    lo = jnp.zeros((N, 3), jnp.float32)
    hi = jnp.zeros((N, 3), jnp.float32)
    for k in range(len(lo_tabs)):
        sel = flat.refit_level == k
        a = jnp.clip(flat.refit_a, 0, lo_tabs[k].shape[0] - 1)
        b = jnp.clip(flat.refit_b, 0, lo_tabs[k].shape[0] - 1)
        lo = jnp.where(sel[:, None],
                       jnp.minimum(lo_tabs[k][a], lo_tabs[k][b]), lo)
        hi = jnp.where(sel[:, None],
                       jnp.maximum(hi_tabs[k][a], hi_tabs[k][b]), hi)

    # repack node stream (pad rows keep their never-hit boxes)
    n_pad = flat.links.shape[0]
    pad_lo = jnp.full((n_pad - N, 3), jnp.inf, jnp.float32)
    pad_hi = jnp.full((n_pad - N, 3), -jnp.inf, jnp.float32)
    node_arr = jnp.concatenate(
        [jnp.concatenate([lo, pad_lo]), jnp.concatenate([hi, pad_hi]),
         flat.links], axis=1)                    # (Npad, 9)
    nodes = node_arr.reshape(-1, 128, 9).transpose(0, 2, 1)

    # repack deformed triangle stream
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    tris = jnp.concatenate([v[:, 0], e1, e2], axis=1)   # (T, 9)
    t_pad = -(-T // 128) * 128 - T
    tris = jnp.concatenate([tris, jnp.zeros((t_pad, 9), jnp.float32)])
    tris = tris.reshape(-1, 128, 9).transpose(0, 2, 1)

    return flat._replace(nodes=nodes, tris=tris)
