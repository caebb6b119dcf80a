"""LBVH: GPU-style linear BVH build (Karras 2012 radix tree) in pure JAX.

This is the TPU-native equivalent of the driver-side BLAS builder the
reference gets through DXR (`BottomLevelAS::Build`, XUSGRayTracing.h:163-190;
invoked RayTracer.cpp:697-709).  Everything is data-parallel and runs on
device:

1. triangle centroids -> 30-bit Morton codes (morton.py)
2. sort; build the binary radix tree over the sorted codes with the
   Karras 2012 per-node parallel range search (every internal node found
   independently -> fully vectorizable, no sequential insertion)
3. AABBs: leaf boxes from triangles; internal boxes by iterating
   ``parent = union(children)`` for MAX_DEPTH rounds (the radix tree over
   64 discriminating bits has height <= 64, so 64 rounds reach a fixed
   point) — the scatter-free analog of the bottom-up atomic pass.

``refit_lbvh`` re-runs step 3 for deformed vertices: the analog of a DXR
BLAS update (PREFER_FAST_TRACE refit), and the building block the TLAS
refit uses per frame (RayTracer.cpp:339-340).

Node layout: internal nodes [0, n-2], leaves [n-1, 2n-2]; leaf k holds
original triangle ``leaf_tri[k]``.  Root is node 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .morton import morton3d

MAX_DEPTH = 64


class LBVH(NamedTuple):
    left: jnp.ndarray      # (n-1,) int32 child node ids
    right: jnp.ndarray     # (n-1,) int32
    aabb_min: jnp.ndarray  # (2n-1, 3) float32
    aabb_max: jnp.ndarray  # (2n-1, 3) float32
    leaf_tri: jnp.ndarray  # (n,) int32: leaf k -> original triangle id

    @property
    def num_leaves(self):
        return self.leaf_tri.shape[0]

    @property
    def num_internal(self):
        return self.left.shape[0]


def _clz(x):
    return lax.clz(x.astype(jnp.uint32)).astype(jnp.int32)


def _build_radix_tree(keys):
    """Karras 2012: compute (left, right) children for internal nodes
    0..n-2 of the binary radix tree over sorted ``keys`` (uint32).
    Ties are broken by index (conceptually augmenting keys with their
    position), so duplicate Morton codes are fine."""
    n = keys.shape[0]
    idx = jnp.arange(n - 1, dtype=jnp.int32)

    def delta(i, j):
        valid = (j >= 0) & (j < n)
        jc = jnp.clip(j, 0, n - 1)
        x = keys[i] ^ keys[jc]
        d = jnp.where(x == 0,
                      32 + _clz(i.astype(jnp.uint32) ^ jc.astype(jnp.uint32)),
                      _clz(x))
        return jnp.where(valid, d, -1)

    i = idx
    d = jnp.where(delta(i, i + 1) >= delta(i, i - 1), 1, -1).astype(jnp.int32)
    dmin = delta(i, i - d)

    # upper bound for the range length (doubling with a done-mask)
    lmax = jnp.full_like(i, 2)
    done = jnp.zeros_like(i, dtype=bool)
    for _ in range(32):
        c = delta(i, i + lmax * d) > dmin
        lmax = jnp.where(c & ~done, lmax * 2, lmax)
        done = done | ~c

    # binary search the exact other end j = i + l*d
    l = jnp.zeros_like(i)
    for k in range(31):
        t = lmax >> (k + 1)
        c = (t >= 1) & (delta(i, i + (l + t) * d) > dmin)
        l = jnp.where(c, l + t, l)
    j = i + l * d

    # find the split point via ceil-halving search:
    # t_k = ceil(l / 2^(k+1)), stopping after the first t == 1 step
    dnode = delta(i, j)
    s = jnp.zeros_like(i)
    sdone = jnp.zeros_like(i, dtype=bool)
    for k in range(31):
        t = jnp.where(l > 0, ((l - 1) >> (k + 1)) + 1, 0)
        t = jnp.where(sdone, 0, t)
        c = (t >= 1) & (delta(i, i + (s + t) * d) > dnode)
        s = jnp.where(c, s + t, s)
        sdone = sdone | (t <= 1)

    gamma = i + s * d + jnp.minimum(d, 0)
    lo = jnp.minimum(i, j)
    hi = jnp.maximum(i, j)
    left = jnp.where(lo == gamma, gamma + (n - 1), gamma).astype(jnp.int32)
    right = jnp.where(hi == gamma + 1, gamma + 1 + (n - 1),
                      gamma + 1).astype(jnp.int32)
    return left, right


def _union_pass(left, right, aabb_min, aabb_max):
    """Iterate parent = union(children) to a fixed point (height <= 64)."""
    n_int = left.shape[0]

    def body(_, mm):
        amin, amax = mm
        new_min = jnp.minimum(amin[left], amin[right])
        new_max = jnp.maximum(amax[left], amax[right])
        amin = amin.at[:n_int].set(new_min)
        amax = amax.at[:n_int].set(new_max)
        return amin, amax

    return lax.fori_loop(0, MAX_DEPTH, body, (aabb_min, aabb_max))


def build_lbvh(positions, indices) -> LBVH:
    """Build an LBVH over triangles (positions (V,3) f32, indices (3T,)).

    Requires T >= 2 (the reference's smallest mesh, the ground cube, has 12).
    """
    tri = jnp.asarray(indices, jnp.int32).reshape(-1, 3)
    pos = jnp.asarray(positions, jnp.float32)
    v = pos[tri]                                   # (T, 3, 3)
    tmin = v.min(axis=1)
    tmax = v.max(axis=1)
    centroid = (tmin + tmax) * 0.5

    lo = tmin.min(axis=0)
    hi = tmax.max(axis=0)
    codes = morton3d(centroid, lo, hi)
    order = jnp.argsort(codes).astype(jnp.int32)
    keys = codes[order]

    left, right = _build_radix_tree(keys)

    n = tri.shape[0]
    aabb_min = jnp.concatenate([jnp.full((n - 1, 3), jnp.inf, jnp.float32),
                                tmin[order]], axis=0)
    aabb_max = jnp.concatenate([jnp.full((n - 1, 3), -jnp.inf, jnp.float32),
                                tmax[order]], axis=0)
    aabb_min, aabb_max = _union_pass(left, right, aabb_min, aabb_max)
    return LBVH(left, right, aabb_min, aabb_max, order)


def refit_lbvh(bvh: LBVH, positions, indices) -> LBVH:
    """Refit AABBs for deformed vertices, keeping the topology (the analog
    of a DXR BLAS update build)."""
    tri = jnp.asarray(indices, jnp.int32).reshape(-1, 3)
    v = jnp.asarray(positions, jnp.float32)[tri][bvh.leaf_tri]
    n = bvh.num_leaves
    aabb_min = bvh.aabb_min.at[n - 1:].set(v.min(axis=1))
    aabb_max = bvh.aabb_max.at[n - 1:].set(v.max(axis=1))
    aabb_min, aabb_max = _union_pass(bvh.left, bvh.right, aabb_min, aabb_max)
    return bvh._replace(aabb_min=aabb_min, aabb_max=aabb_max)
