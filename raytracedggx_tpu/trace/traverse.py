"""Vectorized BVH traversal: the TPU-native `TraceRay`.

Replaces the driver/fixed-function traversal behind DXR
``DispatchRays``/``TraceRay`` (XUSGRayTracing.h:306-341; RayTracer.cpp:807).

Design: a *synchronous wavefront* — every ray in the batch advances one
traversal step per iteration of a single ``lax.while_loop``; finished rays
idle (masked) until the slowest ray completes.  All per-step work is
gathers + elementwise VPU math, which is how a stack-based traversal maps
onto a SIMD machine with no per-lane control flow.  Divergence is the cost
model's enemy: callers should sort/compact incoherent ray batches (wavefront
formulation per BASELINE.json north star).

Per-ray state: current node, a 64-deep traversal stack, best hit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..bvh.lbvh import LBVH
from .intersect import moller_trumbore, ray_aabb, safe_inv_dir

STACK_DEPTH = 64


class HitRecord(NamedTuple):
    t: jnp.ndarray        # (R,) float32 (t_max where missed)
    prim: jnp.ndarray     # (R,) int32 original triangle id (-1 = miss)
    u: jnp.ndarray        # (R,) float32 barycentric of vertex 1
    v: jnp.ndarray        # (R,) float32 barycentric of vertex 2
    hit: jnp.ndarray      # (R,) bool
    inst: jnp.ndarray     # (R,) int32 instance id (-1 = miss)


def trace_rays(bvh: LBVH, tri_v0, tri_e1, tri_e2, ray_o, ray_d,
               t_min, t_max) -> HitRecord:
    """Closest-hit trace of (R, 3) rays against one LBVH.

    tri_v0/e1/e2: (T, 3) precomputed triangle data in ORIGINAL triangle
    order (leaf_tri indexes into them).
    """
    R = ray_o.shape[0]
    n_int = bvh.num_internal
    inv_d = safe_inv_dir(ray_d)

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))

    class S(NamedTuple):
        node: jnp.ndarray
        sp: jnp.ndarray
        stack: jnp.ndarray
        best_t: jnp.ndarray
        best_prim: jnp.ndarray
        best_u: jnp.ndarray
        best_v: jnp.ndarray
        active: jnp.ndarray

    # cheap root cull so rays that miss the whole mesh cost zero steps
    _, root_hit = ray_aabb(ray_o, inv_d, bvh.aabb_min[0], bvh.aabb_max[0],
                           t_min, t_max0)

    init = S(
        node=jnp.zeros((R,), jnp.int32),
        sp=jnp.zeros((R,), jnp.int32),
        stack=jnp.zeros((R, STACK_DEPTH), jnp.int32),
        best_t=t_max0,
        best_prim=jnp.full((R,), -1, jnp.int32),
        best_u=jnp.zeros((R,), jnp.float32),
        best_v=jnp.zeros((R,), jnp.float32),
        active=root_hit,
    )

    rows = jnp.arange(R)

    def cond(s: S):
        return jnp.any(s.active)

    def body(s: S) -> S:
        node = s.node
        is_leaf = node >= n_int

        # ---- leaf: intersect its triangle -------------------------------
        leaf_id = jnp.clip(node - n_int, 0, bvh.num_leaves - 1)
        prim = bvh.leaf_tri[leaf_id]
        t, u, v, hit = moller_trumbore(
            ray_o, ray_d, tri_v0[prim], tri_e1[prim], tri_e2[prim],
            t_min, s.best_t)
        take = s.active & is_leaf & hit
        best_t = jnp.where(take, t, s.best_t)
        best_prim = jnp.where(take, prim, s.best_prim)
        best_u = jnp.where(take, u, s.best_u)
        best_v = jnp.where(take, v, s.best_v)

        # ---- internal: test children ------------------------------------
        nidx = jnp.clip(node, 0, n_int - 1)
        lc = bvh.left[nidx]
        rc = bvh.right[nidx]
        tl, hl = ray_aabb(ray_o, inv_d, bvh.aabb_min[lc], bvh.aabb_max[lc],
                          t_min, best_t)
        tr, hr = ray_aabb(ray_o, inv_d, bvh.aabb_min[rc], bvh.aabb_max[rc],
                          t_min, best_t)
        both = hl & hr & ~is_leaf
        near = jnp.where(tl <= tr, lc, rc)
        far = jnp.where(tl <= tr, rc, lc)
        one = (hl ^ hr) & ~is_leaf
        one_child = jnp.where(hl, lc, rc)

        # push the far child when both hit
        push = s.active & both
        stack = s.stack.at[rows, s.sp].set(
            jnp.where(push, far, s.stack[rows, s.sp]))
        sp = jnp.where(push, s.sp + 1, s.sp)

        # next node: descend or pop
        descend = (~is_leaf) & (both | one)
        next_desc = jnp.where(both, near, one_child)
        need_pop = s.active & ~descend
        can_pop = need_pop & (sp > 0)
        sp_pop = jnp.where(can_pop, sp - 1, sp)
        popped = stack[rows, jnp.clip(sp_pop, 0, STACK_DEPTH - 1)]

        node_next = jnp.where(descend, next_desc, popped)
        active = s.active & (descend | can_pop)

        return S(node=jnp.where(s.active, node_next, s.node),
                 sp=jnp.where(s.active, sp_pop, s.sp),
                 stack=stack,
                 best_t=best_t, best_prim=best_prim,
                 best_u=best_u, best_v=best_v,
                 active=active)

    out = lax.while_loop(cond, body, init)
    hit = out.best_prim >= 0
    return HitRecord(t=out.best_t, prim=out.best_prim, u=out.best_u,
                     v=out.best_v, hit=hit,
                     inst=jnp.where(hit, 0, -1).astype(jnp.int32))


def trace_bruteforce(tri_v0, tri_e1, tri_e2, ray_o, ray_d,
                     t_min, t_max) -> HitRecord:
    """O(R*T) reference oracle for tests (scan over triangles)."""
    R = ray_o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    init = (jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,)),
            jnp.full((R,), -1, jnp.int32),
            jnp.zeros((R,), jnp.float32), jnp.zeros((R,), jnp.float32))

    def step(carry, tri):
        bt, bp, bu, bv = carry
        v0, e1, e2, idx = tri
        t, u, v, hit = moller_trumbore(ray_o, ray_d, v0[None], e1[None],
                                       e2[None], t_min, bt)
        take = hit
        return ((jnp.where(take, t, bt), jnp.where(take, idx, bp),
                 jnp.where(take, u, bu), jnp.where(take, v, bv)), None)

    T = tri_v0.shape[0]
    (bt, bp, bu, bv), _ = lax.scan(
        step, init, (tri_v0, tri_e1, tri_e2, jnp.arange(T, dtype=jnp.int32)))
    hit = bp >= 0
    return HitRecord(t=bt, prim=bp, u=bu, v=bv, hit=hit,
                     inst=jnp.where(hit, 0, -1).astype(jnp.int32))


def trace_scene(blas_list, tri_data, tlas, ray_o, ray_d, t_min, t_max
                ) -> HitRecord:
    """Closest hit across all TLAS instances.

    blas_list: per-mesh LBVH; tri_data: per-mesh (v0, e1, e2);
    tlas: TLAS with inv_worlds.  Rays are transformed per instance with
    unnormalized directions so t stays in world units (tlas.py docstring).
    Instance count is small and static (NUM_MESH=2 in the reference), so a
    Python loop unrolls into independent traversals XLA can co-schedule —
    the analog of the two hardware queues.
    """
    best = None
    for i, mesh_id in enumerate(tlas.mesh_ids):
        inv = tlas.inv_worlds[i]
        o = ray_o @ inv[:3, :3] + inv[3, :3]
        d = ray_d @ inv[:3, :3]
        v0, e1, e2 = tri_data[mesh_id]
        rec = trace_rays(blas_list[mesh_id], v0, e1, e2, o, d, t_min,
                         t_max if best is None else best.t)
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
