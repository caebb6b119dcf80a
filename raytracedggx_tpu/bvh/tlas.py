"""Two-level acceleration structure: instances over per-mesh LBVHs.

The reference's ``TopLevelAS`` holds instance descriptors (3x4 transform +
BLAS handle) and is refit every frame on the async compute queue for the
animated model (RayTracer::UpdateAccelerationStructure, RayTracer.cpp:326-341;
TLAS ALLOW_UPDATE + Build(source=self) RayTracer.cpp:701, 339-340).

TPU-native: an instance is (mesh_id, world, inv_world, world-space AABB).
``refit_tlas`` recomputes inverse transforms + world AABBs from the frame's
world matrices — a tiny fused jnp computation that lives inside the jitted
frame step, overlapping with other work via XLA async dispatch (the analog
of the compute-queue refit).

Rays are traced against an instance by transforming origin/direction into
object space with the *unnormalized* direction, which keeps the ray's t
parameterization in world units under affine instance transforms.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp



class TLAS(NamedTuple):
    worlds: jnp.ndarray        # (I, 4, 4) row-vector world matrices
    inv_worlds: jnp.ndarray    # (I, 4, 4)
    aabb_min: jnp.ndarray      # (I, 3) world-space instance bounds
    aabb_max: jnp.ndarray      # (I, 3)
    mesh_ids: tuple            # static: instance -> BLAS index


def _world_aabb(blas_min, blas_max, world):
    """Transform an object-space AABB by a row-vector world matrix."""
    corners = jnp.stack(jnp.meshgrid(
        jnp.stack([blas_min[0], blas_max[0]]),
        jnp.stack([blas_min[1], blas_max[1]]),
        jnp.stack([blas_min[2], blas_max[2]]), indexing="ij"),
        axis=-1).reshape(8, 3)
    wc = corners @ world[:3, :3] + world[3, :3]
    return wc.min(axis=0), wc.max(axis=0)


def build_tlas(blas_list, worlds, mesh_ids=None) -> TLAS:
    """blas_list: list of LBVH (one per mesh); worlds: (I, 4, 4);
    mesh_ids: instance -> mesh (defaults to identity mapping)."""
    num_inst = worlds.shape[0]
    if mesh_ids is None:
        mesh_ids = tuple(range(num_inst))
    roots_min = [blas_list[m].aabb_min[0] for m in mesh_ids]
    roots_max = [blas_list[m].aabb_max[0] for m in mesh_ids]
    mins, maxs = [], []
    for i in range(num_inst):
        lo, hi = _world_aabb(roots_min[i], roots_max[i], worlds[i])
        mins.append(lo)
        maxs.append(hi)
    return TLAS(
        worlds=jnp.asarray(worlds, jnp.float32),
        inv_worlds=jnp.linalg.inv(worlds).astype(jnp.float32),
        aabb_min=jnp.stack(mins),
        aabb_max=jnp.stack(maxs),
        mesh_ids=tuple(mesh_ids),
    )


def refit_tlas(tlas: TLAS, blas_list, worlds) -> TLAS:
    """Per-frame refit with new instance transforms (SetInstances + TLAS
    update build, RayTracer.cpp:329-340)."""
    return build_tlas(blas_list, worlds, tlas.mesh_ids)
