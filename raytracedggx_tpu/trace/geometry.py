"""Device-resident scene geometry: the bindless IB/VB analog.

The reference binds per-mesh index/vertex buffers bindlessly
(RayTracing.hlsl:81-82, register spaces 1/2) and fetches triangle vertices
by (instance, primitive) id (getVertices, RayTracing.hlsl:230-244).  Here
each mesh's arrays live on device; attribute fetch is a gather, and the
2-mesh instance select is a masked merge (instances map 1:1 to meshes, as
InstanceIndex() doubles as the mesh index in the reference).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ..bvh import LBVH, build_lbvh


class MeshGeom(NamedTuple):
    positions: jnp.ndarray  # (V, 3) float32, object space
    normals: jnp.ndarray    # (V, 3)
    tri: jnp.ndarray        # (T, 3) int32
    v0: jnp.ndarray         # (T, 3) Moller-Trumbore precompute
    e1: jnp.ndarray         # (T, 3) v1 - v0
    e2: jnp.ndarray         # (T, 3) v2 - v0


class SceneGeometry(NamedTuple):
    meshes: Tuple[MeshGeom, ...]
    blas: Tuple[LBVH, ...]
    flat: Tuple = ()            # per-mesh FlatBVH (Pallas traversal layout)
    # packed per-triangle attribute table: ONE gather row per hit instead
    # of 12+ vertex gathers (p0 p1 p2 n0 n1 n2, 18 f32) — all meshes
    # concatenated; attrib_off[mesh] = first row of that mesh
    attrib: jnp.ndarray = None          # (sum_T, 18) float32
    attrib_off: Tuple[int, ...] = ()    # static per-mesh row offsets

    @property
    def tri_data(self):
        return [(m.v0, m.e1, m.e2) for m in self.meshes]


def upload_mesh(mesh) -> MeshGeom:
    tri = np.asarray(mesh.indices, np.int64).reshape(-1, 3)
    pos = np.asarray(mesh.positions, np.float32)
    v = pos[tri]
    return MeshGeom(
        positions=jnp.asarray(pos),
        normals=jnp.asarray(mesh.normals, jnp.float32),
        tri=jnp.asarray(tri, jnp.int32),
        v0=jnp.asarray(v[:, 0]),
        e1=jnp.asarray(v[:, 1] - v[:, 0]),
        e2=jnp.asarray(v[:, 2] - v[:, 0]),
    )


def upload_scene(scene, leaf_size: int = 8) -> SceneGeometry:
    import jax

    from ..ops.flatten import flatten_bvh

    meshes = tuple(upload_mesh(m) for m in scene.meshes)
    # jit the builds: eager dispatch of the radix-tree's many small ops is
    # ~100x slower on a remote backend
    build = jax.jit(build_lbvh)
    blas = tuple(build(m.positions, m.tri.reshape(-1)) for m in meshes)
    flat = tuple(flatten_bvh(b, m.v0, m.e1, m.e2, leaf_size=leaf_size)
                 for b, m in zip(blas, meshes))

    # packed attribute rows [p0 p1 p2 n0 n1 n2] per triangle, all meshes
    offs, rows, off = [], [], 0
    for m in meshes:
        tri = np.asarray(m.tri)
        p = np.asarray(m.positions)[tri].reshape(-1, 9)
        n = np.asarray(m.normals)[tri].reshape(-1, 9)
        rows.append(np.concatenate([p, n], axis=1).astype(np.float32))
        offs.append(off)
        off += tri.shape[0]
    return SceneGeometry(meshes=meshes, blas=blas, flat=flat,
                         attrib=jnp.asarray(np.concatenate(rows)),
                         attrib_off=tuple(offs))


def fetch_vertices(geom: SceneGeometry, mesh_ids, inst, prim):
    """getVertices (RayTracing.hlsl:230-244): gather the 3 object-space
    vertex positions/normals of (inst, prim).  Returns ((R,3,3), (R,3,3)).
    inst/prim may be garbage where the ray missed — caller masks.

    ONE barriered gather from the packed 18-wide attribute table (instead
    of 12 per-mesh vertex gathers) — fewer ops for XLA to schedule; the
    per-row-latency theory behind the original change was later debunked
    (docs/PERF.md round 2)."""
    import jax

    # per-ray row offset: tiny static select chain over instances
    off = jnp.zeros(inst.shape, jnp.int32)
    for i, m in enumerate(mesh_ids):
        g = geom.meshes[m]
        lim = g.tri.shape[0] - 1
        p = geom.attrib_off[m] + jnp.clip(prim, 0, lim)
        off = jnp.where(inst == i, p, off)
    row = jax.lax.optimization_barrier(geom.attrib[off])   # (R, 18)
    return (row[..., 0:9].reshape(inst.shape + (3, 3)),
            row[..., 9:18].reshape(inst.shape + (3, 3)))


def interp_attribs(geom: SceneGeometry, mesh_ids, inst, prim, u, v):
    """interpAttrib (RayTracing.hlsl:249-271): barycentric-interpolated
    object-space position and (unnormalized) normal at (inst, prim, u, v)."""
    p, n = fetch_vertices(geom, mesh_ids, inst, prim)
    return interp_from_vertices(p, n, u, v)


def interp_from_vertices(p, n, u, v):
    w0 = (1.0 - u - v)[..., None]
    w1 = u[..., None]
    w2 = v[..., None]
    pos = w0 * p[..., 0, :] + w1 * p[..., 1, :] + w2 * p[..., 2, :]
    nrm = w0 * n[..., 0, :] + w1 * n[..., 1, :] + w2 * n[..., 2, :]
    return pos, nrm
