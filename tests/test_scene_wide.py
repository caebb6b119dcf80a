"""Unified world-space scene BVH (ops/scene_wide.py): single-launch
multi-instance traversal parity vs the pure-JAX two-level reference
(trace/traverse.trace_scene), incl. per-frame device refit under rotation
and >4 instances (nested top-level supernode tree)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracedggx_tpu.bvh import build_tlas
from raytracedggx_tpu.ops.scene_wide import (build_scene_wide,
                                             refit_scene_wide,
                                             trace_scene_wide)
from raytracedggx_tpu.scene import Scene, default_materials
from raytracedggx_tpu.scene.mesh import ground_cube
from raytracedggx_tpu.trace.geometry import upload_scene
from raytracedggx_tpu.trace.traverse import trace_scene


def _scene(extra=()):
    return Scene(meshes=[ground_cube(), ground_cube()],
                 materials=default_materials(),
                 pos_scale=np.array([0.0, 2.0, 0.0, 1.0], np.float32),
                 extra_instances=tuple(extra))


def _rand_rays(rng, n, lo=-6.0, hi=6.0):
    o = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(3.0, 8.0, size=n)
    tgt = rng.uniform(-2.0, 2.0, size=(n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("extra,angle", [
    ((), 0.0),
    (((3.0, 1.0, 3.0, 0.5),), 0.7),                      # 3 instances
    (tuple((2.5 * i - 5.0, 1.0, 2.5 * ((i * 7) % 3), 0.4)
           for i in range(7)), 1.3),                     # 9 instances: top tree
])
def test_wide_scene_parity(rng, extra, angle):
    scene = _scene(extra)
    geom = upload_scene(scene)
    worlds = scene.worlds(angle)
    tlas = build_tlas(list(geom.blas), worlds, mesh_ids=scene.mesh_ids)

    sw = build_scene_wide(geom, scene.mesh_ids)
    sw = jax.jit(lambda w: refit_scene_wide(sw, w))(worlds)

    o, d = _rand_rays(rng, 512)
    ref = trace_scene(geom.blas, geom.tri_data, tlas, o, d, 0.0, 1e4)
    got = trace_scene_wide(sw, o, d, 0.0, 1e4, interpret=True)

    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    h = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(got.t)[h], np.asarray(ref.t)[h],
                               rtol=1e-4, atol=1e-5)
    # same instance/prim except at exact t ties on shared edges
    same = ((np.asarray(got.inst) == np.asarray(ref.inst))
            & (np.asarray(got.prim) == np.asarray(ref.prim)))[h]
    assert same.mean() > 0.99


def test_wide_scene_per_ray_tmax_mask(rng):
    scene = _scene()
    geom = upload_scene(scene)
    worlds = scene.worlds(0.0)
    sw = build_scene_wide(geom, scene.mesh_ids, worlds=worlds)

    o, d = _rand_rays(rng, 256)
    tmax = jnp.where(jnp.arange(256) % 2 == 0, 1e4, -1.0)
    got = trace_scene_wide(sw, o, d, 0.0, tmax, interpret=True)
    assert not np.asarray(got.hit)[1::2].any()
    assert np.asarray(got.hit)[::2].any()


def test_refit_boxes_contain_triangles(rng):
    """After refit at an arbitrary rotation, every supernode child box must
    contain its stream range's triangles (the invariant traversal needs)."""
    scene = _scene(((1.5, 0.5, -2.0, 0.7),))
    geom = upload_scene(scene)
    worlds = scene.worlds(2.1)
    sw = build_scene_wide(geom, scene.mesh_ids, worlds=worlds)

    # reconstruct world triangles from the leaf-major stream
    L = int(sw.leaf_size)
    cols = np.asarray(sw.tris).transpose(0, 2, 1).reshape(
        -1, sw.tris.shape[1])                            # (leaves_pad, RW)
    T = sw.v0_obj.shape[0]
    n_leaves = T // L
    geom9 = cols[:n_leaves, :9 * L].reshape(-1, 9)       # (T, 9)
    pad = np.asarray(sw.pad_mask)
    v0, e1, e2 = geom9[:, 0:3], geom9[:, 3:6], geom9[:, 6:9]
    pts = np.stack([v0, v0 + e1, v0 + e2], axis=1)       # (T, 3, 3)

    nodes = np.asarray(sw.nodes).transpose(0, 2, 1).reshape(-1, 36)
    N = sw.num_nodes
    stat = np.asarray(sw.static_cols)
    ab = np.asarray(sw.child_ab)
    child_lvl = np.asarray(sw.child_level)
    for r in range(N):
        for k in range(4):
            knd = int(stat[r, k])
            if knd == 0:
                continue
            lvl = int(child_lvl[r, k])
            s = int(ab[r, k, 0]) - lvl * n_leaves        # leaf range start
            e = int(ab[r, k, 1]) - lvl * n_leaves + (1 << lvl)
            lo = nodes[r, k * 6:k * 6 + 3]
            hi = nodes[r, k * 6 + 3:k * 6 + 6]
            live = ~pad[s * L:e * L]
            seg = pts[s * L:e * L].reshape(-1, 3)[np.repeat(live, 3)]
            assert (seg >= lo - 1e-4).all() and (seg <= hi + 1e-4).all(), \
                f"node {r} child {k} box does not contain its range"
