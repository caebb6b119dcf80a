import numpy as np
import jax.numpy as jnp
import pytest

from raytracedggx_tpu.bvh import build_lbvh, refit_lbvh, build_tlas
from raytracedggx_tpu.trace import (trace_rays, trace_bruteforce, trace_scene)
from raytracedggx_tpu.scene.mesh import ground_cube
from raytracedggx_tpu.utils import math3d as m3


def random_tris(rng, n, spread=4.0, size=0.5):
    base = (rng.random((n, 1, 3)) - 0.5) * 2 * spread
    offs = (rng.random((n, 3, 3)) - 0.5) * 2 * size
    v = (base + offs).astype(np.float32)
    pos = v.reshape(-1, 3)
    idx = np.arange(3 * n, dtype=np.uint32)
    return pos, idx


def tri_data(pos, idx):
    t = pos[idx.reshape(-1, 3)]
    v0 = t[:, 0]
    return (jnp.asarray(v0), jnp.asarray(t[:, 1] - v0),
            jnp.asarray(t[:, 2] - v0))


def tree_is_valid(bvh):
    """Every leaf reached exactly once; children AABBs inside parents."""
    n = bvh.num_leaves
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    count = np.zeros(2 * n - 1, int)
    stack = [0]
    while stack:
        node = stack.pop()
        count[node] += 1
        if node < n - 1:
            stack.append(left[node])
            stack.append(right[node])
    assert count.max() == 1, "node visited twice"
    assert count[n - 1:].sum() == n, "not all leaves reachable"
    amin = np.asarray(bvh.aabb_min)
    amax = np.asarray(bvh.aabb_max)
    ok_min = (amin[:n - 1] <= np.minimum(amin[left], amin[right]) + 1e-6).all()
    ok_max = (amax[:n - 1] >= np.maximum(amax[left], amax[right]) - 1e-6).all()
    assert ok_min and ok_max


@pytest.mark.parametrize("n", [2, 3, 12, 257])
def test_tree_structure(rng, n):
    pos, idx = random_tris(rng, n)
    bvh = build_lbvh(pos, idx)
    tree_is_valid(bvh)


def test_duplicate_morton_codes(rng):
    # identical centroids -> all equal codes; index tiebreak must keep the
    # tree valid
    tri = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    pos = np.concatenate([tri + 0 for _ in range(17)])
    idx = np.arange(len(pos), dtype=np.uint32)
    bvh = build_lbvh(pos, idx)
    tree_is_valid(bvh)


def test_traversal_matches_bruteforce(rng):
    pos, idx = random_tris(rng, 300)
    bvh = build_lbvh(pos, idx)
    v0, e1, e2 = tri_data(pos, idx)

    R = 512
    o = (rng.random((R, 3)).astype(np.float32) - 0.5) * 16
    d = rng.standard_normal((R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    a = trace_rays(bvh, v0, e1, e2, jnp.asarray(o), jnp.asarray(d), 1e-4, 1e4)
    b = trace_bruteforce(v0, e1, e2, jnp.asarray(o), jnp.asarray(d), 1e-4, 1e4)

    assert np.array_equal(np.asarray(a.hit), np.asarray(b.hit))
    ah, bh = np.asarray(a.t), np.asarray(b.t)
    np.testing.assert_allclose(ah[np.asarray(a.hit)], bh[np.asarray(b.hit)],
                               rtol=1e-4, atol=1e-5)
    # prims match except exact-t ties
    same = np.asarray(a.prim) == np.asarray(b.prim)
    ties = np.abs(ah - bh) <= 1e-5 * np.maximum(1, np.abs(ah))
    assert np.all(same | ties)


def test_ground_cube_rays():
    m = ground_cube()
    bvh = build_lbvh(m.positions, m.indices)
    v0, e1, e2 = tri_data(m.positions, m.indices)
    # straight-down rays hit the top face at y=1
    o = np.array([[0.2, 5.0, 0.3], [0.0, 5.0, 0.0], [3.0, 5.0, 3.0]],
                 np.float32)
    d = np.tile(np.array([[0.0, -1.0, 0.0]], np.float32), (3, 1))
    rec = trace_rays(bvh, v0, e1, e2, jnp.asarray(o), jnp.asarray(d), 0.0, 1e4)
    hit = np.asarray(rec.hit)
    assert hit[0] and hit[1] and not hit[2]
    np.testing.assert_allclose(np.asarray(rec.t)[:2], [4.0, 4.0], rtol=1e-5)


def test_refit_moves_with_vertices(rng):
    pos, idx = random_tris(rng, 64)
    bvh = build_lbvh(pos, idx)
    moved = pos + np.array([10.0, 0.0, 0.0], np.float32)
    bvh2 = refit_lbvh(bvh, moved, idx)
    np.testing.assert_allclose(np.asarray(bvh2.aabb_min[0]),
                               np.asarray(bvh.aabb_min[0]) + [10, 0, 0],
                               atol=1e-4)
    v0, e1, e2 = tri_data(moved, idx)
    o = (rng.random((64, 3)).astype(np.float32) - 0.5) * 16 + [10, 0, 0]
    d = rng.standard_normal((64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    a = trace_rays(bvh2, v0, e1, e2, jnp.asarray(o), jnp.asarray(d), 1e-4, 1e4)
    b = trace_bruteforce(v0, e1, e2, jnp.asarray(o), jnp.asarray(d), 1e-4, 1e4)
    assert np.array_equal(np.asarray(a.hit), np.asarray(b.hit))


def test_tlas_two_instances_world_t():
    m = ground_cube()
    bvh = build_lbvh(m.positions, m.indices)
    v0, e1, e2 = tri_data(m.positions, m.indices)
    # instance 0: unit cube at origin; instance 1: scaled x2, moved +x by 10
    w0 = jnp.eye(4)
    w1 = m3.scaling(2, 2, 2) @ m3.translation(10, 0, 0)
    tlas = build_tlas([bvh, bvh], jnp.stack([w0, w1]), mesh_ids=(0, 0))
    o = np.array([[0.0, 10.0, 0.0], [10.0, 10.0, 0.0]], np.float32)
    d = np.tile(np.array([[0.0, -1.0, 0.0]], np.float32), (2, 1))
    rec = trace_scene([bvh], [(v0, e1, e2)], tlas, jnp.asarray(o),
                      jnp.asarray(d), 0.0, 1e4)
    assert np.asarray(rec.hit).all()
    assert list(np.asarray(rec.inst)) == [0, 1]
    # world-space t: top of unit cube at y=1 -> t=9; scaled cube top y=2 -> t=8
    np.testing.assert_allclose(np.asarray(rec.t), [9.0, 8.0], rtol=1e-5)
