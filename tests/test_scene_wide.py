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


def test_wide_scene_slim_parity(rng):
    """slim (deferred-attribute) kernel vs the standard lean kernel:
    identical hits and t; u/v recomputed post-kernel must match the
    in-kernel values to fp reassociation (barycentrics are
    affine-invariant, trace_scene_wide_fused docstring)."""
    from raytracedggx_tpu.ops.scene_wide import trace_scene_wide_fused

    scene = _scene(((3.0, 1.0, 3.0, 0.5),))
    geom = upload_scene(scene)
    worlds = scene.worlds(0.7)
    sw = build_scene_wide(geom, scene.mesh_ids)
    sw = jax.jit(lambda w: refit_scene_wide(sw, w))(worlds)

    o, d = _rand_rays(rng, 512)
    rec0, n0 = trace_scene_wide_fused(sw, o, d, 0.0, 1e4, interpret=True)
    rec1, n1 = trace_scene_wide_fused(sw, o, d, 0.0, 1e4, interpret=True,
                                      slim=True)
    np.testing.assert_array_equal(np.asarray(rec0.hit),
                                  np.asarray(rec1.hit))
    h = np.asarray(rec0.hit)
    np.testing.assert_allclose(np.asarray(rec1.t)[h],
                               np.asarray(rec0.t)[h], rtol=1e-6, atol=0)
    np.testing.assert_array_equal(np.asarray(rec0.inst)[h],
                                  np.asarray(rec1.inst)[h])
    np.testing.assert_allclose(np.asarray(rec1.u)[h],
                               np.asarray(rec0.u)[h], atol=1e-4)
    np.testing.assert_allclose(np.asarray(rec1.v)[h],
                               np.asarray(rec0.v)[h], atol=1e-4)
    np.testing.assert_allclose(np.asarray(n1)[h], np.asarray(n0)[h],
                               atol=1e-4)


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
    """Structural invariants of the instanced scene BVH after refit at an
    arbitrary rotation: (a) every leaf child box contains its leaf
    column's object-space triangles, (b) every internal child box
    contains its target node's own child boxes, (c) every instance entry
    box contains the world-transformed mesh root box.  Together these
    give the global containment traversal relies on."""
    scene = _scene(((1.5, 0.5, -2.0, 0.7),))
    geom = upload_scene(scene)
    worlds = np.asarray(scene.worlds(2.1))
    sw = build_scene_wide(geom, scene.mesh_ids, worlds=worlds)

    L = int(sw.leaf_size)
    RW = sw.tris.shape[1]
    cols = np.asarray(sw.tris).transpose(0, 2, 1).reshape(-1, RW)
    nodes = np.asarray(sw.nodes).transpose(0, 2, 1).reshape(-1, 36)
    N, n_top = sw.num_nodes, sw.n_top
    kind = nodes[:, 24:28].astype(np.int32)
    a_col = nodes[:, 28:32].astype(np.int32)

    def child_box(r, k):
        return nodes[r, k * 6:k * 6 + 3], nodes[r, k * 6 + 3:k * 6 + 6]

    for r in range(N):
        for k in range(4):
            knd = kind[r, k]
            if knd == 0:
                continue
            lo, hi = child_box(r, k)
            if knd == 1:                      # leaf: contains its tris
                col = cols[a_col[r, k]]
                tri9 = col[:9 * L].reshape(L, 9)
                live = ~np.isnan(tri9[:, 0])
                v0, e1, e2 = tri9[:, 0:3], tri9[:, 3:6], tri9[:, 6:9]
                pts = np.concatenate([v0, v0 + e1, v0 + e2])[
                    np.tile(live, 3)]
                assert (pts >= lo - 1e-4).all() and \
                    (pts <= hi + 1e-4).all(), f"leaf box {r}/{k}"
            elif knd == 2:                    # internal: contains target
                t = a_col[r, k]
                for kk in range(4):
                    if kind[t, kk] == 0:
                        continue
                    clo, chi = child_box(t, kk)
                    assert (clo >= lo - 1e-4).all() and \
                        (chi <= hi + 1e-4).all(), f"node box {r}/{k}"
            else:                             # instance: world root box
                inst = int(nodes[r, 32 + k]) - 1
                corners = np.asarray(sw.root_corners)[inst]
                w = worlds[inst]
                wc = corners @ w[:3, :3] + w[3, :3]
                assert (wc >= lo - 1e-4).all() and \
                    (wc <= hi + 1e-4).all(), f"instance box {r}/{k}"


def test_anchor_ids_and_sort_key_parity(rng):
    """Frontier re-binning (round 5): anchor ids are in-range per
    instance, anchor-augmented sort keys keep dead rays last, and
    tracing in anchor order returns exactly the same hit set after
    un-permutation (the sort is a pure reordering)."""
    from raytracedggx_tpu.ops.scene_wide import (anchor_bits,
                                                 anchor_ids_scene)
    from raytracedggx_tpu.ops.traverse_pallas import sort_rays_morton

    scene = _scene(((3.0, 1.0, 3.0, 0.5),))
    geom = upload_scene(scene)
    worlds = scene.worlds(0.7)
    sw = build_scene_wide(geom, scene.mesh_ids, anchor_cut=8)
    sw = jax.jit(lambda w: refit_scene_wide(sw, w))(worlds)

    assert sw.anchor_boxes is not None
    total = sw.anchor_base[-1]
    ab = anchor_bits(sw)
    assert total >= 3 and (1 << ab) >= total

    o, d = _rand_rays(rng, 512)
    aid = np.asarray(anchor_ids_scene(sw, o, d))
    assert aid.dtype == np.uint32 and (aid < total).all()
    # rays aimed at the scene overwhelmingly enter SOME cut box
    assert (aid > 0).any()

    tmax = jnp.where(jnp.arange(512) % 3 == 0, -1.0, 1e4)
    lo = jnp.asarray([-8.0, -8.0, -8.0])
    hi = jnp.asarray([8.0, 8.0, 8.0])
    order, inv = sort_rays_morton(o, d, lo, hi, active=tmax > 0,
                                  anchor=jnp.asarray(aid),
                                  anchor_bits=ab)
    order = np.asarray(order)
    # dead rays (every 3rd) sort to the tail
    n_dead = int(np.asarray(tmax <= 0).sum())
    assert set(order[-n_dead:].tolist()) == \
        set(np.nonzero(np.asarray(tmax <= 0))[0].tolist())

    ref = trace_scene_wide(sw, o, d, 0.0, tmax, interpret=True)
    got_s = trace_scene_wide(sw, o[jnp.asarray(order)],
                             d[jnp.asarray(order)], 0.0,
                             tmax[jnp.asarray(order)], interpret=True)
    inv_o = np.argsort(order)
    np.testing.assert_array_equal(np.asarray(got_s.hit)[inv_o],
                                  np.asarray(ref.hit))
    np.testing.assert_allclose(np.asarray(got_s.t)[inv_o],
                               np.asarray(ref.t), rtol=1e-6)
