import numpy as np
import jax.numpy as jnp
import pytest

from raytracedggx_tpu.bvh import build_lbvh
from raytracedggx_tpu.ops import flatten_bvh, trace_rays_pallas
from raytracedggx_tpu.ops.traverse_pallas import block_order
from raytracedggx_tpu.trace.traverse import trace_bruteforce


def random_tris(rng, n, spread=6.0):
    base = (rng.random((n, 1, 3)) - 0.5) * 2 * spread
    v = (base + (rng.random((n, 3, 3)) - 0.5)).astype(np.float32)
    pos = v.reshape(-1, 3)
    idx = np.arange(3 * n, dtype=np.uint32)
    return pos, idx


@pytest.mark.parametrize("leaf_size", [1, 4, 8])
def test_flatten_covers_all_triangles(rng, leaf_size):
    pos, idx = random_tris(rng, 130)
    bvh = build_lbvh(pos, idx)
    tri = pos[idx.reshape(-1, 3)]
    flat = flatten_bvh(bvh, tri[:, 0], tri[:, 1] - tri[:, 0],
                       tri[:, 2] - tri[:, 0], leaf_size=leaf_size)
    perm = np.asarray(flat.tri_perm)
    assert sorted(perm) == list(range(130))
    nodes = np.asarray(flat.nodes)          # (Nt, 9, 128)
    skip = nodes[:, 6].reshape(-1)[:flat.num_nodes].astype(np.int64)
    count = nodes[:, 8].reshape(-1)[:flat.num_nodes].astype(np.int64)
    # leaf triangle ranges partition the stream
    starts = nodes[:, 7].reshape(-1)[:flat.num_nodes].astype(np.int64)[
        count > 0]
    counts = count[count > 0]
    order = np.argsort(starts)
    assert np.all(starts[order] == np.concatenate(
        [[0], np.cumsum(counts[order])[:-1]]))
    # skip links monotonically bounded
    assert np.all(skip > np.arange(flat.num_nodes))
    assert np.all(skip <= flat.num_nodes)


def test_pallas_interpret_matches_bruteforce(rng):
    pos, idx = random_tris(rng, 64)
    bvh = build_lbvh(pos, idx)
    tri = pos[idx.reshape(-1, 3)]
    v0 = jnp.asarray(tri[:, 0])
    e1 = jnp.asarray(tri[:, 1] - tri[:, 0])
    e2 = jnp.asarray(tri[:, 2] - tri[:, 0])
    flat = flatten_bvh(bvh, v0, e1, e2, leaf_size=4)

    R = 1024
    o = jnp.asarray(((rng.random((R, 3)) - 0.5) * 24).astype(np.float32))
    d = rng.standard_normal((R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)

    a = trace_rays_pallas(flat, o, d, 1e-4, 1e4, interpret=True)
    b = trace_bruteforce(v0, e1, e2, o, d, 1e-4, 1e4)
    assert np.array_equal(np.asarray(a.hit), np.asarray(b.hit))
    m = np.asarray(a.hit)
    np.testing.assert_allclose(np.asarray(a.t)[m], np.asarray(b.t)[m],
                               rtol=1e-4)


def test_pallas_per_ray_tmax_masking(rng):
    pos, idx = random_tris(rng, 16)
    bvh = build_lbvh(pos, idx)
    tri = pos[idx.reshape(-1, 3)]
    v0 = jnp.asarray(tri[:, 0])
    e1 = jnp.asarray(tri[:, 1] - tri[:, 0])
    e2 = jnp.asarray(tri[:, 2] - tri[:, 0])
    flat = flatten_bvh(bvh, v0, e1, e2)
    R = 256
    o = jnp.asarray(((rng.random((R, 3)) - 0.5) * 24).astype(np.float32))
    d = rng.standard_normal((R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.where(jnp.arange(R) % 2 == 0, 1e4, -1.0)
    rec = trace_rays_pallas(flat, o, d, 1e-4, tmax, interpret=True)
    hit = np.asarray(rec.hit)
    assert not hit[1::2].any()              # masked rays never hit


def test_block_order_is_permutation():
    order, inv = block_order(64, 36)
    assert sorted(order) == list(range(64 * 36))
    assert np.array_equal(order[inv], np.arange(64 * 36))
    # first 1024 entries form a 32x32 block
    ys, xs = np.divmod(order[:1024], 64)
    assert ys.max() - ys.min() == 31 and xs.max() - xs.min() == 31


def test_refit_flat_bvh_matches_rebuild(rng):
    from raytracedggx_tpu.ops import refit_flat_bvh
    pos, idx = random_tris(rng, 97)
    bvh = build_lbvh(pos, idx)
    tri = pos[idx.reshape(-1, 3)]
    flat = flatten_bvh(bvh, tri[:, 0], tri[:, 1] - tri[:, 0],
                       tri[:, 2] - tri[:, 0], leaf_size=4)
    # deform: shift + scale
    pos2 = pos * 1.3 + np.array([2.0, -1.0, 0.5], np.float32)
    flat2 = refit_flat_bvh(flat, pos2, idx)
    # traversal against the refit structure == brute force on new verts
    tri2 = pos2[idx.reshape(-1, 3)]
    v0 = jnp.asarray(tri2[:, 0])
    e1 = jnp.asarray(tri2[:, 1] - tri2[:, 0])
    e2 = jnp.asarray(tri2[:, 2] - tri2[:, 0])
    R = 512
    o = jnp.asarray(((rng.random((R, 3)) - 0.5) * 30).astype(np.float32))
    d = rng.standard_normal((R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    a = trace_rays_pallas(flat2, o, jnp.asarray(d), 1e-4, 1e4,
                          interpret=True)
    b = trace_bruteforce(v0, e1, e2, o, jnp.asarray(d), 1e-4, 1e4)
    assert np.array_equal(np.asarray(a.hit), np.asarray(b.hit))
    m = np.asarray(a.hit)
    np.testing.assert_allclose(np.asarray(a.t)[m], np.asarray(b.t)[m],
                               rtol=1e-4)


def test_bvh4_matches_bruteforce_and_masks(rng):
    from raytracedggx_tpu.ops.wide import flatten_bvh4, trace_rays_pallas4
    pos, idx = random_tris(rng, 220, spread=4.0)
    bvh = build_lbvh(pos, idx)
    tri = pos[idx.reshape(-1, 3)]
    v0 = jnp.asarray(tri[:, 0])
    e1 = jnp.asarray(tri[:, 1] - tri[:, 0])
    e2 = jnp.asarray(tri[:, 2] - tri[:, 0])
    wide = flatten_bvh4(bvh, v0, e1, e2, leaf_size=4)
    R = 1024
    o = jnp.asarray(((rng.random((R, 3)) - 0.5) * 16).astype(np.float32))
    d = rng.standard_normal((R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = jnp.where(jnp.arange(R) % 5 == 0, -1.0, 1e4)
    a = trace_rays_pallas4(wide, o, jnp.asarray(d), 1e-4, tmax,
                           interpret=True)
    b = trace_bruteforce(v0, e1, e2, o, jnp.asarray(d), 1e-4, 1e4)
    want_hit = np.asarray(b.hit) & (np.arange(R) % 5 != 0)
    assert np.array_equal(np.asarray(a.hit), want_hit)
    m = np.asarray(a.hit)
    np.testing.assert_allclose(np.asarray(a.t)[m], np.asarray(b.t)[m],
                               rtol=1e-4)


def test_bvh4_full_pipeline_smoke():
    """traversal='pallas4' renders the tiny scene (interpret on CPU)."""
    from raytracedggx_tpu.scene import Scene, default_materials
    from raytracedggx_tpu.scene.mesh import ground_cube
    from raytracedggx_tpu.engine import Renderer, RenderConfig

    scene = Scene(meshes=[ground_cube(), ground_cube()],
                  materials=default_materials(),
                  pos_scale=np.array([0, 3.0, 0, 1.0], np.float32))
    a = Renderer(scene, config=RenderConfig(width=48, height=32,
                                            traversal="pallas4",
                                            sort_secondary=False))
    sa = a.init_state()
    sa, fa, _ = a.step(sa)
    b = Renderer(scene, config=RenderConfig(width=48, height=32,
                                            traversal="jax"))
    sb = b.init_state()
    sb, fb, _ = b.step(sb)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                               atol=1e-4, rtol=1e-3)
