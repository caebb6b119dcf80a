import numpy as np

from raytracedggx_tpu.io.obj import load_obj
from raytracedggx_tpu.scene.mesh import ground_cube


def test_ground_cube_shape():
    m = ground_cube()
    assert m.positions.shape == (24, 3)
    assert m.indices.shape == (36,)
    assert m.num_triangles == 12
    # all normals unit, matching their face
    assert np.allclose(np.linalg.norm(m.normals, axis=1), 1.0)


def test_load_simple_obj(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text("""
v 0 0 0
v 1 0 0
v 0 1 0
f 1 2 3
""")
    m = load_obj(str(p))
    assert m.positions.shape == (3, 3)
    assert m.indices.shape == (3,)
    # forDX negates z (all zero here) and reverses indices: [0,1,2]->[2,1,0]
    assert list(m.indices) == [2, 1, 0]
    # recomputed normal: cross(v1-v0, v2-v1) on the REVERSED winding
    # original winding normal is +z; reversed gives -z; z also negated by DX
    # handedness, so the stored normal faces -z in the loaded (DX) space.
    assert np.allclose(m.normals, [[0, 0, -1]] * 3, atol=1e-6)


def test_quad_fan_triangulation(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text("""
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3 4
""")
    m = load_obj(str(p))
    assert m.num_triangles == 2
    # fan (0,1,2),(0,2,3) then whole-buffer reversal
    assert list(m.indices) == [3, 2, 0, 2, 1, 0]


def test_file_normals_with_split(tmp_path):
    p = tmp_path / "split.obj"
    # two triangles sharing vertex 1 with different normals -> vertex split
    p.write_text("""
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vn 0 0 1
vn 0 0 -1
f 1//1 2//1 3//1
f 2//2 4//2 3//2
""")
    m = load_obj(str(p))
    # at least one vertex must be split (shared verts 2,3 have 2 normals)
    assert m.positions.shape[0] > 4
    assert m.indices.shape == (6,)
    # every referenced vertex has a unit normal
    used = np.unique(m.indices)
    assert np.allclose(np.linalg.norm(m.normals[used], axis=1), 1.0, atol=1e-6)


def test_load_bunny(bunny_path):
    m = load_obj(bunny_path)
    assert m.positions.shape[0] == 34835
    assert m.indices.shape[0] == 69666 * 3
    assert np.allclose(np.linalg.norm(m.normals, axis=1), 1.0, atol=1e-4)
    # z negated relative to raw file: AABB sanity (bunny sits above y=0)
    assert m.aabb_min[1] >= -1.0


def test_load_turing_bowl_file_normals():
    import os
    p = "/root/reference/Bin/Assets/TuringBowl.obj"
    if not os.path.exists(p):
        import pytest
        pytest.skip("asset missing")
    m = load_obj(p)
    used = np.unique(m.indices)
    assert np.allclose(np.linalg.norm(m.normals[used], axis=1), 1.0, atol=1e-3)
    assert m.positions.shape[0] >= 15359  # at least one split occurred
