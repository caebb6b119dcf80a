import numpy as np
import jax.numpy as jnp

from raytracedggx_tpu.utils import math3d as m3


def test_perspective_lh_maps_near_far():
    p = np.asarray(m3.perspective_fov_lh(np.pi / 4, 16 / 9, 1.0, 1000.0))
    # row-vector convention: clip = [x y z 1] @ P
    near = np.array([0, 0, 1.0, 1.0]) @ p
    far = np.array([0, 0, 1000.0, 1.0]) @ p
    assert abs(near[2] / near[3]) < 1e-6          # z_ndc(near) = 0
    assert abs(far[2] / far[3] - 1.0) < 1e-5      # z_ndc(far) = 1
    assert near[3] == 1.0                          # w = view z


def test_look_at_lh_basis():
    v = np.asarray(m3.look_at_lh([0, 0, -10], [0, 0, 0], [0, 1, 0]))
    # camera at -z looking at origin: forward = +z
    p = np.array([0.0, 0.0, 0.0, 1.0]) @ v
    assert np.allclose(p, [0, 0, 10, 1], atol=1e-6)
    # a point right of view dir (+x in LH) maps to +x
    p = np.array([3.0, 0.0, 0.0, 1.0]) @ v
    assert np.allclose(p, [3, 0, 10, 1], atol=1e-6)


def test_rotation_y_matches_directxmath():
    r = np.asarray(m3.rotation_y(np.pi / 2))
    # v * M: +z rotates to +x (DirectXMath row-vector convention)
    v = np.array([0.0, 0.0, 1.0, 1.0]) @ r
    assert np.allclose(v[:3], [1, 0, 0], atol=1e-6)


def test_world_composition_order():
    # scaling * rotation * translation (row-vector: applied left to right)
    w = np.asarray(m3.scaling(2, 2, 2) @ m3.rotation_y(np.pi / 2)
                   @ m3.translation(5, 0, 0))
    v = np.array([0.0, 0.0, 1.0, 1.0]) @ w
    # scale: (0,0,2) -> rotY90: (2,0,0) -> translate: (7,0,0)
    assert np.allclose(v[:3], [7, 0, 0], atol=1e-5)


def test_normal_matrix_nonuniform_scale():
    w = m3.scaling(10.0, 0.5, 10.0)
    nm = np.asarray(m3.normal_matrix(w))
    n = np.array([0.0, 1.0, 0.0]) @ nm
    n = n / np.linalg.norm(n)
    assert np.allclose(n, [0, 1, 0], atol=1e-6)


def test_reflect():
    i = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2)
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = np.asarray(m3.reflect(i, n))
    assert np.allclose(r, [[1 / np.sqrt(2), 1 / np.sqrt(2), 0]], atol=1e-6)


def test_proj_unproject_roundtrip():
    from raytracedggx_tpu.scene.camera import Camera
    cam = Camera(width=64, height=64)
    vp = np.asarray(cam.view_proj())
    inv = np.linalg.inv(vp)
    pt = np.array([1.0, 2.0, 3.0, 1.0])
    clip = pt @ vp
    ndc = clip / clip[3]
    back = ndc @ inv
    back = back / back[3]
    assert np.allclose(back[:3], pt[:3], atol=1e-3)
