import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracedggx_tpu.bvh import build_tlas
from raytracedggx_tpu.scene import Scene, Camera, default_materials
from raytracedggx_tpu.scene.mesh import ground_cube, Mesh
from raytracedggx_tpu.trace.geometry import upload_scene
from raytracedggx_tpu.trace.env import procedural_env, sample_env
from raytracedggx_tpu.trace.raygen import (FrameConstants, MaterialsDev,
                                           ray_trace_pass, primary_surface)
from raytracedggx_tpu.sh import project_sh9
from raytracedggx_tpu.utils import math3d as m3


W, H = 64, 36


def tiny_scene():
    """Ground cube + a small floating cube as the 'model'."""
    model = ground_cube()
    scene = Scene(meshes=[ground_cube(), model],
                  materials=default_materials(),
                  pos_scale=np.array([0, 3.0, 0, 1.0], np.float32))
    return scene


def make_frame(scene, cam, angle=0.0, prev_angle=None, bias=(0.0, 0.0)):
    vp = cam.view_proj()
    worlds = scene.worlds(angle)
    worlds_prev = scene.worlds(angle if prev_angle is None else prev_angle)
    wvp = jnp.einsum("ijk,kl->ijl", worlds, vp)
    wvp_prev = jnp.einsum("ijk,kl->ijl", worlds_prev, vp)
    return FrameConstants(
        world_view_projs=wvp,
        world_view_projs_prev=wvp_prev,
        worlds=worlds,
        world_its=scene.normal_matrices(worlds),
        proj_to_world=m3.inverse(vp),
        eye=jnp.asarray(cam.eye),
        proj_bias=jnp.asarray(bias, jnp.float32),
        frame_index=jnp.uint32(0),
    ), worlds


@pytest.fixture(scope="module")
def setup():
    scene = tiny_scene()
    cam = Camera(width=W, height=H)
    geom = upload_scene(scene)
    env = procedural_env(16)
    sh = project_sh9(
        np.full((6, 8, 8, 3), 1.0, np.float32))
    mats = MaterialsDev(jnp.asarray(scene.materials.base_colors),
                        jnp.asarray(scene.materials.rough_metals))
    return scene, cam, geom, env, sh, mats


def test_primary_surface_vis_encoding(setup):
    scene, cam, geom, env, sh, mats = setup
    consts, worlds = make_frame(scene, cam)
    tlas = build_tlas(list(geom.blas), worlds, mesh_ids=(0, 1))
    surf = primary_surface(geom, tlas, consts, mats, W, H)
    vis = np.asarray(surf["vis"]).reshape(H, W)
    hit = np.asarray(surf["hit"]).reshape(H, W)
    assert hit.any() and not hit.all()
    # decode: non-zero entries decode to instance 0/1 and valid prim ids
    nz = vis[vis > 0] - 1
    inst = nz >> 24
    prim = nz & ((1 << 24) - 1)
    assert set(np.unique(inst)) <= {0, 1}
    assert prim.max() < 12
    # depth in (0, 1) for hits, 1 for sky
    depth = np.asarray(surf["depth"]).reshape(H, W)
    assert np.all(depth[~hit] == 1.0)
    assert np.all((depth[hit] > 0) & (depth[hit] < 1.0))


def test_ray_trace_pass_outputs(setup):
    scene, cam, geom, env, sh, mats = setup
    consts, worlds = make_frame(scene, cam)
    tlas = build_tlas(list(geom.blas), worlds, mesh_ids=(0, 1))
    out = ray_trace_pass(geom, tlas, consts, mats, env, sh, W, H)
    refl = np.asarray(out["refl"])
    diff = np.asarray(out["diff"])
    nrm = np.asarray(out["normal"])
    assert refl.shape == (H, W, 3) and np.isfinite(refl).all()
    assert np.isfinite(diff).all()
    hit = nrm[..., 3] > 0
    # sky pixels carry env radiance in both channels
    sky_refl = refl[~hit]
    assert sky_refl.min() > 0.0
    # metallic=1 hits have zero diffuse
    mtl = np.asarray(out["rough_metal"])[..., 1]
    assert np.all(diff[(mtl >= 1.0) & hit] == 0.0)
    # ground top face normals point up
    vis = np.asarray(out["vis"])
    inst = np.where(vis > 0, (vis - 1) >> 24, 255)
    g = inst == 0
    if g.any():
        n = nrm[g][:, :3] * 2 - 1
        assert n[:, 1].max() > 0.99


def test_velocity_zero_when_static(setup):
    scene, cam, geom, env, sh, mats = setup
    consts, worlds = make_frame(scene, cam, angle=0.3, prev_angle=0.3)
    tlas = build_tlas(list(geom.blas), worlds, mesh_ids=(0, 1))
    out = ray_trace_pass(geom, tlas, consts, mats, env, sh, W, H)
    vel = np.asarray(out["velocity"])
    assert np.abs(vel).max() < 1e-4


def test_velocity_nonzero_when_animated(setup):
    scene, cam, geom, env, sh, mats = setup
    consts, worlds = make_frame(scene, cam, angle=0.3, prev_angle=0.25)
    tlas = build_tlas(list(geom.blas), worlds, mesh_ids=(0, 1))
    out = ray_trace_pass(geom, tlas, consts, mats, env, sh, W, H)
    vel = np.asarray(out["velocity"])
    vis = np.asarray(out["vis"])
    model = np.where(vis > 0, (vis - 1) >> 24, 255) == 1
    assert np.abs(vel[model]).max() > 1e-4
    ground = np.where(vis > 0, (vis - 1) >> 24, 255) == 0
    assert np.abs(vel[ground]).max() < 1e-4


def test_bary_modes_agree(setup):
    scene, cam, geom, env, sh, mats = setup
    consts, worlds = make_frame(scene, cam)
    tlas = build_tlas(list(geom.blas), worlds, mesh_ids=(0, 1))
    a = primary_surface(geom, tlas, consts, mats, W, H, bary_mode="direct")
    b = primary_surface(geom, tlas, consts, mats, W, H, bary_mode="ndc")
    hit = np.asarray(a["hit"])
    pa = np.asarray(a["p"])[hit]
    pb = np.asarray(b["p"])[hit]
    np.testing.assert_allclose(pa, pb, atol=5e-3)


def test_multi_instance_tlas(setup):
    """BASELINE config 5: more than two instances, distinct ids decoded."""
    scene0, cam, _, env, sh, _ = setup
    import numpy as np
    from raytracedggx_tpu.scene import Scene, default_materials
    from raytracedggx_tpu.scene.mesh import ground_cube
    from raytracedggx_tpu.trace.geometry import upload_scene
    from raytracedggx_tpu.trace.raygen import MaterialsDev

    scene = Scene(meshes=[ground_cube(), ground_cube()],
                  materials=default_materials(),
                  pos_scale=np.array([-4, 2.0, 0, 1.0], np.float32),
                  extra_instances=((4.0, 2.0, 0.0, 1.0),
                                   (0.0, 5.5, 0.0, 0.8)))
    assert scene.mesh_ids == (0, 1, 1, 1)
    geom = upload_scene(scene)
    im = scene.instance_materials()
    mats = MaterialsDev(jnp.asarray(im.base_colors),
                        jnp.asarray(im.rough_metals))
    consts, worlds = make_frame(scene, cam, angle=0.1)
    tlas = build_tlas(list(geom.blas), worlds, mesh_ids=scene.mesh_ids)
    surf = primary_surface(geom, tlas, consts, mats, W, H)
    vis = np.asarray(surf["vis"])
    inst = np.unique((vis[vis > 0] - 1) >> 24)
    # ground + at least two of the three model instances visible
    assert 0 in inst and len(inst) >= 3
