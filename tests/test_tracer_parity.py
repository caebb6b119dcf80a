"""Pallas packet kernel vs pure-JAX traversal on the FULL ray-trace pass —
the analog of the reference's DXR-vs-compute-fallback duality (the two
implementations of the traversal contract must agree; SURVEY.md §2.3)."""

import numpy as np
import jax.numpy as jnp

from raytracedggx_tpu.bvh import build_tlas
from raytracedggx_tpu.scene import Scene, Camera, default_materials
from raytracedggx_tpu.scene.mesh import ground_cube
from raytracedggx_tpu.trace.geometry import upload_scene
from raytracedggx_tpu.trace.env import procedural_env
from raytracedggx_tpu.trace.raygen import (MaterialsDev, ray_trace_pass,
                                           default_tracer, pallas_tracer)
from raytracedggx_tpu.sh import project_sh9

W, H = 64, 32


def test_pallas_pipeline_matches_jax():
    scene = Scene(meshes=[ground_cube(), ground_cube()],
                  materials=default_materials(),
                  pos_scale=np.array([0, 3.0, 0, 1.0], np.float32))
    cam = Camera(width=W, height=H)
    geom = upload_scene(scene)
    env = procedural_env(16)
    sh = project_sh9(np.full((6, 8, 8, 3), 1.0, np.float32))
    mats = MaterialsDev(jnp.asarray(scene.materials.base_colors),
                        jnp.asarray(scene.materials.rough_metals))

    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_raytrace import make_frame

    consts, worlds = make_frame(scene, cam, angle=0.2)
    tlas = build_tlas(list(geom.blas), worlds, mesh_ids=(0, 1))

    a = ray_trace_pass(geom, tlas, consts, mats, env, sh, W, H,
                       trace_fn=default_tracer(geom))
    b = ray_trace_pass(geom, tlas, consts, mats, env, sh, W, H,
                       trace_fn=pallas_tracer(geom, interpret=True))

    assert np.array_equal(np.asarray(a["vis"]), np.asarray(b["vis"]))
    for key in ["refl", "diff", "normal", "depth", "velocity"]:
        np.testing.assert_allclose(np.asarray(a[key]), np.asarray(b[key]),
                                   atol=1e-4, rtol=1e-3, err_msg=key)
