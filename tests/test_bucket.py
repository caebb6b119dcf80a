"""Bucketed secondary wave (trace/raygen._trace_shade_bucketed_fused):
the live-prefix fast path must match the full sorted path bit-for-bit
when the live rays fit the bucket, and fall back to it when they don't.
"""

import jax.numpy as jnp
import numpy as np

from raytracedggx_tpu.ops.scene_wide import (build_scene_wide,
                                             trace_scene_wide_fused)
from raytracedggx_tpu.ops.traverse_pallas import sort_rays_morton
from raytracedggx_tpu.scene import Scene, default_materials
from raytracedggx_tpu.scene.mesh import ground_cube
from raytracedggx_tpu.trace.geometry import upload_scene
from raytracedggx_tpu.trace.raygen import (_trace_shade_bucketed_fused,
                                           _trace_shade_ordered_fused)
from raytracedggx_tpu.trace.env import procedural_env


def _setup(rng, n, live_frac):
    scene = Scene(meshes=[ground_cube(), ground_cube()],
                  materials=default_materials(),
                  pos_scale=np.array([0.0, 2.0, 0.0, 1.0], np.float32))
    geom = upload_scene(scene)
    sw = build_scene_wide(geom, scene.mesh_ids,
                          worlds=scene.worlds(0.4))

    o = rng.uniform(-4.0, 4.0, size=(n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(3.0, 7.0, size=n)
    tgt = rng.uniform(-2.0, 2.0, size=(n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.where(rng.uniform(size=n) < live_frac, 1e4, -1.0
                    ).astype(np.float32)

    def trace_fused(o, d, tmin, tm):
        return trace_scene_wide_fused(sw, o, d, tmin, tm, interpret=True)

    def shade(rec, nrm, o_s, d_s):
        # toy hit shading with a normal-dependent term so ordering bugs
        # show up in the values.  Second element: optional unified env
        # tap (None -> the caller samples the miss env itself)
        return jnp.abs(nrm) + 0.25 * d_s, None

    env = procedural_env(16)
    order = sort_rays_morton(jnp.asarray(o), jnp.asarray(d),
                             jnp.full(3, -6.0), jnp.full(3, 6.0),
                             active=jnp.asarray(tmax) > 0)
    return (trace_fused, shade, env, jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(tmax), order)


def test_bucket_prefix_matches_full(rng):
    args = _setup(rng, 4096, live_frac=0.2)     # ~800 live
    ref_rad, ref_hit = _trace_shade_ordered_fused(*args[:5], 0.0, args[5],
                                                  args[6])
    rad, hit = _trace_shade_bucketed_fused(*args[:5], 0.0, args[5],
                                           args[6], bucket=1024)
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(ref_hit))
    np.testing.assert_allclose(np.asarray(rad), np.asarray(ref_rad),
                               rtol=1e-6, atol=1e-6)


def test_bucket_overflow_falls_back(rng):
    args = _setup(rng, 4096, live_frac=0.9)     # ~3700 live > bucket
    ref_rad, ref_hit = _trace_shade_ordered_fused(*args[:5], 0.0, args[5],
                                                  args[6])
    rad, hit = _trace_shade_bucketed_fused(*args[:5], 0.0, args[5],
                                           args[6], bucket=1024)
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(ref_hit))
    np.testing.assert_allclose(np.asarray(rad), np.asarray(ref_rad),
                               rtol=1e-6, atol=1e-6)
