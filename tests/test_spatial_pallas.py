"""A/B parity: Pallas VMEM-tiled filters vs XLA stencils — the analog of
the reference's '[V] shared-memory toggle must not change the image'
self-check (RayTracedGGX.cpp:391-396; SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from raytracedggx_tpu.denoise import (reflection_spatial_filter,
                                      diffuse_spatial_filter)

H, W = 24, 32


def gbuffers(rng):
    normal = rng.random((H, W, 4)).astype(np.float32)
    n = normal[..., :3] * 2 - 1
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    normal[..., :3] = n * 0.5 + 0.5
    normal[..., 3] = (rng.random((H, W)) > 0.2).astype(np.float32)
    rough = rng.random((H, W)).astype(np.float32)
    depth = (0.3 + 0.6 * rng.random((H, W))).astype(np.float32)
    metal = rng.choice([0.0, 0.5, 1.0], size=(H, W)).astype(np.float32)
    return (jnp.asarray(normal), jnp.asarray(rough), jnp.asarray(depth),
            jnp.asarray(metal))


def test_reflection_filter_pallas_matches_xla(rng):
    normal, rough, depth, metal = gbuffers(rng)
    refl = jnp.asarray(rng.random((H, W, 3)).astype(np.float32) * 3)
    a = np.asarray(reflection_spatial_filter(refl, normal, rough, depth,
                                             W, H, impl="xla"))
    b = np.asarray(reflection_spatial_filter(refl, normal, rough, depth,
                                             W, H, impl="pallas",
                                             interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)


def test_diffuse_filter_pallas_matches_xla(rng):
    normal, rough, depth, metal = gbuffers(rng)
    diff = jnp.asarray(rng.random((H, W, 3)).astype(np.float32) * 2)
    flt_rfl = jnp.asarray(rng.random((H, W, 4)).astype(np.float32))
    a = np.asarray(diffuse_spatial_filter(diff, flt_rfl, normal, metal,
                                          depth, impl="xla"))
    b = np.asarray(diffuse_spatial_filter(diff, flt_rfl, normal, metal,
                                          depth, impl="pallas",
                                          interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)
