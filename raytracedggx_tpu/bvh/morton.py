"""30-bit 3-D Morton codes for LBVH construction.

TPU-native replacement for the driver-internal BLAS builder behind
``BuildRaytracingAccelerationStructure`` (XUSGRayTracing.h:306-322): we sort
triangle centroids along a Morton curve and build a Karras radix tree.
Pure jnp uint32 bit arithmetic; runs on device at scene-build time.
"""

from __future__ import annotations

import jax.numpy as jnp


def expand_bits(v):
    """Spread the low 10 bits of each uint32 lane to every 3rd bit."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(points, lo, hi):
    """Morton codes for (N, 3) points normalized into the [lo, hi] AABB."""
    x = (points - lo) / jnp.maximum(hi - lo, 1e-20)
    q = jnp.clip(x * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    xx = expand_bits(q[:, 0])
    yy = expand_bits(q[:, 1])
    zz = expand_bits(q[:, 2])
    return (xx << 2) | (yy << 1) | zz
