"""Ray-triangle (Möller–Trumbore) and ray-AABB (slab) tests.

The TPU-native replacement for the fixed-function/driver intersection the
reference gets from DXR ``TraceRay`` (RayTracing.hlsl:194).  Barycentrics
follow the DXR convention: (u, v) weigh vertices 1 and 2, w0 = 1-u-v
(interpAttrib, RayTracing.hlsl:249-271).  Vectorized over rays (VPU work).
"""

from __future__ import annotations

import jax.numpy as jnp


def moller_trumbore(ray_o, ray_d, v0, e1, e2, t_min, t_max):
    """Intersect rays with per-ray triangles (all args (..., 3)).

    e1 = v1 - v0, e2 = v2 - v0.  Returns (t, u, v, hit).  No backface
    culling (the reference traces RAY_FLAG_NONE, RayTracing.hlsl:194).
    Degenerate determinants produce NaN which fails every comparison ->
    counted as a miss.
    """
    pvec = jnp.cross(ray_d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = 1.0 / det
    tvec = ray_o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(ray_d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= t_min) & (t <= t_max)
    return t, u, v, hit


def ray_aabb(ray_o, inv_d, box_min, box_max, t_min, t_max):
    """Slab test. Returns (t_near, hit). inv_d precomputed (safe, no zeros).
    NaN-free for axis-parallel rays because inv_d is finite."""
    t0 = (box_min - ray_o) * inv_d
    t1 = (box_max - ray_o) * inv_d
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tnear <= tfar) & (tfar >= t_min) & (tnear <= t_max)
    return tnear, hit


def safe_inv_dir(ray_d, eps=1e-20):
    """1/d with zero components clamped to +-1/eps-safe values."""
    d = jnp.where(jnp.abs(ray_d) < eps,
                  jnp.where(ray_d >= 0, eps, -eps), ray_d)
    return 1.0 / d
