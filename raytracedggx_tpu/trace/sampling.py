"""Sample generation: PCG hash RNG + GGX / cosine direction sampling.

Bit-exact replication of the reference's per-pixel sample parameterization
(RayTracing.hlsl:379-406): a condensed pcg_output_rxs_m_xs_32_32 hash seeded
by linear pixel id, re-hashed with the frame index (mod 256), producing the
2-D xi used by BOTH the reflection and diffuse sample of a pixel in the same
frame (computeReflection:437 and computeDiffuse:501 call getSampleParam with
identical arguments).

Direction sampling (RayTracing.hlsl:92-162):
- GGX half-vector: cos(theta) = sqrt((1-xi2)/(1+(a^2-1)*xi2)), ONB transform
- cosine hemisphere: normalize(N + uniform_sphere(xi))
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

TWO_PI = 2.0 * np.pi


def pcg(seed):
    """pcg_output_rxs_m_xs_32_32, condensed (RayTracing.hlsl:379-387)."""
    seed = seed.astype(jnp.uint32)
    seed = seed * jnp.uint32(747796405) + jnp.uint32(1)
    seed = ((seed >> ((seed >> jnp.uint32(28)) + jnp.uint32(4))) ^ seed
            ) * jnp.uint32(277803737)
    seed = (seed >> jnp.uint32(22)) ^ seed
    return seed


def rng_float2(s, num):
    """RNG(i, num) (RayTracing.hlsl:389-392): (i/num, (RNG(i)&0xffff)/65536)."""
    x = s.astype(jnp.float32) / float(num)
    y = (pcg(s) & jnp.uint32(0xFFFF)).astype(jnp.float32) / float(0x10000)
    return jnp.stack([x, y], axis=-1)


def sample_param(px, py, width, frame_index, num_samples: int = 256):
    """getSampleParam (RayTracing.hlsl:394-406). px/py int32 arrays;
    frame_index uint32 scalar (mod 256 upstream, RayTracer.cpp:295)."""
    s = (py * width + px).astype(jnp.uint32)
    s = pcg(s)
    s = s + jnp.asarray(frame_index, jnp.uint32)
    s = pcg(s)
    s = s % jnp.uint32(num_samples)
    return rng_float2(s, num_samples)


def orthonormal_basis(n):
    """computeLocalToWorld (RayTracing.hlsl:129-138): rows (x, y, z=n)."""
    up = jnp.where(jnp.abs(n[..., 1:2]) < 0.999,
                   jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
                   jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
    x = jnp.cross(up, n)
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    y = jnp.cross(n, x)
    return x, y


def ggx_dir(a, n, xi):
    """computeDirectionGGX (RayTracing.hlsl:92-101, 141-147): sample the
    GGX half-vector distribution around normal n (a = roughness^2)."""
    phi = TWO_PI * xi[..., 0]
    cos_t = jnp.sqrt((1.0 - xi[..., 1])
                     / (1.0 + (a * a - 1.0) * xi[..., 1]))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    lx = jnp.cos(phi) * sin_t
    ly = jnp.sin(phi) * sin_t
    x, y = orthonormal_basis(n)
    return (x * lx[..., None] + y * ly[..., None] + n * cos_t[..., None])


def uniform_sphere(xi):
    """computeLocalDirectionUS (RayTracing.hlsl:103-112)."""
    phi = TWO_PI * xi[..., 0]
    cos_t = 1.0 - 2.0 * xi[..., 1]
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    return jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t],
                     axis=-1)


def cos_dir(n, xi):
    """computeDirectionCos (RayTracing.hlsl:150-162, active #if-1 branch):
    normalize(N + uniform_sphere(xi)) — cosine-weighted hemisphere."""
    d = n + uniform_sphere(xi)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-20)
