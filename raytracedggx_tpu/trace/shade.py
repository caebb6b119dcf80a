"""Material evaluation: procedural UV + checkerboard roughness.

Material.hlsli: triplanar-style UV from object-space position/normal
(getUV :16-23), per-instance constant base color (:25-28), checkerboard
roughness on the ground instance — 5x5 tiles, alternate tiles roughness*0.25
(:30-40).
"""

from __future__ import annotations

import jax.numpy as jnp


def get_uv(nrm, pos, scl=(1.0, 0.2, 1.0)):
    """getUV (Material.hlsli:16-23). nrm/pos (..., 3) object space."""
    ax = jnp.abs(nrm[..., 0:1])
    ay = jnp.abs(nrm[..., 1:2])
    az = jnp.abs(nrm[..., 2:3])
    yz = jnp.stack([pos[..., 1] * scl[1], pos[..., 2] * scl[2]], axis=-1)
    zx = jnp.stack([pos[..., 2] * scl[2], pos[..., 0] * scl[0]], axis=-1)
    xy = jnp.stack([pos[..., 0] * scl[0], pos[..., 1] * scl[1]], axis=-1)
    uv = ax * yz + ay * zx + az * xy
    return uv * 0.5 + 0.5


def get_rough_metal(rough_metals, inst, uv):
    """getRoughMetal (Material.hlsli:43-49): per-instance roughness with
    the instance-0 checkerboard (uint truncation of uv*5, xor parity)."""
    from .raygen import take_small

    rm = take_small(rough_metals, inst, rough_metals.shape[0])
    rough = rm[..., 0]
    metal = rm[..., 1]
    p = (uv * 5.0).astype(jnp.uint32) & jnp.uint32(1)
    checker = (p[..., 0] ^ p[..., 1]) != 0
    rough = jnp.where((inst == 0) & checker, rough * 0.25, rough)
    return rough, metal


def get_base_color(base_colors, inst):
    from .raygen import take_small

    return take_small(base_colors, inst, base_colors.shape[0])
