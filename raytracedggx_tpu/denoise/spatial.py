"""Edge-aware separable spatial filters (reflection + diffuse).

Semantics of CSSpatial_{H,V}_{Refl,Diff}.hlsl + SpatialFilter.hlsli +
FilterCommon.hlsli, as fused jnp stencils:

- radius 16, 33 taps per axis (SpatialFilter.hlsli:8-9)
- filtering in Reinhard tone-mapped domain with luma base (0.25, 0.5, 0.25)
  (FilterCommon.hlsli:14-27)
- weights (SpatialFilter.hlsli:57-83): hit gate (normal alpha) x Gaussian
  with roughness-derived radius (FilterCommon.hlsli:49-52) x normal
  alignment ^512 (reflection) / ^32 (diffuse) x depth exp(-|zC-z|*zC*4) x
  roughness similarity 1-smoothstep(0,0.5,|r-rC|); the diffuse filter
  additionally drops metallic >= 1 taps (CSSpatial_H_Diff.hlsl:40)
- out-of-bounds taps read as zeros (HLSL OOB load), which the hit gate
  kills; the vertical diffuse pass composites the filtered reflection:
  out = dest.rgb + ITM(mu) (CSSpatial_V_Diff.hlsl:58)

Each pass is a static 33-tap shift-and-accumulate over (H, W, C) arrays —
pure VPU work XLA fuses into one loop nest; the Pallas VMEM-tiled variant
(ops/) mirrors the reference's shared-memory '_S' shader toggle.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

RADIUS = 16
LUM_BASE = np.array([0.25, 0.5, 0.25], np.float32)
SIGMA_Z = 4.0


def tm(rgb):
    """Reinhard TM in luma (FilterCommon.hlsli:14-19)."""
    lum = jnp.einsum("...c,c->...", rgb, jnp.asarray(LUM_BASE))
    return rgb / (1.0 + lum[..., None])


def itm(rgb):
    """Inverse (FilterCommon.hlsli:24-27)."""
    lum = jnp.einsum("...c,c->...", rgb, jnp.asarray(LUM_BASE))
    return rgb / (1.0 - lum[..., None])


def _shift(img, dy, dx):
    """Shift with zero fill (HLSL out-of-bounds loads return 0)."""
    h, w = img.shape[0], img.shape[1]
    pad = [(max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))]
    pad += [(0, 0)] * (img.ndim - 2)
    p = jnp.pad(img, pad)
    return p[max(-dy, 0):max(-dy, 0) + h, max(-dx, 0):max(-dx, 0) + w]


def _gaussian_radius(rough, width, height):
    """GaussianRadiusFromRoughness (FilterCommon.hlsli:49-52): int clamp."""
    return jnp.clip(0.1 * rough * width, 0.0, height * 0.05
                    ).astype(jnp.int32).astype(jnp.float32)


def _gaussian(r, blur_radius):
    sigma = (blur_radius + 1.0) / 3.0
    a = r / sigma
    return jnp.exp(-0.5 * a * a)


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _axis_offsets(axis):
    return [((i, 0) if axis == 0 else (0, i))
            for i in range(-RADIUS, RADIUS + 1)]


def _reflection_pass(src_tm, normal, rough, depth, axis, width, height):
    """One separable reflection pass over tone-mapped source (H, W, 3)."""
    n_c = normal[..., :3] * 2.0 - 1.0
    hit_c = normal[..., 3] > 0.0
    br = _gaussian_radius(rough, width, height)

    mu = jnp.zeros_like(src_tm)
    wsum = jnp.zeros(src_tm.shape[:2], jnp.float32)
    for dy, dx in _axis_offsets(axis):
        i = dy if axis == 0 else dx
        nrm = _shift(normal, dy, dx)
        s = _shift(src_tm, dy, dx)
        dep = _shift(depth, dy, dx)
        rgh = _shift(rough, dy, dx)
        n = nrm[..., :3] * 2.0 - 1.0
        w = jnp.where(nrm[..., 3] > 0.0, 1.0, 0.0)
        w = w * _gaussian(float(abs(i)), br)
        # clamp: out-of-bounds taps decode to n=(-1,-1,-1) whose dot can
        # exceed 1, and x^512 then overflows to inf -> 0*inf = NaN (the
        # gate is zero there); unit normals never exceed 1
        w = w * jnp.clip(jnp.sum(n_c * n, axis=-1), 0.0, 1.0) ** 512.0
        w = w * jnp.exp(-jnp.abs(depth - dep) * depth * SIGMA_Z)
        w = w * (1.0 - _smoothstep(0.0, 0.5, jnp.abs(rgh - rough)))
        mu = mu + s * w[..., None]
        wsum = wsum + w
    mu = mu / jnp.maximum(wsum, 1e-30)[..., None]
    return mu, hit_c


def reflection_spatial_filter(refl, normal, rough, depth, width, height,
                              impl: str = "xla", interpret: bool = False):
    """H then V pass (Denoiser::reflectionSpatialFilter, Denoiser.cpp:361-409).
    refl: (H, W, 3) raw radiance. Returns (H, W, 4): rgb filtered + hit mask
    alpha (CSSpatial_V_Refl.hlsl:16-59).

    impl="pallas" selects the VMEM-tiled kernels (ops/spatial_pallas.py) —
    the reference's shared-memory '[V]' toggle analog; identical math."""
    if impl == "pallas":
        from ..ops.spatial_pallas import reflection_pass_pallas as rp

        def _pass(src, normal, rough, depth, axis, width, height):
            return rp(src, normal, rough, depth, width, height, axis,
                      interpret=interpret)
    else:
        _pass = _reflection_pass
    src_tm = tm(refl)
    h_out, hit = _pass(src_tm, normal, rough, depth, axis=1,
                       width=width, height=height)
    h_out = jnp.where(hit[..., None], h_out, 0.0)
    v_out, hit = _pass(h_out, normal, rough, depth, axis=0,
                       width=width, height=height)
    filtered = jnp.concatenate([itm(v_out), jnp.ones_like(v_out[..., :1])],
                               axis=-1)
    passthrough = jnp.concatenate([refl, jnp.zeros_like(refl[..., :1])],
                                  axis=-1)
    return jnp.where(hit[..., None], filtered, passthrough)


def _diffuse_pass(src_tm, normal, metal, depth, axis):
    n_c = normal[..., :3] * 2.0 - 1.0
    hit_c = (normal[..., 3] > 0.0) & (metal < 1.0)

    mu = jnp.zeros_like(src_tm)
    wsum = jnp.zeros(src_tm.shape[:2], jnp.float32)
    for dy, dx in _axis_offsets(axis):
        nrm = _shift(normal, dy, dx)
        s = _shift(src_tm, dy, dx)
        dep = _shift(depth, dy, dx)
        mtl = _shift(metal, dy, dx)
        n = nrm[..., :3] * 2.0 - 1.0
        gate = (nrm[..., 3] > 0.0) & (mtl < 1.0)
        w = jnp.where(gate, 1.0, 0.0)
        # clip (not max): see the reflection pass note on OOB taps
        w = w * jnp.clip(jnp.sum(n_c * n, axis=-1), 0.0, 1.0) ** 32.0
        w = w * jnp.exp(-jnp.abs(depth - dep) * depth * SIGMA_Z)
        mu = mu + s * w[..., None]
        wsum = wsum + w
    mu = mu / jnp.maximum(wsum, 1e-30)[..., None]
    return mu, hit_c


def diffuse_spatial_filter(diff, filtered_refl, normal, metal, depth,
                           impl: str = "xla", interpret: bool = False):
    """H then V diffuse pass, compositing the filtered reflection:
    out = filtered_refl.rgb + ITM(mu), alpha = filtered_refl.a
    (CSSpatial_V_Diff.hlsl:17-59). Pixels failing the gate pass
    filtered_refl through unchanged."""
    if impl == "pallas":
        from ..ops.spatial_pallas import diffuse_pass_pallas as dp

        def _pass(src, normal, metal, depth, axis):
            return dp(src, normal, metal, depth, axis, interpret=interpret)
    else:
        _pass = _diffuse_pass
    src_tm = tm(diff)
    h_out, gate = _pass(src_tm, normal, metal, depth, axis=1)
    h_out = jnp.where(gate[..., None], h_out, 0.0)
    v_out, gate = _pass(h_out, normal, metal, depth, axis=0)
    composite = jnp.concatenate(
        [filtered_refl[..., :3] + itm(v_out), filtered_refl[..., 3:4]],
        axis=-1)
    return jnp.where(gate[..., None], composite, filtered_refl)
