"""Pallas VMEM-tiled spatial filter passes — the '[V]' toggle variant.

The reference ships each spatial filter twice: a direct 8x8 dispatch and a
shared-memory wave variant (CSSpatial_*_S.hlsl) toggled at runtime with the
V key (RayTracedGGX.cpp:391-396), mathematically identical.  Here the XLA
stencils (denoise/spatial.py) are the 'direct' path, and these Pallas
kernels — row bands resident in VMEM, 33 taps fully unrolled over lanes —
are the explicitly-tiled analog.  `RenderConfig.kernels="pallas"` selects
them; outputs must match the XLA path bit-for-bit (A/B test, mirroring the
reference's toggle-pair self-check, SURVEY.md §4).

The horizontal pass is the kernel; the vertical pass reuses it on
transposed planes (taps then run along lanes again).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RADIUS = 16
TILE_H = 8
SIGMA_Z = 4.0


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _refl_kernel(sr, sg, sb, nx, ny, nz, nw, rg, dp, br,
                 o_r, o_g, o_b, *, w):
    R = RADIUS

    def c(ref):
        return ref[:, R:R + w]

    ncx = c(nx) * 2.0 - 1.0
    ncy = c(ny) * 2.0 - 1.0
    ncz = c(nz) * 2.0 - 1.0
    rgh_c = c(rg)
    dep_c = c(dp)
    sigma = (c(br) + 1.0) / 3.0

    mu_r = jnp.zeros_like(ncx)
    mu_g = jnp.zeros_like(ncx)
    mu_b = jnp.zeros_like(ncx)
    wsum = jnp.zeros_like(ncx)
    for i in range(-R, R + 1):
        def s(ref, i=i):
            return ref[:, R + i:R + i + w]

        gate = jnp.where(s(nw) > 0.0, 1.0, 0.0)
        a = float(abs(i)) / sigma
        g = jnp.exp(-0.5 * a * a)
        ndot = (ncx * (s(nx) * 2.0 - 1.0) + ncy * (s(ny) * 2.0 - 1.0)
                + ncz * (s(nz) * 2.0 - 1.0))
        # clip to 1: OOB taps decode past unit length; x^512 would inf
        nwgt = jnp.clip(ndot, 0.0, 1.0) ** 512.0
        dwgt = jnp.exp(-jnp.abs(dep_c - s(dp)) * dep_c * SIGMA_Z)
        rwgt = 1.0 - _smoothstep(0.0, 0.5, jnp.abs(s(rg) - rgh_c))
        wgt = gate * g * nwgt * dwgt * rwgt
        mu_r = mu_r + s(sr) * wgt
        mu_g = mu_g + s(sg) * wgt
        mu_b = mu_b + s(sb) * wgt
        wsum = wsum + wgt
    inv = 1.0 / jnp.maximum(wsum, 1e-30)
    o_r[:, :] = mu_r * inv
    o_g[:, :] = mu_g * inv
    o_b[:, :] = mu_b * inv


def _diff_kernel(sr, sg, sb, nx, ny, nz, nw, mt, dp,
                 o_r, o_g, o_b, *, w):
    R = RADIUS

    def c(ref):
        return ref[:, R:R + w]

    ncx = c(nx) * 2.0 - 1.0
    ncy = c(ny) * 2.0 - 1.0
    ncz = c(nz) * 2.0 - 1.0
    dep_c = c(dp)

    mu_r = jnp.zeros_like(ncx)
    mu_g = jnp.zeros_like(ncx)
    mu_b = jnp.zeros_like(ncx)
    wsum = jnp.zeros_like(ncx)
    for i in range(-R, R + 1):
        def s(ref, i=i):
            return ref[:, R + i:R + i + w]

        gate = jnp.where((s(nw) > 0.0) & (s(mt) < 1.0), 1.0, 0.0)
        ndot = (ncx * (s(nx) * 2.0 - 1.0) + ncy * (s(ny) * 2.0 - 1.0)
                + ncz * (s(nz) * 2.0 - 1.0))
        nwgt = jnp.clip(ndot, 0.0, 1.0) ** 32.0
        dwgt = jnp.exp(-jnp.abs(dep_c - s(dp)) * dep_c * SIGMA_Z)
        wgt = gate * nwgt * dwgt
        mu_r = mu_r + s(sr) * wgt
        mu_g = mu_g + s(sg) * wgt
        mu_b = mu_b + s(sb) * wgt
        wsum = wsum + wgt
    inv = 1.0 / jnp.maximum(wsum, 1e-30)
    o_r[:, :] = mu_r * inv
    o_g[:, :] = mu_g * inv
    o_b[:, :] = mu_b * inv


def _run_pass(kernel, planes, w, h, interpret=False):
    """planes: list of (H, W) arrays already in tap order; pads lanes by
    RADIUS (zeros = HLSL OOB) and rows to a TILE_H multiple, launches the
    row-band grid, returns 3 (H, W) outputs."""
    hp = -(-h // TILE_H) * TILE_H
    padded = [jnp.pad(p, ((0, hp - h), (RADIUS, RADIUS))) for p in planes]
    grid = (hp // TILE_H,)
    in_spec = pl.BlockSpec((TILE_H, w + 2 * RADIUS), lambda g: (g, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TILE_H, w), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(kernel, w=w),
        grid=grid,
        in_specs=[in_spec] * len(padded),
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((hp, w), jnp.float32)] * 3,
        interpret=interpret,
    )(*padded)
    return [o[:h] for o in outs]


def reflection_pass_pallas(src_tm, normal, rough, depth, width, height,
                           axis, interpret=False):
    """One separable reflection pass (TM domain), Pallas-tiled.
    axis=1 -> horizontal; axis=0 -> vertical (runs on transposed planes).
    Mirrors denoise/spatial.py:_reflection_pass."""
    br = jnp.clip(0.1 * rough * width, 0.0, height * 0.05
                  ).astype(jnp.int32).astype(jnp.float32)
    planes = [src_tm[..., 0], src_tm[..., 1], src_tm[..., 2],
              normal[..., 0], normal[..., 1], normal[..., 2],
              normal[..., 3], rough, depth, br]
    if axis == 0:
        planes = [p.T for p in planes]
        h, w = src_tm.shape[1], src_tm.shape[0]
    else:
        h, w = src_tm.shape[0], src_tm.shape[1]
    outs = _run_pass(_refl_kernel, planes, w, h, interpret)
    if axis == 0:
        outs = [o.T for o in outs]
    mu = jnp.stack(outs, axis=-1)
    return mu, normal[..., 3] > 0.0


def diffuse_pass_pallas(src_tm, normal, metal, depth, axis,
                        interpret=False):
    """One separable diffuse pass; mirrors spatial.py:_diffuse_pass."""
    planes = [src_tm[..., 0], src_tm[..., 1], src_tm[..., 2],
              normal[..., 0], normal[..., 1], normal[..., 2],
              normal[..., 3], metal, depth]
    if axis == 0:
        planes = [p.T for p in planes]
        h, w = src_tm.shape[1], src_tm.shape[0]
    else:
        h, w = src_tm.shape[0], src_tm.shape[1]
    outs = _run_pass(_diff_kernel, planes, w, h, interpret)
    if axis == 0:
        outs = [o.T for o in outs]
    mu = jnp.stack(outs, axis=-1)
    return mu, (normal[..., 3] > 0.0) & (metal < 1.0)
