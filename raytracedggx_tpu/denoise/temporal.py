"""Temporal supersampling (TAA-style accumulate) — CSTemporalSS.hlsl.

Compiled configuration of the reference (vcxproj:217-218): _DENOISE_ +
_ALPHA_AS_ID_, with _VARIANCE_AABB_=1 and _USE_YCOCG_=1 (CSTemporalSS.hlsl:
20-21).  Pipeline per pixel (main, :254-336):

1. velocity dilation: max-speed of center + 4 diagonal neighbors (:139-167)
2. history resample: bilinear-clamp at uv - velocity
3. history-blur estimate from speed + 4-bit convergence counter in alpha
4. tone map current to YCoCg Reinhard domain (TM :108-118: c/(4+luma4))
5. variance AABB over the 3x3 neighborhood with adaptive gamma
   clamp(8/historyBlur, 1, 32), relaxed to 1 when the blurred hit-mask
   ('alpha as id') differs from the center (:201-205)
6. clamp history (per-channel in YCoCg), anti-alias blend of the Gaussian-
   blurred current, luma-distance-driven blend factor capped at 0.25
7. NaN guard; write (rgb, convergence) — convergence feeds next frame

Out-of-bounds neighbor loads are zeros (HLSL OOB).  All jnp; shift-based
stencil + one bilinear gather.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

HISTORY_BITS = 4
HISTORY_MAX = float((1 << HISTORY_BITS) - 1)

_DIAG = [(-1, -1), (1, -1), (1, 1), (-1, 1)]
_CROSS = [(-1, 0), (1, 0), (0, -1), (0, 1)]
_OFFSETS = _CROSS + _DIAG          # g_texOffsets order (:45-49)
_WEIGHTS = [0.5] * 4 + [0.25] * 4  # NeighborMinMax weights (:175-179)


def _shift(img, dy, dx):
    h, w = img.shape[0], img.shape[1]
    pad = [(max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))]
    pad += [(0, 0)] * (img.ndim - 2)
    p = jnp.pad(img, pad)
    return p[max(-dy, 0):max(-dy, 0) + h, max(-dx, 0):max(-dx, 0) + w]


def rgb_to_ycocg(rgb):
    """(:78-87): y = dot(1,2,1), co = dot(2,0,-2), cg = dot(-1,2,-1)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return jnp.stack([r + 2 * g + b, 2 * r - 2 * b, -r + 2 * g - b], axis=-1)


def ycocg_to_rgb(c):
    y, co, cg = c[..., 0] * 0.25, c[..., 1] * 0.25, c[..., 2] * 0.25
    return jnp.stack([y + co - cg, y + cg, y - co - cg], axis=-1)


def _tm(rgb):
    c = rgb_to_ycocg(rgb)
    return c / (4.0 + c[..., 0:1])


def _itm(c):
    c = c * (4.0 / (1.0 - c[..., 0:1]))
    return ycocg_to_rgb(c)


def _tent_resample(img, dx, dy, D: int):
    """Bilinear resample of ``img`` at per-pixel offsets (dx, dy) pixels,
    EXACT whenever every |dx|,|dy| <= D, as a windowed tent stencil:

        out(p) = sum_{oy,ox} max(0,1-|dy(p)-oy|) * max(0,1-|dx(p)-ox|)
                             * img(py+oy, px+ox)

    Bilinear interpolation IS a tent filter evaluated at integer taps, so
    for bounded displacement the R-row gather (~4-6 ns/row on TPU —
    docs/PERF.md r3 xplane; layout laundering does NOT fix it,
    scripts/layoutbench.py) becomes (2D+2)^2 shifted multiply-adds that
    XLA fuses into one windowed streaming loop over the padded image.
    The weights must NOT be factored into separable row/column passes:
    the displacement field varies per pixel, so an intermediate y-pass
    would bake in wy evaluated at the shifted column instead of the
    destination (measured max-error ~4.7 on random fields).  Taps with
    indices outside the image always carry weight 0 when the sample
    coordinate is in bounds, so zero-padding is safe."""
    h, w = img.shape[0], img.shape[1]
    pad = jnp.pad(img, ((D, D + 1), (D, D + 1), (0, 0)))
    wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(dx - ox))[..., None]
           for ox in range(-D, D + 2)]
    out = jnp.zeros_like(img)
    for oy in range(-D, D + 2):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - oy))[..., None]
        row = jnp.zeros_like(img)
        for ox in range(-D, D + 2):
            row = row + wxs[ox + D] * pad[oy + D:oy + D + h,
                                          ox + D:ox + D + w]
        out = out + wy * row
    return out


def _bilinear_clamp_pix(img, x, y):
    """Bilinear sample (H, W, C) at continuous pixel coords (clamp).
    (x, y) = (u*W - 0.5, v*H - 0.5) of the equivalent uv sampler.

    One 4C-wide gather instead of 4 C-wide gathers: TPU gathers cost
    ~6 ns/row regardless of row width (scripts/envbench.py), so the 2x2
    footprint is packed per pixel with two elementwise clamp-shifts
    (cheap HBM streaming) and fetched in a single gather.  Clamping the
    continuous coordinate to [0, dim-1] reproduces per-tap clamping: the
    out-of-range tap's weight is 0 there and the footprint's edge copies
    match the old duplicated-tap sum."""
    h, w = img.shape[0], img.shape[1]
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    row0 = jnp.concatenate([img, right], axis=-1)          # [c00 | c10]
    quad = jnp.concatenate(
        [row0, jnp.concatenate([row0[1:], row0[-1:]], axis=0)],
        axis=-1)                                           # + [c01 | c11]
    c = img.shape[-1]
    q = quad.reshape(h * w, 4 * c)[
        (y0.astype(jnp.int32) * w + x0.astype(jnp.int32)).reshape(-1)
    ].reshape(*x.shape, 4 * c)

    return (q[..., 0:c] * (1 - fx) * (1 - fy)
            + q[..., c:2 * c] * fx * (1 - fy)
            + q[..., 2 * c:3 * c] * (1 - fx) * fy
            + q[..., 3 * c:] * fx * fy)


def _velocity_max(velocity):
    """VelocityMax (:139-167): center + 4 diagonals, strictly-greater
    speed comparison in sequence."""
    best = velocity
    best_sq = jnp.sum(best * best, axis=-1)
    for dy, dx in _DIAG:
        nb = _shift(velocity, dy, dx)
        sq = jnp.sum(nb * nb, axis=-1)
        take = (sq > best_sq)[..., None]
        best = jnp.where(take, nb, best)
        best_sq = jnp.maximum(sq, best_sq)
    return best


def temporal_ss(current, history, velocity, full_size=None):
    """current/history: (H, W, 4); velocity: (H, W, 2) in fractions of the
    FULL viewport (NDC*0.5 units).  full_size=(W_full, H_full) scales the
    reprojection when the arrays are a row band of a larger sharded image
    (parallel/sharded.py); defaults to the local shape.
    Returns the new accumulation buffer (H, W, 4) in float32; callers
    store it at their history dtype (the production renderers carry
    history as float16 — the reference's R16G16B16A16_FLOAT
    TemporalSSOut format, Denoiser.cpp:46-56)."""
    history = history.astype(jnp.float32)
    h, w = current.shape[0], current.shape[1]
    fw, fh = full_size if full_size is not None else (w, h)
    tex_size = jnp.asarray([fw, fh], jnp.float32)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")

    vel = _velocity_max(velocity)
    # history resample at uv - velocity.  The coordinate is clamped FIRST
    # (reproducing the bilinear-clamp sampler), making the effective
    # per-pixel displacement bounded near edges too; when the max
    # displacement fits the tent radius the resample runs as a shifted
    # stencil (no gather), with a lax.cond fallback to the exact gather
    # for fast motion (both branches compute the identical bilinear).
    qx = jnp.clip(xs - vel[..., 0] * fw, 0.0, w - 1.0)
    qy = jnp.clip(ys - vel[..., 1] * fh, 0.0, h - 1.0)
    dx, dy = qx - xs, qy - ys
    # TPU pricing (scripts/microbench_r3.py): tent D=4 (100 taps) 3.9 ms
    # vs 9.0 ms for the 921k-row bilinear gather; D=4 covers ~4 px/frame
    # of motion, beyond which the exact-gather branch takes over.
    D = 4
    small = jnp.maximum(jnp.max(jnp.abs(dx)), jnp.max(jnp.abs(dy))) <= D
    hist = lax.cond(
        small,
        lambda args: _tent_resample(args[0], args[1], args[2], D),
        lambda args: _bilinear_clamp_pix(args[0], xs + args[1],
                                         ys + args[2]),
        (history, dx, dy))

    # speed -> blur estimate (:276-283)
    blur_amp = 4.0 * tex_size
    blurs = jnp.abs(vel) * blur_amp
    cur_history_blur = blurs[..., 0] + blurs[..., 1]
    history_blur = jnp.maximum(1.0 - hist[..., 3], cur_history_blur)
    hist_count = hist[..., 3] * HISTORY_MAX + 1.0

    cur_rgb = current[..., :3]
    cur_a = current[..., 3]
    cur_tm = _tm(cur_rgb)

    # gamma (:291): _DENOISE_ branch
    gamma = jnp.where(cur_a <= 0.0, 1.0,
                      jnp.clip(8.0 / jnp.maximum(history_blur, 1e-6),
                               1.0, 32.0))

    # ---- NeighborMinMax (:173-252) -----------------------------------
    filt = jnp.concatenate([cur_tm, cur_a[..., None]], axis=-1)
    m1 = cur_tm
    m2 = cur_tm * cur_tm
    for (dy, dx), wgt in zip(_OFFSETS, _WEIGHTS):
        nb = _shift(current, dy, dx)
        nb_tm = _tm(nb[..., :3])
        nb4 = jnp.concatenate([nb_tm, nb[..., 3:4]], axis=-1)
        filt = filt + nb4 * wgt
        m1 = m1 + nb_tm
        m2 = m2 + nb_tm * nb_tm
    filt = filt / 4.0

    # _DENOISE_ + _ALPHA_AS_ID_ gamma relaxation (:201-205)
    gamma = jnp.where(jnp.abs(cur_a - filt[..., 3]) < 1.0 / 255.0,
                      gamma, 1.0)

    ns = float(len(_OFFSETS) + 1)
    mu = m1 / ns
    sigma = jnp.sqrt(jnp.abs(m2 / ns - mu * mu))
    nmin = mu - gamma[..., None] * sigma
    nmax = mu + gamma[..., None] * sigma
    nmin = jnp.minimum(nmin, filt[..., :3])
    nmax = jnp.maximum(nmax, filt[..., :3])
    nmin_w = (mu - sigma)[..., 0]
    nmax_w = (mu + sigma)[..., 0]

    cur_history_blur = jnp.clip(cur_history_blur, 0.0, 1.0)
    history_blur = jnp.clip(history_blur, 0.0, 1.0)

    # clamp history in YCoCg (:306-311)
    hist_tm = jnp.clip(_tm(hist[..., :3]), nmin, nmax)
    contrast = nmax_w - nmin_w

    # anti-alias add-back (:313-322); YCoCg luma contrast factor 32*4
    add_alias = history_blur * 0.5 + 0.25
    add_alias = jnp.clip(add_alias + 1.0 / (1.0 + contrast * 128.0),
                         0.0, 1.0)
    filt_rgb = filt[..., :3] + (cur_tm - filt[..., :3]) * add_alias[..., None]

    # blend factor (:324-334)
    lum_hist = hist_tm[..., 0]
    dist_to_clamp = jnp.minimum(jnp.abs(nmin_w - lum_hist),
                                jnp.abs(nmax_w - lum_hist))
    history_amt = jnp.minimum(1.0 / hist_count + history_blur / 8.0, 1.0)
    blend = 0.25 / (8.0 + (dist_to_clamp + contrast - 8.0) * history_amt)
    blend = jnp.minimum(blend, 0.25)
    blend = jnp.where(filt[..., 3] > 0.0, blend, 1.0)

    out_tm = hist_tm + (filt_rgb - hist_tm) * blend[..., None]
    result = _itm(out_tm)
    fallback = _itm(filt_rgb)
    result = jnp.where(jnp.any(jnp.isnan(result), axis=-1, keepdims=True),
                       fallback, result)

    meta = jnp.minimum(hist_count / HISTORY_MAX, 1.0 - cur_history_blur)
    return jnp.concatenate([result, meta[..., None]], axis=-1)
