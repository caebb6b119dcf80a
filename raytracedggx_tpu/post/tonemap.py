"""Final tone map + unsharp composite (PSToneMap.hlsl:13-41).

Per pixel: 5-tap cross, each tone-mapped x/(x+0.5), then an unsharp mask
c0 -= 0.2 * laplacian.  Replaces the fullscreen-triangle graphics pass
(Denoiser::ToneMap, Denoiser.cpp:77-103) with a fused jnp stencil writing
the display-ready image.
"""

from __future__ import annotations

import jax.numpy as jnp


def _shift(img, dy, dx):
    h, w = img.shape[0], img.shape[1]
    pad = [(max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0)), (0, 0)]
    p = jnp.pad(img, pad)
    return p[max(-dy, 0):max(-dy, 0) + h, max(-dx, 0):max(-dx, 0) + w]


def tone_map(src):
    """src: (H, W, 4) accumulated HDR (+meta alpha). Returns (H, W, 3)."""
    rgb = src[..., :3]
    center = rgb / (rgb + 0.5)
    lap = -4.0 * center
    for dy, dx in [(0, -1), (0, 1), (-1, 0), (1, 0)]:
        nb = _shift(rgb, dy, dx)
        lap = lap + nb / (nb + 0.5)
    return center - 0.2 * lap
