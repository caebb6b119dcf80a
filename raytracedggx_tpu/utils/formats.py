"""GPU texture-format emulation (optional storage quantization).

The reference stores intermediates in quantized formats (RayTracer.cpp:91-114,
Denoiser.cpp:46-56):

- RayTracingOut[2]      R11G11B10_FLOAT
- Normal                R10G10B10A2_UNORM
- RoughnessMetallic     R8G8_UNORM
- Velocity              R16G16_FLOAT
- TemporalSS / Filtered R16G16B16A16_FLOAT

On TPU every intermediate is a float32 (or bfloat16) array; the functions
here round-trip values through the reference's storage precision so golden
comparisons against the D3D12 renderer can account for quantization.  They
are pure jnp and fuse into surrounding elementwise work.  Rendering quality
does not need them; `RenderConfig.emulate_formats` enables them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_unorm(x, bits: int):
    """Round-trip through an n-bit UNORM channel (round-to-nearest)."""
    maxv = float((1 << bits) - 1)
    q = jnp.round(jnp.clip(x, 0.0, 1.0) * maxv)
    return q / maxv


def quantize_f16(x):
    return x.astype(jnp.float16).astype(jnp.float32)


def _quantize_small_float(x, mantissa_bits: int):
    """Round-trip a positive float32 through a 5-exponent small float
    (e5m6 for float11, e5m5 for float10) with round-to-nearest-even,
    matching D3D float32->R11G11B10 conversion. Negative inputs clamp to 0.
    """
    x = jnp.maximum(x, 0.0).astype(jnp.float32)
    max_val = jnp.float32(65024.0 if mantissa_bits == 6 else 64512.0)
    x = jnp.minimum(x, max_val)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    drop = jnp.uint32(23 - mantissa_bits)
    # round-to-nearest-even on the dropped mantissa bits
    half = jnp.uint32(1) << (drop - 1)
    low = (bits >> drop) & jnp.uint32(1)
    bits = bits + half - jnp.uint32(1) + low
    bits = bits & ~((jnp.uint32(1) << drop) - jnp.uint32(1))
    y = jax.lax.bitcast_convert_type(bits, jnp.float32)
    # flush denormals (exponent underflow below 2^-14) to zero like the GPU
    y = jnp.where(y < jnp.float32(6.103515625e-05), 0.0, y)
    return y


def quantize_r11g11b10(rgb):
    """Round-trip (..., 3) through R11G11B10_FLOAT."""
    r = _quantize_small_float(rgb[..., 0], 6)
    g = _quantize_small_float(rgb[..., 1], 6)
    b = _quantize_small_float(rgb[..., 2], 5)
    return jnp.stack([r, g, b], axis=-1)
