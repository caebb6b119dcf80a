import io
import struct

import numpy as np
import pytest

pil = pytest.importorskip("PIL.Image")

from raytracedggx_tpu.io.native import bc6h_decode  # noqa: E402
from raytracedggx_tpu.io.dds import load_dds_cubemap, load_cubemap_env  # noqa: E402


def _make_dds_2d_bc6h(blocks, w, h, fmt=95):
    pf = struct.pack("<2I4s5I", 32, 0x4, b"DX10", 0, 0, 0, 0, 0)
    caps = struct.pack("<5I", 0x1000, 0, 0, 0, 0)
    header = (b"DDS " + struct.pack("<7I", 124, 0x1007, h, w, 0, 1, 1)
              + b"\x00" * 44 + pf + caps)
    dx10 = struct.pack("<5I", fmt, 3, 0, 1, 0)
    return header + dx10 + blocks.tobytes()


@pytest.mark.parametrize("mode_bits,nbits", [
    (0b00, 2), (0b01, 2), (0x02, 5), (0x06, 5), (0x0A, 5), (0x0E, 5),
    (0x12, 5), (0x16, 5), (0x1A, 5), (0x1E, 5), (0x03, 5), (0x07, 5),
    (0x0B, 5), (0x0F, 5)])
def test_bc6h_fuzz_vs_pillow(mode_bits, nbits, rng):
    """Random blocks per mode; Pillow's independent BC6H decoder is the
    oracle (its uint8 output is linear clamp x255)."""
    n = 128
    blocks = rng.integers(0, 256, size=(n, 16), dtype=np.uint8).copy()
    mask = np.uint8((1 << nbits) - 1)
    blocks[:, 0] = ((blocks[:, 0] & np.uint8(0xFF ^ mask))
                    | np.uint8(mode_bits))
    mine = bc6h_decode(blocks, False)
    img = mine.reshape(n, 4, 4, 3).transpose(1, 0, 2, 3).reshape(4, n * 4, 3)
    ref = np.asarray(pil.open(io.BytesIO(_make_dds_2d_bc6h(
        blocks, n * 4, 4)))).astype(np.float32)
    cand = np.clip(np.round(np.clip(img, 0, 1) * 255), 0, 255)
    assert np.abs(cand - ref).max() <= 1


@pytest.mark.parametrize("mode_bits,nbits", [(0x1E, 5), (0x03, 5)])
def test_bc6h_signed_fuzz_vs_pillow(mode_bits, nbits, rng):
    """Signed (BC6H_SF16, DXGI 96) fuzz for the NON-transformed modes
    (6.666 two-region 0x1E, 10.10 one-region 0x03) — covers unquantize_s /
    finish_s (native/bc6h.cpp), untested in round 1.

    Pillow is the oracle only here: its signed decoder mishandles the
    delta-transformed modes (verified against hand-computed D3D11.3
    functional-spec vectors — see test_bc6h_signed_spec_vectors, which
    covers the transformed path instead)."""
    n = 128
    blocks = rng.integers(0, 256, size=(n, 16), dtype=np.uint8).copy()
    mask = np.uint8((1 << nbits) - 1)
    blocks[:, 0] = ((blocks[:, 0] & np.uint8(0xFF ^ mask))
                    | np.uint8(mode_bits))
    mine = bc6h_decode(blocks, True)
    img = mine.reshape(n, 4, 4, 3).transpose(1, 0, 2, 3).reshape(4, n * 4, 3)
    ref = np.asarray(pil.open(io.BytesIO(_make_dds_2d_bc6h(
        blocks, n * 4, 4, fmt=96)))).astype(np.float32)
    cand = np.clip(np.round(np.clip(img, 0, 1) * 255), 0, 255)
    assert np.abs(cand - ref).max() <= 1


def _bits_to_block(bits):
    assert len(bits) == 128
    b = np.zeros(16, np.uint8)
    for i, bit in enumerate(bits):
        b[i >> 3] |= bit << (i & 7)
    return b


def _spec_signed_half(v, epb):
    """D3D11.3 functional spec: unquantize (signed) + finish_unquantize."""
    c = abs(v)
    if c == 0:
        unq = 0
    elif c >= (1 << (epb - 1)) - 1:
        unq = 0x7FFF
    else:
        unq = ((c << 15) + 0x4000) >> (epb - 1)
    if v < 0:
        unq = -unq
    f = (unq * 31) >> 5 if unq >= 0 else -(((-unq) * 31) >> 5)
    hb = (0x8000 | -f) if f < 0 else f
    return float(np.frombuffer(np.uint16(hb).tobytes(), np.float16)[0])


@pytest.mark.parametrize("w,d", [(-200, 100), (300, -50), (-800, -100),
                                 (1000, 200), (0, -256), (-1023, 255)])
def test_bc6h_signed_spec_vectors(w, d):
    """Transformed signed path (mode 12, 11.9 one-region): anchor w +
    sign-extended 9-bit delta d, masked to 11 bits, re-sign-extended —
    expectations hand-computed from the spec (Pillow gets these wrong)."""
    bits = []

    def put(v, n):
        for i in range(n):
            bits.append((v >> i) & 1)

    put(0x07, 5)
    for _ in range(3):
        put(w & 0x3FF, 10)
    for _ in range(3):
        put(d & 0x1FF, 9)
        put((w >> 10) & 1, 1)
    put(0, 3)                    # anchor pixel: index 0 -> endpoint 0
    for _ in range(15):
        put(0xF, 4)              # weight 64 -> endpoint 1
    blk = _bits_to_block(bits)

    e1 = (w + d) & 0x7FF
    e1 = e1 - 0x800 if e1 & 0x400 else e1
    out = np.asarray(bc6h_decode(blk[None], True)).reshape(4, 4, 3)
    np.testing.assert_allclose(out[0, 0], _spec_signed_half(w, 11), rtol=0)
    np.testing.assert_allclose(out[0, 1], _spec_signed_half(e1, 11), rtol=0)


def test_load_rnl_probe(env_dds_path):
    mips = load_dds_cubemap(env_dds_path)
    assert len(mips) == 9
    assert mips[0].shape == (6, 256, 256, 3)
    assert mips[-1].shape == (6, 1, 1, 3)
    m0 = mips[0]
    assert np.isfinite(m0).all() and m0.min() >= 0
    assert m0.max() > 2.0          # HDR content
    # face 0 mip 0 matches Pillow's LDR view within 1 LSB
    ref = np.asarray(pil.open(env_dds_path)).astype(np.float32)
    cand = np.clip(np.round(np.clip(m0[0], 0, 1) * 255), 0, 255)
    assert np.abs(cand - ref).max() <= 1
    # 1x1 mip approximates the mean radiance of the probe
    np.testing.assert_allclose(mips[-1].mean(axis=(0, 1, 2)),
                               m0.mean(axis=(0, 1, 2)), rtol=0.35)


def test_env_from_dds_sampleable(env_dds_path):
    import jax.numpy as jnp
    from raytracedggx_tpu.trace.env import sample_env
    env = load_cubemap_env(env_dds_path)
    assert env.num_mips == 9
    d = jnp.asarray(np.array([[0, 1, 0], [1, 0, 0], [0, -1, 0]], np.float32))
    out = np.asarray(sample_env(env, d, 0.0))
    assert np.isfinite(out).all() and out.min() >= 0
    # sky (up) brighter than ground (down) for this probe
    assert out[0].mean() != out[2].mean()
