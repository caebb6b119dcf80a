import io
import struct

import numpy as np
import pytest

pil = pytest.importorskip("PIL.Image")

from raytracedggx_tpu.io.native import bc6h_decode  # noqa: E402
from raytracedggx_tpu.io.dds import load_dds_cubemap, load_cubemap_env  # noqa: E402


def _make_dds_2d_bc6h(blocks, w, h):
    pf = struct.pack("<2I4s5I", 32, 0x4, b"DX10", 0, 0, 0, 0, 0)
    caps = struct.pack("<5I", 0x1000, 0, 0, 0, 0)
    header = (b"DDS " + struct.pack("<7I", 124, 0x1007, h, w, 0, 1, 1)
              + b"\x00" * 44 + pf + caps)
    dx10 = struct.pack("<5I", 95, 3, 0, 1, 0)
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
