import numpy as np
import jax.numpy as jnp

from raytracedggx_tpu.utils import formats
from raytracedggx_tpu.io.png import write_png


def test_unorm_roundtrip():
    x = jnp.linspace(0, 1, 257)
    q8 = np.asarray(formats.quantize_unorm(x, 8))
    assert np.all(np.abs(q8 - np.asarray(x)) <= 0.5 / 255 + 1e-7)
    # exact codes survive
    codes = jnp.arange(256) / 255.0
    assert np.allclose(np.asarray(formats.quantize_unorm(codes, 8)),
                       np.asarray(codes))


def test_r11g11b10_roundtrip():
    rgb = jnp.array([[0.5, 1.0, 2.0], [100.0, 0.001, 0.0],
                     [-1.0, 65504.0, 3.14159]])
    q = np.asarray(formats.quantize_r11g11b10(rgb))
    assert q[2, 0] == 0.0                       # negatives clamp to 0
    assert np.all(q >= 0)
    # relative error bounded by mantissa precision (2^-7 for 6 bits)
    ref = np.asarray(rgb)
    mask = ref > 1e-4
    rel = np.abs(q - ref)[mask] / ref[mask]
    assert rel.max() < 2 ** -6


def test_png_writer_roundtrip(tmp_path):
    from PIL import Image
    img = (np.random.default_rng(0).random((16, 24, 3)) * 255).astype(np.uint8)
    path = tmp_path / "t.png"
    write_png(str(path), img)
    back = np.asarray(Image.open(path))
    assert np.array_equal(back, img)
