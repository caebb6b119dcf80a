import numpy as np
import jax.numpy as jnp

from raytracedggx_tpu.denoise import (reflection_spatial_filter,
                                      diffuse_spatial_filter, temporal_ss,
                                      tm, itm)
from raytracedggx_tpu.post import tone_map

H, W = 40, 48


def flat_gbuffers():
    normal = np.zeros((H, W, 4), np.float32)
    normal[..., 1] = 1.0          # n = (0,1,0) encoded
    normal[..., :3] = normal[..., :3] * 0.5 + 0.5
    normal[..., 3] = 1.0
    rough = np.full((H, W), 0.5, np.float32)
    depth = np.full((H, W), 0.5, np.float32)
    metal = np.full((H, W), 0.5, np.float32)
    return (jnp.asarray(normal), jnp.asarray(rough), jnp.asarray(depth),
            jnp.asarray(metal))


def test_tm_itm_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).random((8, 8, 3)) * 10)
    np.testing.assert_allclose(np.asarray(itm(tm(x))), np.asarray(x),
                               rtol=1e-4)


def test_reflection_filter_preserves_flat_signal():
    normal, rough, depth, metal = flat_gbuffers()
    refl = jnp.full((H, W, 3), 1.7, jnp.float32)
    out = np.asarray(reflection_spatial_filter(refl, normal, rough, depth,
                                               W, H))
    # interior: weighted mean of a constant = the constant
    np.testing.assert_allclose(out[20, 24, :3], 1.7, rtol=1e-4)
    assert out[20, 24, 3] == 1.0


def test_reflection_filter_sky_passthrough():
    normal, rough, depth, metal = flat_gbuffers()
    normal = normal.at[:, :10, 3].set(0.0)   # left strip = sky
    refl = jnp.full((H, W, 3), 0.3, jnp.float32)
    out = np.asarray(reflection_spatial_filter(refl, normal, rough, depth,
                                               W, H))
    np.testing.assert_allclose(out[5, 5, :3], 0.3, rtol=1e-6)
    assert out[5, 5, 3] == 0.0


def test_reflection_filter_smooths_noise():
    normal, rough, depth, metal = flat_gbuffers()
    rng = np.random.default_rng(3)
    noise = rng.random((H, W, 3)).astype(np.float32)
    out = np.asarray(reflection_spatial_filter(jnp.asarray(noise), normal,
                                               rough, depth, W, H))
    inner = np.s_[17:23, 17:31]
    assert out[inner + (slice(0, 3),)].std() < noise[inner].std() * 0.35


def test_diffuse_composite_and_metal_gate():
    normal, rough, depth, metal = flat_gbuffers()
    metal = metal.at[:, W // 2:].set(1.0)      # right half full metal
    diff = jnp.full((H, W, 3), 0.8, jnp.float32)
    flt_rfl = jnp.concatenate([jnp.full((H, W, 3), 0.2, jnp.float32),
                               jnp.ones((H, W, 1), jnp.float32)], axis=-1)
    out = np.asarray(diffuse_spatial_filter(diff, flt_rfl, normal, metal,
                                            depth))
    # left interior: composite = 0.2 + 0.8
    np.testing.assert_allclose(out[20, 8, :3], 1.0, rtol=1e-4)
    # right half: reflection passthrough
    np.testing.assert_allclose(out[20, W - 5, :3], 0.2, rtol=1e-6)


def test_temporal_converges_static():
    rng = np.random.default_rng(5)
    cur = np.concatenate([rng.random((H, W, 3)).astype(np.float32) * 0 + 0.6,
                          np.ones((H, W, 1), np.float32)], axis=-1)
    vel = jnp.zeros((H, W, 2), jnp.float32)
    hist = jnp.zeros((H, W, 4), jnp.float32)
    for _ in range(8):
        hist = temporal_ss(jnp.asarray(cur), hist, vel)
    out = np.asarray(hist)
    # interior converges to the input (borders blur against OOB zeros,
    # matching the reference's HLSL out-of-bounds-load-as-zero behavior)
    np.testing.assert_allclose(out[2:-2, 2:-2, :3], 0.6, atol=5e-3)
    assert out[..., 3].min() > 0.4         # convergence counter climbed


def test_temporal_rejects_history_on_disocclusion():
    # history bright red, current dark; clamp + blend must pull toward
    # current within the neighborhood AABB
    cur = np.concatenate([np.full((H, W, 3), 0.1, np.float32),
                          np.ones((H, W, 1), np.float32)], axis=-1)
    hist = np.concatenate([np.full((H, W, 3), 5.0, np.float32),
                           np.full((H, W, 1), 1.0, np.float32)], axis=-1)
    out = np.asarray(temporal_ss(jnp.asarray(cur), jnp.asarray(hist),
                                 jnp.zeros((H, W, 2), jnp.float32)))
    assert np.abs(out[..., :3] - 0.1).max() < 0.05


def test_temporal_velocity_dilation():
    from raytracedggx_tpu.denoise.temporal import _velocity_max
    vel = np.zeros((H, W, 2), np.float32)
    vel[10, 10] = [0.5, 0.0]
    out = np.asarray(_velocity_max(jnp.asarray(vel)))
    # diagonal neighbors of (10,10) inherit its velocity
    assert np.allclose(out[9, 9], [0.5, 0.0])
    assert np.allclose(out[11, 11], [0.5, 0.0])
    # cross neighbors are NOT in the dilation footprint (diagonals only)
    assert np.allclose(out[10, 9], [0.0, 0.0])


def test_tonemap_flat_and_range():
    src = jnp.concatenate([jnp.full((H, W, 3), 2.0, jnp.float32),
                           jnp.ones((H, W, 1), jnp.float32)], axis=-1)
    out = np.asarray(tone_map(src))
    np.testing.assert_allclose(out[5:-5, 5:-5], 2.0 / 2.5, rtol=1e-5)
    # HDR maps under ~1 in the interior for any input
    big = src.at[..., :3].set(1000.0)
    out = np.asarray(tone_map(big))
    assert out[5:-5, 5:-5].max() <= 1.001
