"""HDR environment cube map: storage + SampleLevel-style sampling.

The reference lights the scene with a TextureCube environment probe sampled
via ``g_txEnv.SampleLevel(sampler, dir, level)`` (RayTracing.hlsl:170) with
a mip level derived from roughness (calcCubemapMipFromRoughness,
RayTracing.hlsl:416-422).  Face selection and uv derivation follow the D3D11
cube-map convention.  Filtering is bilinear-within-face + trilinear across
mips, texels clamped at face edges (no seam blending — a close approximation
of hardware seamless filtering at 256^2 probe resolution).

Storage is TPU-gather-friendly: all faces of all mips flattened into one
(N, 3) float32 buffer with per-mip offsets, so a single gather source
serves every (ray, mip) pair.

Also provides the reference's procedural sky fallback
(environment() #else branch, RayTracing.hlsl:172-178) used before a DDS
probe is loaded.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax.numpy as jnp
import numpy as np


class EnvMap(NamedTuple):
    data: jnp.ndarray      # (N, 3) float32: all mips, faces row-major
    offsets: jnp.ndarray   # (L,) int32 start of each mip in data
    sizes: jnp.ndarray     # (L,) int32 face edge length per mip
    num_mips: int          # static
    # (N, 12) float32: per texel its 2x2 bilinear footprint
    # [c00 c10 c01 c11], edge-clamped at build time, so one bilinear tap
    # is ONE gather.  TPU gathers cost ~6 ns/row regardless of row width
    # (scripts/envbench.py: 8-gather trilinear 45 ms vs quad 12 ms at
    # 921k rays), so trading 4x memory for 4x fewer gathers wins big.
    quad: jnp.ndarray = None
    # (N, 39) float16: [own 2x2 quad 12 | parent-mip 3x3 window 27].
    # The parent 2x2 footprint of a trilinear sample is NOT determined
    # by the child texel alone (an even child x0=2k straddles parent
    # columns k-1/k), but it always lies inside the 3x3 window centered
    # on column/row clip([k-1, k, k+1]) — so ONE gather + VPU selects
    # replaces the trilinear's second mip gather (exact same taps and
    # weights as the two-gather path).  Last mip's parent is itself.
    # Stored f16: 39 f32 cols = 156 B spans two 128 B lines, which
    # doubled the per-row gather cost (11.6 vs ~6 ns/row, r4 xplane);
    # 78 B fits one line.  f16 texels are FAITHFUL storage — the DDS
    # source is BC6H half-float — only the 2x2 box-filtered mips round.
    tri: jnp.ndarray = None


def pack_mips(mips: List[np.ndarray]) -> EnvMap:
    """mips[m]: (6, S_m, S_m, 3), S_m halving per level down to 1."""
    offsets = []
    sizes = []
    chunks = []
    quads = []
    tris = []
    off = 0
    for mi, m in enumerate(mips):
        s = m.shape[1]
        assert m.shape == (6, s, s, 3)
        offsets.append(off)
        sizes.append(s)
        m = np.asarray(m, np.float32)
        chunks.append(m.reshape(-1, 3))
        x1 = np.minimum(np.arange(s) + 1, s - 1)
        quad = np.concatenate(
            [m, m[:, :, x1], m[:, x1, :], m[:, x1][:, :, x1]],
            axis=-1).reshape(-1, 12)
        quads.append(quad)
        # parent-mip 3x3 window around (y0//2, x0//2) per texel
        par = np.asarray(mips[min(mi + 1, len(mips) - 1)], np.float32)
        s2 = par.shape[1]
        k = np.arange(s) // 2                       # parent col of texel
        win = []
        for r in (-1, 0, 1):
            yy = np.clip(k + r, 0, s2 - 1)
            for c in (-1, 0, 1):
                xx = np.clip(k + c, 0, s2 - 1)
                win.append(par[:, yy][:, :, xx])    # (6, s, s, 3)
        tris.append(np.concatenate([quad.reshape(6, s, s, 12)] + win,
                                   axis=-1).reshape(-1, 39))
        off += 6 * s * s
    return EnvMap(
        data=jnp.asarray(np.concatenate(chunks, axis=0)),
        offsets=jnp.asarray(offsets, jnp.int32),
        sizes=jnp.asarray(sizes, jnp.int32),
        num_mips=len(mips),
        quad=jnp.asarray(np.concatenate(quads, axis=0)),
        tri=jnp.asarray(np.concatenate(tris, axis=0), jnp.float16),
    )


def build_mips(base: np.ndarray) -> List[np.ndarray]:
    """2x2 box-filter mip chain from a (6, S, S, 3) base down to 1x1."""
    mips = [np.asarray(base, np.float32)]
    while mips[-1].shape[1] > 1:
        m = mips[-1]
        s = m.shape[1] // 2
        mips.append(m.reshape(6, s, 2, s, 2, 3).mean(axis=(2, 4)))
    return mips


def dir_to_face_uv(d):
    """D3D cube-map face selection + uv for (..., 3) directions.

    Returns (face, u, v) with u, v in [0, 1]."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    # major axis
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(is_x, jnp.where(x >= 0, 0, 1),
                     jnp.where(is_y, jnp.where(y >= 0, 2, 3),
                               jnp.where(z >= 0, 4, 5))).astype(jnp.int32)
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    sc = jnp.where(is_x, jnp.where(x >= 0, -z, z),
                   jnp.where(is_y, x, jnp.where(z >= 0, x, -x)))
    tc = jnp.where(is_y, jnp.where(y >= 0, z, -z), -y)
    inv = 0.5 / jnp.maximum(ma, 1e-30)
    return face, sc * inv + 0.5, tc * inv + 0.5


def face_uv_to_dir(face: int, u, v):
    """Inverse mapping (texel center uv in [0,1] -> unit direction)."""
    sc = u * 2.0 - 1.0
    tc = v * 2.0 - 1.0
    if face == 0:
        d = jnp.stack([jnp.ones_like(sc), -tc, -sc], axis=-1)
    elif face == 1:
        d = jnp.stack([-jnp.ones_like(sc), -tc, sc], axis=-1)
    elif face == 2:
        d = jnp.stack([sc, jnp.ones_like(sc), tc], axis=-1)
    elif face == 3:
        d = jnp.stack([sc, -jnp.ones_like(sc), -tc], axis=-1)
    elif face == 4:
        d = jnp.stack([sc, -tc, jnp.ones_like(sc)], axis=-1)
    else:
        d = jnp.stack([-sc, -tc, -jnp.ones_like(sc)], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def _bilinear(env: EnvMap, mip, face, u, v):
    """Bilinear sample one mip level (per-ray dynamic mip index).

    Single-gather path: each quad row already holds the texel's
    edge-clamped 2x2 footprint, so one gather + 4 FMAs replaces 4 row
    gathers (the gathers dominate: ~6 ns/row each on TPU regardless of
    width — scripts/envbench.py).  Clamping the CONTINUOUS coordinate to
    [0, s-1] reproduces the per-tap clamp exactly: outside that range the
    out-of-face tap's weight is 0 and the footprint's own clamped copy
    matches the old duplicated-tap sum."""
    s = env.sizes[mip]
    off = env.offsets[mip]
    sf = s.astype(jnp.float32)
    x = jnp.clip(u * sf - 0.5, 0.0, sf - 1.0)
    y = jnp.clip(v * sf - 0.5, 0.0, sf - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    if env.quad is not None:
        idx = off + (face * s + y0.astype(jnp.int32)) * s \
            + x0.astype(jnp.int32)
        q = env.quad[idx]
        c00, c10, c01, c11 = (q[..., 0:3], q[..., 3:6],
                              q[..., 6:9], q[..., 9:12])
    else:
        import jax

        def tex(xi, yi):
            xi = jnp.clip(xi, 0, s - 1).astype(jnp.int32)
            yi = jnp.clip(yi, 0, s - 1).astype(jnp.int32)
            return env.data[off + (face * s + yi) * s + xi]

        c00, c10, c01, c11 = jax.lax.optimization_barrier(
            (tex(x0, y0), tex(x0 + 1, y0), tex(x0, y0 + 1),
             tex(x0 + 1, y0 + 1)))
    return (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy + c11 * fx * fy)


def sample_env(env: EnvMap, d, level=0.0):
    """SampleLevel(dir, level): trilinear clamp. d: (..., 3), level scalar
    or (...,).  A static level that lands exactly on one mip (e.g. the
    miss-shader's level 0, RayTracing.hlsl:619-625) skips the second
    bilinear pass entirely."""
    face, u, v = dir_to_face_uv(d)
    if isinstance(level, (int, float)) and float(level) == int(level):
        m = int(np.clip(level, 0, env.num_mips - 1))
        return _bilinear(env, m, face, u, v)
    level = jnp.clip(jnp.broadcast_to(jnp.asarray(level, jnp.float32),
                                      face.shape), 0.0, env.num_mips - 1.0)
    m0 = jnp.floor(level).astype(jnp.int32)
    f = (level - m0.astype(jnp.float32))[..., None]
    if env.tri is not None:
        return _trilinear_packed(env, m0, f, face, u, v)
    m1 = jnp.minimum(m0 + 1, env.num_mips - 1)
    c0 = _bilinear(env, m0, face, u, v)
    c1 = _bilinear(env, m1, face, u, v)
    return c0 * (1 - f) + c1 * f


def _trilinear_packed(env: EnvMap, m0, f, face, u, v):
    """Trilinear via ONE gather of the packed (N, 39) rows: the child
    quad serves mip m0's bilinear; the parent 3x3 window serves mip
    m0+1's, with the 2x2 footprint selected by where the parent sample
    point falls relative to the window center.  Tap positions, clamps
    and weights are identical to the two-gather _bilinear path."""
    s = env.sizes[m0]
    off = env.offsets[m0]
    sf = s.astype(jnp.float32)
    x = jnp.clip(u * sf - 0.5, 0.0, sf - 1.0)
    y = jnp.clip(v * sf - 0.5, 0.0, sf - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    idx = off + (face * s + y0.astype(jnp.int32)) * s \
        + x0.astype(jnp.int32)
    row = env.tri[idx].astype(jnp.float32)
    c0 = (row[..., 0:3] * (1 - fx) * (1 - fy)
          + row[..., 3:6] * fx * (1 - fy)
          + row[..., 6:9] * (1 - fx) * fy
          + row[..., 9:12] * fx * fy)

    # parent-mip bilinear from the 3x3 window.  The parent sample
    # column px0 is k-1 or k (k = x0//2): weight vector over window
    # columns [k-1, k, k+1] is [1-fxp, fxp, 0] or [0, 1-fxp, fxp].
    s2 = jnp.maximum(jnp.floor(sf * 0.5), 1.0)     # sizes[m0+1]
    px = jnp.clip(u * s2 - 0.5, 0.0, s2 - 1.0)
    py = jnp.clip(v * s2 - 0.5, 0.0, s2 - 1.0)
    px0 = jnp.floor(px)
    py0 = jnp.floor(py)
    fxp = px - px0
    fyp = py - py0
    lo_x = (px0 - jnp.floor(x0 * 0.5) + 1.0) < 0.5   # px0 == k-1
    lo_y = (py0 - jnp.floor(y0 * 0.5) + 1.0) < 0.5
    zero = jnp.zeros_like(fxp)
    wx = (jnp.where(lo_x, 1.0 - fxp, zero),
          jnp.where(lo_x, fxp, 1.0 - fxp),
          jnp.where(lo_x, zero, fxp))
    wy = (jnp.where(lo_y, 1.0 - fyp, zero),
          jnp.where(lo_y, fyp, 1.0 - fyp),
          jnp.where(lo_y, zero, fyp))
    c1 = jnp.zeros_like(c0)
    for r in range(3):
        for c in range(3):
            o = 12 + 3 * (r * 3 + c)
            c1 = c1 + row[..., o:o + 3] * (wy[r] * wx[c])[..., None]
    return c0 * (1 - f) + c1 * f


def procedural_sky(d):
    """The reference's built-in sky (RayTracing.hlsl:172-178): vertical
    gradient *3 + a hard sun disk along normalize(-1, 1, -1)."""
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    sun_dir = jnp.asarray([-1.0, 1.0, -1.0], jnp.float32)
    sun_dir = sun_dir / jnp.linalg.norm(sun_dir)
    sun_amt = jnp.clip(jnp.sum(d * sun_dir, axis=-1), 0.0, 1.0)
    a = d[..., 1] * 0.5 + 0.5
    base = jnp.asarray([0.0, 0.16, 0.64], jnp.float32)
    color = base + (1.0 - base) * a[..., None]
    return color * 3.0 + jnp.where(sun_amt > 0.9995, 7.0, 0.0)[..., None]


def procedural_env(size: int = 64) -> EnvMap:
    """Bake the procedural sky into a cube map (tests / no-DDS fallback)."""
    uv = (np.arange(size) + 0.5) / size
    u, v = np.meshgrid(uv, uv, indexing="xy")
    faces = []
    for f in range(6):
        d = np.asarray(face_uv_to_dir(f, jnp.asarray(u, jnp.float32),
                                      jnp.asarray(v, jnp.float32)))
        faces.append(np.asarray(procedural_sky(jnp.asarray(d))))
    base = np.stack(faces)  # (6, S, S, 3)
    return pack_mips(build_mips(base))
