"""Order-3 spherical harmonics: env-probe projection + irradiance eval.

Replaces the binary-only ``XUSG::SphericalHarmonics`` GPU transform
(XUSGAdvanced.h:623-647; invoked once on the first frame via
RayTracer::TransformSH, RayTracer.cpp:307-310, 345-350): projects the
environment cube map into 9 float3 radiance coefficients.

Evaluation matches SHIrradianceTypeless.hlsli:16-37 exactly, including its
constants (which fold the cosine-lobe convolution A_l) and its sign
convention (x, y negated).  The projection uses the same flipped basis so
projection + evaluation is self-consistent: for constant radiance L,
``evaluate_sh_irradiance(project(L), n) / pi == L``.

Coefficient order: [L00, L1-1, L10, L11, L2-2, L2-1, L20, L21, L22].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

SH_NUM_COEFF = 9


def _basis(d):
    """Real SH basis (order 3) evaluated in the reference's flipped frame
    (..., 3) -> (..., 9)."""
    x = -d[..., 0]
    y = -d[..., 1]
    z = d[..., 2]
    return jnp.stack([
        0.28209479177 * jnp.ones_like(x),
        0.48860251190 * y,
        0.48860251190 * z,
        0.48860251190 * x,
        1.09254843059 * x * y,
        1.09254843059 * y * z,
        0.31539156525 * (3.0 * z * z - 1.0),
        1.09254843059 * x * z,
        0.54627421529 * (x * x - y * y),
    ], axis=-1)


def _texel_solid_angles(size: int) -> np.ndarray:
    """Exact per-texel solid angle of a cube face (size, size)."""
    def area(x, y):
        return np.arctan2(x * y, np.sqrt(x * x + y * y + 1.0))

    e = (np.arange(size + 1) / size) * 2.0 - 1.0
    x0, y0 = np.meshgrid(e[:-1], e[:-1], indexing="xy")
    x1, y1 = np.meshgrid(e[1:], e[1:], indexing="xy")
    return (area(x1, y1) - area(x0, y1) - area(x1, y0) + area(x0, y0)
            ).astype(np.float32)


def project_sh9(faces) -> jnp.ndarray:
    """Project a (6, S, S, 3) cube map into (9, 3) SH radiance coeffs.

    One fused reduction over all texels — the whole 'SH transform compute
    pass' of the reference collapses into a weighted matmul.
    """
    from ..trace.env import face_uv_to_dir

    faces = jnp.asarray(faces, jnp.float32)
    s = faces.shape[1]
    w = jnp.asarray(_texel_solid_angles(s))
    uv = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    u, v = jnp.meshgrid(uv, uv, indexing="xy")

    coeffs = jnp.zeros((SH_NUM_COEFF, 3), jnp.float32)
    for f in range(6):
        d = face_uv_to_dir(f, u, v)             # (S, S, 3)
        b = _basis(d)                           # (S, S, 9)
        wl = faces[f] * w[..., None]            # (S, S, 3)
        coeffs = coeffs + jnp.einsum("ijk,ijc->kc", b, wl)
    return coeffs


def evaluate_sh_irradiance(coeffs, n):
    """EvaluateSHIrradiance (SHIrradianceTypeless.hlsli:16-37).

    coeffs: (9, 3); n: (..., 3) unit normals.  Returns (..., 3) irradiance
    (the caller divides by pi for the diffuse BRDF, RayTracing.hlsl:513).
    """
    c1 = 0.42904276540489171563379376569857
    c2 = 0.51166335397324424423977581244463
    c3 = 0.24770795610037568833406429782001
    c4 = 0.88622692545275801364908374167057

    x = -n[..., 0:1]
    y = -n[..., 1:2]
    z = n[..., 2:3]

    irr = (
        (c1 * (x * x - y * y)) * coeffs[8]
        + (c3 * (3.0 * z * z - 1.0)) * coeffs[6]
        + c4 * coeffs[0]
        + 2.0 * c1 * (coeffs[4] * x * y + coeffs[7] * x * z
                      + coeffs[5] * y * z)
        + 2.0 * c2 * (coeffs[3] * x + coeffs[1] * y + coeffs[2] * z)
    )
    return jnp.maximum(irr, 0.0)
