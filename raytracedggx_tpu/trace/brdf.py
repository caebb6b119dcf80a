"""GGX BRDF terms (BRDFModels.hlsli:1-77), vectorized jnp.

Only the terms the renderer actually uses: F_Schlick (with the 2%-floor
shadowing heuristic), Vis_Smith, EnvBRDFApprox (Lazarov split-sum fit);
D_GGX / Vis_Schlick / Vis_SmithJointApprox included for capability parity.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PI = float(np.pi)


def d_ggx(roughness, noh):
    m = roughness * roughness
    m2 = m * m
    d = (noh * m2 - noh) * noh + 1.0
    return m2 / (PI * d * d)


def vis_schlick(roughness, nov, nol):
    k = roughness * roughness * 0.5
    vv = nov * (1.0 - k) + k
    vl = nol * (1.0 - k) + k
    return 0.25 / (vv * vl)


def vis_smith(roughness, nov, nol):
    a = roughness * roughness
    a2 = a * a
    vv = nov + jnp.sqrt(nov * (nov - nov * a2) + a2)
    vl = nol + jnp.sqrt(nol * (nol - nol * a2) + a2)
    return 1.0 / (vv * vl)


def vis_smith_joint_approx(roughness, nov, nol):
    a = roughness * roughness
    vv = nol * (nov * (1.0 - a) + a)
    vl = nov * (nol * (1.0 - a) + a)
    return 0.5 / (vv + vl)


def f_schlick(f0, voh):
    """F_Schlick with <2% reflectance treated as shadowing
    (BRDFModels.hlsli:54-62); f0 (..., 3), voh (...,)."""
    fc = (1.0 - voh) ** 5.0
    shadow = jnp.clip(50.0 * f0[..., 1], 0.0, 1.0)
    return (shadow * fc)[..., None] + (1.0 - fc)[..., None] * f0


def env_brdf_approx(f0, roughness, nov):
    """EnvBRDFApprox (BRDFModels.hlsli:64-77)."""
    c0 = jnp.asarray([-1.0, -0.0275, -0.572, 0.022], jnp.float32)
    c1 = jnp.asarray([1.0, 0.0425, 1.04, -0.04], jnp.float32)
    r = roughness[..., None] * c0 + c1
    a004 = (jnp.minimum(r[..., 0] * r[..., 0],
                        jnp.exp2(-9.28 * nov)) * r[..., 0] + r[..., 1])
    ab_x = -1.04 * a004 + r[..., 2]
    ab_y = 1.04 * a004 + r[..., 3]
    ab_y = ab_y * jnp.clip(50.0 * f0[..., 1], 0.0, 1.0)
    return f0 * ab_x[..., None] + ab_y[..., None]
