"""Row-vector, left-handed 3-D math matching DirectXMath conventions.

The reference app drives its camera and object transforms through
DirectXMath (row-vector convention: ``v_row @ M``), left-handed clip space
with z in [0, 1]:

- projection: ``XMMatrixPerspectiveFovLH`` (RayTracedGGX.cpp:269)
- view: ``XMMatrixLookAtLH`` (RayTracedGGX.cpp:277)
- object worlds: ``XMMatrixScaling * XMMatrixRotationY * XMMatrixTranslation``
  (RayTracer.cpp:273-279)

All functions are jnp-traceable so per-frame matrix updates can live inside
a jitted frame step.  float32 throughout.
"""

from __future__ import annotations

import jax.numpy as jnp


def perspective_fov_lh(fov_y: float, aspect: float, z_near: float, z_far: float):
    """XMMatrixPerspectiveFovLH equivalent (row-vector convention)."""
    h = 1.0 / jnp.tan(jnp.asarray(fov_y, jnp.float32) * 0.5)
    w = h / aspect
    rng = z_far / (z_far - z_near)
    z = jnp.zeros((), jnp.float32)
    one = jnp.ones((), jnp.float32)
    return jnp.stack([
        jnp.stack([w, z, z, z]),
        jnp.stack([z, h, z, z]),
        jnp.stack([z, z, jnp.asarray(rng, jnp.float32), one]),
        jnp.stack([z, z, jnp.asarray(-rng * z_near, jnp.float32), z]),
    ]).astype(jnp.float32)


def look_at_lh(eye, focus, up):
    """XMMatrixLookAtLH equivalent (row-vector convention)."""
    eye = jnp.asarray(eye, jnp.float32)
    focus = jnp.asarray(focus, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    r2 = normalize(focus - eye)               # forward (+z)
    r0 = normalize(jnp.cross(up, r2))         # right
    r1 = jnp.cross(r2, r0)                    # true up
    d = -jnp.stack([jnp.dot(r0, eye), jnp.dot(r1, eye), jnp.dot(r2, eye)])
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[:3, 0].set(r0).at[:3, 1].set(r1).at[:3, 2].set(r2)
    m = m.at[3, :3].set(d).at[3, 3].set(1.0)
    return m


def rotation_y(angle):
    """XMMatrixRotationY equivalent (row-vector convention)."""
    c = jnp.cos(jnp.asarray(angle, jnp.float32))
    s = jnp.sin(jnp.asarray(angle, jnp.float32))
    z = jnp.zeros((), jnp.float32)
    one = jnp.ones((), jnp.float32)
    return jnp.stack([
        jnp.stack([c, z, -s, z]),
        jnp.stack([z, one, z, z]),
        jnp.stack([s, z, c, z]),
        jnp.stack([z, z, z, one]),
    ])


def rotation_x(angle):
    """XMMatrixRotationX equivalent (row-vector convention)."""
    c = jnp.cos(jnp.asarray(angle, jnp.float32))
    s = jnp.sin(jnp.asarray(angle, jnp.float32))
    z = jnp.zeros((), jnp.float32)
    one = jnp.ones((), jnp.float32)
    return jnp.stack([
        jnp.stack([one, z, z, z]),
        jnp.stack([z, c, s, z]),
        jnp.stack([z, -s, c, z]),
        jnp.stack([z, z, z, one]),
    ])


def rotation_roll_pitch_yaw(pitch, yaw, roll=0.0):
    """XMMatrixRotationRollPitchYaw equivalent: Rz(roll) @ Rx(pitch) @
    Ry(yaw) in row-vector order (roll omitted here when 0)."""
    m = rotation_x(pitch) @ rotation_y(yaw)
    if not (isinstance(roll, float) and roll == 0.0):
        c = jnp.cos(jnp.asarray(roll, jnp.float32))
        s = jnp.sin(jnp.asarray(roll, jnp.float32))
        z = jnp.zeros((), jnp.float32)
        one = jnp.ones((), jnp.float32)
        rz = jnp.stack([
            jnp.stack([c, s, z, z]),
            jnp.stack([-s, c, z, z]),
            jnp.stack([z, z, one, z]),
            jnp.stack([z, z, z, one]),
        ])
        m = rz @ m
    return m


def scaling(sx, sy, sz):
    return jnp.diag(jnp.asarray([sx, sy, sz, 1.0], jnp.float32))


def translation(tx, ty, tz):
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[3, :3].set(jnp.asarray([tx, ty, tz], jnp.float32))


def normalize(v, axis=-1, eps=0.0):
    v = jnp.asarray(v, jnp.float32)
    n = jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True))
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def transform_points_h(points, m):
    """Homogeneous transform of (..., 3) points by a 4x4 row-vector matrix.

    Returns the full (..., 4) clip-space result (no perspective divide).
    """
    p = jnp.asarray(points, jnp.float32)
    return p @ m[:3, :] + m[3, :]


def transform_points(points, m):
    """Affine transform of (..., 3) points: w assumed 1, returns (..., 3)."""
    p = jnp.asarray(points, jnp.float32)
    return p @ m[:3, :3] + m[3, :3]


def transform_vectors(vectors, m3):
    """Transform (..., 3) direction vectors by a 3x3 row-vector matrix."""
    return jnp.asarray(vectors, jnp.float32) @ m3


def inverse(m):
    return jnp.linalg.inv(m.astype(jnp.float32)).astype(jnp.float32)


def normal_matrix(world):
    """3x3 inverse-transpose of a 4x4 world matrix (row-vector convention).

    The reference passes WorldIT 3x3 per mesh (RayTracer.cpp:294) and
    normals are transformed as ``mul(nrm, worldIT)`` (RayTracing.hlsl:314).
    For a row-vector convention the correct normal matrix is
    inv(world_3x3)^T.
    """
    w3 = world[:3, :3]
    return jnp.linalg.inv(w3).T.astype(jnp.float32)


def reflect(i, n):
    """HLSL reflect: i - 2*dot(i,n)*n (i points toward the surface)."""
    return i - 2.0 * jnp.sum(i * n, axis=-1, keepdims=True) * n


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def lerp(a, b, t):
    return a + (b - a) * t
