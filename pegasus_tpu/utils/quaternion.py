"""Quaternion / rotation utilities (pure JAX, batched).

Conventions
-----------
Two quaternion layouts exist in the PEGASUS data ecosystem:

* ``wxyz`` — COLMAP qvec and Inria 3DGS per-splat rotations
  (reference: src/utility/graphic_utils.py:13-37,
  submodule ``build_rotation`` consumed at src/gs/gaussian_model.py:502).
* ``xyzw`` — scipy / PyBullet trajectory JSON
  (reference: src/engine/physical_simulation.py:137-152).

All functions here take an explicit layout in their name; the internal
canonical layout is ``wxyz``.  Everything is batched over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def xyzw_to_wxyz(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([q[..., 3:4], q[..., 0:3]], axis=-1)


def wxyz_to_xyzw(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """wxyz quaternion(s) -> 3x3 rotation matrix(es).

    Matches COLMAP's qvec2rotmat (reference: src/utility/graphic_utils.py:13-23)
    and the Inria ``build_rotation`` helper; the input is normalized first.
    """
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix(es) -> wxyz quaternion(s), w >= 0.

    Branch-free Shepperd-style extraction (safe under jit/vmap): computes all
    four candidate quaternions and selects the best-conditioned one.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, scaled by 4*q_k^2 (each always >= 0 up to fp error).
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    # candidate built from w
    cw = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cx = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cy = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cw, cx, cy, cz], axis=-2)  # [..., 4 cand, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    q = normalize(q)
    # canonical sign: w >= 0 (reference rotmat2qvec flips the same way,
    # src/utility/graphic_utils.py:35-37)
    return jnp.where(q[..., 0:1] < 0, -q, q)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b for wxyz quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by wxyz quaternion(s) q (normalized internally)."""
    q = normalize(q)
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def slerp(q1: jnp.ndarray, q2: jnp.ndarray, alpha) -> jnp.ndarray:
    """Spherical linear interpolation, layout-agnostic (4-vectors).

    Reproduces the reference's SLERP including the lerp fallback when the
    quaternions are nearly parallel (dot > 0.9995)
    (reference: src/utility/pose_interpolation.py:58-84).
    """
    alpha = jnp.asarray(alpha)
    dot = jnp.sum(q1 * q2, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)

    # near-parallel: normalized lerp
    lerp = q1 + alpha[..., None] * (q2 - q1)
    lerp = normalize(lerp)

    theta_0 = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta_0 = jnp.maximum(jnp.sin(theta_0), 1e-12)
    theta = theta_0 * alpha[..., None]
    s1 = jnp.cos(theta) - dot * jnp.sin(theta) / sin_theta_0
    s2 = jnp.sin(theta) / sin_theta_0
    true_slerp = s1 * q1 + s2 * q2

    return jnp.where(dot > 0.9995, lerp, true_slerp)


def random_unnormalized_quat_xyzw(key) -> jnp.ndarray:
    """uniform(0,1)^4 start orientation, matching the reference's
    (deliberately unnormalized) object-drop initialization
    (reference: src/engine/physical_simulation.py:66-73).  Consumers
    normalize before use, exactly as Bullet does internally.
    """
    import jax

    return jax.random.uniform(key, (4,), minval=0.0, maxval=1.0)
