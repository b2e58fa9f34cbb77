"""SO(3) parametrizations: angle-axis (exp/log), quaternions, matrices.

Reference-class realization: C++/Eigen hand-rolled rotation utilities
(SURVEY.md §2.1). TPU-native realization: pure jnp, branchless (jnp.where
instead of data-dependent branches) so everything jits and vmaps; small-angle
Taylor fallbacks keep gradients finite at theta == 0, which matters because
bundle adjustment differentiates through so3_exp.

Convention: rotations are world->camera unless stated otherwise. Angle-axis
vectors are the BA-side parametrization (minimal, singularity only at pi).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def so3_hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [w]_x such that hat(w) @ v == cross(w, v). (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: angle-axis (..., 3) -> rotation matrix (..., 3, 3).

    Branchless small-angle handling: sin(t)/t and (1-cos t)/t^2 are replaced
    by their Taylor values below _EPS so jacfwd through theta=0 stays exact.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS**2))
    small = theta2 < _EPS
    # sin(theta)/theta, (1 - cos(theta))/theta^2 with Taylor fallbacks.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS**2))
    K = so3_hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def aa_to_matrix(w: jnp.ndarray) -> jnp.ndarray:
    return so3_exp(w)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> angle-axis (..., 3).

    Uses the quaternion route, which is numerically stable across the full
    angle range including near pi (the trace formula is not).
    """
    q = matrix_to_quat(R)
    return quat_to_aa(q)


def matrix_to_aa(R: jnp.ndarray) -> jnp.ndarray:
    return so3_log(R)


def quat_to_aa(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> angle-axis. Branchless."""
    q = q * jnp.sign(jnp.where(q[..., :1] == 0, 1.0, q[..., :1]))  # hemisphere: w >= 0
    w = q[..., 0]
    v = q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(vnorm, w)
    small = vnorm < _EPS
    scale = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), theta / jnp.maximum(vnorm, _EPS))
    return v * scale[..., None]


def aa_to_quat(w: jnp.ndarray) -> jnp.ndarray:
    """Angle-axis -> unit quaternion (w, x, y, z). Branchless small-angle."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS**2))
    half = 0.5 * theta
    small = theta2 < _EPS
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    return jnp.concatenate([jnp.cos(half)[..., None], k[..., None] * w], axis=-1)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of (w, x, y, z) quaternions."""
    w1, x1, y1, z1 = (q1[..., i] for i in range(4))
    w2, x2, y2, z2 = (q2[..., i] for i in range(4))
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = (q[..., i] for i in range(4))
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z).

    Branchless Shepperd variant: compute all four candidate quaternions from
    the four diagonal combinations, pick the one with the largest divisor.
    Stable for all rotations; vmap-safe.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by its (guaranteed-positive for the argmax) pivot.
    qw0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx0 = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy0 = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz0 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    choice = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw0, qx0, qy0, qz0], axis=-2)  # (..., 4 candidates, 4 components)
    q = jnp.take_along_axis(cands, choice[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical hemisphere (w >= 0) so log is single-valued.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
