"""Geometry core: rotation round-trips and identities (SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfm_tpu.geometry.rotations import (
    so3_exp, so3_log, so3_hat, aa_to_quat, quat_to_aa, quat_mul,
    quat_to_matrix, matrix_to_quat,
)


def random_aa(n, seed=0, max_angle=np.pi - 0.05):
    rng = np.random.default_rng(seed)
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    angle = rng.uniform(0, max_angle, size=(n, 1))
    return (axis * angle).astype(np.float32)


def test_exp_is_rotation():
    w = jnp.asarray(random_aa(64))
    R = so3_exp(w)
    eye = jnp.eye(3)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), jnp.broadcast_to(eye, R.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_exp_log_roundtrip():
    w = jnp.asarray(random_aa(128, seed=1))
    w2 = so3_log(so3_exp(w))
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=2e-5)


def test_log_exp_near_identity_and_pi():
    for angle in [1e-9, 1e-5, 0.1, np.pi - 1e-3]:
        w = jnp.asarray([[angle, 0.0, 0.0]], dtype=jnp.float32)
        w2 = so3_log(so3_exp(w))
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=5e-4)


def test_hat_cross_product():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(10, 3)), dtype=jnp.float32)
    b = jnp.asarray(rng.normal(size=(10, 3)), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("nij,nj->ni", so3_hat(a), b)),
        np.cross(np.asarray(a), np.asarray(b)),
        atol=1e-5,
    )


def test_quat_roundtrips():
    w = jnp.asarray(random_aa(64, seed=3))
    q = aa_to_quat(w)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(quat_to_aa(q)), np.asarray(w), atol=2e-5)
    R = quat_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R), np.asarray(so3_exp(w)), atol=1e-5)
    q2 = matrix_to_quat(R)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=2e-5)


def test_quat_mul_matches_matrix_product():
    wa = jnp.asarray(random_aa(32, seed=4))
    wb = jnp.asarray(random_aa(32, seed=5))
    q = quat_mul(aa_to_quat(wa), aa_to_quat(wb))
    np.testing.assert_allclose(
        np.asarray(quat_to_matrix(q)), np.asarray(so3_exp(wa) @ so3_exp(wb)), atol=1e-5
    )


def test_exp_differentiable_at_zero():
    # BA differentiates through so3_exp; the derivative at 0 must be exact (hat map).
    jac = jax.jacfwd(so3_exp)(jnp.zeros(3))
    expected = np.zeros((3, 3, 3))
    e = np.eye(3)
    for k in range(3):
        hat = np.asarray(so3_hat(jnp.asarray(e[k], dtype=jnp.float32)))
        expected[:, :, k] = hat
    np.testing.assert_allclose(np.asarray(jac), expected, atol=1e-6)
    assert not np.any(np.isnan(np.asarray(jac)))


def test_vmap_and_jit_safe():
    w = jnp.asarray(random_aa(16, seed=6))
    out1 = jax.jit(jax.vmap(so3_exp))(w)
    out2 = so3_exp(w)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
