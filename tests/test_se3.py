"""Lie-group utilities: round-trips and algebraic identities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_ssd_semantic_tpu.geometry import se3


def random_rotvecs(rng, n, scale=2.5):
    return rng.normal(size=(n, 3)).astype(np.float32) * scale / 3.0


def test_so3_exp_log_roundtrip(rng):
    w = random_rotvecs(rng, 64)
    R = se3.so3_exp(jnp.asarray(w))
    w2 = se3.so3_log(R)
    R2 = se3.so3_exp(w2)
    # f32 log/exp near the pi wrap-around costs a few ulps more.
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=5e-4)


def test_so3_exp_orthonormal(rng):
    w = random_rotvecs(rng, 32)
    R = se3.so3_exp(jnp.asarray(w))
    assert bool(jnp.all(se3.is_rotation_matrix(R, tol=1e-3)))


def test_so3_exp_small_angle():
    w = jnp.array([[1e-9, -1e-9, 1e-9], [0.0, 0.0, 0.0]], dtype=jnp.float32)
    R = se3.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)
    assert np.all(np.isfinite(np.asarray(R)))


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(64, 6)).astype(np.float32) * 0.7
    T = se3.se3_exp(jnp.asarray(xi))
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-4)


def test_se3_inverse(rng):
    xi = rng.normal(size=(16, 6)).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    eye = T @ se3.se3_inverse(T)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(4), (16, 1, 1)), atol=1e-5)


def test_quat_roundtrip(rng):
    w = random_rotvecs(rng, 128, scale=3.0)
    R = se3.so3_exp(jnp.asarray(w))
    q = se3.rot_to_quat(R)
    R2 = se3.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)


def test_horn_sim3_recovers_transform(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    w = np.array([0.3, -0.2, 0.5], dtype=np.float32)
    R_true = np.asarray(se3.so3_exp(jnp.asarray(w)))
    s_true, t_true = 1.7, np.array([0.5, -1.0, 2.0], dtype=np.float32)
    dst = s_true * pts @ R_true.T + t_true
    s, R, t = se3.horn_sim3(jnp.asarray(pts), jnp.asarray(dst), with_scale=True)
    assert abs(float(s) - s_true) < 1e-3
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)


def test_horn_sim3_masked(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    R_true = np.asarray(se3.so3_exp(jnp.asarray(np.array([0.1, 0.2, -0.3], np.float32))))
    dst = pts @ R_true.T + np.array([1.0, 2.0, 3.0], np.float32)
    # Corrupt half the points; mask them out.
    dst_bad = dst.copy()
    dst_bad[25:] += 100.0
    mask = jnp.asarray(np.r_[np.ones(25), np.zeros(25)].astype(np.float32))
    s, R, t = se3.horn_sim3(jnp.asarray(pts), jnp.asarray(dst_bad), mask=mask, with_scale=False)
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), [1.0, 2.0, 3.0], atol=1e-3)


def test_sim3_compose_inverse(rng):
    s1 = jnp.asarray(1.5, dtype=jnp.float32)
    R1 = se3.so3_exp(jnp.asarray([0.2, 0.1, -0.4], dtype=jnp.float32))
    t1 = jnp.asarray([1.0, 0.0, -2.0], dtype=jnp.float32)
    si, Ri, ti = se3.sim3_inverse(s1, R1, t1)
    s, R, t = se3.sim3_compose(s1, R1, t1, si, Ri, ti)
    assert abs(float(s) - 1.0) < 1e-5
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), np.zeros(3), atol=1e-5)


def test_se3_exp_jit_and_vmap(rng):
    xi = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
    T1 = jax.jit(se3.se3_exp)(xi)
    T2 = jax.vmap(se3.se3_exp)(xi)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T2), atol=1e-6)
