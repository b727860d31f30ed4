"""Monocular initializer: F RANSAC, essential decomposition, reconstruction."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_ssd_semantic_tpu.config import CameraConfig
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.mapping.initializer import (
    find_fundamental_ransac,
    initialize_monocular,
    reconstruct_from_F,
)

CAM = CameraConfig()


def two_view(rng, n=300, outliers=0):
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 9, n)], -1
    ).astype(np.float32)
    xi = np.array([0.4, 0.05, 0.02, 0.01, 0.06, 0.0], np.float32)
    T2 = np.asarray(se3.se3_exp(jnp.asarray(xi)))

    def proj(T, X):
        p = X @ T[:3, :3].T + T[:3, 3]
        return np.stack(
            [CAM.fx * p[:, 0] / p[:, 2] + CAM.cx, CAM.fy * p[:, 1] / p[:, 2] + CAM.cy], -1
        ).astype(np.float32)

    uv1 = proj(np.eye(4, dtype=np.float32), pts)
    uv2 = proj(T2, pts)
    if outliers:
        uv2[:outliers] += rng.uniform(30, 90, (outliers, 2)).astype(np.float32)
    inside = (
        (uv1 > 5).all(1) & (uv1 < [635, 475]).all(1)
        & (uv2 > 5).all(1) & (uv2 < [635, 475]).all(1)
    )
    return pts, T2, uv1, uv2, inside


def test_fundamental_ransac(rng):
    pts, T2, uv1, uv2, inside = two_view(rng, outliers=60)
    F, inl, n = find_fundamental_ransac(
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(inside), jax.random.PRNGKey(0)
    )
    assert int(n) > 0.6 * inside.sum()
    # Inliers should exclude most corrupted points.
    assert np.asarray(inl)[:60].mean() < 0.25


def test_reconstruction_recovers_motion(rng):
    pts, T2, uv1, uv2, inside = two_view(rng)
    F, inl, n = find_fundamental_ransac(
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(inside), jax.random.PRNGKey(0)
    )
    R, t, X, good = reconstruct_from_F(F, jnp.asarray(uv1), jnp.asarray(uv2), inl, CAM)
    R_true = T2[:3, :3]
    t_true = T2[:3, 3] / np.linalg.norm(T2[:3, 3])
    np.testing.assert_allclose(np.asarray(R), R_true, atol=0.02)
    assert np.linalg.norm(np.asarray(t) - t_true) < 0.05  # up to scale/sign resolved
    # Triangulated structure matches GT up to the global scale.
    g = np.asarray(good)
    scale = np.median(pts[g][:, 2] / np.asarray(X)[g][:, 2])
    err = np.linalg.norm(np.asarray(X)[g] * scale - pts[g], axis=-1)
    assert np.median(err) < 0.15


def test_initialize_monocular_end_to_end(rng):
    pts, T2, uv1, uv2, inside = two_view(rng, outliers=30)
    out = initialize_monocular(
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(inside), CAM,
        jax.random.PRNGKey(1),
    )
    assert out["success"]
    assert out["n_good"] >= 100
