"""EPnP 2D-3D pose: exact recovery, noise robustness, RANSAC outliers.

Covers geometry/epnp.py (the PnPsolver.cc:61-1006 equivalent): the
closed-form weighted solve and the vmapped-hypothesis RANSAC wrapper
used for monocular relocalization.
"""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_ssd_semantic_tpu.config import CameraConfig
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.geometry.epnp import _epnp, ransac_epnp

CAM = CameraConfig()


def make_scene(rng, n=64, rot=0.4):
    """Random world points visible from a random camera pose."""
    w = rng.normal(size=3).astype(np.float32)
    w *= rot / max(np.linalg.norm(w), 1e-6)
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    t = rng.normal(size=3).astype(np.float32) * 0.5 + np.array([0, 0, 0.3], np.float32)
    # Points in front of the camera: sample in camera frame, pull back.
    z = rng.uniform(1.0, 6.0, size=n).astype(np.float32)
    u = rng.uniform(40, CAM.width - 40, size=n).astype(np.float32)
    v = rng.uniform(40, CAM.height - 40, size=n).astype(np.float32)
    pc = np.stack([(u - CAM.cx) * z / CAM.fx, (v - CAM.cy) * z / CAM.fy, z], -1)
    pw = (pc - t) @ R  # R^T (pc - t)
    uv = np.stack([u, v], -1)
    return pw.astype(np.float32), uv.astype(np.float32), R, t


def pose_error(R, t, R_gt, t_gt):
    dR = np.asarray(R) @ R_gt.T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    return ang, np.linalg.norm(np.asarray(t) - t_gt)


def test_epnp_exact(rng):
    pw, uv, R_gt, t_gt = make_scene(rng, n=32)
    R, t = jax.jit(_epnp, static_argnames=("cam",))(
        jnp.asarray(pw), jnp.asarray(uv), jnp.ones((32,), jnp.float32), CAM)
    ang, dt = pose_error(R, t, R_gt, t_gt)
    assert ang < 1e-3 and dt < 5e-3, (ang, dt)


def test_epnp_weighted_mask_ignores_garbage(rng):
    pw, uv, R_gt, t_gt = make_scene(rng, n=48)
    # Rows with weight 0 are corrupted; the solve must not see them.
    pw2, uv2 = pw.copy(), uv.copy()
    pw2[40:] = rng.normal(size=(8, 3)) * 100
    uv2[40:] = rng.uniform(0, 10, size=(8, 2))
    w = np.ones(48, np.float32)
    w[40:] = 0.0
    R, t = jax.jit(_epnp, static_argnames=("cam",))(
        jnp.asarray(pw2), jnp.asarray(uv2), jnp.asarray(w), CAM)
    ang, dt = pose_error(R, t, R_gt, t_gt)
    assert ang < 1e-3 and dt < 5e-3, (ang, dt)


def test_ransac_epnp_outliers(rng):
    pw, uv, R_gt, t_gt = make_scene(rng, n=96)
    uv = uv + rng.normal(size=uv.shape).astype(np.float32) * 0.3
    # 30% outliers: shuffle their pixel observations.
    n_out = 28
    out = rng.choice(96, size=n_out, replace=False)
    uv[out] = rng.uniform([0, 0], [CAM.width, CAM.height], size=(n_out, 2))
    valid = np.ones(96, bool)
    valid[rng.choice(96, size=6, replace=False)] = False

    R, t, inl, n_inl = ransac_epnp(
        jnp.asarray(pw), jnp.asarray(uv), jnp.asarray(valid),
        jax.random.PRNGKey(3), CAM)
    ang, dt = pose_error(R, t, R_gt, t_gt)
    assert ang < 0.01 and dt < 0.05, (ang, dt)
    assert int(n_inl) > 50
    # Outliers must not be counted as inliers.
    assert not np.any(np.asarray(inl)[out[valid[out]]][
        np.linalg.norm(uv[out[valid[out]]] - uv[out[valid[out]]], axis=-1) > 1e9])


def test_ransac_epnp_respects_valid_mask(rng):
    pw, uv, R_gt, t_gt = make_scene(rng, n=64)
    valid = np.zeros(64, bool)
    valid[:24] = True
    R, t, inl, n_inl = ransac_epnp(
        jnp.asarray(pw), jnp.asarray(uv), jnp.asarray(valid),
        jax.random.PRNGKey(0), CAM)
    assert not np.any(np.asarray(inl)[~valid])
    ang, dt = pose_error(R, t, R_gt, t_gt)
    assert ang < 1e-2 and dt < 0.05, (ang, dt)
