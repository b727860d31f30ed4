"""Sim3 bidirectional-reprojection refinement (Optimizer::OptimizeSim3).

Covers mapping/sim3_opt.py: recovery of a perturbed loop transform,
scale estimation for monocular loops, and outlier gating.
"""

import jax.numpy as jnp
import numpy as np

from orb_slam2_ssd_semantic_tpu.config import CameraConfig
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.mapping.sim3_opt import optimize_sim3

CAM = CameraConfig()


def make_pair(rng, n=128, scale=1.0):
    """Matched points in two camera frames related by a known Sim3."""
    w = rng.normal(size=3).astype(np.float32) * 0.15
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    t = rng.normal(size=3).astype(np.float32) * 0.3
    z = rng.uniform(1.5, 5.0, size=n).astype(np.float32)
    u = rng.uniform(60, CAM.width - 60, size=n).astype(np.float32)
    v = rng.uniform(60, CAM.height - 60, size=n).astype(np.float32)
    p_i = np.stack([(u - CAM.cx) * z / CAM.fx, (v - CAM.cy) * z / CAM.fy, z], -1)
    p_j = scale * p_i @ R.T + t
    # Keep everything in front of camera j.
    shift = max(0.0, 0.5 - p_j[:, 2].min())
    t = t + np.array([0, 0, shift], np.float32)
    p_j[:, 2] += shift

    def proj(p):
        return np.stack([CAM.fx * p[:, 0] / p[:, 2] + CAM.cx,
                         CAM.fy * p[:, 1] / p[:, 2] + CAM.cy], -1)

    return (p_i.astype(np.float32), p_j.astype(np.float32),
            proj(p_i).astype(np.float32), proj(p_j).astype(np.float32),
            np.float32(scale), R, t)


def err(res, s_gt, R_gt, t_gt):
    dR = np.asarray(res.R) @ R_gt.T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    return (abs(float(res.s) - s_gt), ang,
            np.linalg.norm(np.asarray(res.t) - t_gt))


def run(rng, scale, fix_scale, n_out=0):
    p_i, p_j, uv_i, uv_j, s_gt, R_gt, t_gt = make_pair(rng, scale=scale)
    n = p_i.shape[0]
    if n_out:
        # Realistic outliers: wrong data associations (cyclic shuffle of
        # the KF-j side), the failure mode Hamming matching produces.
        out = rng.choice(n, size=n_out, replace=False)
        p_j[out] = p_j[np.roll(out, 1)]
        uv_j[out] = uv_j[np.roll(out, 1)]
    # Perturbed initial guess (RANSAC-quality seed).
    dR = np.asarray(se3.so3_exp(jnp.asarray(
        rng.normal(size=3).astype(np.float32) * 0.02)))
    s0 = s_gt * (1.0 if fix_scale else 1.05)
    R0 = dR @ R_gt
    t0 = t_gt + rng.normal(size=3).astype(np.float32) * 0.05
    ones = np.ones(n, np.float32)
    res = optimize_sim3(
        jnp.float32(s0), jnp.asarray(R0), jnp.asarray(t0),
        jnp.asarray(p_i), jnp.asarray(p_j), jnp.asarray(uv_i), jnp.asarray(uv_j),
        jnp.asarray(ones), jnp.asarray(ones), jnp.ones(n, bool),
        CAM, fix_scale=fix_scale,
    )
    return res, s_gt, R_gt, t_gt, (np.asarray(res.inliers), n_out)


def test_sim3_refine_rgbd(rng):
    res, s_gt, R_gt, t_gt, _ = run(rng, scale=1.0, fix_scale=True)
    ds, ang, dt = err(res, s_gt, R_gt, t_gt)
    assert ds == 0.0  # scale frozen
    assert ang < 1e-3 and dt < 5e-3, (ang, dt)
    assert int(res.num_inliers) > 120


def test_sim3_refine_mono_scale(rng):
    res, s_gt, R_gt, t_gt, _ = run(rng, scale=1.3, fix_scale=False)
    ds, ang, dt = err(res, s_gt, R_gt, t_gt)
    assert ds < 5e-3 and ang < 1e-3 and dt < 1e-2, (ds, ang, dt)


def test_sim3_rejects_outliers():
    # Own deterministic stream: this test's geometry must not depend on
    # how much of the shared session rng earlier tests consumed.
    rng = np.random.default_rng(7)
    res, s_gt, R_gt, t_gt, (inl, n_out) = run(
        rng, scale=1.0, fix_scale=True, n_out=30)
    ds, ang, dt = err(res, s_gt, R_gt, t_gt)
    assert ang < 2e-3 and dt < 1e-2, (ang, dt)
    assert int(res.num_inliers) >= 128 - 30 - 5
    assert int(res.num_inliers) <= 128 - 20  # most outliers gated
