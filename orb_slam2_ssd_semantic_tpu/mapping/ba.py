"""Local bundle adjustment with Schur-complement reduction.

TPU-native equivalent of Optimizer::LocalBundleAdjustment
(perfect/src/Optimizer.cc:619-994): jointly refine a window of keyframe
poses and the map points they observe, with Huber-robust reprojection
residuals, the reference's 5+10 iteration schedule with chi2 outlier
gating in between (Optimizer.cc:843-886), and fixed gauge keyframes.

Where g2o builds a heap graph and factors a sparse Hessian, this
implementation exploits the BA structure directly with dense fixed-shape
blocks sized for the local window (SURVEY.md §7 stage 2):

  H = [ Hcc  Hcp ]   Hcc: (W,6,6) block-diag (pose blocks)
      [ Hcp' Hpp ]   Hpp: (N,3,3) block-diag (point blocks)
                     Hcp: (W,N,6,3) dense camera-point coupling

  S  = Hcc - Hcp Hpp^-1 Hcp'          (reduced camera system, 6W x 6W)
  dx_c = solve(S, rhs_c); dx_p by back-substitution.

For the default window (W=16, N=4096) every piece is a dense einsum that
maps straight onto the MXU; the (96,96) solve is negligible. The same
camera-block reduction distributes over the `pt` mesh axis with one psum
(parallel/dist_ba.py; SURVEY.md §2.6 P12).

All observations are padded (W,K) arrays; `point_slot` = -1 marks
padding. Fixed keyframes still constrain points (their observations
enter Hpp/b_p) but contribute no pose block — exactly g2o's
setFixed(true) semantics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import CameraConfig, OptimizerConfig
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.ops.linalg import inv3x3, pcg_solve


class BAProblem(NamedTuple):
    """A fixed-shape local BA problem.

    W keyframes, N local point slots, K keypoint slots per KF.
    """

    T_cw: jnp.ndarray  # (W, 4, 4) initial poses
    fixed: jnp.ndarray  # (W,) bool — gauge/anchor keyframes
    points: jnp.ndarray  # (N, 3) initial positions
    point_valid: jnp.ndarray  # (N,) bool
    point_slot: jnp.ndarray  # (W, K) int32 local point index, -1 = none
    obs_uvr: jnp.ndarray  # (W, K, 3) observations [u, v, uR]
    inv_sigma2: jnp.ndarray  # (W, K)
    is_stereo: jnp.ndarray  # (W, K) bool


class BAResult(NamedTuple):
    T_cw: jnp.ndarray  # (W, 4, 4)
    points: jnp.ndarray  # (N, 3)
    inlier: jnp.ndarray  # (W, K) bool — final observation inlier mask
    chi2: jnp.ndarray  # (W, K)


def _residuals(T_cw, points, prob: BAProblem, cam: CameraConfig):
    """Residuals e (W,K,3), pose Jacobian (W,K,3,6), point Jacobian
    (W,K,3,3), and behind-camera mask (W,K)."""
    W, K = prob.point_slot.shape
    slot = jnp.clip(prob.point_slot, 0, points.shape[0] - 1)
    X = points[slot]  # (W, K, 3)
    R = T_cw[:, :3, :3]
    t = T_cw[:, :3, 3]
    p = jnp.einsum("wij,wkj->wki", R, X) + t[:, None, :]
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    z_safe = jnp.where(z > 1e-6, z, 1e-6)
    iz = 1.0 / z_safe
    iz2 = iz * iz

    u = cam.fx * x * iz + cam.cx
    v = cam.fy * y * iz + cam.cy
    ur = u - cam.depth_bf * iz
    e = jnp.stack([u, v, ur], axis=-1) - prob.obs_uvr

    zeros = jnp.zeros_like(iz)
    du = jnp.stack([cam.fx * iz, zeros, -cam.fx * x * iz2], axis=-1)
    dv = jnp.stack([zeros, cam.fy * iz, -cam.fy * y * iz2], axis=-1)
    dur = du + jnp.stack([zeros, zeros, cam.depth_bf * iz2], axis=-1)
    duvr_dp = jnp.stack([du, dv, dur], axis=-2)  # (W, K, 3, 3)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), p.shape[:-1] + (3, 3))
    dp_dxi = jnp.concatenate([eye, -se3.hat(p)], axis=-1)  # (W, K, 3, 6)
    J_pose = duvr_dp @ dp_dxi  # (W, K, 3, 6)
    # dp/dX = R (independent of the keypoint).
    J_point = duvr_dp @ R[:, None, :, :]  # (W, K, 3, 3)
    return e, J_pose, J_point, z <= 1e-6


def _obs_chi2(e, inv_sigma2, comp_w):
    return jnp.sum(e * e * comp_w, axis=-1) * inv_sigma2


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def local_bundle_adjust(
    prob: BAProblem,
    cam: CameraConfig,
    cfg: OptimizerConfig = OptimizerConfig(),
) -> BAResult:
    W, K = prob.point_slot.shape
    N = prob.points.shape[0]
    comp_w = jnp.where(
        prob.is_stereo[..., None],
        jnp.ones((1, 1, 3), jnp.float32),
        jnp.asarray([[[1.0, 1.0, 0.0]]], jnp.float32),
    )
    chi2_th = jnp.where(prob.is_stereo, cfg.chi2_stereo, cfg.chi2_mono)
    delta = jnp.where(prob.is_stereo, cfg.huber_delta_stereo, cfg.huber_delta_mono)
    obs_valid = (prob.point_slot >= 0) & prob.point_valid[
        jnp.clip(prob.point_slot, 0, N - 1)
    ]
    free_pose = (~prob.fixed).astype(jnp.float32)  # (W,)

    # Observation->point incidence as a one-hot matrix, built ONCE per
    # call (the slot layout is constant across GN iterations). All
    # per-point accumulations become MXU matmuls against it — scatter-add
    # serializes on TPU (~25 ms/iteration at this size), the one-hot
    # GEMMs are bandwidth-bound reads (~1 ms).
    slot = jnp.clip(prob.point_slot, 0, N - 1)
    onehot = (
        (slot[..., None] == jnp.arange(N, dtype=slot.dtype)) & obs_valid[..., None]
    ).astype(jnp.float32)  # (W, K, N)

    def gn_step(T_cw, points, inlier_w, use_huber):
        e, J_pose, J_point, behind = _residuals(T_cw, points, prob, cam)
        w = prob.inv_sigma2 * inlier_w * (~behind)
        chi = _obs_chi2(e, prob.inv_sigma2, comp_w)
        rho = jnp.where(
            use_huber & (chi > delta * delta),
            delta / jnp.sqrt(jnp.maximum(chi, 1e-12)),
            1.0,
        )
        wc = (w * rho)[..., None] * comp_w  # (W, K, 3)

        # Pose blocks exclude fixed keyframes.
        Jp = J_pose * free_pose[:, None, None, None]

        Hcc = jnp.einsum("wkri,wkr,wkrj->wij", Jp, wc, Jp)  # (W, 6, 6)
        b_c = -jnp.einsum("wkri,wkr->wi", Jp, wc * e)  # (W, 6)

        # Per-observation blocks, flattened for the incidence GEMMs.
        Hpp_flat = jnp.einsum("wkri,wkr,wkrj->wkij", J_point, wc, J_point)
        b_p_flat = -jnp.einsum("wkri,wkr->wki", J_point, wc * e)
        Hcp_flat = jnp.einsum("wkri,wkr,wkrj->wkij", Jp, wc, J_point)  # (W,K,6,3)

        # Point reductions: one (N, W*K) x (W*K, 12) GEMM.
        pp12 = jnp.concatenate(
            [Hpp_flat.reshape(W, K, 9), b_p_flat], axis=-1
        ).reshape(W * K, 12)
        red = onehot.reshape(W * K, N).T @ pp12  # (N, 12)
        Hpp = red[:, :9].reshape(N, 3, 3)
        b_p = red[:, 9:]

        # Camera-point coupling: W batched (N, K) x (K, 18) GEMMs.
        Hcp = jnp.einsum(
            "wkn,wkf->wnf", onehot, Hcp_flat.reshape(W, K, 18)
        ).reshape(W, N, 6, 3)

        # Damped point-block inverse.
        lam = jnp.float32(cfg.lm_lambda_init)
        Hpp = Hpp + (lam + 1e-6) * jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (N, 3, 3))
        Hpp_inv = inv3x3(Hpp)

        # Reduced camera system: S = Hcc - A Hcp' with A = Hcp Hpp^-1,
        # contracted as ONE (6W, 3N) x (3N, 6W) MXU matmul.
        A = jnp.einsum("wnab,nbc->wnac", Hcp, Hpp_inv)  # (W, N, 6, 3)
        A2 = A.transpose(0, 2, 1, 3).reshape(6 * W, 3 * N)
        Hcp2 = Hcp.transpose(0, 2, 1, 3).reshape(6 * W, 3 * N)
        S_mat = -(A2 @ Hcp2.T)  # (6W, 6W)
        Sblk = S_mat.reshape(W, 6, W, 6)
        Sblk = Sblk.at[jnp.arange(W), :, jnp.arange(W), :].add(Hcc)
        S_mat = Sblk.reshape(6 * W, 6 * W)
        rhs = b_c - (A2 @ b_p.reshape(-1)).reshape(W, 6)

        # Gauge: identity rows for fixed poses keep the system well-posed.
        fixed_diag = jnp.repeat(prob.fixed, 6)
        S_mat = S_mat + jnp.diag(fixed_diag.astype(jnp.float32) + 1e-5)
        # Jacobi-PCG instead of LU: the 6Wx6W solve is latency-bound
        # sequential work on TPU, and GN tolerates the inexact step.
        dx_c = pcg_solve(S_mat, rhs.reshape(-1), iters=32).reshape(W, 6)
        dx_c = dx_c * free_pose[:, None]

        # Back-substitute points: dx_p = Hpp^-1 (b_p - Hcp' dx_c).
        corr = (dx_c.reshape(-1) @ Hcp2).reshape(N, 3)
        dx_p = jnp.einsum("nbc,nc->nb", Hpp_inv, b_p - corr)
        dx_p = dx_p * prob.point_valid[:, None]

        T_new = se3.se3_exp(dx_c) @ T_cw
        points_new = points + dx_p
        return T_new, points_new

    T_cw = prob.T_cw
    points = prob.points
    inlier = obs_valid.astype(jnp.float32)

    # Phase 1: robust iterations (reference: 5 iters with Huber).
    for _ in range(cfg.local_ba_iters_initial):
        T_cw, points = gn_step(T_cw, points, inlier, True)
    # Outlier gate (Optimizer.cc:850-886).
    e, _, _, behind = _residuals(T_cw, points, prob, cam)
    chi = _obs_chi2(e, prob.inv_sigma2, comp_w)
    inlier = (obs_valid & (chi < chi2_th) & (~behind)).astype(jnp.float32)
    # Phase 2: clean iterations (reference: 10 more without kernel).
    for _ in range(cfg.local_ba_iters_refine):
        T_cw, points = gn_step(T_cw, points, inlier, False)

    e, _, _, behind = _residuals(T_cw, points, prob, cam)
    chi = _obs_chi2(e, prob.inv_sigma2, comp_w)
    final_inlier = obs_valid & (chi < chi2_th) & (~behind)
    return BAResult(T_cw, points, final_inlier, chi)
