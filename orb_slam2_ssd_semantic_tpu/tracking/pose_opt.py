"""Motion-only bundle adjustment (pose optimization).

TPU-native equivalent of Optimizer::PoseOptimization
(perfect/src/Optimizer.cc:365-593): g2o's 4 rounds x 10 LM iterations
with per-round chi-squared outlier gating (mono 5.991 / stereo 7.815,
Optimizer.cc:509-517) and Huber kernels in the early rounds
(Optimizer.cc:547-548 removes the kernel for the later rounds).

Re-architected as a fully batched Gauss-Newton/LM solve: residuals and
analytic Jacobians for ALL observations at once (padded, masked), a
6x6 normal-equation reduction, and `lax.fori_loop` iterations — no
graph objects, no per-edge virtual calls. The 6x6 solve is tiny; the
per-point reduction is the TPU work and maps onto the VPU/MXU.

Residual model (stereo/RGB-D observation = (u, v, uR)):
    p = R X + t
    u = fx px/pz + cx ; v = fy py/pz + cy ; uR = u - bf/pz
Monocular observations set the uR component's weight to zero.
Information weighting is 1/sigma2(level) as in the reference.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import CameraConfig, OptimizerConfig
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.ops.linalg import cholesky_solve_small


class PoseOptResult(NamedTuple):
    T_cw: jnp.ndarray  # (4, 4) optimized world->camera pose
    inliers: jnp.ndarray  # (N,) bool final inlier mask
    num_inliers: jnp.ndarray  # () int32
    chi2: jnp.ndarray  # (N,) final per-point chi2


def _residual_jacobian(T_cw, pts_w, obs, cam: CameraConfig):
    """Batched residual (N, 3) and Jacobian (N, 3, 6) wrt a left-mult
    se3 perturbation (translation-first)."""
    R, t = se3.mat_to_rt(T_cw)
    p = pts_w @ R.T + t  # (N, 3)
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    z_safe = jnp.where(z > 1e-6, z, 1e-6)
    iz = 1.0 / z_safe
    iz2 = iz * iz

    u = cam.fx * x * iz + cam.cx
    v = cam.fy * y * iz + cam.cy
    ur = u - cam.depth_bf * iz
    e = jnp.stack([u, v, ur], axis=-1) - obs  # (N, 3)

    # d(u,v,ur)/dp
    du = jnp.stack([cam.fx * iz, jnp.zeros_like(iz), -cam.fx * x * iz2], axis=-1)
    dv = jnp.stack([jnp.zeros_like(iz), cam.fy * iz, -cam.fy * y * iz2], axis=-1)
    dur = du + jnp.stack(
        [jnp.zeros_like(iz), jnp.zeros_like(iz), cam.depth_bf * iz2], axis=-1
    )
    duvr_dp = jnp.stack([du, dv, dur], axis=-2)  # (N, 3, 3)

    # dp/dxi for left perturbation: [I | -hat(p)]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), (p.shape[0], 3, 3))
    dp_dxi = jnp.concatenate([eye, -se3.hat(p)], axis=-1)  # (N, 3, 6)
    J = duvr_dp @ dp_dxi  # (N, 3, 6)
    behind = z <= 1e-6
    return e, J, behind


def _chi2(e, w_info, comp_w):
    """Per-point chi2 = e^T Omega e with Omega = diag(w_info * comp_w)."""
    return jnp.sum(e * e * comp_w, axis=-1) * w_info


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def pose_optimize(
    T_init: jnp.ndarray,
    pts_w: jnp.ndarray,
    obs_uvr: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    is_stereo: jnp.ndarray,
    valid: jnp.ndarray,
    cam: CameraConfig,
    cfg: OptimizerConfig = OptimizerConfig(),
) -> PoseOptResult:
    """Optimize T_cw given 3D-2D(3) correspondences.

    pts_w: (N, 3) world points; obs_uvr: (N, 3) [u, v, uR] (uR ignored
    where ~is_stereo); inv_sigma2: (N,) per-observation information
    scale (1/sigma^2 of the keypoint's pyramid level); valid: (N,) mask.
    """
    comp_w = jnp.where(
        is_stereo[:, None],
        jnp.ones((1, 3), dtype=jnp.float32),
        jnp.asarray([[1.0, 1.0, 0.0]], dtype=jnp.float32),
    )  # (N, 3) per-component weights
    chi2_th = jnp.where(is_stereo, cfg.chi2_stereo, cfg.chi2_mono)
    delta = jnp.where(is_stereo, cfg.huber_delta_stereo, cfg.huber_delta_mono)

    def gn_iters(T, inl, use_huber, n_iters):
        def body(_, carry):
            T, lam = carry
            e, J, behind = _residual_jacobian(T, pts_w, obs_uvr, cam)
            w = inv_sigma2 * inl * (~behind)
            chi = _chi2(e, 1.0, comp_w) * inv_sigma2  # (N,)
            # Huber robust reweighting on the whitened norm.
            rho_w = jnp.where(
                use_huber & (chi > delta * delta),
                delta / jnp.sqrt(jnp.maximum(chi, 1e-12)),
                1.0,
            )
            wc = (w * rho_w)[:, None] * comp_w  # (N, 3)
            # HIGHEST precision: TPU's default f32 contraction multiplies
            # in bf16, and the ~0.4% absolute error on the ~1e8-scale
            # normal equations can exceed the weak pose modes (see
            # mapping/ba.py red_prec note). The 6x6 output costs nothing.
            hp = jax.lax.Precision.HIGHEST
            H = jnp.einsum("nki,nk,nkj->ij", J, wc, J, precision=hp)
            b = -jnp.einsum("nki,nk->i", J, wc * e, precision=hp)
            H = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6, dtype=H.dtype)
            dx = cholesky_solve_small(H, b)
            T_new = se3.se3_exp(dx) @ T
            return (T_new, lam)

        T, _ = jax.lax.fori_loop(0, n_iters, body, (T, jnp.float32(cfg.lm_lambda_init)))
        return T

    T = T_init
    inl = valid.astype(jnp.float32)
    for rnd in range(cfg.pose_rounds):
        use_huber = rnd < 2  # kernels dropped after round 2 (Optimizer.cc:547)
        T = gn_iters(T, inl, use_huber, cfg.pose_iters_per_round)
        e, _, behind = _residual_jacobian(T, pts_w, obs_uvr, cam)
        chi = _chi2(e, inv_sigma2, comp_w)
        inl = (valid & (chi < chi2_th) & (~behind)).astype(jnp.float32)

    e, _, behind = _residual_jacobian(T, pts_w, obs_uvr, cam)
    chi = _chi2(e, inv_sigma2, comp_w)
    inliers = valid & (chi < chi2_th) & (~behind)
    return PoseOptResult(
        T_cw=T,
        inliers=inliers,
        num_inliers=jnp.sum(inliers.astype(jnp.int32)),
        chi2=chi,
    )
