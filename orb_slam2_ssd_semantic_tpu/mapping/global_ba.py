"""Global (full-map) bundle adjustment via implicit Schur complement + CG.

TPU-native equivalent of Optimizer::GlobalBundleAdjustemnt /
Optimizer::BundleAdjustment (perfect/src/Optimizer.cc:72-363) and the
GBA thread spawned on loop closure (perfect/src/LoopClosing.cc:773-826,
RunGlobalBundleAdjustment at 826: 10 LM iterations over every keyframe
and map point, then map-wide write-back).

Local BA (mapping/ba.py) materializes the dense (W, N, 6, 3)
camera-point coupling — fine for a 16-keyframe window, hopeless for the
full map. Here the reduced camera system

    S = Hcc - Hcp Hpp^-1 Hcp^T

is never materialized. Observations live in flat padded arrays
(M = F*K slots, one per keyframe-keypoint cell); each Gauss-Newton
iteration computes per-observation residual/Jacobian blocks with two
gathers, assembles the block-diagonal Hcc (F,6,6) / Hpp (P,3,3) and the
per-observation coupling blocks B_m = J_pose^T W J_point (M,6,3) — all
MXU-shaped einsums — and solves S dx_c = rhs with preconditioned
conjugate gradient whose matvec is two gathers + two segment-sums:

    S x = Hcc x  -  scatter_kf( B_m  Hpp^-1[pt_m]  scatter_pt(B_m^T x[kf_m]) )

This is the standard inexact-Schur BA scheme (Agarwal et al., "Bundle
Adjustment in the Large"), and it is the form that distributes: shard
the M observations over the `pt` mesh axis and the two segment-sums
become local partials + one psum each (parallel/dist_ba.py;
SURVEY.md §2.6 P12, §7 stage 5).

Gauge freedom is fixed g2o-style: fixed keyframes keep zeroed pose
Jacobians and an identity block on their Hcc diagonal
(Optimizer.cc:132-136 setFixed).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import CameraConfig, OptimizerConfig, SlamConfig
from orb_slam2_ssd_semantic_tpu.frontend.extractor import scale_factors
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.mapping.map_state import SlamState
from orb_slam2_ssd_semantic_tpu.ops.linalg import inv3x3


class GlobalBAProblem(NamedTuple):
    """Full-map BA problem over flat observation slots.

    F keyframes, P points, M observation slots (padded; `obs_valid`
    masks real observations).
    """

    T_cw: jnp.ndarray  # (F, 4, 4)
    fixed: jnp.ndarray  # (F,) bool — gauge keyframes
    points: jnp.ndarray  # (P, 3)
    point_valid: jnp.ndarray  # (P,) bool
    obs_kf: jnp.ndarray  # (M,) int32 keyframe index
    obs_pt: jnp.ndarray  # (M,) int32 point index
    obs_uvr: jnp.ndarray  # (M, 3) [u, v, uR]
    inv_sigma2: jnp.ndarray  # (M,)
    is_stereo: jnp.ndarray  # (M,) bool
    obs_valid: jnp.ndarray  # (M,) bool


class GlobalBAResult(NamedTuple):
    T_cw: jnp.ndarray  # (F, 4, 4)
    points: jnp.ndarray  # (P, 3)
    inlier: jnp.ndarray  # (M,) final chi2 inlier mask
    chi2: jnp.ndarray  # (M,)


def _residuals(T_cw, points, prob: GlobalBAProblem, cam: CameraConfig):
    """Per-observation residual e (M,3), pose Jacobian (M,3,6), point
    Jacobian (M,3,3), and behind-camera mask (M,)."""
    Tk = T_cw[prob.obs_kf]  # (M, 4, 4)
    X = points[prob.obs_pt]  # (M, 3)
    R = Tk[:, :3, :3]
    p = jnp.einsum("mij,mj->mi", R, X) + Tk[:, :3, 3]
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
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
    duvr_dp = jnp.stack([du, dv, dur], axis=-2)  # (M, 3, 3)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), p.shape[:-1] + (3, 3))
    dp_dxi = jnp.concatenate([eye, -se3.hat(p)], axis=-1)  # (M, 3, 6)
    J_pose = duvr_dp @ dp_dxi
    J_point = duvr_dp @ R
    behind = z <= 1e-6
    # Zero dead residuals: behind-camera projections overflow f32, and
    # 0-weight * inf residual = NaN downstream.
    e = jnp.where(behind[:, None] | (~prob.obs_valid[:, None]), 0.0, e)
    return e, J_pose, J_point, behind


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def _gn_direction(
    e, J_pose, J_point, wc, prob: GlobalBAProblem, cfg: OptimizerConfig,
    cg_iters: int, axis_name=None,
):
    """One Gauss-Newton direction (dx_c (F,6), dx_p (P,3)) for the
    weighted problem. `wc` is the (M,3) per-component robust weight.
    With `axis_name`, observation arrays are shard_map-sharded along M
    and the segment-sums are reduced with psum."""
    F = prob.T_cw.shape[0]
    P = prob.points.shape[0]

    # Per-observation normal-equation blocks.
    JtW_pose = J_pose * wc[:, :, None]  # (M, 3, 6) pre-weighted
    Hcc_m = jnp.einsum("mri,mrj->mij", JtW_pose, J_pose)  # (M, 6, 6)
    Hpp_m = jnp.einsum("mri,mr,mrj->mij", J_point, wc, J_point)  # (M, 3, 3)
    B_m = jnp.einsum("mri,mrj->mij", JtW_pose, J_point)  # (M, 6, 3)
    bc_m = -jnp.einsum("mri,mr->mi", JtW_pose, e)  # (M, 6)
    bp_m = -jnp.einsum("mri,mr->mi", J_point, wc * e)  # (M, 3)

    kf = prob.obs_kf
    pt = prob.obs_pt
    Hcc = _psum(jnp.zeros((F, 6, 6), jnp.float32).at[kf].add(Hcc_m), axis_name)
    Hpp = _psum(jnp.zeros((P, 3, 3), jnp.float32).at[pt].add(Hpp_m), axis_name)
    b_c = _psum(jnp.zeros((F, 6), jnp.float32).at[kf].add(bc_m), axis_name)
    b_p = _psum(jnp.zeros((P, 3), jnp.float32).at[pt].add(bp_m), axis_name)

    lam = jnp.float32(cfg.lm_lambda_init)
    eye3 = jnp.eye(3, dtype=jnp.float32)
    # Marquardt scaling: damping proportional to the block diagonal keeps
    # poorly-observed blocks from taking unbounded steps, with an
    # absolute floor for empty blocks.
    dpp = jnp.einsum("pii->p", Hpp)[:, None, None]
    Hpp_inv = inv3x3(Hpp + (lam * dpp / 3.0 + 1e-6) * eye3)

    # Gauge + damping on the camera blocks.
    eye6 = jnp.eye(6, dtype=jnp.float32)
    dcc = jnp.einsum("fii->f", Hcc)[:, None, None]
    Hcc = Hcc + (lam * dcc / 6.0 + 1e-5 + prob.fixed[:, None, None]) * eye6

    def matvec(x):  # x: (F, 6) -> S x
        t_p = _psum(
            jnp.zeros((P, 3), jnp.float32).at[pt].add(
                jnp.einsum("mij,mi->mj", B_m, x[kf])
            ),
            axis_name,
        )
        y_p = jnp.einsum("pij,pj->pi", Hpp_inv, t_p)
        u_c = _psum(
            jnp.zeros((F, 6), jnp.float32).at[kf].add(
                jnp.einsum("mij,mj->mi", B_m, y_p[pt])
            ),
            axis_name,
        )
        return jnp.einsum("fij,fj->fi", Hcc, x) - u_c

    # Reduced RHS: b_c - Hcp Hpp^-1 b_p.
    y0 = jnp.einsum("pij,pj->pi", Hpp_inv, b_p)
    rhs = b_c - _psum(
        jnp.zeros((F, 6), jnp.float32).at[kf].add(
            jnp.einsum("mij,mj->mi", B_m, y0[pt])
        ),
        axis_name,
    )

    # Block-Jacobi preconditioned CG on S dx_c = rhs.
    Minv = jnp.linalg.inv(Hcc)
    prec = lambda r: jnp.einsum("fij,fj->fi", Minv, r)

    x = jnp.zeros((F, 6), jnp.float32)
    r = rhs
    zvec = prec(r)
    d = zvec
    rz = jnp.sum(r * zvec)

    def cg_step(carry, _):
        x, r, d, rz = carry
        Sd = matvec(d)
        dSd = jnp.sum(d * Sd)
        alpha = rz / jnp.where(jnp.abs(dSd) > 1e-20, dSd, 1e-20)
        x = x + alpha * d
        r = r - alpha * Sd
        z = prec(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
        d = z + beta * d
        return (x, r, d, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(cg_step, (x, r, d, rz), None, length=cg_iters)
    dx_c = x * (~prob.fixed)[:, None]

    # Back-substitute points: dx_p = Hpp^-1 (b_p - Hcp^T dx_c).
    t_p = _psum(
        jnp.zeros((P, 3), jnp.float32).at[pt].add(
            jnp.einsum("mij,mi->mj", B_m, dx_c[kf])
        ),
        axis_name,
    )
    dx_p = jnp.einsum("pij,pj->pi", Hpp_inv, b_p - t_p)
    dx_p = dx_p * prob.point_valid[:, None]
    return dx_c, dx_p


def _gn_iteration(
    T_cw, points, prob: GlobalBAProblem, cam: CameraConfig,
    cfg: OptimizerConfig, comp_w, delta, use_huber, cg_iters, axis_name=None,
):
    e, J_pose, J_point, behind = _residuals(T_cw, points, prob, cam)
    w = prob.inv_sigma2 * prob.obs_valid * (~behind)
    chi = jnp.sum(e * e * comp_w, axis=-1) * prob.inv_sigma2
    rho = jnp.where(
        use_huber & (chi > delta * delta),
        delta / jnp.sqrt(jnp.maximum(chi, 1e-12)),
        1.0,
    )
    wc = (w * rho)[:, None] * comp_w  # (M, 3)
    # Fixed keyframes contribute to points but not to pose blocks.
    free = (~prob.fixed).astype(jnp.float32)[prob.obs_kf]
    J_pose = J_pose * free[:, None, None]
    dx_c, dx_p = _gn_direction(e, J_pose, J_point, wc, prob, cfg, cg_iters, axis_name)
    return se3.se3_exp(dx_c) @ T_cw, points + dx_p


def global_ba_core(
    prob: GlobalBAProblem,
    cam: CameraConfig,
    cfg: OptimizerConfig,
    cg_iters: int,
    axis_name=None,
) -> GlobalBAResult:
    """The full robust GN loop. With `axis_name`, the observation arrays
    of `prob` are one shard along M (inside shard_map) and all
    segment-sums reduce with psum — the distributed path
    (parallel/dist_ba.py)."""
    comp_w = jnp.where(
        prob.is_stereo[:, None],
        jnp.ones((1, 3), jnp.float32),
        jnp.asarray([[1.0, 1.0, 0.0]], jnp.float32),
    )
    chi2_th = jnp.where(prob.is_stereo, cfg.chi2_stereo, cfg.chi2_mono)
    delta = jnp.where(prob.is_stereo, cfg.huber_delta_stereo, cfg.huber_delta_mono)

    # A keyframe with fewer than 6 observations has an underdetermined
    # 6-DoF pose: freeze it (it still constrains its points).
    F = prob.T_cw.shape[0]
    n_obs_kf = _psum(
        jnp.zeros((F,), jnp.int32).at[prob.obs_kf].add(
            prob.obs_valid.astype(jnp.int32)
        ),
        axis_name,
    )
    prob = prob._replace(fixed=prob.fixed | (n_obs_kf < 6))

    T_cw, points = prob.T_cw, prob.points

    def body(carry, _):
        T_cw, points = carry
        T_cw, points = _gn_iteration(
            T_cw, points, prob, cam, cfg, comp_w, delta,
            jnp.bool_(True), cg_iters, axis_name,
        )
        return (T_cw, points), None

    (T_cw, points), _ = jax.lax.scan(
        body, (T_cw, points), None, length=cfg.global_ba_iters
    )

    e, _, _, behind = _residuals(T_cw, points, prob, cam)
    chi = jnp.sum(e * e * comp_w, axis=-1) * prob.inv_sigma2
    inlier = prob.obs_valid & (chi < chi2_th) & (~behind)
    return GlobalBAResult(T_cw, points, inlier, chi)


@functools.partial(jax.jit, static_argnames=("cam", "cfg", "cg_iters"))
def global_bundle_adjust(
    prob: GlobalBAProblem,
    cam: CameraConfig,
    cfg: OptimizerConfig = OptimizerConfig(),
    cg_iters: int = 20,
) -> GlobalBAResult:
    """Full-map BA: `cfg.global_ba_iters` robust GN iterations (the
    reference's nIterations=10, LoopClosing.cc:831), each solving the
    reduced camera system with `cg_iters` PCG steps."""
    return global_ba_core(prob, cam, cfg, cg_iters)


def problem_from_state(state: SlamState, cfg: SlamConfig, fixed_kf: int = 0) -> GlobalBAProblem:
    """Assemble the full-map problem from SlamState. One observation slot
    per (keyframe, keypoint) cell — already fixed-shape (M = F*K)."""
    F, K = state.kfs.kp_point.shape
    P = state.points.pos.shape[0]
    sf = scale_factors(cfg.orb)

    kp_point = state.kfs.kp_point
    obs_kf = jnp.repeat(jnp.arange(F, dtype=jnp.int32), K)
    obs_pt = jnp.clip(kp_point.reshape(-1), 0, P - 1)
    pt_ok = state.points.valid[obs_pt] & (kp_point.reshape(-1) >= 0)
    obs_valid = (
        pt_ok & state.kfs.kp_valid.reshape(-1) & state.kfs.valid[obs_kf]
    )

    lv = jnp.clip(state.kfs.level, 0, cfg.orb.n_levels - 1)
    inv_sigma2 = (1.0 / (sf[lv] ** 2)).reshape(-1)
    depth = state.kfs.depth.reshape(-1)
    uv = state.kfs.uv.reshape(-1, 2)
    z_safe = jnp.where(depth > 1e-6, depth, 1.0)
    ur = jnp.where(depth > 1e-6, uv[:, 0] - cfg.camera.depth_bf / z_safe, -1.0)
    obs_uvr = jnp.concatenate([uv, ur[:, None]], axis=-1)

    fixed = (jnp.arange(F) == fixed_kf) | (~state.kfs.valid)
    return GlobalBAProblem(
        T_cw=state.kfs.T_cw,
        fixed=fixed,
        points=state.points.pos,
        point_valid=state.points.valid,
        obs_kf=obs_kf,
        obs_pt=obs_pt,
        obs_uvr=obs_uvr,
        inv_sigma2=inv_sigma2,
        is_stereo=depth > 1e-6,
        obs_valid=obs_valid,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "cg_iters"))
def global_ba_step_state(state: SlamState, cfg: SlamConfig, cg_iters: int = 20) -> SlamState:
    """Run global BA over the whole SlamState and write back refined
    poses and points (RunGlobalBundleAdjustment write-back,
    LoopClosing.cc:826-940 — here direct, since no concurrent tracking
    mutates the state mid-optimization). Outlier observations are pruned
    as in BundleAdjustment's robust kernel + the local-BA erase step."""
    prob = problem_from_state(state, cfg)
    res = global_bundle_adjust(prob, cfg.camera, cfg.optimizer, cg_iters)

    F, K = state.kfs.kp_point.shape
    P = state.points.pos.shape[0]
    kfs = state.kfs._replace(
        T_cw=jnp.where(
            (state.kfs.valid & ~prob.fixed)[:, None, None], res.T_cw, state.kfs.T_cw
        )
    )
    pts = state.points._replace(
        pos=jnp.where(state.points.valid[:, None], res.points, state.points.pos)
    )

    # Prune outlier observations.
    pruned = (prob.obs_valid & ~res.inlier).reshape(F, K)
    kp_point = jnp.where(pruned, -1, state.kfs.kp_point)
    kfs = kfs._replace(kp_point=kp_point)
    pruned_ids = jnp.where(pruned.reshape(-1), prob.obs_pt, P)
    n_obs = pts.n_obs.at[pruned_ids].add(-1, mode="drop")
    pts = pts._replace(n_obs=jnp.maximum(n_obs, 0))
    return state._replace(points=pts, kfs=kfs)
