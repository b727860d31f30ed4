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
from orb_slam2_ssd_semantic_tpu.utils import precision
from orb_slam2_ssd_semantic_tpu.frontend.extractor import scale_factors
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.mapping.map_state import SlamState
from orb_slam2_ssd_semantic_tpu.ops.linalg import cholesky_solve_small, inv3x3_cols


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


def _residual_components(T_cw, points, prob: GlobalBAProblem, cam: CameraConfig):
    """Per-observation residuals/Jacobians as COMPONENT VECTORS: plain
    Python lists of (M,) arrays instead of (M, 3, 6)-style tensors.

    Why: TPU tiles the two minormost dims of every buffer to (8, 128).
    A materialized (M, 3, 6) Jacobian (or any layout XLA picks for a
    small-dim dot_general output) pads 28x — 9.8 GB of HLO temps at the
    10k-keyframe benchmark's M=2.56M, an instant OOM. Component lists
    keep every array exactly (M,), every op an elementwise fusion, and
    the only 2-D buffers are the (36/18/9, M) scatter operands whose
    minor axis is M.

    Returns (e [3 x (M,)], J_pose [3][6 x (M,)], J_point [3][3 x (M,)],
    behind (M,))."""
    kf, pt = prob.obs_kf, prob.obs_pt
    # Pose components per observation: ONE batched column-gather for all
    # 12 components. Separate per-component gathers cost ~11 ms each at
    # M=1.28M (index processing dominates); a (12, F) -> (12, M) column
    # gather amortizes the index work 12x.
    pose_cols = T_cw[:, :3, :].reshape(-1, 12).T  # (12, F), row i*4+j
    g = pose_cols[:, kf]  # (12, M)
    Rg = [[g[i * 4 + j] for j in range(3)] for i in range(3)]
    tg = [g[i * 4 + 3] for i in range(3)]
    Xg = points.T[:, pt]  # (3, M) one gather
    X = [Xg[j] for j in range(3)]
    p = [sum(Rg[i][j] * X[j] for j in range(3)) + tg[i] for i in range(3)]
    x, y, z = p
    z_safe = jnp.where(z > 1e-6, z, 1e-6)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    zeros = jnp.zeros_like(iz)

    u = cam.fx * x * iz + cam.cx
    v = cam.fy * y * iz + cam.cy
    ur = u - cam.depth_bf * iz
    dead = (z <= 1e-6) | (~prob.obs_valid)
    # Zero dead residuals: behind-camera projections overflow f32, and
    # 0-weight * inf residual = NaN downstream.
    e = [
        jnp.where(dead, 0.0, u - prob.obs_uvr[:, 0]),
        jnp.where(dead, 0.0, v - prob.obs_uvr[:, 1]),
        jnp.where(dead, 0.0, ur - prob.obs_uvr[:, 2]),
    ]

    # d(u,v,ur)/dp rows.
    du = [cam.fx * iz, zeros, -cam.fx * x * iz2]
    dv = [zeros, cam.fy * iz, -cam.fy * y * iz2]
    dur = [du[0], du[1], du[2] + cam.depth_bf * iz2]
    duvr = [du, dv, dur]  # [row r][col k] -> (M,)

    # dp/dxi = [I | -hat(p)] columns (translation-first left perturbation).
    hat = [
        [zeros, -z, y],
        [z, zeros, -x],
        [-y, x, zeros],
    ]
    ones = jnp.ones_like(iz)
    eye = [[ones if i == k else zeros for i in range(3)] for k in range(3)]
    dp_dxi = [
        [eye[k][0], eye[k][1], eye[k][2], -hat[k][0], -hat[k][1], -hat[k][2]]
        for k in range(3)
    ]

    J_pose = [
        [sum(duvr[r][k] * dp_dxi[k][i] for k in range(3)) for i in range(6)]
        for r in range(3)
    ]
    J_point = [
        [sum(duvr[r][k] * Rg[k][i] for k in range(3)) for i in range(3)]
        for r in range(3)
    ]
    behind = z <= 1e-6
    return e, J_pose, J_point, behind


def _residuals(T_cw, points, prob: GlobalBAProblem, cam: CameraConfig):
    """Stacked residuals e (3, M) + behind mask, for chi2 evaluation."""
    e, _, _, behind = _residual_components(T_cw, points, prob, cam)
    return jnp.stack(e, axis=0), behind


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def _gn_direction(
    e, J_pose, J_point, wc, prob: GlobalBAProblem, cfg: OptimizerConfig,
    cg_iters: int, axis_name=None, obs_per_kf=None, pt_perm=None,
):
    """One Gauss-Newton direction (dx_c (F,6), dx_p (P,3)) for the
    weighted problem. `e`/`J_pose`/`J_point` are component lists from
    _residual_components; `wc` is a 3-list of (M,) robust weights. With
    `axis_name`, observation arrays are shard_map-sharded along M and
    the segment-sums are reduced with psum.

    Everything per-observation stays (M,) component vectors (see
    _residual_components for the TPU-padding rationale); the only 2-D
    observation buffers are (<=36, M) stacks with M minor, and the
    per-keyframe/point accumulators are tiny.

    Segment sums are the cost of this function: TPU scatter-add runs at
    ~60M updates/s regardless of layout, so with `obs_per_kf` (static;
    single-chip slot-structured problems where obs_kf = repeat(arange(F),
    K)) keyframe sums become pure reshape reductions (~15x faster) and
    point sums use the precomputed `pt_perm` sort + a sorted-hint
    segment_sum (~2-3x faster). The scatter fallback serves the
    shard_map-distributed path, whose shards are not slot-aligned."""
    F = prob.T_cw.shape[0]
    P = prob.points.shape[0]
    kf = prob.obs_kf
    pt = prob.obs_pt
    slot_fast = obs_per_kf is not None and axis_name is None and pt_perm is not None
    if slot_fast:
        pt_sorted = pt[pt_perm]
        kf_sorted = kf[pt_perm]

    # Pre-weighted pose Jacobian rows.
    JtW = [[J_pose[r][i] * wc[r] for i in range(6)] for r in range(3)]

    def scatter_sum(entries, idx, width):
        upd = jnp.stack(entries, axis=0)
        return _psum(
            jnp.zeros((len(entries), width), jnp.float32).at[:, idx].add(upd),
            axis_name,
        )

    def kf_sum(entries):
        """(M,) entries -> (len, F) summed per keyframe."""
        if slot_fast:
            v = jnp.stack(entries, axis=0)
            return v.reshape(len(entries), F, obs_per_kf).sum(-1)
        return scatter_sum(entries, kf, F)

    def pt_sum(entries, sorted_already=False):
        """(M,) entries -> (len, P) summed per point."""
        if slot_fast:
            v = jnp.stack(entries, axis=0)
            if not sorted_already:
                v = v[:, pt_perm]
            return jax.ops.segment_sum(
                v.T, pt_sorted, P, indices_are_sorted=True
            ).T
        return scatter_sum(entries, pt, P)

    # Per-observation blocks as flat component lists.
    Hcc_ij = [
        sum(JtW[r][i] * J_pose[r][j] for r in range(3))
        for i in range(6) for j in range(6)
    ]
    Hpp_ij = [
        sum(J_point[r][i] * wc[r] * J_point[r][j] for r in range(3))
        for i in range(3) for j in range(3)
    ]
    # Coupling blocks are reused by every CG matvec: keep the (18, M)
    # stack resident (M minor — cheap).
    B = [
        [sum(JtW[r][i] * J_point[r][j] for r in range(3)) for j in range(3)]
        for i in range(6)
    ]
    bc_i = [-sum(JtW[r][i] * e[r] for r in range(3)) for i in range(6)]
    bp_i = [-sum(J_point[r][i] * wc[r] * e[r] for r in range(3)) for i in range(3)]

    Hcc = kf_sum(Hcc_ij).T.reshape(F, 6, 6)
    Hpp_c = pt_sum(Hpp_ij).reshape(3, 3, P)
    b_c = kf_sum(bc_i)  # (6, F)
    b_p = pt_sum(bp_i)  # (3, P)

    # Coupling blocks in point-sorted order, gathered once (ONE batched
    # 18-column gather) and reused by every CG matvec (down_project's
    # segment sum wants sorted inputs).
    if slot_fast:
        B_sorted = jnp.stack(
            [B[i][j] for i in range(6) for j in range(3)], axis=0
        )[:, pt_perm]  # (18, M)
        B_s = [[B_sorted[i * 3 + j] for j in range(3)] for i in range(6)]

    lam = jnp.float32(cfg.lm_lambda_init)
    # Marquardt scaling: damping proportional to the block diagonal keeps
    # poorly-observed blocks from taking unbounded steps, with an
    # absolute floor for empty blocks.
    dpp = (Hpp_c[0, 0] + Hpp_c[1, 1] + Hpp_c[2, 2])  # (P,)
    damp = lam * dpp / 3.0 + 1e-6
    for i in range(3):
        Hpp_c = Hpp_c.at[i, i].add(damp)
    Hpp_inv = inv3x3_cols(Hpp_c)  # (3, 3, P)

    # Gauge + damping on the camera blocks.
    eye6 = jnp.eye(6, dtype=jnp.float32)
    dcc = jnp.einsum("fii->f", Hcc)[:, None, None]
    Hcc = Hcc + (lam * dcc / 6.0 + 1e-5 + prob.fixed[:, None, None]) * eye6

    def down_project(x):  # x: (6, F) -> Hpp^-1 Hcp^T x as (3, P)
        if slot_fast:
            xg = x[:, kf_sorted]  # (6, M) one batched gather, sorted order
            t_j = [sum(B_s[i][j] * xg[i] for i in range(6)) for j in range(3)]
            t_p = pt_sum(t_j, sorted_already=True)
        else:
            xg = x[:, kf]  # (6, M) one batched gather
            t_j = [sum(B[i][j] * xg[i] for i in range(6)) for j in range(3)]
            t_p = pt_sum(t_j)  # (3, P)
        return jnp.einsum("ijp,jp->ip", Hpp_inv, t_p)

    def up_project(y_p):  # y_p: (3, P) -> Hcp y as (6, F)
        yg = y_p[:, pt]  # (3, M) one batched gather, slot order
        u_i = [sum(B[i][j] * yg[j] for j in range(3)) for i in range(6)]
        return kf_sum(u_i)

    def matvec(x):  # x: (6, F) -> S x in (6, F)
        return jnp.einsum("fij,jf->if", Hcc, x) - up_project(down_project(x))

    # Reduced RHS: b_c - Hcp Hpp^-1 b_p.
    y0 = jnp.einsum("ijp,jp->ip", Hpp_inv, b_p)  # (3, P)
    rhs = b_c - up_project(y0)

    # Block-Jacobi preconditioned CG on S dx_c = rhs. Unrolled Cholesky
    # (elementwise over F) instead of XLA's batched-LU inverse.
    prec = lambda r: cholesky_solve_small(Hcc, r.T).T

    x = jnp.zeros((6, F), jnp.float32)
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
    x = x * (~prob.fixed)[None, :]

    # Back-substitute points: dx_p = Hpp^-1 (b_p - Hcp^T dx_c).
    if slot_fast:
        xg = x[:, kf_sorted]
        t_j = [sum(B_s[i][j] * xg[i] for i in range(6)) for j in range(3)]
        t_p = pt_sum(t_j, sorted_already=True)
    else:
        xg = x[:, kf]
        t_j = [sum(B[i][j] * xg[i] for i in range(6)) for j in range(3)]
        t_p = pt_sum(t_j)
    dx_p = jnp.einsum("ijp,jp->ip", Hpp_inv, b_p - t_p)  # (3, P)
    dx_p = dx_p * prob.point_valid[None, :]
    return x.T, dx_p.T


def _gn_iteration(
    T_cw, points, prob: GlobalBAProblem, cam: CameraConfig,
    cfg: OptimizerConfig, comp_w, delta, use_huber, cg_iters, axis_name=None,
    obs_per_kf=None, pt_perm=None,
):
    e, J_pose, J_point, behind = _residual_components(T_cw, points, prob, cam)
    w = prob.inv_sigma2 * prob.obs_valid * (~behind)  # (M,)
    chi = sum(e[r] * e[r] * comp_w[r] for r in range(3)) * prob.inv_sigma2
    rho = jnp.where(
        use_huber & (chi > delta * delta),
        delta / jnp.sqrt(jnp.maximum(chi, 1e-12)),
        1.0,
    )
    wr = w * rho
    wc = [wr * comp_w[r] for r in range(3)]  # 3 x (M,)
    # Fixed keyframes contribute to points but not to pose blocks.
    free = (~prob.fixed).astype(jnp.float32)[prob.obs_kf]
    J_pose = [[J_pose[r][i] * free for i in range(6)] for r in range(3)]
    dx_c, dx_p = _gn_direction(
        e, J_pose, J_point, wc, prob, cfg, cg_iters, axis_name,
        obs_per_kf=obs_per_kf, pt_perm=pt_perm,
    )
    return se3.se3_exp(dx_c) @ T_cw, points + dx_p


def global_ba_core(
    prob: GlobalBAProblem,
    cam: CameraConfig,
    cfg: OptimizerConfig,
    cg_iters: int,
    axis_name=None,
    obs_per_kf=None,
) -> GlobalBAResult:
    """The full robust GN loop. With `axis_name`, the observation arrays
    of `prob` are one shard along M (inside shard_map) and all
    segment-sums reduce with psum — the distributed path
    (parallel/dist_ba.py).

    `obs_per_kf` (static): set when obs_kf == repeat(arange(F), K) —
    both problem_from_state and the benchmark build this layout — to
    unlock the fast segment-sum paths (see _gn_direction)."""
    # Component weights in batch-last layout (3, M).
    comp_w = jnp.where(
        prob.is_stereo[None, :],
        jnp.ones((3, 1), jnp.float32),
        jnp.asarray([[1.0], [1.0], [0.0]], jnp.float32),
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

    # Point-sort permutation for the fast segment-sum path, computed once
    # (the observation->point mapping never changes across iterations).
    pt_perm = None
    if obs_per_kf is not None and axis_name is None:
        pt_perm = jnp.argsort(prob.obs_pt)

    T_cw, points = prob.T_cw, prob.points

    def body(carry, _):
        T_cw, points = carry
        T_cw, points = _gn_iteration(
            T_cw, points, prob, cam, cfg, comp_w, delta,
            jnp.bool_(True), cg_iters, axis_name,
            obs_per_kf=obs_per_kf, pt_perm=pt_perm,
        )
        return (T_cw, points), None

    (T_cw, points), _ = jax.lax.scan(
        body, (T_cw, points), None, length=cfg.global_ba_iters
    )

    e, behind = _residuals(T_cw, points, prob, cam)
    chi = jnp.sum(e * e * comp_w, axis=0) * prob.inv_sigma2
    inlier = prob.obs_valid & (chi < chi2_th) & (~behind)
    return GlobalBAResult(T_cw, points, inlier, chi)


@functools.partial(
    jax.jit, static_argnames=("cam", "cfg", "cg_iters", "obs_per_kf")
)
def global_bundle_adjust(
    prob: GlobalBAProblem,
    cam: CameraConfig,
    cfg: OptimizerConfig = OptimizerConfig(),
    cg_iters: int = 20,
    obs_per_kf: int | None = None,
) -> GlobalBAResult:
    """Full-map BA: `cfg.global_ba_iters` robust GN iterations (the
    reference's nIterations=10, LoopClosing.cc:831), each solving the
    reduced camera system with `cg_iters` PCG steps. Pass `obs_per_kf`
    when the problem has the slot layout obs_kf = repeat(arange(F), K)
    (problem_from_state always does) for ~5x faster segment sums."""
    return global_ba_core(prob, cam, cfg, cg_iters, obs_per_kf=obs_per_kf)


def problem_from_state(state: SlamState, cfg: SlamConfig, fixed_kf=None) -> GlobalBAProblem:
    """Assemble the full-map problem from SlamState. One observation slot
    per (keyframe, keypoint) cell — already fixed-shape (M = F*K).
    Gauge: `fixed_kf` slot if given, else the oldest live keyframe
    (minimum uid — slot 0 may be reused)."""
    F, K = state.kfs.kp_point.shape
    if fixed_kf is None:
        uid_eff = jnp.where(
            state.kfs.valid & (state.kfs.uid >= 0), state.kfs.uid, jnp.int32(2 ** 30)
        )
        fixed_kf = jnp.argmin(uid_eff)
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


@jax.jit
def _write_back(state: SlamState, prob, res) -> SlamState:
    """Apply a GlobalBAResult to the SlamState: refined poses/points +
    outlier-observation pruning (RunGlobalBundleAdjustment write-back,
    LoopClosing.cc:826-940 + the local-BA erase step)."""
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
    pruned = (prob.obs_valid & ~res.inlier).reshape(F, K)
    kp_point = jnp.where(pruned, -1, state.kfs.kp_point)
    kfs = kfs._replace(kp_point=kp_point)
    pruned_ids = jnp.where(pruned.reshape(-1), prob.obs_pt, P)
    n_obs = pts.n_obs.at[pruned_ids].add(-1, mode="drop")
    pts = pts._replace(n_obs=jnp.maximum(n_obs, 0))
    return state._replace(points=pts, kfs=kfs)


@precision.scoped
@functools.partial(jax.jit, static_argnames=("cfg", "cg_iters"))
def global_ba_step_state(state: SlamState, cfg: SlamConfig, cg_iters: int = 20) -> SlamState:
    """Run global BA over the whole SlamState and write back refined
    poses and points (RunGlobalBundleAdjustment write-back,
    LoopClosing.cc:826-940 — here direct, since no concurrent tracking
    mutates the state mid-optimization). Outlier observations are pruned
    as in BundleAdjustment's robust kernel + the local-BA erase step."""
    prob = problem_from_state(state, cfg)
    res = global_bundle_adjust(
        prob, cfg.camera, cfg.optimizer, cg_iters,
        obs_per_kf=state.kfs.kp_point.shape[1],
    )
    return _write_back(state, prob, res)


_DIST_GBA_CACHE: dict = {}


@precision.scoped
def global_ba_step_state_sharded(state: SlamState, cfg: SlamConfig, mesh,
                                 cg_iters: int = 20) -> SlamState:
    """Mesh-mode global BA: the same step as `global_ba_step_state`, but
    the O(M) observation reductions run sharded over the mesh's `pt`
    axis (parallel/dist_ba.make_distributed_global_ba) — the engine path
    for `SlamSystem(mesh=...)` (SURVEY.md §2.6 P12: everything wired
    into ONE runtime, System.cc:164-197, not a standalone demo)."""
    from jax.sharding import NamedSharding, PartitionSpec as P_

    from orb_slam2_ssd_semantic_tpu.parallel import dist_ba
    from orb_slam2_ssd_semantic_tpu.parallel.mesh import PT_AXIS

    key = (id(mesh), cfg, cg_iters)
    run = _DIST_GBA_CACHE.get(key)
    if run is None:
        run = dist_ba.make_distributed_global_ba(
            mesh, cfg.camera, cfg.optimizer, cg_iters)
        _DIST_GBA_CACHE[key] = run
    prob = problem_from_state(state, cfg)
    n = mesh.shape[PT_AXIS]
    M = prob.obs_kf.shape[0]
    pad = (-M) % n
    obs = prob
    if pad:
        # Pad the observation axis to a pt-axis multiple; padded rows are
        # obs_valid=False so they contribute nothing to the reductions
        # (a config whose F*K is not divisible by the axis size must not
        # crash mid-run at the first accepted loop — ADVICE r4).
        def _pad(x):
            width = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
            return jnp.pad(x, width)

        obs = prob._replace(
            obs_kf=_pad(prob.obs_kf), obs_pt=_pad(prob.obs_pt),
            obs_uvr=_pad(prob.obs_uvr), inv_sigma2=_pad(prob.inv_sigma2),
            is_stereo=_pad(prob.is_stereo), obs_valid=_pad(prob.obs_valid),
        )
    sh = NamedSharding(mesh, P_(PT_AXIS))
    prob_sh = obs._replace(
        obs_kf=jax.device_put(obs.obs_kf, sh),
        obs_pt=jax.device_put(obs.obs_pt, sh),
        obs_uvr=jax.device_put(obs.obs_uvr, sh),
        inv_sigma2=jax.device_put(obs.inv_sigma2, sh),
        is_stereo=jax.device_put(obs.is_stereo, sh),
        obs_valid=jax.device_put(obs.obs_valid, sh),
    )
    res = run(prob_sh)
    if pad:
        res = res._replace(inlier=res.inlier[:M], chi2=res.chi2[:M])
    return _write_back(state, prob, res)
