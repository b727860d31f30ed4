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
from orb_slam2_ssd_semantic_tpu.ops import pallas_solve
from orb_slam2_ssd_semantic_tpu.ops.linalg import inv3x3_cols


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


def _residual_components(T_cw, points, prob: BAProblem, cam: CameraConfig):
    """Residuals/Jacobians as COMPONENT LISTS of (W, K) arrays.

    A materialized (W, K, 3, 6) Jacobian tiles to (8, 128) on its last
    two dims — a ~56x HBM padding blowup that turns the 15-iteration GN
    loop bandwidth-bound. (W, K) = (16, 1024) maps onto the tile grid
    exactly, and every block product is an elementwise fusion.

    Returns (e [3 x (W,K)], J_pose [3][6 x (W,K)],
    J_point [3][3 x (W,K)], behind (W,K))."""
    slot = jnp.clip(prob.point_slot, 0, points.shape[0] - 1)
    X = points[slot]  # (W, K, 3) — row gather, 3-wide
    R = T_cw[:, :3, :3]
    t = T_cw[:, :3, 3]
    Rg = [[R[:, i, j][:, None] for j in range(3)] for i in range(3)]
    Xc = [X[..., j] for j in range(3)]
    p = [sum(Rg[i][j] * Xc[j] for j in range(3)) + t[:, i][:, None]
         for i in range(3)]
    x, y, z = p
    z_safe = jnp.where(z > 1e-6, z, 1e-6)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    zeros = jnp.zeros_like(iz)
    ones = jnp.ones_like(iz)

    u = cam.fx * x * iz + cam.cx
    v = cam.fy * y * iz + cam.cy
    ur = u - cam.depth_bf * iz
    e = [u - prob.obs_uvr[..., 0], v - prob.obs_uvr[..., 1],
         ur - prob.obs_uvr[..., 2]]

    du = [cam.fx * iz, zeros, -cam.fx * x * iz2]
    dv = [zeros, cam.fy * iz, -cam.fy * y * iz2]
    dur = [du[0], du[1], du[2] + cam.depth_bf * iz2]
    duvr = [du, dv, dur]

    hat = [[zeros, -z, y], [z, zeros, -x], [-y, x, zeros]]
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
    return e, J_pose, J_point, z <= 1e-6


def _residuals_only(T_cw, points, prob: BAProblem, cam: CameraConfig):
    """Residuals WITHOUT Jacobians — for cost evaluation (the
    monotonicity guard runs this once per GN iteration; the Jacobian
    terms are ~3x the residual cost and unused there)."""
    slot = jnp.clip(prob.point_slot, 0, points.shape[0] - 1)
    X = points[slot]
    R = T_cw[:, :3, :3]
    t = T_cw[:, :3, 3]
    # HIGHEST: a bf16-multiplied rotation loses ~3 decimal digits of the
    # point coordinates — noise bigger than converged residuals, which
    # makes the monotonicity guard accept/reject at random.
    p = jnp.einsum(
        "wij,wkj->wki", R, X, precision=jax.lax.Precision.HIGHEST
    ) + t[:, None, :]
    z = p[..., 2]
    z_safe = jnp.where(z > 1e-6, z, 1e-6)
    iz = 1.0 / z_safe
    u = cam.fx * p[..., 0] * iz + cam.cx
    v = cam.fy * p[..., 1] * iz + cam.cy
    ur = u - cam.depth_bf * iz
    e = [u - prob.obs_uvr[..., 0], v - prob.obs_uvr[..., 1],
         ur - prob.obs_uvr[..., 2]]
    return e, z <= 1e-6


def _residuals(T_cw, points, prob: BAProblem, cam: CameraConfig):
    """Stacked residuals e (W,K,3) + behind mask, for chi2 evaluation."""
    e, behind = _residuals_only(T_cw, points, prob, cam)
    return jnp.stack(e, axis=-1), behind


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
    # The Schur product is cancellation-dominated; TPU's default f32
    # matmul multiplies in bf16, whose absolute error exceeds the weak
    # eigenvalues of small windows (r3 finding) — force true f32.
    # cfg.ba_reduction_dtype="bfloat16" opts into fast multiplies for
    # well-conditioned batch workloads.
    red_prec = (
        jax.lax.Precision.DEFAULT
        if jnp.dtype(cfg.ba_reduction_dtype) == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )

    # Observation->point reductions via SORTED segment sums, with the
    # permutations computed ONCE per call (the slot layout is constant
    # across GN iterations). Round 2 used a dense (W, K, N) one-hot
    # incidence GEMM; its ~400 MB f32 read per GN iteration was the
    # dominant cost of the whole keyframe event, and un-sorted
    # scatter-adds serialize on TPU (~25 ms at this size). Sorted
    # segment sums over the (W*K,) flat observation list are exact f32,
    # touch only megabytes, and lower to efficient TPU reductions
    # (the same trick mapping/global_ba.py uses at 1.28M observations).
    slot = jnp.clip(prob.point_slot, 0, N - 1)
    slot_eff = jnp.where(obs_valid, slot, N)  # N = invalid bucket
    WK = W * K
    # Per-row ordering by slot: row-major flatten of per-row argsort is
    # sorted by the combined key w*(N+1)+slot (each (w, slot) pair is
    # unique post-dedup, so this "sum" is a perfect scatter). The global
    # Hpp/b_p sums reuse this SAME ordering — the (c, W, N) per-row
    # reduction summed over W — instead of a second, GLOBAL argsort
    # (each 18k argsort is ~1.2 ms on TPU, ~25% of the whole BA call;
    # MFU_r05 finding).
    order_r = jnp.argsort(slot_eff, axis=1)  # (W, K)
    perm_r = (
        jnp.arange(W, dtype=jnp.int32)[:, None] * K + order_r
    ).reshape(-1)
    key_r = (
        jnp.arange(W, dtype=jnp.int32)[:, None] * (N + 1)
        + jnp.take_along_axis(slot_eff, order_r, axis=1)
    ).reshape(-1)

    def gn_step(T_cw, points, inlier_w, use_huber):
        # Component-vector algebra: every per-observation quantity is a
        # (W, K) array (exactly tile-aligned) — no (W, K, 3, 6) tensors,
        # whose (8, 128) tile padding costs ~56x the HBM traffic.
        e, J_pose, J_point, behind = _residual_components(T_cw, points, prob, cam)
        w = prob.inv_sigma2 * inlier_w * (~behind)
        chi = sum(e[r] * e[r] * comp_w[..., r] for r in range(3)) * prob.inv_sigma2
        # Robust objective at the CURRENT state, from the residuals this
        # step already computed: the per-iteration acceptance guard used
        # to re-evaluate the full residual pass (`robust_cost`) after
        # every step — ~1/3 of each iteration's kernels for a value the
        # next step's own residual pass produces for free (VERDICT r4
        # next #7: the local BA is latency-bound, not compute-bound).
        rho_cost = jnp.where(
            use_huber & (chi > delta * delta),
            delta * (2.0 * jnp.sqrt(jnp.maximum(chi, 1e-12)) - delta),
            chi,
        )
        cost_here = jnp.sum(rho_cost * inlier_w * (~behind))
        rho = jnp.where(
            use_huber & (chi > delta * delta),
            delta / jnp.sqrt(jnp.maximum(chi, 1e-12)),
            1.0,
        )
        wr = w * rho
        wc = [wr * comp_w[..., r] for r in range(3)]  # 3 x (W, K)

        # Pose blocks exclude fixed keyframes.
        fp = free_pose[:, None]
        JtW = [[J_pose[r][i] * wc[r] * fp for i in range(6)] for r in range(3)]

        # Hcc (W, 6, 6) and b_c (W, 6): per-(i,j) sums over K.
        Hcc = jnp.stack(
            [sum((JtW[r][i] * J_pose[r][j] * fp).sum(-1) for r in range(3))
             for i in range(6) for j in range(6)],
            axis=-1,
        ).reshape(W, 6, 6)
        b_c = jnp.stack(
            [-sum((JtW[r][i] * e[r]).sum(-1) for r in range(3))
             for i in range(6)],
            axis=-1,
        )  # (W, 6)

        # Per-observation point/coupling blocks as (c, W, K) stacks.
        pp12 = jnp.stack(
            [sum(J_point[r][i] * wc[r] * J_point[r][j] for r in range(3))
             for i in range(3) for j in range(3)]
            + [-sum(J_point[r][i] * wc[r] * e[r] for r in range(3))
               for i in range(3)],
            axis=0,
        )  # (12, W, K)
        Hcp_c = jnp.stack(
            [sum(JtW[r][i] * J_point[r][j] for r in range(3))
             for i in range(6) for j in range(3)],
            axis=0,
        )  # (18, W, K)

        # ONE per-row-sorted segment sum for BOTH the coupling blocks and
        # the point sums: 30 stacked channels over the combined key (a
        # perfect scatter; see perm_r above). The per-(pose,point) blocks
        # come out directly; the global point sums are the per-row
        # reduction summed over W.
        stacked = jnp.concatenate(
            [Hcp_c.reshape(18, WK), pp12.reshape(12, WK)], axis=0
        )[:, perm_r]  # (30, WK)
        red_r = jax.ops.segment_sum(
            stacked.T, key_r, W * (N + 1), indices_are_sorted=True
        ).T.reshape(30, W, N + 1)[..., :N]  # (30, W, N)
        Hcp = red_r[:18]  # (18, W, N)
        red = red_r[18:].sum(axis=1)  # (12, N)
        Hpp_cols = red[:9].reshape(3, 3, N)
        b_p = red[9:]  # (3, N)

        # Damped point-block inverse in (3, 3, N) layout.
        lam = jnp.float32(cfg.lm_lambda_init)
        for i in range(3):
            Hpp_cols = Hpp_cols.at[i, i].add(lam + 1e-6)
        Hpp_inv = inv3x3_cols(Hpp_cols)  # (3, 3, N)

        # Reduced camera system: S = Hcc - A Hcp' with A = Hcp Hpp^-1.
        # Row order is (i, w) -> i*W + w on BOTH factors, so the 3
        # (6W, N) x (N, 6W) MXU matmuls (one per point coordinate)
        # produce consistent (iw, jd) blocks.
        A = [
            [sum(Hcp[i * 3 + b] * Hpp_inv[b, c][None, :] for b in range(3))
             for c in range(3)]
            for i in range(6)
        ]  # [i][c] -> (W, N)
        A_mat = [jnp.stack([A[i][c] for i in range(6)], 0).reshape(6 * W, N)
                 for c in range(3)]
        H_mat = [jnp.stack([Hcp[i * 3 + c] for i in range(6)], 0).reshape(6 * W, N)
                 for c in range(3)]
        # The Schur product is cancellation-dominated: it must run at
        # true f32 multiply precision (see red_prec note above).
        S_mat = -sum(
            jnp.matmul(A_mat[c], H_mat[c].T, precision=red_prec)
            for c in range(3)
        )  # (6W, 6W) iw-order
        Sblk = S_mat.reshape(6, W, 6, W)
        wi = jnp.arange(W)
        # Advanced indices at axes 1 and 3 land in front: (W, 6, 6).
        Sblk = Sblk.at[:, wi, :, wi].add(Hcc)
        S_mat = Sblk.reshape(6 * W, 6 * W)
        rhs = b_c.T - sum(
            jnp.matmul(A_mat[c], b_p[c], precision=red_prec).reshape(6, W)
            for c in range(3)
        )  # (6, W)

        # Gauge: identity rows for fixed poses keep the system well-posed.
        # Diagonal damping is RELATIVE (Levenberg-style): the system's
        # scale is ~fx^2 x obs-count (1e6+), so an absolute 1e-5 is
        # nothing against the cancellation error of the Schur product —
        # the r3 loop-room scenario produced slightly indefinite S and
        # exploding steps without this.
        fixed_diag = jnp.tile(prob.fixed, 6)  # iw order
        S_diag = jnp.abs(jnp.diagonal(S_mat))
        S_mat = S_mat + jnp.diag(
            1e-3 * S_diag + fixed_diag.astype(jnp.float32) + 1e-5
        )
        # Direct solve. On TPU the 6W-dim damped-SPD system runs as ONE
        # fused Pallas Gauss-Jordan kernel (~30 us) — jnp.linalg.solve's
        # LU is ~n sequential XLA steps (0.57 ms at 6W=108, ~65% of each
        # GN iteration; MFU_r05). Exactness either way keeps the
        # best-state guard accepting; CG at this size was worse still
        # (32 latency-bound matvecs per solve).
        if S_mat.shape[0] <= 128 and pallas_solve.use_pallas():
            dx = pallas_solve.spd_solve(S_mat, rhs.reshape(-1)).reshape(6, W)
        else:
            dx = jnp.linalg.solve(S_mat, rhs.reshape(-1)).reshape(6, W)
        dx = dx * free_pose[None, :]
        # Trust region: a GN step beyond ~0.5 rad / 0.5 m is never a
        # descent step on a real local-BA window — clamp instead of
        # letting one bad solve poison the poses (g2o's LM lambda plays
        # this role in the reference).
        dx = jnp.clip(jnp.where(jnp.isfinite(dx), dx, 0.0), -0.5, 0.5)
        dx_c = dx.T  # (W, 6)

        # Back-substitute points: dx_p = Hpp^-1 (b_p - Hcp' dx_c).
        corr = [
            sum((Hcp[i * 3 + c] * dx[i][:, None]).sum(0) for i in range(6))
            for c in range(3)
        ]  # 3 x (N,)
        resid = jnp.stack([b_p[c] - corr[c] for c in range(3)], 0)  # (3, N)
        dx_p = jnp.einsum("bcn,cn->bn", Hpp_inv, resid).T  # (N, 3)
        dx_p = dx_p * prob.point_valid[:, None]
        dx_p = jnp.clip(jnp.where(jnp.isfinite(dx_p), dx_p, 0.0), -2.0, 2.0)

        T_new = se3.se3_exp(dx_c) @ T_cw
        points_new = points + dx_p
        return T_new, points_new, cost_here

    T_cw = prob.T_cw
    points = prob.points
    inlier = obs_valid.astype(jnp.float32)

    def phase(T_cw, points, inlier, use_huber, n_iters):
        # lax.while_loop, not a Python loop: the component-style gn_step
        # traces to a large graph and unrolling 15 copies multiplies
        # XLA compile time.
        #
        # Divergence guard as BEST-STATE tracking (g2o's LM
        # accept/reject role): each gn_step returns the objective at
        # the state it stepped FROM (free — computed from its own
        # residual pass), and the loop keeps the lowest-cost state
        # seen. Equivalent safety to the old reject-and-hold guard
        # (whose rejected deterministic step simply re-ran and
        # re-rejected every remaining iteration) without the extra
        # full residual pass per iteration it cost.
        #
        # EARLY TERMINATION (g2o's gain-based terminateAction, which the
        # reference's fixed 5/10 schedules run under): once the
        # objective between consecutive states improves by less than
        # `local_ba_min_rel_decrease`, further solves only re-derive the
        # same state — stop. Typical tracking windows converge in 2-4
        # iterations; the full schedule is the worst-case bound, not the
        # common cost (VERDICT r4 next #7).
        min_dec = cfg.local_ba_min_rel_decrease
        big = jnp.float32(jnp.finfo(jnp.float32).max)

        def cond(st):
            i, done, _T, _pts, _best, _prev = st
            return (i < n_iters) & ~done

        def body(st):
            i, _done, T, pts, best, prev_cost = st
            best_T, best_pts, best_cost = best
            T_new, pts_new, cost_here = gn_step(T, pts, inlier, use_huber)
            better = cost_here < best_cost
            best = (
                jnp.where(better, T, best_T),
                jnp.where(better, pts, best_pts),
                jnp.where(better, cost_here, best_cost),
            )
            done = cost_here > (1.0 - min_dec) * prev_cost
            return i + 1, done, T_new, pts_new, best, cost_here

        _, _, T_last, pts_last, best, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.bool_(False), T_cw, points,
             (T_cw, points, big), big),
        )
        return T_last, pts_last, best

    def eval_state(T, pts, inlier, use_huber):
        """One residual pass yielding BOTH the phase-closing objective
        and the chi2/behind the subsequent gate needs — the separate
        robust_cost + _residuals passes per phase were ~15% of the BA
        wall (MFU_r05)."""
        e, behind = _residuals(T, pts, prob, cam)
        chi = _obs_chi2(e, prob.inv_sigma2, comp_w)
        rho = jnp.where(
            use_huber & (chi > delta * delta),
            delta * (2.0 * jnp.sqrt(jnp.maximum(chi, 1e-12)) - delta),
            chi,
        )
        cost = jnp.sum(rho * inlier * (~behind))
        return cost, chi, behind

    def finish_phase(T_last, pts_last, best, inlier, use_huber):
        """Close a phase: decide last-vs-best with one pass at the last
        state; re-evaluate chi only in the rare best-wins branch."""
        best_T, best_pts, best_cost = best
        cost_l, chi_l, behind_l = eval_state(T_last, pts_last, inlier,
                                             use_huber)
        use_last = cost_l < best_cost
        T = jnp.where(use_last, T_last, best_T)
        pts = jnp.where(use_last, pts_last, best_pts)
        chi, behind = jax.lax.cond(
            use_last,
            lambda: (chi_l, behind_l),
            lambda: eval_state(best_T, best_pts, inlier, use_huber)[1:],
        )
        return T, pts, chi, behind

    # Phase 1: robust iterations (reference: 5 iters with Huber).
    T_last, pts_last, best = phase(
        T_cw, points, inlier, True, cfg.local_ba_iters_initial)
    # Outlier gate (Optimizer.cc:850-886) from the closing pass.
    T_cw, points, chi, behind = finish_phase(T_last, pts_last, best,
                                             inlier, True)
    inlier = (obs_valid & (chi < chi2_th) & (~behind)).astype(jnp.float32)
    # Phase 2: clean iterations (reference: 10 more without kernel).
    T_last, pts_last, best = phase(
        T_cw, points, inlier, False, cfg.local_ba_iters_refine)
    T_cw, points, chi, behind = finish_phase(T_last, pts_last, best,
                                             inlier, False)
    final_inlier = obs_valid & (chi < chi2_th) & (~behind)
    return BAResult(T_cw, points, final_inlier, chi)
