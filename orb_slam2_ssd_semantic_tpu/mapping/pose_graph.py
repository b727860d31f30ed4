"""Pose-graph optimization over keyframe poses.

TPU-native equivalent of Optimizer::OptimizeEssentialGraph
(perfect/src/Optimizer.cc:995-1308): after a loop closure, distribute
the loop correction over the whole keyframe graph by minimizing
relative-pose residuals on spanning-tree, covisibility and loop edges.
The reference optimizes Sim3 vertices with g2o/LM; for RGB-D the scale
is fixed (it sets scale=1 too), so this solves the SE(3) pose graph with
batched Gauss-Newton: all edge residuals/Jacobians in one shot, a dense
(6F, 6F) normal system (F <= max_keyframes; 512 keyframes -> a 3072^2
solve, trivial for the MXU), gauge fixed at keyframe 0.

Edges are padded fixed-capacity arrays (i, j, T_ji measurement, weight).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_ssd_semantic_tpu.config import OptimizerConfig
from orb_slam2_ssd_semantic_tpu.geometry import se3

# TPU's default f32 "matmul" multiplies in bf16; the PCR chain
# factorization and the CG normal-equation products are
# cancellation-dominated, so every contraction in the large-graph solver
# runs at true f32 (see README "precision rules"; the 6x6 blocks make
# this free). Without it the 10k-node solve diverges on-chip while
# passing bit-identical tests on CPU.
_ein = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


class PoseGraph(NamedTuple):
    edge_i: jnp.ndarray  # (E,) int32
    edge_j: jnp.ndarray  # (E,) int32
    T_ji: jnp.ndarray  # (E, 4, 4) measured T_j_cw @ inv(T_i_cw)
    weight: jnp.ndarray  # (E,) float32 (covis weight / loop boost)
    valid: jnp.ndarray  # (E,) bool


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(
    T_cw: jnp.ndarray,  # (F, 4, 4) initial keyframe poses
    kf_valid: jnp.ndarray,  # (F,)
    graph: PoseGraph,
    fixed: jnp.ndarray | None = None,  # (F,) bool; default: kf 0
    iters: int = 20,
):
    """Minimize sum_e w_e || log( T_ji_meas @ T_i @ inv(T_j) ) ||^2."""
    with jax.default_matmul_precision("highest"):
        F = T_cw.shape[0]
        if fixed is None:
            fixed = jnp.arange(F) == 0
        free = (~fixed) & kf_valid

        ei = jnp.clip(graph.edge_i, 0, F - 1)
        ej = jnp.clip(graph.edge_j, 0, F - 1)
        w = jnp.where(
            graph.valid & kf_valid[ei] & kf_valid[ej], graph.weight, 0.0
        )

        def gn_step(T, _):
            Ti = T[ei]
            Tj = T[ej]
            # Residual r_e = log( T_ji_meas @ T_i @ inv(T_j) )  (6,)
            M = graph.T_ji @ Ti @ jax.vmap(se3.se3_inverse)(Tj)
            r = jax.vmap(se3.se3_log)(M)  # (E, 6)

            # Jacobians wrt left-mult perturbations of T_i and T_j, using the
            # small-residual approximation J_i ~ Ad(T_ji_meas), J_j ~ -Ad(M)
            # (standard pose-graph GN; exact at r=0).
            def adjoint(T):
                R = T[:3, :3]
                t = T[:3, 3]
                top = jnp.concatenate([R, se3.hat(t) @ R], axis=1)
                bot = jnp.concatenate([jnp.zeros((3, 3)), R], axis=1)
                return jnp.concatenate([top, bot], axis=0)  # (6, 6)

            J_i = jax.vmap(adjoint)(graph.T_ji)  # (E, 6, 6)
            J_j = -jax.vmap(adjoint)(M)

            # Assemble the (F, 6) gradient and (F, F, 6, 6) Hessian blocks.
            Wr = w[:, None] * r
            g = jnp.zeros((F, 6), jnp.float32)
            g = g.at[ei].add(jnp.einsum("eab,ea->eb", J_i, Wr))
            g = g.at[ej].add(jnp.einsum("eab,ea->eb", J_j, Wr))

            H = jnp.zeros((F, F, 6, 6), jnp.float32)
            Hii = jnp.einsum("eab,e,eac->ebc", J_i, w, J_i)
            Hjj = jnp.einsum("eab,e,eac->ebc", J_j, w, J_j)
            Hij = jnp.einsum("eab,e,eac->ebc", J_i, w, J_j)
            H = H.at[ei, ei].add(Hii)
            H = H.at[ej, ej].add(Hjj)
            H = H.at[ei, ej].add(Hij)
            H = H.at[ej, ei].add(jnp.swapaxes(Hij, -1, -2))

            free_f = free.astype(jnp.float32)
            H = H * free_f[:, None, None, None] * free_f[None, :, None, None]
            g = g * free_f[:, None]

            Hm = H.transpose(0, 2, 1, 3).reshape(6 * F, 6 * F)
            diag_fix = jnp.repeat(~free, 6).astype(jnp.float32)
            # Relative (Levenberg-style) damping: the absolute 1e-5 floor is
            # nothing against edge weights of 100-500.
            Hd = jnp.abs(jnp.diagonal(Hm))
            Hm = Hm + jnp.diag(1e-3 * Hd + diag_fix + 1e-5)
            dx = jnp.linalg.solve(Hm, -g.reshape(-1)).reshape(F, 6)
            dx = dx * free_f[:, None]
            dx = jnp.clip(jnp.where(jnp.isfinite(dx), dx, 0.0), -1.0, 1.0)
            T_new = jax.vmap(se3.se3_exp)(dx) @ T
            # Monotonicity guard (see mapping/ba.py): reject cost increases.
            cost_old = jnp.sum(w[:, None] * r * r)
            M_new = graph.T_ji @ T_new[ei] @ jax.vmap(se3.se3_inverse)(T_new[ej])
            r_new = jax.vmap(se3.se3_log)(M_new)
            cost_new = jnp.sum(w[:, None] * r_new * r_new)
            ok = cost_new < cost_old
            return jnp.where(ok, T_new, T), None

        T_out, _ = jax.lax.scan(gn_step, T_cw, None, length=iters)
        return T_out


@functools.partial(jax.jit, static_argnames=("iters", "cg_iters"))
def optimize_pose_graph_pcg(
    T_cw: jnp.ndarray,  # (F, 4, 4) initial keyframe poses
    kf_valid: jnp.ndarray,  # (F,)
    graph: PoseGraph,
    fixed: jnp.ndarray | None = None,  # (F,) bool; default: kf 0
    iters: int = 20,
    cg_iters: int = 50,
    chain_perm: jnp.ndarray | None = None,  # (F,) slots in chain order
):
    """Matrix-free essential-graph Gauss-Newton for LARGE graphs.

    `optimize_pose_graph` materializes the dense (6F, 6F) normal system —
    fine at the 512-KF default (3072^2), impossible at the 10k-KF
    BASELINE regime (60k^2 dense ~ 14 GB). This variant never forms H:
    each CG step applies H through edge-wise gathers and Jacobian
    products (O(E) work, O(F + E) memory). The reference solves this
    sparsely inside g2o (perfect/src/Optimizer.cc:995-1308); CG over the
    graph Laplacian is the TPU-native equivalent.

    Preconditioner: the exact block-TRIDIAGONAL Hessian restricted to
    the spanning chain (odometry backbone), solved by parallel cyclic
    reduction — log2(F) levels of batched 6x6 block algebra, all
    MXU-shaped. A plain block-Jacobi preconditioner propagates
    information one hop per CG step, which cannot converge a
    diameter-10k chain at any sane CG depth; the chain solve propagates
    a loop-closure correction across the whole trajectory in ONE
    preconditioner application, and CG only has to absorb the off-chain
    (covisibility/loop) couplings. `chain_perm` lists keyframe slots in
    spanning-chain (insertion/uid) order; defaults to arange(F).
    Semantics match `optimize_pose_graph` (same residuals, Jacobian
    approximation, gauge handling)."""
    with jax.default_matmul_precision("highest"):
        F = T_cw.shape[0]
        if fixed is None:
            fixed = jnp.arange(F) == 0
        if chain_perm is None:
            chain_perm = jnp.arange(F, dtype=jnp.int32)
        free = (~fixed) & kf_valid
        free_f = free.astype(jnp.float32)

        ei = jnp.clip(graph.edge_i, 0, F - 1)
        ej = jnp.clip(graph.edge_j, 0, F - 1)
        w = jnp.where(graph.valid & kf_valid[ei] & kf_valid[ej], graph.weight, 0.0)

        # Chain coordinates: pos[slot] = rank along the spanning chain
        # (inverse permutation via argsort — the TPU scatter emitter chokes
        # on some fused scatter patterns, so prefer gathers throughout).
        pos = jnp.argsort(chain_perm).astype(jnp.int32)
        n_levels = max(1, int(np.ceil(np.log2(F)))) if F > 1 else 1

        def _shift_down(x, s):  # out[k] = x[k - s], zero-filled
            if s >= F:
                return jnp.zeros_like(x)
            pad = jnp.zeros((s,) + x.shape[1:], x.dtype)
            return jnp.concatenate([pad, x[: F - s]], axis=0)

        def _shift_up(x, s):  # out[k] = x[k + s], zero-filled
            if s >= F:
                return jnp.zeros_like(x)
            pad = jnp.zeros((s,) + x.shape[1:], x.dtype)
            return jnp.concatenate([x[s:], pad], axis=0)

        def adjoint(T):
            R = T[:3, :3]
            t = T[:3, 3]
            top = jnp.concatenate([R, se3.hat(t) @ R], axis=1)
            bot = jnp.concatenate([jnp.zeros((3, 3)), R], axis=1)
            return jnp.concatenate([top, bot], axis=0)  # (6, 6)

        def gn_step(T, _):
            Ti = T[ei]
            Tj = T[ej]
            M = graph.T_ji @ Ti @ jax.vmap(se3.se3_inverse)(Tj)
            r = jax.vmap(se3.se3_log)(M)  # (E, 6)
            J_i = jax.vmap(adjoint)(graph.T_ji)  # (E, 6, 6) — constant per edge
            J_j = -jax.vmap(adjoint)(M)

            Wr = w[:, None] * r
            g = jnp.zeros((F, 6), jnp.float32)
            g = g.at[ei].add(_ein("eab,ea->eb", J_i, Wr))
            g = g.at[ej].add(_ein("eab,ea->eb", J_j, Wr))
            g = g * free_f[:, None]

            def hv(x):  # x (F, 6) -> H @ x, gauge rows/cols masked
                xm = x * free_f[:, None]
                yi = _ein("eab,eb->ea", J_i, xm[ei])  # J_i x_i
                yj = _ein("eab,eb->ea", J_j, xm[ej])
                y = w[:, None] * (yi + yj)  # (E, 6) = w (J x)_e
                out = jnp.zeros((F, 6), jnp.float32)
                out = out.at[ei].add(_ein("eab,ea->eb", J_i, y))
                out = out.at[ej].add(_ein("eab,ea->eb", J_j, y))
                return out * free_f[:, None] + 1e-5 * xm

            # ---- chain (block-tridiagonal) preconditioner -----------------
            # Diagonal blocks take contributions from ALL edges (so the
            # tridiagonal factor is diagonally dominant and SPD); off-chain
            # couplings are left to CG.
            Hii = _ein("eab,e,eac->ebc", J_i, w, J_i)
            Hjj = _ein("eab,e,eac->ebc", J_j, w, J_j)
            diag = jnp.zeros((F, 6, 6), jnp.float32)
            diag = diag.at[ei].add(Hii)
            diag = diag.at[ej].add(Hjj)
            diag = diag + jnp.eye(6)[None] * 1e-5

            # Super-diagonal blocks in chain order: for an edge whose
            # endpoints are chain-adjacent, its H[i,j] = J_i^T w J_j block
            # couples rank k and k+1. Orientation matters: H[j,i] = H[i,j]^T.
            Hij = _ein("eab,e,eac->ebc", J_i, w, J_j)
            pi, pj = pos[ei], pos[ej]
            up_idx = jnp.where(pj == pi + 1, pi, F)  # i precedes j
            dn_idx = jnp.where(pi == pj + 1, pj, F)  # j precedes i
            # ONE scatter-add (two sequential scatters into the same buffer
            # get fused into a variadic scatter that crashes the TPU
            # scatter emitter: scatter_emitter.cc operand_indices check).
            Uc = jnp.zeros((F, 6, 6), jnp.float32).at[
                jnp.concatenate([up_idx, dn_idx])
            ].add(
                jnp.concatenate([Hij, jnp.swapaxes(Hij, -1, -2)]), mode="drop"
            )

            # Gauge/invalid rows: identity diagonal, severed couplings.
            fc = free_f[chain_perm]  # (F,) free mask in chain order
            Dc = diag[chain_perm]
            Dc = Dc * fc[:, None, None] + (1.0 - fc)[:, None, None] * jnp.eye(6)
            Uc = Uc * (fc * jnp.concatenate([fc[1:], jnp.zeros(1)]))[:, None, None]
            Lc = _shift_down(jnp.swapaxes(Uc, -1, -2), 1)  # L[k] = Uc[k-1]^T

            # Parallel cyclic reduction factorization: after log2(F) levels
            # every equation decouples; store per-level (alpha, beta) so the
            # solve is 2 batched block-matvecs per level per application.
            def pcr_factor(D, L, U):
                alphas, betas = [], []
                for lev in range(n_levels):
                    s = 1 << lev
                    Dinv = jnp.linalg.inv(D)
                    alpha = -_ein("kab,kbc->kac", L, _shift_down(Dinv, s))
                    beta = -_ein("kab,kbc->kac", U, _shift_up(Dinv, s))
                    D = (
                        D
                        + _ein("kab,kbc->kac", alpha, _shift_down(U, s))
                        + _ein("kab,kbc->kac", beta, _shift_up(L, s))
                    )
                    L_new = _ein("kab,kbc->kac", alpha, _shift_down(L, s))
                    U = _ein("kab,kbc->kac", beta, _shift_up(U, s))
                    L = L_new
                    alphas.append(alpha)
                    betas.append(beta)
                return jnp.stack(alphas), jnp.stack(betas), jnp.linalg.inv(D)

            p_alpha, p_beta, p_dinv = pcr_factor(Dc, Lc, Uc)

            def prec(x):
                bb = x[chain_perm] * fc[:, None]
                for lev in range(n_levels):
                    s = 1 << lev
                    bb = (
                        bb
                        + _ein("kab,kb->ka", p_alpha[lev], _shift_down(bb, s))
                        + _ein("kab,kb->ka", p_beta[lev], _shift_up(bb, s))
                    )
                z = _ein("kab,kb->ka", p_dinv, bb) * fc[:, None]
                return z[pos] * free_f[:, None]  # back to slot order (gather)

            # PCG on H dx = -g.
            b = -g

            def cg_body(carry, _):
                x, rr, p, rz = carry
                Hp = hv(p)
                denom = jnp.sum(p * Hp)
                alpha = jnp.where(denom > 1e-12, rz / denom, 0.0)
                x = x + alpha * p
                rr_new = rr - alpha * Hp
                z_new = prec(rr_new)
                rz_new = jnp.sum(rr_new * z_new)
                beta = jnp.where(rz > 1e-12, rz_new / rz, 0.0)
                p_new = z_new + beta * p
                return (x, rr_new, p_new, rz_new), None

            x0 = jnp.zeros((F, 6), jnp.float32)
            z0 = prec(b)
            (dx, _, _, _), _ = jax.lax.scan(
                cg_body, (x0, b, z0, jnp.sum(b * z0)), None, length=cg_iters
            )
            dx = jnp.clip(dx * free_f[:, None], -1.0, 1.0)
            T_new = jax.vmap(se3.se3_exp)(dx) @ T
            # Monotonicity guard (as in mapping/ba.py): the Ad-approximated
            # Jacobians are only locally valid; on a 10k-node graph one
            # overshooting inexact-CG step can explode the whole chain.
            cost_new = edge_cost(T_new)
            cost_old = edge_cost(T)
            ok = cost_new < cost_old
            return jnp.where(ok, T_new, T), None

        def edge_cost(T):
            M = graph.T_ji @ T[ei] @ jax.vmap(se3.se3_inverse)(T[ej])
            r = jax.vmap(se3.se3_log)(M)
            return jnp.sum(w[:, None] * r * r)

        T_out, _ = jax.lax.scan(gn_step, T_cw, None, length=iters)
        return T_out


class Sim3Graph(NamedTuple):
    """Sim(3) pose-graph edges: the measured similarity j<-i is
    (s_ji, T_ji[:3,:3], T_ji[:3,3])."""

    edge_i: jnp.ndarray  # (E,) int32
    edge_j: jnp.ndarray  # (E,) int32
    s_ji: jnp.ndarray  # (E,) float32 measured relative scale
    T_ji: jnp.ndarray  # (E, 4, 4) measured rotation|translation
    weight: jnp.ndarray  # (E,)
    valid: jnp.ndarray  # (E,) bool


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph_sim3(
    T_cw: jnp.ndarray,  # (F, 4, 4) initial keyframe poses
    log_s: jnp.ndarray,  # (F,) initial log-scales (zeros normally)
    kf_valid: jnp.ndarray,  # (F,)
    graph: Sim3Graph,
    fixed: jnp.ndarray | None = None,
    iters: int = 20,
):
    """7-DoF essential-graph optimization — the monocular form of
    Optimizer::OptimizeEssentialGraph (perfect/src/Optimizer.cc:995-1308),
    where loop closure must also absorb accumulated scale drift
    (g2o::VertexSim3Expmap vertices). Minimizes
    sum_e w_e || sim3_log( S_ji * S_i * S_j^-1 ) ||^2 over vertices
    S_i = (exp(log_s_i), R_i, t_i), gauge fixed at keyframe 0.

    Edge Jacobians come from forward-mode autodiff of the residual wrt
    left-multiplicative sim3 perturbations — exact, branch-free, and a
    few lines instead of hand-derived Sim3 adjoints.

    Returns (T_cw_opt (F,4,4), log_s_opt (F,)). Map points must be
    corrected with the FULL similarity: p' = S'_ref^-1 ( S_ref p )."""
    with jax.default_matmul_precision("highest"):
        F = T_cw.shape[0]
        if fixed is None:
            fixed = jnp.arange(F) == 0
        free = (~fixed) & kf_valid
        D = 7

        ei = jnp.clip(graph.edge_i, 0, F - 1)
        ej = jnp.clip(graph.edge_j, 0, F - 1)
        w = jnp.where(graph.valid & kf_valid[ei] & kf_valid[ej], graph.weight, 0.0)
        s_m = graph.s_ji
        R_m = graph.T_ji[:, :3, :3]
        t_m = graph.T_ji[:, :3, 3]

        def edge_residual(xi, si, Ri, ti, sj, Rj, tj, sm, Rm, tm):
            """Residual with left perturbations xi = [xi_i (7), xi_j (7)]."""
            dsi, dRi, dti = se3.sim3_exp(xi[:7])
            dsj, dRj, dtj = se3.sim3_exp(xi[7:])
            si_, Ri_, ti_ = se3.sim3_compose(dsi, dRi, dti, si, Ri, ti)
            sj_, Rj_, tj_ = se3.sim3_compose(dsj, dRj, dtj, sj, Rj, tj)
            sji, Rji, tji = se3.sim3_inverse(sj_, Rj_, tj_)
            s1, R1, t1 = se3.sim3_compose(si_, Ri_, ti_, sji, Rji, tji)
            s2, R2, t2 = se3.sim3_compose(sm, Rm, tm, s1, R1, t1)
            return se3.sim3_log(s2, R2, t2)

        def edge_r_J(si, Ri, ti, sj, Rj, tj, sm, Rm, tm):
            zero = jnp.zeros((14,), jnp.float32)
            r = edge_residual(zero, si, Ri, ti, sj, Rj, tj, sm, Rm, tm)
            J = jax.jacfwd(edge_residual)(zero, si, Ri, ti, sj, Rj, tj, sm, Rm, tm)
            return r, J[:, :7], J[:, 7:]

        def gn_step(carry, _):
            T, ls = carry
            s_all = jnp.exp(ls)
            R_all = T[:, :3, :3]
            t_all = T[:, :3, 3]
            r, J_i, J_j = jax.vmap(edge_r_J)(
                s_all[ei], R_all[ei], t_all[ei],
                s_all[ej], R_all[ej], t_all[ej],
                s_m, R_m, t_m,
            )

            Wr = w[:, None] * r
            g = jnp.zeros((F, D), jnp.float32)
            g = g.at[ei].add(jnp.einsum("eab,ea->eb", J_i, Wr))
            g = g.at[ej].add(jnp.einsum("eab,ea->eb", J_j, Wr))

            H = jnp.zeros((F, F, D, D), jnp.float32)
            Hii = jnp.einsum("eab,e,eac->ebc", J_i, w, J_i)
            Hjj = jnp.einsum("eab,e,eac->ebc", J_j, w, J_j)
            Hij = jnp.einsum("eab,e,eac->ebc", J_i, w, J_j)
            H = H.at[ei, ei].add(Hii)
            H = H.at[ej, ej].add(Hjj)
            H = H.at[ei, ej].add(Hij)
            H = H.at[ej, ei].add(jnp.swapaxes(Hij, -1, -2))

            free_f = free.astype(jnp.float32)
            H = H * free_f[:, None, None, None] * free_f[None, :, None, None]
            g = g * free_f[:, None]

            Hm = H.transpose(0, 2, 1, 3).reshape(D * F, D * F)
            diag_fix = jnp.repeat(~free, D).astype(jnp.float32)
            Hm = Hm + jnp.diag(diag_fix + 1e-5)
            dx = jnp.linalg.solve(Hm, -g.reshape(-1)).reshape(F, D)
            dx = dx * free_f[:, None]

            ds, dR, dt = se3.sim3_exp(dx)
            R_new = dR @ R_all
            t_new = ds[:, None] * jnp.einsum("fij,fj->fi", dR, t_all) + dt
            T_new = T.at[:, :3, :3].set(R_new).at[:, :3, 3].set(t_new)
            return (T_new, ls + dx[:, 6]), None

        (T_out, ls_out), _ = jax.lax.scan(gn_step, (T_cw, log_s), None, length=iters)
        return T_out, ls_out


def build_graph_arrays(covis, kf_valid, threshold: int, max_edges: int,
                       T_cw, extra_edges=None, uid=None):
    """Host-side edge assembly from a covisibility matrix: spanning
    chain (keyframes consecutive in INSERTION ORDER — slots are reused,
    so the chain follows uids; the recency analogue of the reference's
    spanning tree), strong covisibility edges (weight >= 100 in the
    reference essential graph, Optimizer.cc:1100), plus explicit loop
    edges. Returns a padded PoseGraph."""
    import numpy as np

    W = np.asarray(covis)
    v = np.asarray(kf_valid)
    T = np.asarray(T_cw)
    F = len(v)
    if uid is None:
        order = [i for i in range(F) if v[i]]
    else:
        u = np.asarray(uid)
        live = [i for i in range(F) if v[i] and u[i] >= 0]
        order = sorted(live, key=lambda i: u[i])
    edges = []
    chain_pairs = set()
    for a, b in zip(order[:-1], order[1:]):
        edges.append((a, b, max(W[a, b], 1.0)))
        chain_pairs.add((min(a, b), max(a, b)))
    for i in range(F):
        if not v[i]:
            continue
        for j in range(i + 1, F):
            # Skip pairs already covered by a spanning-chain edge —
            # emitting both double-weights the odometry constraint.
            if v[j] and W[i, j] >= threshold and (i, j) not in chain_pairs:
                edges.append((i, j, W[i, j]))
    # Normal edges measure the CURRENT relative poses; loop edges carry
    # their own externally-measured transform (the Sim3/rigid estimate),
    # whose large residual the optimizer distributes over the graph.
    edges = [(i, j, wt, T[j] @ np.linalg.inv(T[i])) for (i, j, wt) in edges]
    if extra_edges:
        edges.extend(extra_edges)  # entries: (i, j, weight, T_ji)
    edges = edges[:max_edges]
    E = max_edges
    ei = np.zeros(E, np.int32)
    ej = np.zeros(E, np.int32)
    Tji = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
    wts = np.zeros(E, np.float32)
    val = np.zeros(E, bool)
    for k, (i, j, wt, Tm) in enumerate(edges):
        ei[k], ej[k], wts[k], val[k] = i, j, wt, True
        Tji[k] = np.asarray(Tm, np.float32)
    return PoseGraph(
        jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(Tji),
        jnp.asarray(wts), jnp.asarray(val),
    )
