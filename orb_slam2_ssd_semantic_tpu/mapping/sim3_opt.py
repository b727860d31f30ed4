"""Sim3 refinement between two keyframes on bidirectional reprojection.

TPU-native equivalent of Optimizer::OptimizeSim3
(perfect/src/Optimizer.cc:1310-1525): given matched 3D points expressed
in each keyframe's own camera frame, refine the similarity T_ji with
two reprojection residuals per match — the forward edge projects
KF-i points through T_ji into KF j's image, the inverse edge projects
KF-j points through T_ji^-1 into KF i's image — with Huber kernels,
a chi2 > th2 (=10) outlier rejection pass, and further iterations on
the surviving inliers (Optimizer.cc:1448-1482). Scale is optimized for
monocular loops and frozen for stereo/RGB-D (bFixScale,
Optimizer.cc:1331).

Re-architected as a batched Gauss-Newton over the 7-dof Sim(3) tangent
with autodiff Jacobians (jacfwd over the multiplicative perturbation):
all residuals evaluate at once, the normal equations are a 7x7 solve.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import CameraConfig
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.ops.linalg import cholesky_solve_small


class Sim3OptResult(NamedTuple):
    s: jnp.ndarray  # () scale of T_ji
    R: jnp.ndarray  # (3, 3)
    t: jnp.ndarray  # (3,)
    inliers: jnp.ndarray  # (N,) bool
    num_inliers: jnp.ndarray  # () int32


def _project(p: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    z = jnp.maximum(p[..., 2], 1e-6)
    return jnp.stack(
        [cam.fx * p[..., 0] / z + cam.cx, cam.fy * p[..., 1] / z + cam.cy], -1
    )


def _residuals(x, s0, R0, t0, p_i, p_j, uv_i, uv_j, cam: CameraConfig):
    """Bidirectional reprojection residuals (N, 2, 2) for the
    multiplicative perturbation exp(x) o (s0, R0, t0)."""
    ds, dR, dt = se3.sim3_exp(x)
    s, R, t = se3.sim3_compose(ds, dR, dt, s0, R0, t0)
    q_j = se3.sim3_apply(s, R, t, p_i)  # KF-i points in KF j's frame
    si, Ri, ti = se3.sim3_inverse(s, R, t)
    q_i = se3.sim3_apply(si, Ri, ti, p_j)  # KF-j points in KF i's frame
    r_fwd = _project(q_j, cam) - uv_j  # g2o EdgeSim3ProjectXYZ
    r_bwd = _project(q_i, cam) - uv_i  # g2o EdgeInverseSim3ProjectXYZ
    behind = (q_j[..., 2] <= 1e-6) | (q_i[..., 2] <= 1e-6)
    return jnp.stack([r_fwd, r_bwd], axis=-2), behind  # (N, 2, 2)


@functools.partial(jax.jit, static_argnames=("cam", "fix_scale", "iters"))
def optimize_sim3(
    s0: jnp.ndarray,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    p_i: jnp.ndarray,  # (N, 3) matched points in KF i's camera frame
    p_j: jnp.ndarray,  # (N, 3) matched points in KF j's camera frame
    uv_i: jnp.ndarray,  # (N, 2) observations in KF i
    uv_j: jnp.ndarray,  # (N, 2) observations in KF j
    inv_sigma2_i: jnp.ndarray,  # (N,) information of the KF-i observation
    inv_sigma2_j: jnp.ndarray,  # (N,)
    valid: jnp.ndarray,  # (N,) bool
    cam: CameraConfig,
    fix_scale: bool = True,
    chi2_th: float = 10.0,
    iters: int = 5,
) -> Sim3OptResult:
    """Refine T_ji = (s0, R0, t0) with p_j ~ T_ji p_i.

    Mirrors OptimizeSim3's schedule: `iters` robust iterations, drop
    edges with chi2 > chi2_th in either direction (Optimizer.cc:
    1448-1463), then 2x iters more on the survivors; returns the final
    inlier count the caller gates on (LoopClosing.cc:377 nInliers>=20).
    """
    huber2 = chi2_th  # deltaHuber = sqrt(th2) (Optimizer.cc:1407)
    # Per-edge, per-direction information (j-image edge uses the KF-j
    # keypoint's level sigma, i-image edge the KF-i one).
    w_dir = jnp.stack([inv_sigma2_j, inv_sigma2_i], axis=-1)  # (N, 2)

    def gn(carry_sRt, w_edge, n_iters, use_huber):
        def body(_, sRt):
            s, R, t = sRt
            x0 = jnp.zeros((7,), p_i.dtype)

            def res_flat(x):
                r, _ = _residuals(x, s, R, t, p_i, p_j, uv_i, uv_j, cam)
                return r

            r, behind = _residuals(x0, s, R, t, p_i, p_j, uv_i, uv_j, cam)
            J = jax.jacfwd(res_flat)(x0)  # (N, 2, 2, 7)
            chi = jnp.sum(r * r, -1) * w_dir  # (N, 2)
            rho = jnp.where(
                use_huber & (chi > huber2),
                jnp.sqrt(huber2 / jnp.maximum(chi, 1e-12)),
                1.0,
            )
            # Gross mismatches (Huber influence still grows as
            # sqrt(chi)) must not steer the solve at all.
            rho = jnp.where(use_huber & (chi > 1e5 * huber2), 0.0, rho)
            w = w_dir * rho * (w_edge * (~behind).astype(r.dtype))[:, None]
            H = jnp.einsum("ndci,nd,ndcj->ij", J, w, J)
            b = -jnp.einsum("ndci,ndc->i", J, w[..., None] * r)
            if fix_scale:
                # Freeze the sigma coordinate (bFixScale).
                H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
                b = b.at[6].set(0.0)
            H = H + 1e-6 * jnp.eye(7, dtype=H.dtype)
            dx = cholesky_solve_small(H, b)
            ds, dR, dt = se3.sim3_exp(dx)
            return se3.sim3_compose(ds, dR, dt, s, R, t)

        return jax.lax.fori_loop(0, n_iters, body, carry_sRt)

    w_edge = valid.astype(p_i.dtype)
    sRt = gn((s0, R0, t0), w_edge, iters, use_huber=True)

    # Outlier rejection on both directions, then more iterations.
    r, behind = _residuals(
        jnp.zeros((7,), p_i.dtype), *sRt, p_i, p_j, uv_i, uv_j, cam)
    chi = jnp.sum(r * r, -1) * w_dir  # (N, 2)
    keep = valid & (~behind) & jnp.all(chi < chi2_th, axis=-1)
    sRt = gn(sRt, keep.astype(p_i.dtype), 2 * iters, use_huber=False)

    r, behind = _residuals(
        jnp.zeros((7,), p_i.dtype), *sRt, p_i, p_j, uv_i, uv_j, cam)
    chi = jnp.sum(r * r, -1) * w_dir
    inl = valid & (~behind) & jnp.all(chi < chi2_th, axis=-1)
    s, R, t = sRt
    return Sim3OptResult(
        s=s, R=R, t=t, inliers=inl, num_inliers=jnp.sum(inl.astype(jnp.int32))
    )
