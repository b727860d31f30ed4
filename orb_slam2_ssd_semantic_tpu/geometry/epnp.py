"""Batched EPnP: 2D-3D perspective-n-point pose inside vectorized RANSAC.

The TPU twin of PnPsolver (perfect/src/PnPsolver.cc:61-1006). The
reference runs EPnP (Lepetit et al., IJCV'09) serially inside a RANSAC
loop for relocalization: 4 control points, barycentric coordinates, a
2Nx12 measurement matrix M whose null space spans the camera-frame
control points, beta coefficients recovered from inter-control-point
distances (find_betas_approx_1/2/3, PnPsolver.cc:621-712) and refined
by Gauss-Newton on the 6x10 distance system (gauss_newton,
PnPsolver.cc:891-908), then absolute orientation for (R, t)
(compute_R_and_t, PnPsolver.cc:795-829).

Here every RANSAC hypothesis solves and scores in one vmapped batch on
the MXU, and the final refit re-runs the same closed form with an
inlier mask (weighted centroids / weighted M^T M) instead of rebuilding
variable-size matrices. Used for monocular relocalization; RGB-D
frames with depth prefer the 3D-3D path (geometry/ransac3d.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import CameraConfig
from orb_slam2_ssd_semantic_tpu.geometry import se3

# Pairs of control-point indices for the 6 inter-control-point
# distances (PnPsolver.cc:736-744 iterates i<j over 4 points).
_PAIRS = jnp.array([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)], dtype=jnp.int32)

# betas10 ordering: [b1^2, b1b2, b2^2, b1b3, b2b3, b3^2, b1b4, b2b4, b3b4, b4^2]
# (PnPsolver.cc:758-768).
_B10_I = jnp.array([0, 0, 1, 0, 1, 2, 0, 1, 2, 3], dtype=jnp.int32)
_B10_J = jnp.array([0, 1, 1, 2, 2, 2, 3, 3, 3, 3], dtype=jnp.int32)


def _control_points(pw: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted EPnP control points: centroid + scaled principal axes
    (choose_control_points, PnPsolver.cc:273-309). Returns (4, 3)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    c0 = jnp.sum(pw * w[:, None], axis=0) / wsum
    d = (pw - c0) * jnp.sqrt(w)[:, None]
    cov = d.T @ d / wsum
    evals, evecs = jnp.linalg.eigh(cov)  # ascending
    # Guard rank-deficient (planar/linear) sets so the barycentric solve
    # stays invertible; the tiny fake extent cancels in the null space.
    lam = jnp.sqrt(jnp.maximum(evals, 1e-8))
    cws = c0[None, :] + lam[:, None] * evecs.T  # rows = axes
    return jnp.concatenate([c0[None, :], cws[::-1]], axis=0)


def _barycentric(pw: jnp.ndarray, cws: jnp.ndarray) -> jnp.ndarray:
    """Barycentric coordinates of pw wrt the 4 control points
    (compute_barycentric_coordinates, PnPsolver.cc:311-336). (N, 4)."""
    A = (cws[1:] - cws[0]).T  # (3, 3)
    a123 = jnp.linalg.solve(A, (pw - cws[0]).T).T  # (N, 3)
    a0 = 1.0 - jnp.sum(a123, axis=-1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=-1)


def _fill_M(alphas: jnp.ndarray, uv: jnp.ndarray, w: jnp.ndarray,
            cam: CameraConfig) -> jnp.ndarray:
    """Weighted M^T M of the 2Nx12 EPnP system (fill_M,
    PnPsolver.cc:338-355). Returns (12, 12)."""
    N = alphas.shape[0]
    z = jnp.zeros((N, 4), alphas.dtype)
    ru = jnp.stack([alphas * cam.fx, z, alphas * (cam.cx - uv[:, 0:1])], axis=-1)
    rv = jnp.stack([z, alphas * cam.fy, alphas * (cam.cy - uv[:, 1:2])], axis=-1)
    M = jnp.concatenate([ru.reshape(N, 12), rv.reshape(N, 12)], axis=0)
    Wd = jnp.concatenate([w, w])[:, None]
    return M.T @ (M * Wd)


def _rho(cws: jnp.ndarray) -> jnp.ndarray:
    d = cws[_PAIRS[:, 0]] - cws[_PAIRS[:, 1]]
    return jnp.sum(d * d, axis=-1)


def _L6x10(V: jnp.ndarray) -> jnp.ndarray:
    """(6, 10) distance system over the 4 null-space vectors
    (compute_L_6x10, PnPsolver.cc:848-881). V is (12, 4)."""
    cc = V.T.reshape(4, 4, 3)  # (vector k, control point, xyz)
    dv = cc[:, _PAIRS[:, 0]] - cc[:, _PAIRS[:, 1]]  # (4, 6, 3)
    dots = jnp.einsum("apx,bpx->pab", dv, dv)  # (6, 4, 4)
    g = dots[:, _B10_I, _B10_J]
    scale = jnp.where(_B10_I == _B10_J, 1.0, 2.0)
    return g * scale[None, :]


def _betas10(b: jnp.ndarray) -> jnp.ndarray:
    return b[_B10_I] * b[_B10_J]


def _betas_approx1(L: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
    """find_betas_approx_1 (PnPsolver.cc:621-645): least-squares on
    columns [b1^2, b1b2, b1b3, b1b4]."""
    L4 = L[:, jnp.array([0, 1, 3, 6])]
    x, *_ = jnp.linalg.lstsq(L4, rho)
    b1 = jnp.sqrt(jnp.abs(x[0]))
    sgn = jnp.where(x[0] < 0, -1.0, 1.0)
    rest = sgn * x[1:] / jnp.maximum(b1, 1e-9)
    return jnp.concatenate([b1[None], rest])


def _betas_approx2(L: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
    """find_betas_approx_2 (PnPsolver.cc:651-681): columns
    [b1^2, b1b2, b2^2]."""
    L3 = L[:, jnp.array([0, 1, 2])]
    x, *_ = jnp.linalg.lstsq(L3, rho)
    b1 = jnp.sqrt(jnp.abs(x[0]))
    b2 = jnp.sqrt(jnp.abs(x[2])) * jnp.where(x[2] > 0, 1.0, 0.0)
    flip = jnp.where(x[1] < 0, -1.0, 1.0)
    return jnp.array([b1 * flip, b2, 0.0, 0.0]) * jnp.where(x[0] < 0, -1.0, 1.0) * flip


def _gauss_newton(L: jnp.ndarray, rho: jnp.ndarray, b: jnp.ndarray,
                  iters: int = 5) -> jnp.ndarray:
    """Refine betas on ||L betas10(b) - rho|| (gauss_newton,
    PnPsolver.cc:891-908), 5 iterations like the reference."""
    def step(b, _):
        J = jax.jacfwd(lambda bb: L @ _betas10(bb))(b)  # (6, 4)
        r = rho - L @ _betas10(b)
        JtJ = J.T @ J + 1e-9 * jnp.eye(4, dtype=b.dtype)
        b = b + jnp.linalg.solve(JtJ, J.T @ r)
        return b, None

    b, _ = jax.lax.scan(step, b, None, length=iters)
    return b


def _pose_from_betas(b: jnp.ndarray, V: jnp.ndarray, alphas: jnp.ndarray,
                     pw: jnp.ndarray, w: jnp.ndarray):
    """Camera-frame control points -> point cloud -> absolute
    orientation (compute_ccs/compute_pcs/compute_R_and_t,
    PnPsolver.cc:714-829). Returns (R, t)."""
    ccs = (V @ b).reshape(4, 3)
    pcs = alphas @ ccs
    # Resolve the global sign so depths are positive (solve_for_sign,
    # PnPsolver.cc:784-793).
    flip = jnp.where(jnp.sum(pcs[:, 2] * w) < 0, -1.0, 1.0)
    pcs = pcs * flip
    _, R, t = se3.horn_sim3(pw, pcs, mask=w, with_scale=False)
    return R, t


def _epnp(pw: jnp.ndarray, uv: jnp.ndarray, w: jnp.ndarray, cam: CameraConfig):
    """One weighted EPnP solve over all rows with weight w (0/1 mask ok).

    Returns (R, t) with T_cw = [R|t] mapping world -> camera."""
    cws = _control_points(pw, w)
    alphas = _barycentric(pw, cws)
    MtM = _fill_M(alphas, uv, w, cam)
    _, evecs = jnp.linalg.eigh(MtM)
    V = evecs[:, :4]  # 4 smallest — the (approximate) null space
    L = _L6x10(V)
    rho = _rho(cws)

    def candidate(b0):
        b = _gauss_newton(L, rho, b0)
        R, t = _pose_from_betas(b, V, alphas, pw, w)
        pc = pw @ R.T + t
        z = jnp.maximum(pc[:, 2], 1e-6)
        proj = jnp.stack([cam.fx * pc[:, 0] / z + cam.cx,
                          cam.fy * pc[:, 1] / z + cam.cy], axis=-1)
        err = jnp.sum(jnp.where(w > 0, jnp.sum((proj - uv) ** 2, -1), 0.0))
        return err, R, t

    b1 = _betas_approx1(L, rho)
    b2 = _betas_approx2(L, rho)
    e1, R1, t1 = candidate(b1)
    e2, R2, t2 = candidate(b2)
    take1 = e1 <= e2
    R = jnp.where(take1, R1, R2)
    t = jnp.where(take1, t1, t2)
    return R, t


@functools.partial(jax.jit, static_argnames=("cam", "n_hypotheses", "min_set"))
def ransac_epnp(
    pw: jnp.ndarray,  # (N, 3) world points
    uv: jnp.ndarray,  # (N, 2) pixel observations
    valid: jnp.ndarray,  # (N,) bool
    key: jnp.ndarray,
    cam: CameraConfig,
    threshold_px: float = 5.991 ** 0.5 * 2.0,
    n_hypotheses: int = 128,
    min_set: int = 6,
):
    """Robust PnP: every hypothesis is an independent EPnP on a random
    minimal set, all solved in one vmapped batch (PnPsolver::iterate,
    PnPsolver.cc:161-257, vectorized).

    Returns (R, t, inliers (N,), n_inliers) with T_cw = [R|t]."""
    N = pw.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    keys = jax.random.split(key, n_hypotheses)
    idx = jax.vmap(lambda k: jax.random.categorical(k, logits, shape=(min_set,)))(keys)

    def solve(ids):
        w = jnp.ones((min_set,), pw.dtype)
        return _epnp(pw[ids], uv[ids], w, cam)

    R_h, t_h = jax.vmap(solve)(idx)  # (S,3,3), (S,3)

    pc = jnp.einsum("sij,nj->sni", R_h, pw) + t_h[:, None, :]
    z = pc[..., 2]
    proj = jnp.stack([cam.fx * pc[..., 0] / jnp.maximum(z, 1e-6) + cam.cx,
                      cam.fy * pc[..., 1] / jnp.maximum(z, 1e-6) + cam.cy], axis=-1)
    err = jnp.linalg.norm(proj - uv[None], axis=-1)
    inl = (err < threshold_px) & (z > 0) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)

    # Refit one weighted EPnP on the winning inlier set (the reference
    # refines with all inliers at PnPsolver.cc:229-247).
    w = inl[best].astype(pw.dtype)
    R, t = _epnp(pw, uv, w, cam)
    pc = pw @ R.T + t
    zr = jnp.maximum(pc[:, 2], 1e-6)
    proj = jnp.stack([cam.fx * pc[:, 0] / zr + cam.cx,
                      cam.fy * pc[:, 1] / zr + cam.cy], axis=-1)
    inliers = (jnp.linalg.norm(proj - uv, axis=-1) < threshold_px) \
        & (pc[:, 2] > 0) & valid
    # Fall back to the raw hypothesis if the weighted refit diverged.
    n_ref = jnp.sum(inliers.astype(jnp.int32))
    keep = n_ref >= counts[best]
    R = jnp.where(keep, R, R_h[best])
    t = jnp.where(keep, t, t_h[best])
    inliers = jnp.where(keep, inliers, inl[best])
    return R, t, inliers, jnp.maximum(n_ref, counts[best])
