"""Batched DLT homography estimation with vectorized RANSAC.

TPU-native replacement for cv::findHomography(RANSAC) as used by
Tracking::TrackHomo (perfect/src/Tracking.cc:1386) to cancel camera
ego-motion before the optical-flow dynamic mask (Flow.cc:73-80).

All hypotheses are evaluated in one batch: sample S minimal 4-point
sets, solve each 8x9 DLT by SVD with vmap, score all correspondences
against every hypothesis with one (S, N) residual matrix, pick the best
by inlier count, then refit on its inliers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _dlt(src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted DLT: src, dst (N, 2), w (N,) -> H (3, 3) with H[2,2]=1-ish.

    Solves for the null vector of the weighted A (2N, 9)."""
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([-x, -y, -o, z, z, z, u * x, u * y, u], axis=-1)
    r2 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], axis=-1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)  # (2N, 9)
    # Null vector via eigh of A^T A (9x9) — cheaper and batchable.
    M = A.T @ A
    _, vecs = jnp.linalg.eigh(M)
    h = vecs[:, 0]
    H = h.reshape(3, 3)
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])


def apply_homography(H: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """H (..., 3, 3) applied to pts (..., N, 2)."""
    ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
    ph = jnp.concatenate([pts, ones], axis=-1)
    out = jnp.einsum("...ij,...nj->...ni", H, ph)
    w = jnp.where(jnp.abs(out[..., 2:3]) < 1e-12, 1e-12, out[..., 2:3])
    return out[..., :2] / w


def _normalize(pts, valid):
    n = jnp.maximum(jnp.sum(valid), 1.0)
    mean = jnp.sum(pts * valid[:, None], axis=0) / n
    d = jnp.linalg.norm(pts - mean, axis=-1)
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d * valid) / n, 1e-6)
    T = jnp.asarray(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32
    )
    T = T.at[0, 0].set(scale).at[1, 1].set(scale)
    T = T.at[0, 2].set(-scale * mean[0]).at[1, 2].set(-scale * mean[1])
    return (pts - mean) * scale, T


@functools.partial(jax.jit, static_argnames=("n_hypotheses",))
def find_homography_ransac(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    valid: jnp.ndarray,
    key: jnp.ndarray,
    threshold: float = 3.0,
    n_hypotheses: int = 128,
):
    """RANSAC homography from padded correspondences.

    src, dst: (N, 2); valid: (N,) bool; key: PRNG key.
    Returns (H (3,3), inliers (N,) bool, n_inliers).
    """
    N = src.shape[0]
    sn, Ts = _normalize(src, valid.astype(jnp.float32))
    dn, Td = _normalize(dst, valid.astype(jnp.float32))

    # Sample 4 indices per hypothesis, weighted toward valid entries.
    logits = jnp.where(valid, 0.0, -1e9)
    keys = jax.random.split(key, n_hypotheses)
    idx = jax.vmap(
        lambda k: jax.random.categorical(k, logits, shape=(4,))
    )(keys)  # (S, 4)

    def solve_one(ids):
        w = jnp.ones((4,), jnp.float32)
        return _dlt(sn[ids], dn[ids], w)

    Hs = jax.vmap(solve_one)(idx)  # (S, 3, 3)

    # Score every hypothesis on all correspondences (normalized frame).
    proj = apply_homography(Hs, jnp.broadcast_to(sn, (n_hypotheses, N, 2)))
    err = jnp.linalg.norm(proj - dn[None], axis=-1)  # (S, N)
    # Threshold in normalized units: scale by Td's scale.
    th = threshold * Td[0, 0]
    inl = (err < th) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    best_inl = inl[best]

    # Refit on the best inlier set (weighted DLT over all points).
    H_norm = _dlt(sn, dn, best_inl.astype(jnp.float32))
    H = jnp.linalg.inv(Td) @ H_norm @ Ts
    H = H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])

    # Final inliers in pixel units.
    proj_px = apply_homography(H, src)
    err_px = jnp.linalg.norm(proj_px - dst, axis=-1)
    inliers = (err_px < threshold) & valid
    return H, inliers, jnp.sum(inliers.astype(jnp.int32))
