"""Vectorized RANSAC rigid/similarity alignment of 3D-3D correspondences.

The TPU twin of Sim3Solver (perfect/src/Sim3Solver.cc:126-284): the
reference iterates Horn's closed form over random 3-point minimal sets
with reprojection-based inlier checks; here all hypotheses solve and
score in one vmapped batch. Scale is fixed to 1 for stereo/RGB-D
(Sim3Solver ctor flag, Sim3Solver.cc:16). Also serves RGB-D
relocalization, where frame depth turns 2D-3D PnP into 3D-3D alignment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.geometry import se3


@functools.partial(jax.jit, static_argnames=("n_hypotheses", "with_scale"))
def ransac_rigid(
    src: jnp.ndarray,  # (N, 3)
    dst: jnp.ndarray,  # (N, 3)
    valid: jnp.ndarray,  # (N,)
    key: jnp.ndarray,
    threshold: float = 0.10,
    n_hypotheses: int = 256,
    with_scale: bool = False,
):
    """Estimate dst ~ s R src + t robustly.

    Returns (s, R, t, inliers (N,), n_inliers)."""
    N = src.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    keys = jax.random.split(key, n_hypotheses)
    idx = jax.vmap(lambda k: jax.random.categorical(k, logits, shape=(3,)))(keys)

    def solve(ids):
        return se3.horn_sim3(src[ids], dst[ids], with_scale=with_scale)

    s_h, R_h, t_h = jax.vmap(solve)(idx)  # (S,), (S,3,3), (S,3)
    pred = s_h[:, None, None] * jnp.einsum("sij,nj->sni", R_h, src) + t_h[:, None, :]
    err = jnp.linalg.norm(pred - dst[None], axis=-1)  # (S, N)
    inl = (err < threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)

    # Refit on the best inlier set with the full closed form.
    mask = inl[best].astype(jnp.float32)
    s, R, t = se3.horn_sim3(src, dst, mask=mask, with_scale=with_scale)
    pred = s * src @ R.T + t
    inliers = (jnp.linalg.norm(pred - dst, axis=-1) < threshold) & valid
    return s, R, t, inliers, jnp.sum(inliers.astype(jnp.int32))
