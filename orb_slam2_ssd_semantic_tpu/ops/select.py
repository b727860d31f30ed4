"""Spatially-uniform keypoint selection on dense score maps.

TPU-native replacement for the reference's recursive quadtree
(ORBextractor::DistributeOctTree, perfect/src/ORBextractor.cc:478-770)
and its per-30px-cell FAST retry logic (ComputeKeyPointsOctTree,
ORBextractor.cc:771-860). Same goals — spatial uniformity, best-corner
preference, two-threshold fallback in weak cells — achieved with
fixed-shape ops: per-cell top-k, then a round-robin-by-cell-rank global
top-k (rank-0 candidates are every cell's best corner, i.e. exactly the
"one best per region" the quadtree converges to).

All outputs are fixed-capacity arrays with validity masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit, static_argnames=("cell_size", "max_per_cell", "quota", "border")
)
def select_keypoints(
    score: jnp.ndarray,
    ini_th: float,
    min_th: float,
    cell_size: int = 16,
    max_per_cell: int = 4,
    quota: int = 256,
    border: int = 19,
):
    """Select up to `quota` keypoints from a dense (NMS'd) score map.

    Two-threshold rule per cell (mirrors ORBextractor.cc:820-850): a
    corner is eligible if score >= ini_th, or if its whole cell has no
    such corner and score >= min_th.

    Returns (uv (quota, 2) float32 [x, y], scores (quota,), valid (quota,) bool),
    ordered by (cell-rank, -score) — i.e. all best-in-cell corners first.
    """
    h, w = score.shape
    # Mask detection border.
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    inb = (row >= border) & (row < h - border) & (col >= border) & (col < w - border)
    score = jnp.where(inb, score, 0.0)

    # Pad to cell multiples.
    hp = -(-h // cell_size) * cell_size
    wp = -(-w // cell_size) * cell_size
    sp = jnp.pad(score, ((0, hp - h), (0, wp - w)))
    ncy, ncx = hp // cell_size, wp // cell_size
    cells = sp.reshape(ncy, cell_size, ncx, cell_size).transpose(0, 2, 1, 3)
    cells = cells.reshape(ncy * ncx, cell_size * cell_size)

    # Two-threshold eligibility.
    cell_max = cells.max(axis=1, keepdims=True)
    eligible = (cells >= ini_th) | ((cell_max < ini_th) & (cells >= min_th))
    cells = jnp.where(eligible & (cells > 0), cells, 0.0)

    # Per-cell top-k.
    top_s, top_i = jax.lax.top_k(cells, max_per_cell)  # (ncells, k)

    # Recover absolute pixel coords.
    cell_ids = jnp.arange(ncy * ncx)[:, None]
    cy = cell_ids // ncx
    cx = cell_ids % ncx
    py = cy * cell_size + top_i // cell_size
    px = cx * cell_size + top_i % cell_size

    # Flatten candidates; composite key: cell-rank first, then score.
    rank = jnp.broadcast_to(jnp.arange(max_per_cell)[None, :], top_s.shape)
    flat_s = top_s.reshape(-1)
    flat_rank = rank.reshape(-1)
    flat_x = px.reshape(-1).astype(jnp.float32)
    flat_y = py.reshape(-1).astype(jnp.float32)
    valid_c = flat_s > 0
    # Higher key = better: invalid -> -inf.
    smax = jnp.max(flat_s) + 1.0
    key = jnp.where(valid_c, -flat_rank.astype(jnp.float32) * smax + flat_s, -jnp.inf)

    k = min(quota, key.shape[0])
    best_key, best_idx = jax.lax.top_k(key, k)
    uv = jnp.stack([flat_x[best_idx], flat_y[best_idx]], axis=-1)
    out_s = flat_s[best_idx]
    out_valid = jnp.isfinite(best_key) & (out_s > 0)
    if k < quota:  # capacity exceeds candidates: pad
        pad = quota - k
        uv = jnp.pad(uv, ((0, pad), (0, 0)))
        out_s = jnp.pad(out_s, (0, pad))
        out_valid = jnp.pad(out_valid, (0, pad))
    uv = jnp.where(out_valid[:, None], uv, 0.0)
    return uv, jnp.where(out_valid, out_s, 0.0), out_valid


@jax.jit
def subpixel_refine(score: jnp.ndarray, uv: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Quadratic subpixel refinement of corner locations on the dense
    (pre-NMS) score map: independent 1D parabola fits along x and y over
    the 3x3 neighborhood. Offsets are clamped to +-0.5 px; degenerate
    curvature keeps the integer location.

    The reference keeps integer FAST corners (cv::FAST output); under
    camera motion the integer quantization error is CORRELATED across
    all corners (the whole image shifts by the same subpixel phase),
    producing a systematic ~0.2-0.5 px frame-to-frame bias that random
    per-corner noise does not average away — a few mm/frame of pose
    drift at room scale. Subpixel refinement removes that bias at the
    source; a deliberate improvement over the reference.
    """
    h, w = score.shape
    x = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 1, w - 2)
    y = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 1, h - 2)

    def tap(dy, dx):
        return score[y + dy, x + dx]

    s0 = tap(0, 0)
    dxn, dxp = tap(0, -1), tap(0, 1)
    dyn, dyp = tap(-1, 0), tap(1, 0)
    denx = dxn - 2.0 * s0 + dxp
    deny = dyn - 2.0 * s0 + dyp
    offx = jnp.where(denx < -1e-6, 0.5 * (dxn - dxp) / denx, 0.0)
    offy = jnp.where(deny < -1e-6, 0.5 * (dyn - dyp) / deny, 0.0)
    offx = jnp.clip(offx, -0.5, 0.5)
    offy = jnp.clip(offy, -0.5, 0.5)
    off = jnp.stack([offx, offy], axis=-1)
    return jnp.where(valid[:, None], uv + off, uv)


def level_quotas(n_features: int, n_levels: int, scale_factor: float):
    """Geometric per-level feature budget (ORBextractor ctor,
    ORBextractor.cc:399-430): level i gets ~ n*(1-q)/(1-q^L) * q^i with
    q = 1/scale_factor, remainder to the coarsest level."""
    q = 1.0 / scale_factor
    first = n_features * (1 - q) / (1 - q**n_levels)
    quotas = [int(round(first * q**i)) for i in range(n_levels - 1)]
    quotas.append(max(0, n_features - sum(quotas)))
    return quotas
