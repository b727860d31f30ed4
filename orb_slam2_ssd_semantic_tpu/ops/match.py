"""Batched Hamming descriptor matching.

TPU-native replacement for the nine ORBmatcher::Search* variants
(perfect/src/ORBmatcher.cc). The reference walks per-keypoint grid cells
(Frame::GetFeaturesInArea); here every search is one dense masked
(Q, K) distance-matrix problem: XOR + popcount on (K, 8) uint32 packed
descriptors (DescriptorDistance, ORBmatcher.cc:2124-2142), with the
window/level/epipolar constraints applied as additive masks. At the
reference's operating point (1024 keypoints) a full matrix is ~8M
popcounts — trivial VPU work, and far better TPU shape than
pointer-chasing a grid.

Conventions: distances are int32 in [0, 256]; BIG = 1024 marks
masked-out pairs. All outputs are fixed-shape with -1/False invalids.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG = 1024  # sentinel distance for masked pairs (> any real Hamming distance)
TH_LOW = 50  # ORBmatcher.cc:40 (accept threshold for guided searches)
TH_HIGH = 100  # ORBmatcher.cc:41
HISTO_LENGTH = 30  # rotation histogram bins (ORBmatcher.cc:42)


def hamming_matrix(desc_q: jnp.ndarray, desc_t: jnp.ndarray) -> jnp.ndarray:
    """(Q, 8) x (T, 8) uint32 -> (Q, T) int32 Hamming distances."""
    x = jnp.bitwise_xor(desc_q[:, None, :], desc_t[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


class MatchResult(NamedTuple):
    """Per-query best match into the target set."""

    idx: jnp.ndarray  # (Q,) int32 target index, -1 if unmatched
    dist: jnp.ndarray  # (Q,) int32 best distance (BIG if unmatched)
    valid: jnp.ndarray  # (Q,) bool


def masked_best_match(
    dist: jnp.ndarray,
    pair_mask: jnp.ndarray,
    max_dist: int = TH_LOW,
    ratio: float | None = None,
    mutual: bool = False,
) -> MatchResult:
    """Select per-row best target under a pair mask, with optional
    Lowe-style best/second-best ratio test (ORBmatcher ctor mfNNratio,
    ORBmatcher.cc:43) and optional mutual-best (cross-check) constraint.
    """
    d = jnp.where(pair_mask, dist, BIG)
    # Best and second-best per row.
    neg, idx2 = jax.lax.top_k(-d, 2)
    best = -neg[:, 0]
    second = -neg[:, 1]
    best_idx = idx2[:, 0]
    ok = best <= max_dist
    if ratio is not None:
        ok = ok & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
    if mutual:
        col_best = jnp.argmin(d, axis=0)  # (T,)
        ok = ok & (col_best[best_idx] == jnp.arange(d.shape[0]))
    return MatchResult(
        idx=jnp.where(ok, best_idx, -1),
        dist=jnp.where(ok, best, BIG),
        valid=ok,
    )


def resolve_duplicate_targets(m: MatchResult, num_targets: int) -> MatchResult:
    """Keep only the lowest-distance query per target (the reference
    erases the previous match when a better one claims the same keypoint,
    e.g. ORBmatcher.cc:1634-1655). Scatter-min over target bins."""
    tgt = jnp.where(m.valid, m.idx, num_targets)  # overflow bin for invalid
    best_per_tgt = jnp.full((num_targets + 1,), BIG, dtype=jnp.int32)
    best_per_tgt = best_per_tgt.at[tgt].min(m.dist)
    keep = m.valid & (m.dist == best_per_tgt[tgt])
    # Among equal-distance claimants keep the lowest query index.
    qidx = jnp.arange(m.idx.shape[0], dtype=jnp.int32)
    first_q = jnp.full((num_targets + 1,), m.idx.shape[0], dtype=jnp.int32)
    first_q = first_q.at[jnp.where(keep, tgt, num_targets)].min(qidx)
    keep = keep & (first_q[tgt] == qidx)
    return MatchResult(
        idx=jnp.where(keep, m.idx, -1),
        dist=jnp.where(keep, m.dist, BIG),
        valid=keep,
    )


def rotation_consistency_mask(
    angle_q: jnp.ndarray,
    angle_t: jnp.ndarray,
    m: MatchResult,
    histo_length: int = HISTO_LENGTH,
    keep_bins: int = 3,
) -> jnp.ndarray:
    """Keep only matches whose orientation delta falls in the 3 most
    populated of 30 bins (ORBmatcher::ComputeThreeMaxima,
    ORBmatcher.cc:2068-2122, including its <10%-of-max bin rejection).

    Returns an updated validity mask (Q,)."""
    tgt_angle = angle_t[jnp.clip(m.idx, 0, angle_t.shape[0] - 1)]
    delta = angle_q - tgt_angle
    # Wrap to [0, 2pi) then bin.
    two_pi = 2.0 * jnp.pi
    delta = jnp.mod(delta, two_pi)
    bins = jnp.clip((delta * histo_length / two_pi).astype(jnp.int32), 0, histo_length - 1)
    counts = jnp.zeros((histo_length,), jnp.int32).at[jnp.where(m.valid, bins, 0)].add(
        m.valid.astype(jnp.int32)
    )
    top_counts, top_bins = jax.lax.top_k(counts, keep_bins)
    # Reference drops bins below 10% of the best bin.
    good_bin = top_counts.astype(jnp.float32) > 0.1 * top_counts[0].astype(jnp.float32)
    in_top = jnp.any((bins[:, None] == top_bins[None, :]) & good_bin[None, :], axis=-1)
    return m.valid & in_top


def window_mask(
    centers: jnp.ndarray,
    uv_t: jnp.ndarray,
    radius: jnp.ndarray | float,
    valid_q: jnp.ndarray,
    valid_t: jnp.ndarray,
) -> jnp.ndarray:
    """(Q, T) mask: target keypoint within a square search window around
    each query center (GetFeaturesInArea semantics, Frame.cc:544-580).
    `radius` may be scalar or per-query (Q,)."""
    r = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (centers.shape[0],))
    du = jnp.abs(uv_t[None, :, 0] - centers[:, None, 0])
    dv = jnp.abs(uv_t[None, :, 1] - centers[:, None, 1])
    inside = (du <= r[:, None]) & (dv <= r[:, None])
    return inside & valid_q[:, None] & valid_t[None, :]


def level_mask(
    level_q: jnp.ndarray, level_t: jnp.ndarray, min_delta: int, max_delta: int
) -> jnp.ndarray:
    """(Q, T) mask: target pyramid level within [lq+min_delta, lq+max_delta]
    (the reference gates projection searches by predicted octave,
    e.g. ORBmatcher.cc:105-110)."""
    d = level_t[None, :] - level_q[:, None]
    return (d >= min_delta) & (d <= max_delta)


@functools.partial(jax.jit, static_argnames=("max_dist", "mutual"))
def match_by_window(
    desc_q: jnp.ndarray,
    desc_t: jnp.ndarray,
    centers: jnp.ndarray,
    uv_t: jnp.ndarray,
    valid_q: jnp.ndarray,
    valid_t: jnp.ndarray,
    radius,
    angle_q: jnp.ndarray | None = None,
    angle_t: jnp.ndarray | None = None,
    max_dist: int = TH_HIGH,
    mutual: bool = False,
) -> MatchResult:
    """Projection-style guided search: for each query descriptor with a
    predicted pixel location `centers[q]`, find the best target keypoint
    within the window (equivalent of SearchByProjection for the
    last-frame/motion-model case, ORBmatcher.cc:1578-1725).

    On TPU the distance+mask+top-2 core runs as one fused Pallas kernel
    (ops/pallas_match.py) — no (Q, T) intermediates touch HBM."""
    from orb_slam2_ssd_semantic_tpu.ops import pallas_match

    use_fused = (
        not mutual
        and pallas_match.use_pallas()
        and desc_q.shape[0] % 256 == 0
        and desc_t.shape[0] % 128 == 0
    )
    if use_fused:
        best, _, best_idx, key_min = pallas_match.fused_window_match(
            desc_q, desc_t, centers, uv_t, radius, valid_q, valid_t,
            max_dist=max_dist,
        )
        ok = best <= max_dist
        m = MatchResult(
            idx=jnp.where(ok, best_idx, -1),
            dist=jnp.where(ok, best, BIG),
            valid=ok,
        )
        if angle_q is None or angle_t is None:
            # Duplicate-target resolution straight from the kernel's
            # accumulated claim keys: q keeps its target iff its packed
            # (dist, q) key IS the per-target minimum — no scatter.
            # (With a rotation filter the claim set changes post-kernel;
            # that path resolves in XLA below.)
            q_key = (
                best * pallas_match._Q_STRIDE
                + jnp.arange(best.shape[0], dtype=jnp.int32)
            )
            tgt = jnp.clip(m.idx, 0, desc_t.shape[0] - 1)
            keep = m.valid & (q_key == key_min[tgt])
            return MatchResult(
                idx=jnp.where(keep, m.idx, -1),
                dist=jnp.where(keep, m.dist, BIG),
                valid=keep,
            )
    else:
        dist = hamming_matrix(desc_q, desc_t)
        mask = window_mask(centers, uv_t, radius, valid_q, valid_t)
        m = masked_best_match(dist, mask, max_dist=max_dist, mutual=mutual)
    if angle_q is not None and angle_t is not None:
        keep = rotation_consistency_mask(angle_q, angle_t, m)
        m = MatchResult(
            idx=jnp.where(keep, m.idx, -1),
            dist=jnp.where(keep, m.dist, BIG),
            valid=keep,
        )
    m = resolve_duplicate_targets(m, desc_t.shape[0])
    return m
