"""Dense FAST-9-16 corner detection as vectorized XLA ops.

TPU-native replacement for cv::FAST as used by the reference's extractor
(perfect/src/ORBextractor.cc:771-860: per-cell FAST with iniThFAST=20,
retry minThFAST=7). Instead of per-cell calls, we compute a dense score
map per pyramid level at BOTH thresholds in one pass (whole-image VPU
work), 3x3 non-max suppress, and let the selection stage (ops/select.py)
apply the two-threshold fallback per cell.

Scores follow OpenCV semantics: the corner score is the largest
threshold for which the pixel is still a FAST corner (max over arcs of
the min absolute center-difference along a 9-long contiguous arc).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3: 16 (dy, dx) offsets in circular order.
FAST_OFFSETS = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

ARC_LEN = 9  # contiguous run length for FAST-9


def _circle_stack(img: jnp.ndarray) -> jnp.ndarray:
    """(16, H, W) stack of the 16 circle-neighbor images (zero-padded at
    the 3-px border; border pixels are masked out of scores anyway)."""
    h, w = img.shape
    pad = 3
    xp = jnp.pad(img, pad, mode="edge")
    taps = [
        jax.lax.dynamic_slice(xp, (pad + int(dy), pad + int(dx)), (h, w))
        for dy, dx in FAST_OFFSETS
    ]
    return jnp.stack(taps, axis=0)


@functools.partial(jax.jit, static_argnames=("border",))
def fast_score_map(img: jnp.ndarray, border: int = 3) -> jnp.ndarray:
    """Dense FAST-9-16 corner score (H, W) float32; 0 where not a corner
    at threshold 1 (i.e. score < 1). Use `score >= th` to test a corner
    at threshold `th` — one score map serves both iniThFAST and
    minThFAST gates.

    Internals run in int16 (center differences of 8-bit images fit
    exactly; half the HBM traffic of f32) with log-doubling cyclic arc
    minima (4 passes instead of 8).
    """
    circ = _circle_stack(jnp.round(img).astype(jnp.int16))  # (16, H, W)
    d = circ - jnp.round(img).astype(jnp.int16)[None]  # neighbor - center

    # For each of the 16 starting positions, the min over the 9-long arc of
    # (neighbor - center) [bright arcs] and (center - neighbor) [dark arcs].
    # A pixel is a corner at threshold t iff max_arc min_arc |d| > t for a
    # consistently-signed arc; its score is that max-min value. The
    # bright and dark scans share work through min/max duality:
    # min over arc of (-d) == -(max over arc of d).
    def arc_minmax(x):
        # Log-doubling: runs of 2, 4, 8, then 8+1 -> 9 (cyclic over 16).
        mn = mx = x
        for shift in (1, 2, 4):
            rolled_mn = jnp.roll(mn, -shift, axis=0)
            rolled_mx = jnp.roll(mx, -shift, axis=0)
            mn = jnp.minimum(mn, rolled_mn)
            mx = jnp.maximum(mx, rolled_mx)
        last = jnp.roll(x, -(ARC_LEN - 1), axis=0)
        return jnp.minimum(mn, last), jnp.maximum(mx, last)

    mn9, mx9 = arc_minmax(d)
    bright = mn9.max(axis=0)  # max over arcs of (min over arc of d)
    dark = (-mx9).max(axis=0)  # == max over arcs of min of (-d)
    score = jnp.maximum(jnp.maximum(bright, dark), 0).astype(jnp.float32)

    # Kill the border (circle taps are invalid there).
    h, w = img.shape
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    interior = (row >= border) & (row < h - border) & (col >= border) & (col < w - border)
    return jnp.where(interior, score, 0.0)


@jax.jit
def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep only strict 3x3 local maxima (cv::FAST nonmaxSuppression).
    Ties broken toward the top-left pixel so plateaus keep one corner."""
    h, w = score.shape
    sp = jnp.pad(score, 1, mode="constant", constant_values=-1.0)
    best = jnp.full_like(score, -jnp.inf)
    strictly_before = jnp.full_like(score, -jnp.inf)
    for dy in range(3):
        for dx in range(3):
            if dy == 1 and dx == 1:
                continue
            nb = jax.lax.dynamic_slice(sp, (dy, dx), (h, w))
            best = jnp.maximum(best, nb)
            if dy < 1 or (dy == 1 and dx < 1):
                strictly_before = jnp.maximum(strictly_before, nb)
    # Keep if greater than all later neighbors and >= all earlier ones.
    keep = (score > 0) & (score >= best) & (score > strictly_before)
    return jnp.where(keep, score, 0.0)
