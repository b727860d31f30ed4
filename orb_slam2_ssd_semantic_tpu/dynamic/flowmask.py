"""Optical-flow dynamic-pixel mask.

TPU-native equivalent of Flow::ComputeMask (perfect/src/Flow.cc:14-80):

  1. (optional) warp the current gray image by a homography estimated
     from static feature matches, cancelling camera ego-motion
     (Flow.cc:73-80; H from Tracking::TrackHomo, Tracking.cc:1331-1399);
  2. downsample x2 (Flow.cc:21 pyrDown);
  3. dense flow vs the previous frame (Farneback there, pyramidal LK
     here — ops/flow.py);
  4. threshold the squared flow magnitude (`Dynamic.flow`, floor 40,
     shipped 70 — Flow.cc:19,37);
  5. morphology: erode x2 then dilate with a 21x21 ellipse
     (Flow.cc:42-48);
  6. upsample the static mask to full resolution.

Returns mask (H, W) bool — True = STATIC (keep), matching the
reference's convention where masked-out keypoints are dropped
(Frame.cc:356-374).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import DynamicConfig
from orb_slam2_ssd_semantic_tpu.ops import flow as flow_ops
from orb_slam2_ssd_semantic_tpu.ops import image as image_ops
from orb_slam2_ssd_semantic_tpu.ops.homography import apply_homography


@functools.partial(jax.jit, static_argnames=("cfg",))
def flow_dynamic_mask(
    prev_gray: jnp.ndarray,
    cur_gray: jnp.ndarray,
    cfg: DynamicConfig = DynamicConfig(),
    homography: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(H, W) bool static mask from flow consistency."""
    h, w = cur_gray.shape
    cur = cur_gray
    if homography is not None:
        # Warp current frame by H^-1 so static pixels align with prev
        # (cv::warpPerspective(cur, cur_warped, H) semantics with
        # WARP_INVERSE not set: output(p) = cur(H^-1 p)... the reference
        # warps with H directly, Flow.cc:76; we sample cur at H(p)).
        ys = jnp.arange(h, dtype=jnp.float32)[:, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, :]
        grid = jnp.stack(
            [jnp.broadcast_to(xs, (h, w)), jnp.broadcast_to(ys, (h, w))], axis=-1
        ).reshape(-1, 2)
        src = apply_homography(homography, grid)
        vals, _ = image_ops.bilinear_sample(cur_gray, src)
        cur = vals.reshape(h, w)

    s = cfg.flow_downscale
    ph = image_ops.resize_bilinear(prev_gray, h // s, w // s)
    ch = image_ops.resize_bilinear(cur, h // s, w // s)
    f = flow_ops.dense_flow(ph, ch, levels=cfg.flow_levels,
                            window=cfg.flow_window, iters=cfg.flow_iters)
    mag2 = flow_ops.flow_magnitude_sq(f)

    # Threshold with the reference's floor rule (Flow.cc:33-38).
    th = max(cfg.flow_threshold, cfg.flow_threshold_floor) / (s * s)
    dynamic = mag2 > th

    k = max(3, cfg.flow_morph_kernel // s)
    dynamic = image_ops.erode(dynamic, k, iterations=2)
    dynamic = image_ops.dilate(dynamic, k, iterations=1)

    static_small = ~dynamic
    static = image_ops.resize_bilinear(static_small.astype(jnp.float32), h, w) > 0.5
    return static


@functools.partial(jax.jit, static_argnames=("cfg", "grid_stride"))
def flow_dynamic_mask_fitted(
    prev_gray: jnp.ndarray,
    cur_gray: jnp.ndarray,
    cfg: DynamicConfig = DynamicConfig(),
    grid_stride: int = 8,
) -> jnp.ndarray:
    """(H, W) bool static mask with a FITTED ego-motion homography.

    The reference fits H to feature matches from a throwaway light track
    (Tracking::TrackHomo, Tracking.cc:1331-1399: SearchByProjection
    pixel pairs -> cv::findHomography(RANSAC)) and warps before flow
    (Flow.cc:73-80). Here the dense flow field itself supplies the
    correspondences: grid points (x, x + flow(x)) feed the batched
    RANSAC homography (ops/homography.py) — the static majority votes
    the ego-motion in, exactly the findHomography(RANSAC) role, with no
    second feature extraction — and the dynamic test thresholds the
    RESIDUAL flow ||flow(x) - (Hx - x)||^2, which equals the reference's
    flow-after-warp magnitude test. Unlike round 1's rotation-only
    predicted H, this cancels translation-induced parallax too (the
    published 0.388 m flow ATE depended on the fitted H; VERDICT #6)."""
    from orb_slam2_ssd_semantic_tpu.ops.homography import (
        apply_homography as apply_h,
        find_homography_ransac,
    )

    h, w = cur_gray.shape
    s = cfg.flow_downscale
    hs, ws = h // s, w // s
    ph = image_ops.resize_bilinear(prev_gray, hs, ws)
    ch = image_ops.resize_bilinear(cur_gray, hs, ws)
    f = flow_ops.dense_flow(ph, ch, levels=cfg.flow_levels,
                            window=cfg.flow_window, iters=cfg.flow_iters)

    # Grid correspondences for the ego-motion fit.
    gy = jnp.arange(0, hs - grid_stride + 1, grid_stride, dtype=jnp.int32)
    gx = jnp.arange(0, ws - grid_stride + 1, grid_stride, dtype=jnp.int32)
    yy, xx = jnp.meshgrid(gy, gx, indexing="ij")
    src = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1).astype(jnp.float32)
    fl = f[yy.reshape(-1), xx.reshape(-1)]
    dst = src + fl
    margin = 2.0
    valid = (
        (dst[:, 0] >= margin) & (dst[:, 0] < ws - margin)
        & (dst[:, 1] >= margin) & (dst[:, 1] < hs - margin)
    )
    H, inl, n_inl = find_homography_ransac(
        src, dst, valid, jax.random.PRNGKey(0), threshold=2.0
    )
    # Degenerate fit (few inliers) -> identity (raw-flow threshold,
    # the reference's no-homography Flow::ComputeMask path).
    use_H = n_inl >= 20
    H = jnp.where(use_H, H, jnp.eye(3, dtype=jnp.float32))

    # Residual flow after ego-motion cancellation.
    ys = jnp.arange(hs, dtype=jnp.float32)[:, None]
    xs = jnp.arange(ws, dtype=jnp.float32)[None, :]
    grid = jnp.stack(
        [jnp.broadcast_to(xs, (hs, ws)), jnp.broadcast_to(ys, (hs, ws))], axis=-1
    ).reshape(-1, 2)
    ego = (apply_h(H, grid) - grid).reshape(hs, ws, 2)
    resid = f - ego
    mag2 = resid[..., 0] ** 2 + resid[..., 1] ** 2

    th = max(cfg.flow_threshold, cfg.flow_threshold_floor) / (s * s)
    dynamic = mag2 > th
    k = max(3, cfg.flow_morph_kernel // s)
    dynamic = image_ops.erode(dynamic, k, iterations=2)
    dynamic = image_ops.dilate(dynamic, k, iterations=1)
    static_small = ~dynamic
    static = image_ops.resize_bilinear(static_small.astype(jnp.float32), h, w) > 0.5
    return static


def static_area_fraction(mask: jnp.ndarray) -> jnp.ndarray:
    """Fraction of static pixels; the frame ctor only applies the mask if
    >= 65% of the area is static (Frame.cc:357-374)."""
    return jnp.mean(mask.astype(jnp.float32))
