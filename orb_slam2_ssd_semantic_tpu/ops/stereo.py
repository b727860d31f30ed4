"""Rectified stereo keypoint matching -> per-keypoint depth.

Equivalent of Frame::ComputeStereoMatches (reference perfect/src/Frame.cc,
decl Frame.h:94): for every left keypoint, find the best Hamming match
among right keypoints in the same row band (within +-2 px scaled by the
keypoint's pyramid level) and a bounded disparity range, then convert
disparity to depth via z = bf / d.

TPU-native shape: one masked (K, K) distance-matrix problem (the row
band + disparity bounds are the mask), like every other search in
ops/match.py. The reference's per-keypoint SAD subpixel refinement
(Frame.cc ComputeStereoMatches second half) is omitted — keypoints are
already subpixel-refined at detection and the virtual-uR observation
model weights depth appropriately (config.CameraConfig.depth_bf).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import CameraConfig, OrbConfig
from orb_slam2_ssd_semantic_tpu.frontend.extractor import Features, scale_factors
from orb_slam2_ssd_semantic_tpu.ops import match as match_ops


@functools.partial(jax.jit, static_argnames=("cam", "orb"))
def stereo_match(
    feats_l: Features,
    feats_r: Features,
    cam: CameraConfig,
    orb: OrbConfig,
    max_dist: int = (match_ops.TH_HIGH + match_ops.TH_LOW) // 2,
):
    """Returns (depth (K,), ur (K,), valid (K,)) for the left keypoints.

    Disparity range [min_disp, max_disp] = [0.3, bf/fx_baseline..]: the
    reference uses minD=0, maxD=bf/minZ with minZ = baseline
    (Frame.cc ComputeStereoMatches); a small positive floor keeps depth
    finite."""
    sf = scale_factors(orb)
    bf = cam.bf  # real baseline x fx (Camera.bf)
    max_disp = cam.fx  # disparity at z = baseline (minZ = b, Frame.cc)
    min_disp = 0.3

    band = 2.0 * sf[jnp.clip(feats_r.level, 0, orb.n_levels - 1)]  # (K,)

    dv = jnp.abs(feats_l.uv[:, None, 1] - feats_r.uv[None, :, 1])
    disp = feats_l.uv[:, None, 0] - feats_r.uv[None, :, 0]
    lvl_ok = jnp.abs(feats_l.level[:, None] - feats_r.level[None, :]) <= 1
    mask = (
        (dv <= band[None, :])
        & (disp >= min_disp)
        & (disp <= max_disp)
        & lvl_ok
        & feats_l.valid[:, None]
        & feats_r.valid[None, :]
    )
    dist = match_ops.hamming_matrix(feats_l.desc, feats_r.desc)
    m = match_ops.masked_best_match(dist, mask, max_dist=max_dist)

    j = jnp.clip(m.idx, 0, feats_r.uv.shape[0] - 1)
    d = feats_l.uv[:, 0] - feats_r.uv[j, 0]
    ok = m.valid & (d >= min_disp)
    depth = jnp.where(ok, bf / jnp.maximum(d, min_disp), 0.0)
    ur = jnp.where(ok, feats_r.uv[j, 0], -1.0)
    # Scale-consistency: depth must be within the keypoint level's usable
    # range (coarse levels can't resolve tiny disparities).
    return depth, ur, ok