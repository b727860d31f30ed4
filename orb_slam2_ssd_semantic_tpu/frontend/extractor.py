"""ORB feature extraction pipeline: pyramid -> FAST -> uniform selection
-> IC angle -> steered BRIEF, all jitted with static shapes.

The TPU-native re-architecture of ORBextractor::operator()
(perfect/src/ORBextractor.cc:1052-1115): instead of per-cell OpenCV calls
and a recursive quadtree, each pyramid level is processed as dense
whole-image tensor work, and keypoints land in fixed-capacity padded
arrays with validity masks (SURVEY.md §7 stage 1).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import OrbConfig
from orb_slam2_ssd_semantic_tpu.ops import fast as fast_ops
from orb_slam2_ssd_semantic_tpu.ops import image as image_ops
from orb_slam2_ssd_semantic_tpu.ops import select as select_ops
from orb_slam2_ssd_semantic_tpu.ops.orb_descriptor import (
    BLUR_PAD,
    HALF_PATCH,
    binned_brief,
    blur_patches,
    extract_patches,
    ic_angle_from_patches,
)


class Features(NamedTuple):
    """Fixed-capacity keypoint set for one image (the engine's equivalent
    of the reference Frame's mvKeysUn/mDescriptors/mvDepth columns).

    All arrays have leading dim K = OrbConfig.max_keypoints; `valid`
    masks real entries.
    """

    uv: jnp.ndarray  # (K, 2) float32, level-0 pixel coords [x, y]
    level: jnp.ndarray  # (K,) int32 pyramid level
    angle: jnp.ndarray  # (K,) float32 radians
    score: jnp.ndarray  # (K,) float32 FAST corner score
    desc: jnp.ndarray  # (K, 8) uint32 packed 256-bit descriptor
    valid: jnp.ndarray  # (K,) bool

    @property
    def capacity(self) -> int:
        return self.uv.shape[0]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))


def scale_factors(cfg: OrbConfig) -> jnp.ndarray:
    """(L,) per-level scale (1.2^l), reference mvScaleFactor."""
    return jnp.asarray([cfg.scale_factor**i for i in range(cfg.n_levels)], dtype=jnp.float32)


def sigma2_per_level(cfg: OrbConfig) -> jnp.ndarray:
    """(L,) per-level variance scale^2l, reference mvLevelSigma2 — the
    measurement covariance used to weight BA residuals."""
    return scale_factors(cfg) ** 2


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract(img: jnp.ndarray, cfg: OrbConfig) -> Features:
    """Extract ORB features from a grayscale image (H, W) float32 [0,255].

    Output coordinates are level-0 pixel units (keypoints from level l
    are multiplied by scale^l, as in ORBextractor.cc:1098-1103).
    """
    h, w = img.shape
    quotas = select_ops.level_quotas(cfg.n_features, cfg.n_levels, cfg.scale_factor)
    levels = image_ops.build_pyramid(img, cfg.n_levels, cfg.scale_factor)

    uv_all, lvl_all, score_all, valid_all, patches_all = [], [], [], [], []
    for lvl, (lv_img, quota) in enumerate(zip(levels, quotas)):
        score_raw = fast_ops.fast_score_map(lv_img)
        score = fast_ops.nms3x3(score_raw)
        uv, s, valid = select_ops.select_keypoints(
            score,
            float(cfg.ini_th_fast),
            float(cfg.min_th_fast),
            cell_size=cfg.cell_size,
            max_per_cell=cfg.max_per_cell,
            quota=max(quota, 1),
            border=cfg.edge_threshold,
        )
        uv = select_ops.subpixel_refine(score_raw, uv, valid)
        # Per-keypoint padded RAW patches via one-hot selector matmuls
        # (ops/orb_descriptor.py "Fast TPU path"). Orientation +
        # descriptors are deferred and computed ONCE over all levels'
        # keypoints: 8 skinny per-level GEMMs (N ~ 50-220 each) become a
        # single 1000-row GEMM that actually fills the MXU.
        patches_all.append(extract_patches(lv_img, uv, half=HALF_PATCH + BLUR_PAD))
        # Exact level->base coordinate mapping. Bilinear resize uses the
        # half-pixel-centers convention: level pixel p sits at base
        # coordinate (p + 0.5) * (base/level) - 0.5, NOT p * scale. The
        # naive p*scale (which the reference uses, ORBextractor.cc:1098)
        # biases coarse-level keypoints by (scale-1)/2 px (up to ~1.3 px
        # at level 7); because the observation level of a landmark
        # changes with viewing distance, that per-level bias turns into
        # a systematic radial drift under forward motion.
        lh, lw = lv_img.shape
        sx = img.shape[1] / lw
        sy = img.shape[0] / lh
        uv_base = jnp.stack(
            [(uv[:, 0] + 0.5) * sx - 0.5, (uv[:, 1] + 0.5) * sy - 0.5], axis=-1
        )
        uv_all.append(jnp.where(valid[:, None], uv_base, 0.0))
        lvl_all.append(jnp.full((uv.shape[0],), lvl, dtype=jnp.int32))
        score_all.append(s)
        valid_all.append(valid)

    patches_raw = jnp.concatenate(patches_all, axis=0)  # (N_total, 37, 37)
    valid = jnp.concatenate(valid_all, axis=0)
    # The IC angle is a patch moment matmul on the raw center; the BRIEF
    # pre-blur (ORBextractor.cc:1105) runs inside the padded patch;
    # steered BRIEF is one one-hot sampling matmul over 32 quantized
    # orientations — all levels in one shot.
    ang = ic_angle_from_patches(
        patches_raw[:, BLUR_PAD:-BLUR_PAD, BLUR_PAD:-BLUR_PAD], valid
    )
    desc = binned_brief(blur_patches(patches_raw), ang, valid)

    feats = Features(
        uv=jnp.concatenate(uv_all, axis=0),
        level=jnp.concatenate(lvl_all, axis=0),
        angle=ang,
        score=jnp.concatenate(score_all, axis=0),
        desc=desc,
        valid=valid,
    )

    # Pad / trim to the fixed capacity.
    k = cfg.max_keypoints
    n = feats.uv.shape[0]
    if n < k:
        pad = k - n
        feats = Features(
            uv=jnp.pad(feats.uv, ((0, pad), (0, 0))),
            level=jnp.pad(feats.level, (0, pad)),
            angle=jnp.pad(feats.angle, (0, pad)),
            score=jnp.pad(feats.score, (0, pad)),
            desc=jnp.pad(feats.desc, ((0, pad), (0, 0))),
            valid=jnp.pad(feats.valid, (0, pad)),
        )
    elif n > k:
        # Keep the strongest overall (never triggers with default config:
        # sum(quotas) == n_features <= max_keypoints).
        key = jnp.where(feats.valid, feats.score, -jnp.inf)
        _, idx = jax.lax.top_k(key, k)
        feats = jax.tree.map(lambda a: a[idx], feats)
    return feats
