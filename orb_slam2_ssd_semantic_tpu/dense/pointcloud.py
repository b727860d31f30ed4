"""Per-keyframe point-cloud generation and ground-plane splitting.

Equivalent of MapDrawer::GeneratePointCloud (perfect/src/MapDrawer.cc:
641-939): build an organized world-frame cloud from the keyframe's
depth/RGB payload with the reference's gates (depth 0.5-4 m, |y| < 3 m,
stride decimation), then split ground from non-ground with a RANSAC
perpendicular-to-gravity plane fit (200 iters, 0.04 m inliers, offset
|d| > 0.07 — MapDrawer.cc:849-939). All hypotheses are scored in one
batched residual matrix (vmapped), replacing PCL's SACSegmentation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import CameraConfig, DenseMapConfig
from orb_slam2_ssd_semantic_tpu.geometry import se3


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def keyframe_cloud(
    depth_img: jnp.ndarray,
    T_cw: jnp.ndarray,
    cam: CameraConfig,
    cfg: DenseMapConfig = DenseMapConfig(),
    gray_img: jnp.ndarray | None = None,
):
    """(N, 3) world points + valid mask (+ (N, 3) colors) from a
    stride-decimated organized depth image."""
    s = cfg.cloud_stride
    d = depth_img[::s, ::s]
    h, w = d.shape
    ys = (jnp.arange(h, dtype=jnp.float32) * s)[:, None]
    xs = (jnp.arange(w, dtype=jnp.float32) * s)[None, :]
    z = d
    x = (xs - cam.cx) / cam.fx * z
    y = (ys - cam.cy) / cam.fy * z
    ok = (
        (z > cfg.cloud_min_depth)
        & (z < cfg.cloud_max_depth)
        & (jnp.abs(y) < cfg.cloud_max_y)  # MapDrawer.cc:799
    )
    pts_c = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    T_wc = se3.se3_inverse(T_cw)
    pts_w = se3.transform_points(T_wc, pts_c)
    if gray_img is not None:
        g = gray_img[::s, ::s].reshape(-1)
        colors = jnp.stack([g, g, g], axis=-1)
        return pts_w, ok.reshape(-1), colors
    return pts_w, ok.reshape(-1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def split_ground(
    pts_w: jnp.ndarray,
    valid: jnp.ndarray,
    key: jnp.ndarray,
    up_axis: int = 1,
    cfg: DenseMapConfig = DenseMapConfig(),
):
    """RANSAC ground split. Returns (is_ground (N,), plane (4,)).

    The plane is constrained near-perpendicular to the gravity axis
    (SACMODEL_PERPENDICULAR_PLANE with the y axis, MapDrawer.cc:855-866)
    by sampling heights along `up_axis` and fitting axis-aligned planes
    y = h; a ground plane must additionally sit away from the origin
    (|d| > ground_min_offset, MapDrawer.cc:900-905)."""
    N = pts_w.shape[0]
    S = cfg.ground_ransac_iters
    hkeys = jax.random.split(key, S)
    # Hypotheses: the up-coordinate of a random valid point.
    logits = jnp.where(valid, 0.0, -1e9)
    idx = jax.vmap(lambda k: jax.random.categorical(k, logits))(hkeys)
    heights = pts_w[idx, up_axis]  # (S,)
    resid = jnp.abs(pts_w[None, :, up_axis] - heights[:, None])  # (S, N)
    inl = (resid < cfg.ground_inlier_threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    # Valid ground hypotheses are far enough from the camera plane.
    counts = jnp.where(jnp.abs(heights) > cfg.ground_min_offset, counts, -1)
    best = jnp.argmax(counts)
    h_best = heights[best]
    is_ground = (jnp.abs(pts_w[:, up_axis] - h_best) < cfg.ground_inlier_threshold) & valid
    normal = jnp.zeros((3,), jnp.float32).at[up_axis].set(1.0)
    plane = jnp.concatenate([normal, -h_best[None]])
    # If no hypothesis qualified, report nothing as ground.
    ok = counts[best] > 0
    return jnp.where(ok, is_ground, False), plane
