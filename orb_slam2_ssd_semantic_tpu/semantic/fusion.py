"""2D-detection -> 3D-cluster fusion.

Two schemes, mirroring the reference:

1. `fuse_depth_window` — Merge2d3d (perfect/src/Merge2d3d.cc:30-131):
   for each detection above the probability gate (0.54, Merge2d3d.cc:48),
   take the mean depth over the central 30-70% of the box, gather pixels
   whose depth lies within +-0.2 m of it over the central 20-80%,
   backproject to world, and reduce to centroid + extents. The
   reference's PCL voxel + statistical-outlier filters become a depth
   inlier band plus a robust (percentile-free) trimmed reduction.

2. `segment_objects` — the MergeSG direction (perfect/src/MergeSG.cc):
   organized plane removal + connected-component clustering on the
   depth/normal image, then greedy matching of detection boxes to
   cluster ROIs by IoU (findMaxIntersectionRelationships,
   MergeSG.cc:164-290). Implemented as dense label propagation —
   fixed-iteration min-pooling over a connectivity mask — instead of
   PCL's pointer-based region growing.

Both emit fixed-capacity candidate clusters for ObjectDB.add_objects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import CameraConfig, SemanticConfig
from orb_slam2_ssd_semantic_tpu.geometry import camera as cam_ops
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.ops import image as image_ops
from orb_slam2_ssd_semantic_tpu.semantic.detector import Detections


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def fuse_depth_window(
    det: Detections,
    depth_img: jnp.ndarray,
    T_cw: jnp.ndarray,
    cam: CameraConfig,
    cfg: SemanticConfig = SemanticConfig(),
):
    """Per-detection 3D clusters via the depth-window rule.

    Returns (centroids (D,3) world, sizes (D,3), probs (D,), classes (D,),
    valid (D,)).
    """
    h, w = depth_img.shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    T_wc = se3.se3_inverse(T_cw)

    def one(box, score, cls, ok):
        x1, y1, x2, y2 = box
        bw = jnp.maximum(x2 - x1, 1.0)
        bh = jnp.maximum(y2 - y1, 1.0)
        # Central 30-70% window for the depth estimate (Merge2d3d.cc:55-78).
        in_mid = (
            (xs >= x1 + 0.3 * bw) & (xs <= x1 + 0.7 * bw)
            & (ys >= y1 + 0.3 * bh) & (ys <= y1 + 0.7 * bh)
            & (depth_img > 1e-3)
        )
        n_mid = jnp.maximum(jnp.sum(in_mid), 1.0)
        d_mean = jnp.sum(depth_img * in_mid) / n_mid
        # Collection region: central 20-80%, depth within +-window
        # (Merge2d3d.cc:79-97).
        in_box = (
            (xs >= x1 + 0.2 * bw) & (xs <= x1 + 0.8 * bw)
            & (ys >= y1 + 0.2 * bh) & (ys <= y1 + 0.8 * bh)
            & (jnp.abs(depth_img - d_mean) < cfg.fusion_depth_window)
            & (depth_img > 1e-3)
        )
        n = jnp.sum(in_box)
        sel = in_box.astype(jnp.float32)
        # Backproject the selected pixels (organized cloud).
        zc = depth_img
        xc = (xs - cam.cx) / cam.fx * zc
        yc = (ys - cam.cy) / cam.fy * zc
        pts_c = jnp.stack([xc, yc, zc], axis=-1)
        pts_w = se3.transform_points(T_wc, pts_c.reshape(-1, 3)).reshape(h, w, 3)
        n_safe = jnp.maximum(n, 1.0)
        centroid = jnp.sum(pts_w * sel[..., None], axis=(0, 1)) / n_safe
        # Extents via selected min/max (Merge2d3d.cc:114-131).
        big = 1e9
        mins = jnp.min(jnp.where(sel[..., None] > 0, pts_w, big), axis=(0, 1))
        maxs = jnp.max(jnp.where(sel[..., None] > 0, pts_w, -big), axis=(0, 1))
        size = jnp.maximum(maxs - mins, 0.0)
        good = ok & (score > cfg.fusion_prob_threshold) & (n > 50)
        return centroid, size, good

    centroids, sizes, good = jax.vmap(one)(det.boxes, det.scores, det.classes, det.valid)
    return centroids, sizes, det.scores, det.classes, good


@functools.partial(jax.jit, static_argnames=("cfg", "n_iters"))
def segment_objects(
    depth_img: jnp.ndarray,
    cfg: SemanticConfig = SemanticConfig(),
    n_iters: int = 64,
):
    """Object-candidate segmentation on the organized depth image:

    1. connected components over depth-continuous valid pixels (iterated
       4-neighbor label min-propagation — the dense-array equivalent of
       PCL's euclidean cluster extraction, MergeSG.cc:367-408);
    2. per-component plane test: components that are large (>= the
       reference's 10000-inlier plane gate, MergeSG.cc:29-31) AND
       geometrically thin (smallest covariance eigenvalue ~ plane
       thickness) are removed as walls/floor (segmentPlanes equivalent);
    3. small fragments below the cluster-size gate are dropped.

    Returns labels (H, W) int32 with -1 = background/plane.
    """
    h, w = depth_img.shape
    valid = depth_img > 1e-3
    idx = (jnp.arange(h * w, dtype=jnp.int32).reshape(h, w) + 1) * valid

    def prop(_, lab):
        out = lab
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            nb = jnp.roll(lab, (dy, dx), (0, 1))
            nb_d = jnp.roll(depth_img, (dy, dx), (0, 1))
            ok = valid & (nb > 0) & (jnp.abs(nb_d - depth_img) < 0.05)
            out = jnp.where(ok & (nb < out), nb, out)
        return jnp.where(valid, out, 0)

    labels = jax.lax.fori_loop(0, n_iters, prop, idx)

    # Per-component statistics in a hashed label space (few components;
    # collisions only merge statistics, erring toward removal).
    B = 4096
    hid = jnp.where(valid, labels % B, B)
    flat = hid.reshape(-1)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    # 3D points in camera frame (unit-focal backprojection is fine for
    # the planarity test).
    X = jnp.stack([xs / w * depth_img, ys / h * depth_img, depth_img], -1)
    ones = jnp.ones((h, w), jnp.float32)

    def comp_sum(val):
        return jnp.zeros((B + 1,), jnp.float32).at[flat].add(val.reshape(-1))

    n = comp_sum(ones * valid)
    sums = jnp.stack([comp_sum(X[..., i] * valid) for i in range(3)], -1)  # (B+1, 3)
    mean = sums / jnp.maximum(n[:, None], 1.0)
    # Second moments for covariance.
    mom = jnp.stack(
        [comp_sum(X[..., i] * X[..., j] * valid) for i in range(3) for j in range(3)],
        -1,
    ).reshape(B + 1, 3, 3)
    cov = mom / jnp.maximum(n[:, None, None], 1.0) - mean[:, :, None] * mean[:, None, :]
    eig = jnp.linalg.eigvalsh(cov + 1e-9 * jnp.eye(3))
    thickness = jnp.sqrt(jnp.maximum(eig[:, 0], 0.0))

    is_plane = (n > cfg.seg_min_plane_inliers) & (thickness < 0.02)
    too_small = n < cfg.seg_min_cluster_size / 4
    drop = is_plane | too_small
    keep = ~drop[jnp.clip(hid, 0, B)]
    return jnp.where(valid & keep, labels - 1, -1)


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def fuse_segmentation(
    det: Detections,
    depth_img: jnp.ndarray,
    T_cw: jnp.ndarray,
    cam: CameraConfig,
    cfg: SemanticConfig = SemanticConfig(),
):
    """MergeSG-style fusion: segment clusters, then assign each detection
    the cluster with maximal overlap of its box (score IoU-like,
    MergeSG.cc:270-290), producing world-frame clusters."""
    h, w = depth_img.shape
    labels = segment_objects(depth_img, cfg)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    T_wc = se3.se3_inverse(T_cw)
    zc = depth_img
    xc = (xs - cam.cx) / cam.fx * zc
    yc = (ys - cam.cy) / cam.fy * zc
    pts_w = se3.transform_points(
        T_wc, jnp.stack([xc, yc, zc], -1).reshape(-1, 3)
    ).reshape(h, w, 3)

    def one(box, score, cls, ok):
        x1, y1, x2, y2 = box
        in_box = (xs >= x1) & (xs <= x2) & (ys >= y1) & (ys <= y2) & (labels >= 0)
        # Dominant cluster label inside the box: mode via histogram over a
        # hashed label space (labels are raster ids; hash to 1024 bins).
        hashed = jnp.where(in_box, labels % 1024, 1024)
        counts = jnp.zeros((1025,), jnp.int32).at[hashed.reshape(-1)].add(1)
        best_bin = jnp.argmin(jnp.where(jnp.arange(1025) < 1024, -counts, 1))
        sel = in_box & (labels % 1024 == best_bin)
        n = jnp.sum(sel)
        n_safe = jnp.maximum(n, 1.0)
        centroid = jnp.sum(pts_w * sel[..., None], axis=(0, 1)) / n_safe
        big = 1e9
        mins = jnp.min(jnp.where(sel[..., None] > 0, pts_w, big), axis=(0, 1))
        maxs = jnp.max(jnp.where(sel[..., None] > 0, pts_w, -big), axis=(0, 1))
        size = jnp.maximum(maxs - mins, 0.0)
        good = ok & (score > cfg.fusion_prob_threshold) & (n > cfg.seg_min_cluster_size // 4)
        return centroid, size, good

    centroids, sizes, good = jax.vmap(one)(det.boxes, det.scores, det.classes, det.valid)
    return centroids, sizes, det.scores, det.classes, good
