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
import numpy as np

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


def _camera_cloud(depth_img, cam: CameraConfig):
    h, w = depth_img.shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    zc = depth_img
    xc = (xs - cam.cx) / cam.fx * zc
    yc = (ys - cam.cy) / cam.fy * zc
    return jnp.stack([xc, yc, zc], -1)  # (H, W, 3)


def fuse_detections(
    det: Detections,
    depth_img: jnp.ndarray,
    T_cw: jnp.ndarray,
    cam: CameraConfig,
    cfg: SemanticConfig = SemanticConfig(),
):
    """The engine's keyframe fusion entry: dispatches on
    `cfg.fusion_scheme` — "depth_window" (Merge2d3d) or "merge_sg"
    (the scheme the reference compiles in, MapDrawer.cc:79)."""
    if cfg.fusion_scheme == "merge_sg":
        return fuse_segmentation(det, depth_img, T_cw, cam, cfg)
    return fuse_depth_window(det, depth_img, T_cw, cam, cfg)


@functools.partial(jax.jit, static_argnames=("cam",))
def estimate_normals(depth_img: jnp.ndarray, cam: CameraConfig):
    """Organized surface normals: cross product of the organized cloud's
    horizontal/vertical tangents — the TPU analogue of PCL's
    integral-image normal estimation (MergeSG::estimateNormal,
    MergeSG.cc:322-336): both approximate the local tangent plane
    straight from the image grid, no neighbor search.

    Returns (normals (H, W, 3) unit, valid (H, W))."""
    P = _camera_cloud(depth_img, cam)
    dx = jnp.roll(P, -1, axis=1) - jnp.roll(P, 1, axis=1)
    dy = jnp.roll(P, -1, axis=0) - jnp.roll(P, 1, axis=0)
    n = jnp.cross(dy, dx)
    nn = jnp.linalg.norm(n, axis=-1)
    valid = (
        (depth_img > 1e-3)
        & (jnp.abs(dx[..., 2]) < 0.1)
        & (jnp.abs(dy[..., 2]) < 0.1)
        & (nn > 1e-9)
    )
    n = n / jnp.maximum(nn, 1e-9)[..., None]
    # Orient toward the camera (z component negative in camera frame).
    flip = jnp.sum(n * P, axis=-1) > 0
    n = jnp.where(flip[..., None], -n, n)
    return n, valid


# 26 quantization directions for plane-normal binning: all sign/axis
# combinations of {-1,0,1}^3 minus the origin, normalized.
_DIRS = np.array(
    [
        (i, j, k)
        for i in (-1, 0, 1)
        for j in (-1, 0, 1)
        for k in (-1, 0, 1)
        if (i, j, k) != (0, 0, 0)
    ],
    np.float32,
)
_DIRS /= np.linalg.norm(_DIRS, axis=1, keepdims=True)
_N_DIRS = len(_DIRS)  # 26
_D_BINS = 128  # plane-offset bins
_D_RANGE = 8.0  # meters


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def segment_planes(
    depth_img: jnp.ndarray,
    cam: CameraConfig,
    cfg: SemanticConfig = SemanticConfig(),
):
    """Organized multi-plane segmentation (MergeSG::segmentPlanes,
    MergeSG.cc:338-365, PCL OrganizedMultiPlaneSegmentation equivalent):
    every pixel votes its local plane (quantized normal direction x
    plane offset d = n.p) into a (26, 128) Hough-style accumulator; bins
    with >= seg_min_plane_inliers supporters are planes and their
    supporting pixels are masked out. One histogram pass instead of
    region growing — same angular/distance-threshold semantics, fully
    parallel.

    Returns (plane_mask (H, W) bool, normals, normal_valid)."""
    normals, nvalid = estimate_normals(depth_img, cam)
    P = _camera_cloud(depth_img, cam)
    dirs = jnp.asarray(_DIRS)  # (26, 3)
    dots = jnp.einsum("hwc,dc->hwd", normals, dirs)
    dbin = jnp.argmax(dots, axis=-1)  # (H, W)
    # Angular gate ~ the comparator's angular threshold (2-3 deg in PCL;
    # quantization to 26 dirs is coarser — the offset bin disambiguates).
    ang_ok = jnp.max(dots, axis=-1) > 0.9
    off = jnp.sum(normals * P, axis=-1)  # signed plane offset
    obin = jnp.clip(
        ((off / _D_RANGE + 1.0) * 0.5 * _D_BINS).astype(jnp.int32), 0, _D_BINS - 1
    )
    ok = nvalid & ang_ok
    flat_bin = jnp.where(ok, dbin * _D_BINS + obin, _N_DIRS * _D_BINS)
    hist = jnp.zeros((_N_DIRS * _D_BINS + 1,), jnp.int32).at[
        flat_bin.reshape(-1)
    ].add(1)
    is_plane_bin = hist >= cfg.seg_min_plane_inliers
    plane_mask = ok & is_plane_bin[flat_bin]
    return plane_mask, normals, nvalid


@functools.partial(jax.jit, static_argnames=("cam", "cfg", "n_iters"))
def segment_objects(
    depth_img: jnp.ndarray,
    cam: CameraConfig = CameraConfig(),
    cfg: SemanticConfig = SemanticConfig(),
    n_iters: int = 64,
):
    """Object-candidate segmentation on the organized depth image
    (MergeSG::segment, MergeSG.cc:295-408):

    1. organized multi-plane segmentation removes walls/floor/desk
       surfaces (segment_planes above);
    2. connected components over the remaining depth-continuous pixels
       (iterated 4-neighbor label min-propagation — the dense-array
       equivalent of PCL's euclidean cluster comparator with the
       reference's 0.01 m tolerance scaled to depth noise);
    3. fragments below the cluster-size gate are dropped.

    Returns labels (H, W) int32 with -1 = background/plane.
    """
    h, w = depth_img.shape
    plane_mask, _, _ = segment_planes(depth_img, cam, cfg)
    valid = (depth_img > 1e-3) & ~plane_mask
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

    # Size gate over a hashed label space.
    B = 4096
    hid = jnp.where(valid, labels % B, B)
    n = jnp.zeros((B + 1,), jnp.int32).at[hid.reshape(-1)].add(1)
    too_small = n < cfg.seg_min_cluster_size // 4
    keep = ~too_small[jnp.clip(hid, 0, B)]
    return jnp.where(valid & keep, labels - 1, -1)


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def fuse_segmentation(
    det: Detections,
    depth_img: jnp.ndarray,
    T_cw: jnp.ndarray,
    cam: CameraConfig,
    cfg: SemanticConfig = SemanticConfig(),
):
    """MergeSG fusion: plane-free euclidean clusters, each back-projected
    to its 2D ROI, greedily matched to detection boxes by the reference's
    score IoU x avgDiagonal / centerDistance
    (MergeSG::findMaxIntersectionRelationships + getMatch,
    MergeSG.cc:164-233, 270-290; each matched cluster is erased so two
    detections cannot claim one cluster, MergeSG.cc:231)."""
    h, w = depth_img.shape
    labels = segment_objects(depth_img, cam, cfg)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    T_wc = se3.se3_inverse(T_cw)
    pts_w = se3.transform_points(
        T_wc, _camera_cloud(depth_img, cam).reshape(-1, 3)
    ).reshape(h, w, 3)

    # Per-cluster stats over a hashed label space: pixel ROI (copyPointCloud
    # pixel coords + getProjectedROI, MergeSG.cc:241-267,452-463) and
    # world-frame extents.
    B = 1024
    hid = jnp.where(labels >= 0, labels % B, B).reshape(-1)
    big = jnp.float32(1e9)

    def smin(v):
        return jnp.full((B + 1,), big).at[hid].min(v.reshape(-1))

    def smax(v):
        return jnp.full((B + 1,), -big).at[hid].max(v.reshape(-1))

    def ssum(v):
        return jnp.zeros((B + 1,)).at[hid].add(v.reshape(-1))

    sel = (labels >= 0).astype(jnp.float32)
    cnt = ssum(sel)
    rx1, rx2 = smin(jnp.broadcast_to(xs, (h, w))), smax(jnp.broadcast_to(xs, (h, w)))
    ry1, ry2 = smin(jnp.broadcast_to(ys, (h, w))), smax(jnp.broadcast_to(ys, (h, w)))
    wmin = jnp.stack([smin(pts_w[..., i]) for i in range(3)], -1)  # (B+1, 3)
    wmax = jnp.stack([smax(pts_w[..., i]) for i in range(3)], -1)
    wsum = jnp.stack([ssum(pts_w[..., i] * sel) for i in range(3)], -1)
    cluster_ok = (cnt >= cfg.seg_min_cluster_size // 4) & (
        jnp.arange(B + 1) < B
    )

    def match_score(box, used):
        """(B+1,) reference match score of this detection vs every cluster."""
        x1, y1, x2, y2 = box
        ix1 = jnp.maximum(x1, rx1)
        iy1 = jnp.maximum(y1, ry1)
        ix2 = jnp.minimum(x2, rx2)
        iy2 = jnp.minimum(y2, ry2)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        area_b = jnp.maximum((x2 - x1) * (y2 - y1), 1.0)
        area_r = jnp.maximum((rx2 - rx1) * (ry2 - ry1), 0.0)
        iou = inter / jnp.maximum(area_b + area_r - inter, 1.0)
        diag_b = jnp.sqrt((x2 - x1) ** 2 + (y2 - y1) ** 2)
        diag_r = jnp.sqrt(
            jnp.maximum(rx2 - rx1, 0.0) ** 2 + jnp.maximum(ry2 - ry1, 0.0) ** 2
        )
        cbx, cby = (x1 + x2) / 2, (y1 + y2) / 2
        crx, cry = (rx1 + rx2) / 2, (ry1 + ry2) / 2
        dist = jnp.sqrt((cbx - crx) ** 2 + (cby - cry) ** 2)
        score = iou * 0.5 * (diag_b + diag_r) / jnp.maximum(dist, 1.0)
        return jnp.where(cluster_ok & ~used, score, -1.0)

    def greedy(used, inp):
        box, score, ok = inp
        s = match_score(box, used)
        j = jnp.argmax(s)
        good = ok & (score > cfg.fusion_prob_threshold) & (s[j] > 0.0)
        used = used.at[j].set(used[j] | good)
        n_safe = jnp.maximum(cnt[j], 1.0)
        centroid = wsum[j] / n_safe
        size = jnp.maximum(wmax[j] - wmin[j], 0.0)
        return used, (centroid, size, good)

    used0 = jnp.zeros((B + 1,), bool)
    _, (centroids, sizes, good) = jax.lax.scan(
        greedy, used0, (det.boxes, det.scores, det.valid)
    )
    return centroids, sizes, det.scores, det.classes, good
