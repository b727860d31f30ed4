"""Multi-view geometry dynamic-pixel mask (DynaSLAM method).

TPU-native equivalent of Geometry::GeometricModelCorrection
(perfect/src/Geometry.cc:50-518): keep a ring buffer of recent keyframe
views; for the current frame, pick the `geom_ref_frames` best reference
views by a 0.7*distance + 0.3*rotation score (Geometry.cc:83-127);
backproject each reference keypoint with its depth, reproject into the
current frame, and flag it dynamic when the projected depth exceeds the
measured depth by more than `geom_depth_diff_th` with low local depth
variance (Geometry.cc:136-471: depth 0-6 m in the reference view,
parallax < 30 deg, reprojection < 7 m, 20x20 patch stats); then grow
each dynamic seed over the depth image (DepthRegionGrowing,
Geometry.cc:475-518 — realized as a fixed-iteration masked dilation
conditioned on depth similarity) and dilate.

The reference's per-point nested loops become one batched gather/compare
over (R reference views x K keypoints) (SURVEY.md §7 stage 3). Unlike
the reference, nothing is hardcoded to 640x480 (Geometry.cc:16-27).

Returns (H, W) bool — True = STATIC.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import CameraConfig, DynamicConfig
from orb_slam2_ssd_semantic_tpu.geometry import camera as cam_ops
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.ops import image as image_ops


class GeomRefViews(NamedTuple):
    """Fixed-capacity ring buffer of reference views (Geometry.h:19
    vector<DynKeyFrame>, size 20)."""

    T_cw: jnp.ndarray  # (D, 4, 4)
    uv: jnp.ndarray  # (D, K, 2) keypoint pixel coords
    depth: jnp.ndarray  # (D, K) keypoint depths
    kp_valid: jnp.ndarray  # (D, K)
    valid: jnp.ndarray  # (D,)
    cursor: jnp.ndarray  # () int32 ring position


def empty_ref_views(db_size: int, max_kps: int) -> GeomRefViews:
    return GeomRefViews(
        T_cw=jnp.tile(jnp.eye(4, dtype=jnp.float32), (db_size, 1, 1)),
        uv=jnp.zeros((db_size, max_kps, 2), jnp.float32),
        depth=jnp.zeros((db_size, max_kps), jnp.float32),
        kp_valid=jnp.zeros((db_size, max_kps), bool),
        valid=jnp.zeros((db_size,), bool),
        cursor=jnp.int32(0),
    )


@jax.jit
def insert_ref_view(db: GeomRefViews, T_cw, uv, depth, kp_valid) -> GeomRefViews:
    """Ring-buffer insert (GeometricModelUpdateDB, Geometry.cc:532-546)."""
    i = db.cursor % db.valid.shape[0]
    return GeomRefViews(
        T_cw=db.T_cw.at[i].set(T_cw),
        uv=db.uv.at[i].set(uv),
        depth=db.depth.at[i].set(depth),
        kp_valid=db.kp_valid.at[i].set(kp_valid),
        valid=db.valid.at[i].set(True),
        cursor=db.cursor + 1,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "cam", "n_refs"))
def geometry_dynamic_mask(
    db: GeomRefViews,
    T_cw: jnp.ndarray,
    depth_img: jnp.ndarray,
    cam: CameraConfig,
    cfg: DynamicConfig = DynamicConfig(),
    n_refs: int | None = None,
) -> jnp.ndarray:
    """(H, W) bool static mask for the current frame."""
    h, w = depth_img.shape
    R = n_refs or cfg.geom_ref_frames

    # ---- pick reference views by 0.7*dist + 0.3*rot (Geometry.cc:83-127)
    T_wc = se3.se3_inverse(T_cw)
    centers = -jnp.einsum("dij,dj->di", jnp.swapaxes(db.T_cw[:, :3, :3], 1, 2), db.T_cw[:, :3, 3])
    c_cur = T_wc[:3, 3]
    dist = jnp.linalg.norm(centers - c_cur, axis=-1)
    rel_R = db.T_cw[:, :3, :3] @ T_wc[:3, :3]
    tr = rel_R[:, 0, 0] + rel_R[:, 1, 1] + rel_R[:, 2, 2]
    rot = jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))
    score = 0.7 * dist + 0.3 * rot
    score = jnp.where(db.valid, score, jnp.inf)
    _, ref_ids = jax.lax.top_k(-score, R)
    ref_ok = jnp.isfinite(score[ref_ids])

    # ---- batched backproject/reproject (Geometry.cc:136-471) -------------
    uv_r = db.uv[ref_ids]  # (R, K, 2)
    d_r = db.depth[ref_ids]  # (R, K)
    kv_r = db.kp_valid[ref_ids] & ref_ok[:, None]
    T_r = db.T_cw[ref_ids]

    pts_c = cam_ops.backproject(uv_r, d_r, cam)  # (R, K, 3) in ref cams
    T_cur_from_ref = T_cw[None] @ jax.vmap(se3.se3_inverse)(T_r)
    pc = se3.transform_points(T_cur_from_ref, pts_c)  # (R, K, 3) in cur cam
    uv_c, z_proj = cam_ops.project(pc, cam)

    usable = (
        kv_r
        & (d_r > 1e-3)
        & (d_r < cfg.geom_max_ref_depth)  # Geometry.cc:171
        & (z_proj > 1e-3)
        & (z_proj < cfg.geom_max_cur_depth)  # Geometry.cc:301
        & cam_ops.in_image(uv_c, cam, border=cfg.geom_border)  # cc:586-593
    )

    # Parallax gate (Geometry.cc:211-228): angle between the two viewing
    # rays of the 3D point.
    ref_centers = centers[ref_ids]  # (R, 3)
    pts_w = se3.transform_points(jax.vmap(se3.se3_inverse)(T_r), pts_c)
    v1 = pts_w - ref_centers[:, None, :]
    v2 = pts_w - c_cur[None, None, :]
    cosang = jnp.sum(v1 * v2, axis=-1) / (
        jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1) + 1e-9
    )
    max_par = jnp.cos(jnp.deg2rad(cfg.geom_max_parallax_deg))
    usable = usable & (cosang > max_par)

    # Measured depth at the reprojection (patch stats over geom_patch_size
    # via pre-filtered mean/variance maps — the batched equivalent of the
    # reference's per-point 20x20 scan, Geometry.cc:378-461).
    valid_d = (depth_img > 1e-3).astype(jnp.float32)
    p = cfg.geom_patch_size | 1  # odd
    mean_num = image_ops.box_filter(depth_img * valid_d, p)
    mean_den = image_ops.box_filter(valid_d, p)
    mean_map = mean_num / jnp.maximum(mean_den, 1e-6)
    var_num = image_ops.box_filter((depth_img - mean_map) ** 2 * valid_d, p)
    var_map = var_num / jnp.maximum(mean_den, 1e-6)

    d_meas, meas_ok = image_ops.nearest_sample(depth_img, uv_c)
    var_at, _ = image_ops.nearest_sample(var_map, uv_c)

    # Dynamic: projected depth exceeds measured by > threshold (an object
    # moved in front of the old surface) with consistent local depth.
    dynamic_pt = (
        usable
        & meas_ok
        & (d_meas > 1e-3)
        & ((z_proj - d_meas) > cfg.geom_depth_diff_th)
        & (var_at < cfg.geom_patch_var_th)
    )

    # ---- seed mask + depth-similarity region growing ----------------------
    seeds = jnp.zeros((h, w), bool)
    xi = jnp.round(uv_c[..., 0]).astype(jnp.int32)
    yi = jnp.round(uv_c[..., 1]).astype(jnp.int32)
    xi = jnp.where(dynamic_pt, jnp.clip(xi, 0, w - 1), w)  # OOB -> dropped
    yi = jnp.where(dynamic_pt, jnp.clip(yi, 0, h - 1), h)
    seeds = seeds.at[yi.reshape(-1), xi.reshape(-1)].set(True, mode="drop")
    seed_depth = jnp.zeros((h, w), jnp.float32).at[
        yi.reshape(-1), xi.reshape(-1)
    ].set(d_meas.reshape(-1), mode="drop")

    def grow(_, carry):
        mask, ref_d = carry
        # 3x3 dilation of (mask, its reference depth).
        mp = jnp.pad(mask.astype(jnp.float32), 1)
        dp = jnp.pad(ref_d, 1)
        new_mask = mask
        new_ref = ref_d
        for dy in range(3):
            for dx in range(3):
                nb_m = jax.lax.dynamic_slice(mp, (dy, dx), (h, w)) > 0.5
                nb_d = jax.lax.dynamic_slice(dp, (dy, dx), (h, w))
                ok = (
                    nb_m
                    & (depth_img > 1e-3)
                    & (jnp.abs(depth_img - nb_d) < cfg.geom_grow_threshold)
                )
                new_mask = new_mask | ok
                new_ref = jnp.where(ok & (new_ref == 0.0), depth_img, new_ref)
        return new_mask, new_ref

    grown, _ = jax.lax.fori_loop(0, cfg.geom_grow_iters, grow, (seeds, seed_depth))
    dynamic = image_ops.dilate(grown, max(3, cfg.geom_dilate_kernel // 4), iterations=1)
    return ~dynamic
