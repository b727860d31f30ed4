"""Batched keyframe consumers: detection -> fusion -> object DB ->
occupancy, over a whole keyframe queue in one jitted program.

This is the SAME pipeline `SlamSystem._on_new_keyframe` runs per
keyframe (the reference's RunDetect thread + MapDrawer::UpdateOctomap
loop, SURVEY.md §3.4: RunDetect.cc:29-61, MapDrawer.cc:610-1025), in
the batch shape the offline bench wants: the whole keyframe queue's SSD
detection as ONE bf16 forward (batch fills the MXU; RunDetect.cc:44
processes its queue per wake), then a lax.scan over keyframes for
fusion + database merge + ground-split + raycast insertion. Parity with
the engine's per-keyframe path is pinned by
tests/test_semantic.py::test_batched_consume_matches_engine_path.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import SlamConfig


def make_batched_consume(cfg: SlamConfig, kf_frames, kf_slots,
                         grid_extent=(16.0, 4.0, 16.0),
                         grid_origin=(-2.0, 0.0, -2.0),
                         grid_resolution: float = 0.1,
                         detector=None):
    """Build a jitted `consume(g_dev, d_dev, T_cw_all, grid_lo, key)` ->
    `(grid_log_odds, n_detections (Q,), db)` over the keyframe queue.

    `kf_frames` (Q,) frame index of each queued keyframe into
    g_dev/d_dev; `kf_slots` (Q,) keyframe slot into T_cw_all. `key`
    seeds the per-keyframe ground-split RANSAC (the engine path's
    split_ground, MapDrawer.cc:849-939)."""
    from orb_slam2_ssd_semantic_tpu.dense.occupancy import (
        empty_grid,
        insert_scan,
    )
    from orb_slam2_ssd_semantic_tpu.dense.pointcloud import (
        keyframe_cloud,
        split_ground,
    )
    from orb_slam2_ssd_semantic_tpu.geometry import se3 as se3_ops
    from orb_slam2_ssd_semantic_tpu.semantic.detector import Detector
    from orb_slam2_ssd_semantic_tpu.semantic.fusion import fuse_detections
    from orb_slam2_ssd_semantic_tpu.semantic.object_db import (
        add_objects,
        empty_db,
    )

    det = detector or Detector(cfg.semantic)
    dense_cfg = dataclasses.replace(
        cfg.dense,
        max_ray_steps=int(cfg.dense.cloud_max_depth / grid_resolution) + 8,
    )
    kf_frames = np.asarray(kf_frames, np.int32)
    kf_slots = np.asarray(kf_slots, np.int32)

    @jax.jit
    def consume(g_dev, d_dev, T_cw_all, grid_lo, key):
        grid = empty_grid(extent=grid_extent, resolution=grid_resolution,
                          origin=grid_origin)
        grid = grid._replace(log_odds=grid_lo)

        # Detection: the WHOLE keyframe queue in one bf16 forward.
        fis = jnp.asarray(kf_frames)
        grays = g_dev[fis].astype(jnp.float32)
        rgbs = jnp.repeat(grays[..., None], 3, -1)
        dd = det._detect_batched(det.params, rgbs, g_dev.shape[1],
                                 g_dev.shape[2])
        ndet = dd.valid.sum(-1)

        db = empty_db(cfg.semantic.max_objects)

        def body(carry_in, inp):
            grid, db = carry_in
            i, fi, slot, k = inp
            depth = d_dev[fi].astype(jnp.float32) * 1e-3
            T_cw = T_cw_all[slot]
            det_i = jax.tree.map(lambda x: x[i], dd)
            cen, siz, prob, cls, ok = fuse_detections(
                det_i, depth, T_cw, cfg.camera, cfg.semantic)
            db = add_objects(db, cen, siz, prob, cls, ok)
            pts, valid = keyframe_cloud(depth, T_cw, cfg.camera, dense_cfg)
            # Ground split: ground points carve free space only
            # (MapDrawer.cc:946-1025 ground-ray handling) — the engine's
            # _on_new_keyframe runs the same split.
            is_ground, _ = split_ground(pts, valid, k, 1, dense_cfg)
            origin = se3_ops.se3_inverse(T_cw)[:3, 3]
            grid = insert_scan(grid, origin, pts, valid,
                               carve_only=is_ground, cfg=dense_cfg)
            return (grid, db), 0

        idx = jnp.arange(len(kf_frames), dtype=jnp.int32)
        keys = jax.random.split(key, len(kf_frames))
        (grid, db), _ = jax.lax.scan(
            body, (grid, db),
            (idx, jnp.asarray(kf_frames), jnp.asarray(kf_slots), keys),
        )
        return grid.log_odds, ndet, db

    return consume, det


def centroid_box_errors(db, gt_boxes) -> np.ndarray:
    """Per-valid-object distance (m) from its centroid to the NEAREST
    ground-truth axis-aligned box (0 inside the box)."""
    cen = np.asarray(db.centroid)
    valid = np.asarray(db.valid)
    gt = np.asarray(gt_boxes, np.float32)  # (G, 2, 3)
    errs = []
    for i in np.nonzero(valid)[0]:
        d = np.maximum(
            np.maximum(gt[:, 0] - cen[i][None], cen[i][None] - gt[:, 1]),
            0.0,
        )
        errs.append(float(np.sqrt((d ** 2).sum(-1)).min()))
    return np.asarray(errs, np.float32)


def gt_box_localization(db, gt_boxes, spurious_at: float = 0.3):
    """The bench's semantic accuracy metrics vs the known planted-object
    placements: per GT box, the distance from the NEAREST database
    object (did the pipeline find and localize every planted object?),
    plus the count of spurious objects (> `spurious_at` m from every GT
    box — detector false positives on clutter; the reference's
    ObjectDatabase accumulates these too, with no decay,
    ObjectDatabase.cc:145 TODO).

    Returns (per_gt_err (G,), n_spurious)."""
    cen = np.asarray(db.centroid)
    valid = np.asarray(db.valid)
    gt = np.asarray(gt_boxes, np.float32)  # (G, 2, 3)
    idx = np.nonzero(valid)[0]
    if len(idx) == 0:
        return np.full((len(gt),), np.inf, np.float32), 0
    c = cen[idx]  # (M, 3)
    d = np.maximum(
        np.maximum(gt[:, None, 0] - c[None], c[None] - gt[:, None, 1]), 0.0
    )  # (G, M, 3)
    dist = np.sqrt((d ** 2).sum(-1))  # (G, M)
    per_gt = dist.min(axis=1)
    n_spurious = int((dist.min(axis=0) > spurious_at).sum())
    return per_gt.astype(np.float32), n_spurious
