"""RGB-D tracking: frame build, motion-model tracking, local-map tracking,
keyframe creation — the engine's equivalent of the reference Tracking
thread (perfect/src/Tracking.cc:651-1190 GrabImageRGBD/Track), re-shaped
as a handful of jitted fixed-shape step functions sequenced by a thin
host loop (SURVEY.md §2.6 P1).

Pipeline per frame (mirrors Track(), Tracking.cc:875-1190):
  1. build_frame: ORB extraction + keypoint depth association
     (Frame ctor equivalent, Frame.cc:328-420 + ComputeStereoFromRGBD).
  2. track_motion_model: project last frame's keypoints (with depth)
     into the predicted pose and match in a window, then motion-only BA
     (TrackWithMotionModel, Tracking.cc:1911-2006).
  3. track_local_map: project candidate map points, guided-match, final
     pose refine; update visible/found statistics (TrackLocalMap,
     Tracking.cc:2108-2196 + SearchLocalPoints 2631).
  4. Keyframe decision + insertion with new-point spawning
     (NeedNewKeyFrame 2360 / CreateNewKeyFrame 2516).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.frontend.extractor import Features, extract, scale_factors
from orb_slam2_ssd_semantic_tpu.geometry import camera as cam_ops
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.mapping.map_state import SlamState, empty_state
from orb_slam2_ssd_semantic_tpu.ops import image as image_ops
from orb_slam2_ssd_semantic_tpu.ops import match as match_ops
from orb_slam2_ssd_semantic_tpu.tracking.pose_opt import pose_optimize
from orb_slam2_ssd_semantic_tpu.utils import precision


class Frame(NamedTuple):
    feats: Features
    kp_depth: jnp.ndarray  # (K,) float32, 0 = no depth
    obs_uvr: jnp.ndarray  # (K, 3) [u, v, uR] observation vector
    is_stereo: jnp.ndarray  # (K,) bool — has valid depth


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_frame(
    gray: jnp.ndarray,
    depth_img: jnp.ndarray,
    cfg: SlamConfig,
    static_mask: jnp.ndarray | None = None,
) -> Frame:
    """Frame construction. With a dynamic-filter mask, keypoints on
    dynamic pixels are invalidated — the behavioral equivalent of the
    reference's masked Frame ctor (Frame.cc:328-420), which re-extracts
    and drops masked keypoints — guarded by the >=65% static-area check
    (Frame.cc:357-374) so a degenerate mask never blanks the frame."""
    # Accept compact transfer dtypes (the host->device link is the
    # bottleneck at 30 Hz): uint8 gray, uint16 millimeter depth.
    if gray.dtype != jnp.float32:
        gray = gray.astype(jnp.float32)
    feats = extract(gray, cfg.orb)
    return frame_from_features(feats, depth_img, cfg, static_mask)


@functools.partial(jax.jit, static_argnames=("cfg",))
def frame_from_features(
    feats: Features,
    depth_img: jnp.ndarray,
    cfg: SlamConfig,
    static_mask: jnp.ndarray | None = None,
) -> Frame:
    """Frame construction from ALREADY-EXTRACTED (raw-pixel) features —
    the path that lets the stereo front end reuse its left-image
    extraction instead of extracting twice (the reference extracts once
    per image too: the stereo Frame ctor runs L/R extraction exactly
    once in two threads, Frame.cc:196-197)."""
    if depth_img.dtype == jnp.uint16:
        depth_img = depth_img.astype(jnp.float32) * 1e-3
    elif depth_img.dtype != jnp.float32:
        depth_img = depth_img.astype(jnp.float32)
    if static_mask is not None:
        ms, _ = image_ops.nearest_sample(static_mask.astype(jnp.float32), feats.uv)
        static_frac = jnp.mean(static_mask.astype(jnp.float32))
        apply = static_frac >= cfg.dynamic.min_static_area
        feats = feats._replace(valid=feats.valid & ((ms > 0.5) | ~apply))
    uv_ud = cam_ops.undistort_points(feats.uv, cfg.camera)
    feats = feats._replace(uv=jnp.where(feats.valid[:, None], uv_ud, 0.0))
    # Depth sampled at the SUBPIXEL keypoint location with the
    # discontinuity-aware bilinear sampler: nearest-pixel reads carry a
    # half-pixel positional bias that is several cm on grazing-angle
    # surfaces at range — a systematic error that dominated the r3
    # circuit's translation drift (see ops/image.robust_depth_sample).
    if cfg.tracking.subpixel_depth:
        d, dv = image_ops.robust_depth_sample(depth_img, feats.uv)
    else:
        d, dv = image_ops.nearest_sample(depth_img, feats.uv)
    kp_depth = jnp.where(feats.valid & dv & (d > 1e-6), d, 0.0)
    ur = cam_ops.stereo_right_u(feats.uv, kp_depth, cfg.camera)
    obs = jnp.concatenate([feats.uv, ur[:, None]], axis=-1)
    return Frame(feats, kp_depth, obs, kp_depth > 0)


class TrackResult(NamedTuple):
    T_cw: jnp.ndarray
    n_matches: jnp.ndarray  # matches fed to the optimizer
    n_inliers: jnp.ndarray  # inliers after optimization
    kp_point: jnp.ndarray  # (K,) int32 current keypoint -> map point id


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_motion_model(
    frame: Frame,
    last_frame: Frame,
    last_T_cw: jnp.ndarray,
    T_pred: jnp.ndarray,
    cfg: SlamConfig,
    map_pos: jnp.ndarray | None = None,
    map_valid: jnp.ndarray | None = None,
    last_kp_point: jnp.ndarray | None = None,
):
    """Frame-to-frame tracking seeded by the motion model.

    Keypoints of the last frame that are associated to map points use the
    MAP's (BA-refined) 3D — this anchors every frame to the map exactly
    like the reference, whose last-frame mvpMapPoints carry map geometry
    (TrackWithMotionModel, Tracking.cc:1911-2006). Unassociated keypoints
    fall back to depth backprojection at the last pose (the reference's
    temporal 'visual odometry' points, UpdateLastFrame Tracking.cc:1820).
    """
    cam = cfg.camera
    sf = scale_factors(cfg.orb)
    lf = last_frame.feats
    pts_c = cam_ops.backproject(lf.uv, last_frame.kp_depth, cam)
    T_wc_last = se3.se3_inverse(last_T_cw)
    pts_w = se3.transform_points(T_wc_last, pts_c)
    has3d = last_frame.is_stereo & lf.valid
    if map_pos is not None:
        P = map_pos.shape[0]
        assoc = (last_kp_point >= 0) & map_valid[jnp.clip(last_kp_point, 0, P - 1)]
        map_xyz = map_pos[jnp.clip(last_kp_point, 0, P - 1)]
        pts_w = jnp.where(assoc[:, None], map_xyz, pts_w)
        # Use ONLY map-anchored points when there are enough of them.
        # Mixing in depth-backprojected 'temporal' points (whose 3D
        # carries the last pose's error) creates two residual
        # populations; once drift exceeds the chi2 gate (~2.8 px) the
        # gate culls the map-anchored population wholesale and the
        # temporal one wins — pure error propagation with positive
        # feedback. Map-only observations make the motion-model stage
        # re-anchor to the (BA-refined) map every frame.
        enough = jnp.sum(assoc.astype(jnp.int32)) >= 100
        has3d = jnp.where(enough, assoc, has3d | assoc)

    radius = cfg.matcher.mm_search_radius * sf[jnp.clip(lf.level, 0, sf.shape[0] - 1)]

    # One match -> optimize round, exactly the reference structure
    # (TrackWithMotionModel: one SearchByProjection then PoseOptimization;
    # the association is re-done against the map in track_local_map).
    pc = se3.transform_points(T_pred, pts_w)
    centers, z = cam_ops.project(pc, cam)
    vis = has3d & (z > 0.05) & cam_ops.in_image(centers, cam)

    def match_r(r):
        return match_ops.match_by_window(
            lf.desc,
            frame.feats.desc,
            centers,
            frame.feats.uv,
            vis,
            frame.feats.valid,
            r,
            angle_q=lf.angle,
            angle_t=frame.feats.angle,
            max_dist=match_ops.TH_HIGH,
        )

    m = match_r(radius)
    # Doubled-window retry when matching is thin — the reference's
    # "if(nmatches<20) ... SearchByProjection(..., 2*th)"
    # (Tracking.cc:1960-1966): absorbs motion-prediction lag (e.g. the
    # damped velocity model under sustained rotation under-predicts by
    # ~15% of the per-frame motion).
    m = jax.lax.cond(
        jnp.sum(m.valid.astype(jnp.int32)) < cfg.tracking.min_matches_track,
        lambda: match_r(2.0 * radius),
        lambda: m,
    )
    tgt = jnp.clip(m.idx, 0, frame.feats.capacity - 1)
    obs = frame.obs_uvr[tgt]
    inv_sigma2 = 1.0 / (sf[jnp.clip(frame.feats.level[tgt], 0, sf.shape[0] - 1)] ** 2)
    res = pose_optimize(
        T_pred,
        pts_w,
        obs,
        inv_sigma2,
        frame.is_stereo[tgt],
        m.valid,
        cam,
        cfg.optimizer,
    )
    n_match = jnp.sum(m.valid.astype(jnp.int32))
    return res.T_cw, n_match, res.num_inliers


def track_reference_kf(state: SlamState, frame: Frame, last_T_cw, cfg: SlamConfig):
    """Appearance-based fallback when the motion model fails: match the
    frame's descriptors against the reference (newest) keyframe's
    map-point descriptors and optimize from the last pose —
    TrackReferenceKeyFrame (Tracking.cc:1756-1800) with
    ORBmatcher::SearchByBoW's 0.7 ratio + rotation-consistency gates
    (ORBmatcher.cc:217-376). The BoW bucketing is an inverted-index CPU
    trick; on the MXU the full (K, K) Hamming matrix is cheaper than the
    bookkeeping it saves."""
    cam = cfg.camera
    sf = scale_factors(cfg.orb)
    kf = state.last_kf
    P = state.points.pos.shape[0]
    pid = state.kfs.kp_point[kf]
    pidc = jnp.clip(pid, 0, P - 1)
    vk = state.kfs.kp_valid[kf] & (pid >= 0) & state.points.valid[pidc]
    dist = match_ops.hamming_matrix(state.kfs.desc[kf], frame.feats.desc)
    m = match_ops.masked_best_match(
        dist, vk[:, None] & frame.feats.valid[None, :],
        max_dist=match_ops.TH_LOW, ratio=0.7, mutual=True,
    )
    keep = match_ops.rotation_consistency_mask(
        state.kfs.angle[kf], frame.feats.angle, m
    )
    m = match_ops.MatchResult(
        idx=jnp.where(keep, m.idx, -1),
        dist=jnp.where(keep, m.dist, match_ops.BIG),
        valid=keep,
    )
    m = match_ops.resolve_duplicate_targets(m, frame.feats.capacity)
    tgt = jnp.clip(m.idx, 0, frame.feats.capacity - 1)
    obs = frame.obs_uvr[tgt]
    inv_sigma2 = 1.0 / (sf[jnp.clip(frame.feats.level[tgt], 0, sf.shape[0] - 1)] ** 2)
    res = pose_optimize(
        last_T_cw, state.points.pos[pidc], obs, inv_sigma2,
        frame.is_stereo[tgt], m.valid, cam, cfg.optimizer,
    )
    return res.T_cw, res.num_inliers


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_local_map(
    state: SlamState,
    frame: Frame,
    T_cur: jnp.ndarray,
    cfg: SlamConfig,
):
    """Refine pose against the map and associate keypoints to map points.

    Candidate selection projects ALL map points (fixed capacity) and
    keeps up to cfg.tracking.local_map_candidates in-frustum ones — the dense-masked
    equivalent of UpdateLocalPoints + SearchLocalPoints
    (Tracking.cc:2320-2357, 2631-2703)."""
    cam = cfg.camera
    sf = scale_factors(cfg.orb)
    pts = state.points
    # Candidate selection once (the frustum changes negligibly within the
    # per-frame correction), then one match -> optimize round against the
    # map — the reference's TrackLocalMap structure (SearchLocalPoints +
    # PoseOptimization, Tracking.cc:2108-2196).
    pc = se3.transform_points(T_cur, pts.pos)
    uv, z = cam_ops.project(pc, cam)
    dist = jnp.linalg.norm(pc, axis=-1)
    in_frustum = (
        pts.valid
        & (z > 0.05)
        & cam_ops.in_image(uv, cam)
        # Scale-invariance distance gate (MapPoint::PredictScale usage,
        # Tracking.cc:2680): allow margins like the reference (0.8/1.2).
        & (dist > 0.8 * pts.min_dist)
        & (dist < 1.3 * pts.max_dist)
    )

    # Fixed-size candidate gather (configurable; clamped to capacity).
    C = min(cfg.tracking.local_map_candidates, pts.pos.shape[0])
    score = in_frustum.astype(jnp.float32)
    _, cand = jax.lax.top_k(score, C)
    c_valid = in_frustum[cand]
    c_desc = pts.desc[cand]
    c_pos = pts.pos[cand]
    c_dist = dist[cand]
    c_maxd = pts.max_dist[cand]

    # Predicted pyramid level from distance (MapPoint::PredictScale,
    # MapPoint.cc:469-508): level = ceil(log(maxdist/d)/log(s)).
    ratio = jnp.maximum(c_maxd / jnp.maximum(c_dist, 1e-6), 1e-6)
    pred_level = jnp.clip(
        jnp.ceil(jnp.log(ratio) / jnp.log(cfg.orb.scale_factor)).astype(jnp.int32),
        0,
        cfg.orb.n_levels - 1,
    )
    radius = cfg.matcher.lm_search_radius * sf[pred_level]

    c_pc = se3.transform_points(T_cur, c_pos)
    c_uv, c_z = cam_ops.project(c_pc, cam)
    round_valid = c_valid & (c_z > 0.05) & cam_ops.in_image(c_uv, cam)
    m = match_ops.match_by_window(
        c_desc,
        frame.feats.desc,
        c_uv,
        frame.feats.uv,
        round_valid,
        frame.feats.valid,
        radius,
        max_dist=match_ops.TH_HIGH,
    )
    tgt = jnp.clip(m.idx, 0, frame.feats.capacity - 1)
    obs = frame.obs_uvr[tgt]
    inv_sigma2 = 1.0 / (sf[jnp.clip(frame.feats.level[tgt], 0, sf.shape[0] - 1)] ** 2)
    res = pose_optimize(
        T_cur,
        c_pos,
        obs,
        inv_sigma2,
        frame.is_stereo[tgt],
        m.valid,
        cam,
        cfg.optimizer,
    )

    # keypoint -> point id association for the (potential) new keyframe.
    # (targets are unique after resolve_duplicate_targets; invalid rows
    # scatter out-of-bounds and are dropped).
    K = frame.feats.capacity
    ok = m.valid & res.inliers
    kp_point = jnp.full((K,), -1, jnp.int32)
    kp_point = kp_point.at[jnp.where(ok, tgt, K)].set(
        cand.astype(jnp.int32), mode="drop"
    )

    # Tracking statistics (MapPoint::IncreaseVisible/Found,
    # Tracking.cc:2643-2672): visible per frustum, found per inlier match.
    vis_ids = jnp.where(c_valid, cand, state.points.pos.shape[0] - 1)
    n_visible = pts.n_visible.at[vis_ids].add(c_valid.astype(jnp.int32))
    found_ids = jnp.where(ok, cand, state.points.pos.shape[0] - 1)
    n_found = pts.n_found.at[found_ids].add(ok.astype(jnp.int32))
    state = state._replace(points=pts._replace(n_visible=n_visible, n_found=n_found))

    return state, TrackResult(res.T_cw, jnp.sum(m.valid.astype(jnp.int32)), res.num_inliers, kp_point)


def _spawn_points(state: SlamState, frame: Frame, T_cw: jnp.ndarray, kp_point, kf_id,
                  kf_uid, cfg: SlamConfig, spawn_all: bool = False):
    """Allocate map points for keypoints with depth and no association
    (CreateNewKeyFrame close-point spawning, Tracking.cc:2548-2605).
    With spawn_all=True, every valid-depth keypoint spawns a point — the
    StereoInitialization behavior (Tracking.cc:1415-1486)."""
    from orb_slam2_ssd_semantic_tpu.mapping.map_state import alloc_slots

    cam = cfg.camera
    sf = scale_factors(cfg.orb)
    K = frame.feats.capacity
    P = state.points.pos.shape[0]

    depth_ok = frame.kp_depth > 0
    if not spawn_all:
        # Close points always spawn; FAR points spawn by nearest-first
        # rank until min_far_spawn total points exist — the reference's
        # depth-sorted CreateNewKeyFrame rule ("create all close points,
        # and if fewer than 100, the 100 closest regardless",
        # Tracking.cc:2548-2605). Without it, far-wall views (every
        # tangential stretch of a room circuit) starve the map and
        # tracking collapses when the close-depth cone empties.
        close = depth_ok & (frame.kp_depth < cam.depth_threshold)
        candidate = frame.feats.valid & depth_ok & (kp_point < 0)
        order = jnp.argsort(
            jnp.where(candidate, frame.kp_depth, jnp.inf)
        )
        depth_rank = jnp.zeros((K,), jnp.int32).at[order].set(
            jnp.arange(K, dtype=jnp.int32)
        )
        n_spawn = cfg.tracking.max_new_points_per_kf
        depth_ok = close | (depth_rank < n_spawn)
    new_mask = frame.feats.valid & depth_ok & (kp_point < 0)
    # World positions.
    pts_c = cam_ops.backproject(frame.feats.uv, frame.kp_depth, cam)
    T_wc = se3.se3_inverse(T_cw)
    pts_w = se3.transform_points(T_wc, pts_c)
    cam_center = T_wc[:3, 3]

    # Allocation: the rank-th new point takes the rank-th free slot
    # (erase+reuse — culled slots return to circulation; map_state
    # docstring). Overflow ranks get slot P and scatter out of bounds.
    free = alloc_slots(state.points.valid, K)
    rank = jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    slot = free[jnp.clip(rank, 0, K - 1)]
    ok = new_mask & (slot < P)
    # Invalid entries scatter to index P (out of bounds) and are dropped.
    slot_safe = jnp.where(ok, slot, P)

    dist = jnp.linalg.norm(pts_w - cam_center, axis=-1)
    level = jnp.clip(frame.feats.level, 0, cfg.orb.n_levels - 1)
    max_dist = dist * sf[level]
    min_dist = max_dist / sf[-1]
    normal = (pts_w - cam_center) / jnp.maximum(dist, 1e-6)[:, None]

    pts = state.points
    pts = pts._replace(
        pos=pts.pos.at[slot_safe].set(pts_w, mode="drop"),
        desc=pts.desc.at[slot_safe].set(frame.feats.desc, mode="drop"),
        normal=pts.normal.at[slot_safe].set(normal, mode="drop"),
        min_dist=pts.min_dist.at[slot_safe].set(min_dist, mode="drop"),
        max_dist=pts.max_dist.at[slot_safe].set(max_dist, mode="drop"),
        n_obs=pts.n_obs.at[slot_safe].set(1, mode="drop"),
        n_visible=pts.n_visible.at[slot_safe].set(1, mode="drop"),
        n_found=pts.n_found.at[slot_safe].set(1, mode="drop"),
        ref_kf=pts.ref_kf.at[slot_safe].set(kf_id, mode="drop"),
        first_kf_uid=pts.first_kf_uid.at[slot_safe].set(kf_uid, mode="drop"),
        valid=pts.valid.at[slot_safe].set(True, mode="drop"),
    )
    n_new = jnp.sum(ok.astype(jnp.int32))
    kp_point = jnp.where(ok, slot, kp_point)
    return state._replace(points=pts, n_points=state.n_points + n_new), kp_point


@functools.partial(jax.jit, static_argnames=("cfg", "spawn_all"))
def insert_keyframe(
    state: SlamState,
    frame: Frame,
    T_cw: jnp.ndarray,
    kp_point: jnp.ndarray,
    frame_id,
    stamp,
    cfg: SlamConfig,
    spawn_all: bool = False,
) -> SlamState:
    """Write the frame into a free keyframe slot and spawn close points.

    Slot policy (erase+reuse, KeyFrame::SetBadFlag semantics): the lowest
    free slot is taken; if the keyframe store is FULL, the oldest
    keyframe (minimum uid, excluding the origin and the newest) is
    evicted ring-buffer style so tracking never halts — the reference
    instead grows without bound (SURVEY.md §7 hard part 1)."""
    from orb_slam2_ssd_semantic_tpu.mapping.map_state import alloc_slots

    kfs = state.kfs
    F = kfs.valid.shape[0]
    P = state.points.pos.shape[0]
    free = alloc_slots(kfs.valid, 1)[0]
    evict_score = jnp.where(
        kfs.valid & (jnp.arange(F) != state.last_kf) & (kfs.uid > 0),
        -kfs.uid, jnp.int32(-(2 ** 30)),
    )
    slot = jnp.where(free < F, free, jnp.argmax(evict_score)).astype(jnp.int32)
    was_valid = kfs.valid[slot]

    # Eviction retires a LIVE keyframe: record its spanning-tree link
    # (parent = strongest surviving covisible neighbor) in the retirement
    # ring and re-point orphaned landmarks at a surviving observer — the
    # same bookkeeping cull_keyframes does; without it, trajectory
    # entries referencing the evicted uid hit the broken-chain fallback
    # and loop corrections would rigidly carry its points with the slot's
    # NEW occupant's correction.
    from orb_slam2_ssd_semantic_tpu.mapping.map_state import (
        covisibility_row,
        push_retired,
    )

    def retire_evicted(state):
        covrow = covisibility_row(
            kfs.kp_point, kfs.valid.astype(jnp.float32), slot, P
        ).astype(jnp.float32)
        eligible = kfs.valid & (jnp.arange(F) != slot)
        par_sc = jnp.where(eligible, covrow, -1.0)
        parent = jnp.argmax(par_sc).astype(jnp.int32)
        parent = jnp.where(par_sc[parent] > 0, parent, state.last_kf)
        T_rel = kfs.T_cw[slot] @ se3.se3_inverse(kfs.T_cw[parent])
        retired = push_retired(
            state.retired,
            jnp.ones((1,), bool),
            kfs.uid[slot][None],
            kfs.uid[parent][None],
            T_rel[None],
        )
        # Surviving observer per point (excluding the evicted slot) for
        # ref_kf remapping of landmarks anchored on the evicted keyframe.
        tracked_all = (kfs.kp_point >= 0) & kfs.kp_valid
        surv_obs = jnp.where(
            (eligible[:, None] & tracked_all), kfs.kp_point, P
        ).reshape(-1)
        surv_ref = jnp.full((P + 1,), -1, jnp.int32).at[surv_obs].max(
            jnp.repeat(jnp.arange(F, dtype=jnp.int32), kfs.kp_point.shape[1]),
            mode="drop",
        )[:P]
        orphan = state.points.valid & (state.points.ref_kf == slot)
        new_ref = jnp.where(
            orphan, jnp.where(surv_ref >= 0, surv_ref, parent),
            state.points.ref_kf,
        )
        return state._replace(
            retired=retired,
            points=state.points._replace(ref_kf=new_ref),
        )

    # The retirement bookkeeping (covisibility row + two (F, K)
    # scatters) only runs when the store is actually full — lax.cond
    # keeps the common-path insertion cheap.
    state = jax.lax.cond(was_valid, retire_evicted, lambda s: s, state)

    # Release the evicted keyframe's observations (observation-count
    # decrement, as KeyFrame::SetBadFlag does via EraseObservation).
    row = kfs.kp_point[slot]
    rel_ids = jnp.where(was_valid & (row >= 0), row, P)
    n_obs = state.points.n_obs.at[rel_ids].add(-1, mode="drop")
    # Count observations for previously-existing matched points (spawned
    # points get their n_obs=1 inside _spawn_points).
    obs_mask = kp_point >= 0
    ids = jnp.where(obs_mask, kp_point, P)
    n_obs = n_obs.at[ids].add(1, mode="drop")
    state = state._replace(
        points=state.points._replace(n_obs=jnp.maximum(n_obs, 0))
    )

    kf_uid = state.next_uid
    state, kp_point = _spawn_points(
        state, frame, T_cw, kp_point, slot, kf_uid, cfg, spawn_all
    )

    kfs = state.kfs
    kfs = kfs._replace(
        T_cw=kfs.T_cw.at[slot].set(T_cw),
        uv=kfs.uv.at[slot].set(frame.feats.uv),
        level=kfs.level.at[slot].set(frame.feats.level),
        angle=kfs.angle.at[slot].set(frame.feats.angle),
        desc=kfs.desc.at[slot].set(frame.feats.desc),
        depth=kfs.depth.at[slot].set(frame.kp_depth),
        kp_valid=kfs.kp_valid.at[slot].set(frame.feats.valid),
        kp_point=kfs.kp_point.at[slot].set(kp_point),
        frame_id=kfs.frame_id.at[slot].set(frame_id),
        stamp=kfs.stamp.at[slot].set(stamp),
        uid=kfs.uid.at[slot].set(kf_uid),
        parent_uid=kfs.parent_uid.at[slot].set(-1),
        T_rel_parent=kfs.T_rel_parent.at[slot].set(jnp.eye(4, dtype=jnp.float32)),
        valid=kfs.valid.at[slot].set(True),
    )
    state = state._replace(
        kfs=kfs,
        n_kfs=state.n_kfs + 1 - was_valid.astype(jnp.int32),
        last_kf=slot,
        next_uid=state.next_uid + 1,
    )
    return state, kp_point


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "use_mask", "use_feats"),
    donate_argnames=("state",),
)
def fused_track_step(
    state: SlamState,
    gray: jnp.ndarray,
    depth_img: jnp.ndarray,
    last_frame: Frame,
    last_T_cw: jnp.ndarray,
    last_kp_point: jnp.ndarray,
    velocity: jnp.ndarray,
    frames_since_kf: jnp.ndarray,
    ref_kf_inliers: jnp.ndarray,
    cfg: SlamConfig,
    static_mask: jnp.ndarray | None = None,
    use_mask: bool = False,
    feats: Features | None = None,
    use_feats: bool = False,
):
    """The whole per-frame hot path as ONE compiled program: frame build,
    motion-model tracking, local-map tracking, pose selection, keyframe
    decision, velocity update. The host performs a single small transfer
    per frame (a packed stats vector) — essential on hardware where every
    dispatch/sync round trip costs milliseconds (SURVEY.md §7 hard part
    #4: keep the 30 Hz path in one jit).

    Returns (state, frame, T_cw, velocity, kp_point, packed) where
    packed = [T_cw flat (16), status, need_kf, n_inliers, n_matches,
    n_inl_mm] as float32.
    """
    t = cfg.tracking
    mask = static_mask if use_mask else None
    if use_feats:
        # Pre-extracted features (e.g. the stereo front end already ran
        # extraction on the left image) — no second extraction.
        frame = frame_from_features(feats, depth_img, cfg, mask)
    else:
        frame = build_frame(gray, depth_img, cfg, mask)

    T_pred = velocity @ last_T_cw
    T_mm, n_match_mm, n_inl_mm = track_motion_model(
        frame, last_frame, last_T_cw, T_pred, cfg,
        map_pos=state.points.pos,
        map_valid=state.points.valid,
        last_kp_point=last_kp_point,
    )
    mm_jump = jnp.linalg.norm(T_mm[:3, 3] - T_pred[:3, 3])
    ok_mm = (n_inl_mm >= t.min_inliers_track) & (mm_jump < 0.5)

    # Appearance fallback against the reference keyframe when the motion
    # model fails (Track() falls back to TrackReferenceKeyFrame,
    # Tracking.cc:955-966); lax.cond keeps it free on good frames.
    T_ref, n_inl_ref = jax.lax.cond(
        ok_mm,
        lambda: (T_mm, n_inl_mm),
        lambda: track_reference_kf(state, frame, last_T_cw, cfg),
    )
    ok_ref = (~ok_mm) & (n_inl_ref >= t.min_inliers_track)
    ok_pre = ok_mm | ok_ref
    T_seed = jnp.where(ok_mm, T_mm, jnp.where(ok_ref, T_ref, T_pred))

    state, res = track_local_map(state, frame, T_seed, cfg)
    ok_lm = res.n_inliers >= t.min_inliers_local_map
    T_cw = jnp.where(ok_lm, res.T_cw, jnp.where(ok_pre, T_seed, last_T_cw))
    status = jnp.where(ok_lm, 0, jnp.where(ok_pre, 1, 2))  # OK/WEAK/LOST

    # Keyframe decision (NeedNewKeyFrame rules; see Tracker._need_keyframe).
    close = frame.feats.valid & (frame.kp_depth > 0) & (
        frame.kp_depth < cfg.camera.depth_threshold
    )
    n_close_tracked = jnp.sum((close & (res.kp_point >= 0)).astype(jnp.int32))
    n_close_untracked = jnp.sum((close & (res.kp_point < 0)).astype(jnp.int32))
    need_close = (n_close_tracked < t.min_close_points) & (
        n_close_untracked > t.max_non_tracked_close
    )
    need_kf = ok_lm & (
        (frames_since_kf >= t.max_frames_between_kfs)
        | need_close
        | (res.n_inliers < t.kf_ref_ratio * jnp.maximum(ref_kf_inliers, 1))
        | (res.n_inliers < t.kf_min_inliers)
    ) & (res.n_inliers >= t.min_inliers_track)

    rel = T_cw @ se3.se3_inverse(last_T_cw)
    vel_new = jnp.where(
        status == 2,
        jnp.eye(4, dtype=jnp.float32),
        se3.se3_exp(t.velocity_damping * se3.se3_log(rel)),
    )

    packed = jnp.concatenate([
        T_cw.reshape(-1),
        jnp.stack([
            status.astype(jnp.float32),
            need_kf.astype(jnp.float32),
            res.n_inliers.astype(jnp.float32),
            res.n_matches.astype(jnp.float32),
            n_inl_mm.astype(jnp.float32),
        ]),
    ])
    return state, frame, T_cw, vel_new, res.kp_point, packed


class Tracker:
    """Host-side per-frame sequencing (the reference's Tracking state
    machine, minus threads). Owns the SlamState and the motion model."""

    def __init__(self, cfg: SlamConfig, mesh=None):
        from orb_slam2_ssd_semantic_tpu.utils.metrics import Metrics

        self.cfg = cfg
        self.mesh = mesh
        self.metrics = Metrics()
        self.state = empty_state(cfg)
        self.last_frame: Frame | None = None
        self.last_kp_point = jnp.full((cfg.orb.max_keypoints,), -1, jnp.int32)
        self.last_T_cw = jnp.eye(4, dtype=jnp.float32)
        self.prev_gray = None
        if cfg.dynamic.enable_geometry:
            from orb_slam2_ssd_semantic_tpu.dynamic.geommask import empty_ref_views

            self.geom_db = empty_ref_views(cfg.dynamic.geom_db_size, cfg.orb.max_keypoints)
        else:
            self.geom_db = None
        self.velocity = jnp.eye(4, dtype=jnp.float32)
        self.initialized = False
        self.frame_id = 0
        if cfg.loop.enabled or cfg.loop.enable_relocalization:
            from orb_slam2_ssd_semantic_tpu.mapping.loop_closing import LoopCloser

            self.loop_closer = LoopCloser(cfg, mesh=mesh)
        else:
            self.loop_closer = None
        self.n_loops_closed = 0
        self.frames_since_kf = 0
        self.ref_kf_inliers = 0
        # Host-side hard gate on keyframe creation; cleared by
        # localization-only mode (Tracking::InformOnlyTracking,
        # Tracking.cc:3155 — mapping frozen, tracking continues).
        self.allow_new_keyframes = True
        self.trajectory: list = []  # (stamp, ref_kf_uid, T_rel np)
        self.stats: list = []
        self.status = "INIT"
        # Host-side mirrors of rarely-changing device scalars, so the hot
        # loop never fetches them (each fetch is a device round trip).
        self._n_kfs = 0
        self._n_points = 0
        self._last_kf = 0  # slot of the newest keyframe
        self._ref_kf_uid = 0  # uid of the newest keyframe
        self._ref_kf_pose_np = np.eye(4, dtype=np.float32)
        # Retired keyframes: uid -> (parent_uid, T_rel_parent np). Fed by
        # _on_keyframe_inserted scans; resolves trajectory references to
        # culled keyframes through the spanning tree, like the
        # reference's SaveTrajectoryTUM walk (System.cc:487-493).
        self._retired: dict = {}
        self._lost_streak = 0

    @precision.scoped
    def process(self, gray: np.ndarray, depth: np.ndarray, stamp: float,
                feats: Features | None = None) -> np.ndarray:
        """Track one RGB-D frame; returns T_cw (4,4) numpy.

        `feats`: optional pre-extracted raw-pixel Features (the stereo
        front end extracts the left image for disparity matching and
        passes the result here — one extraction per image,
        Frame.cc:196-197 parity).

        Dynamic filtering (the reference's pre-tracking stage,
        Tracking.cc:688-719) runs here when enabled: flow mask vs the
        previous gray image with rotation-homography ego-motion
        compensation, and/or the multi-view geometry mask against the
        recent keyframe views."""
        cfg = self.cfg
        gray = jnp.asarray(gray)
        depth = jnp.asarray(depth)
        static_mask = None
        if cfg.dynamic.enable_flow and self.prev_gray is not None:
            from orb_slam2_ssd_semantic_tpu.dynamic.flowmask import (
                flow_dynamic_mask_fitted,
            )

            # Ego-motion homography FITTED to flow correspondences by
            # RANSAC (TrackHomo + findHomography equivalent,
            # Tracking.cc:1331-1399, Flow.cc:73-80) — cancels rotation
            # AND translation-induced dominant motion.
            with self.metrics.stage("mask.flow"):
                static_mask = flow_dynamic_mask_fitted(
                    self.prev_gray, gray, cfg.dynamic
                )
        if cfg.dynamic.enable_geometry and self.geom_db is not None and self.initialized:
            from orb_slam2_ssd_semantic_tpu.dynamic.geommask import geometry_dynamic_mask

            T_pred = self.velocity @ self.last_T_cw
            with self.metrics.stage("mask.geometry"):
                gmask = geometry_dynamic_mask(
                    self.geom_db, T_pred, depth, cfg.camera, cfg.dynamic
                )
            static_mask = gmask if static_mask is None else (static_mask & gmask)
        self.prev_gray = gray

        if not self.initialized:
            if feats is not None:
                frame = frame_from_features(feats, depth, cfg, static_mask)
            else:
                frame = build_frame(gray, depth, cfg, static_mask)
            T_cw = jnp.eye(4, dtype=jnp.float32)
            kp_point = jnp.full((frame.feats.capacity,), -1, jnp.int32)
            self.state, kp_point = insert_keyframe(
                self.state, frame, T_cw, kp_point, self.frame_id, stamp, cfg,
                spawn_all=True,
            )
            self.initialized = True
            self.status = "OK"
            self.ref_kf_inliers = int(jnp.sum(frame.is_stereo & frame.feats.valid))
            if self.loop_closer is not None:
                self.state, _ = self.loop_closer.on_keyframe(self.state, 0)
            self._on_keyframe_inserted()
            self._record(frame, T_cw, np.eye(4, dtype=np.float32), kp_point,
                         jnp.eye(4, dtype=jnp.float32), stamp, 0, 0)
            return np.eye(4, dtype=np.float32)

        # ---- the fused hot path: one jit call + one small fetch ----------
        with self.metrics.stage("track"):
            self.state, frame, T_cw, velocity, kp_point, packed = fused_track_step(
                self.state,
                gray,
                depth,
                self.last_frame,
                self.last_T_cw,
                self.last_kp_point,
                self.velocity,
                jnp.int32(self.frames_since_kf),
                jnp.int32(self.ref_kf_inliers),
                cfg,
                static_mask=static_mask,
                use_mask=static_mask is not None,
                feats=feats,
                use_feats=feats is not None,
            )
            p = np.asarray(packed)  # the single per-frame device sync
        T_np = p[:16].reshape(4, 4).astype(np.float32)
        status_code, need_kf = int(p[16]), bool(p[17] > 0.5)
        n_inl, n_matches = int(p[18]), int(p[19])
        self.status = ("OK", "WEAK", "LOST")[status_code]

        if need_kf and self.allow_new_keyframes:
            # Capture spanning-tree records of keyframes culled by the
            # previous (possibly still-executing) mapping pass BEFORE
            # this insertion can reuse their slots.
            self._capture_retirements()
            with self.metrics.stage("keyframe.insert"):
                self.state, kp_point = insert_keyframe(
                    self.state, frame, T_cw, kp_point, self.frame_id, stamp, cfg
                )
                kf_slot = int(self.state.last_kf)
            self.metrics.count("keyframes")
            self.frames_since_kf = 0
            # Reference count = the new KF's landmark associations
            # (tracked + spawned) — the NeedNewKeyFrame nRefMatches
            # analogue. Fetch blocks only on the (cheap) insertion.
            self.ref_kf_inliers = int(jnp.sum((kp_point >= 0)))
            if self.geom_db is not None:
                # Geometry-mask reference-view DB update on keyframes
                # (GeometricModelUpdateDB, Geometry.cc:73-79,532-546).
                from orb_slam2_ssd_semantic_tpu.dynamic.geommask import insert_ref_view

                self.geom_db = insert_ref_view(
                    self.geom_db, T_cw, frame.feats.uv, frame.kp_depth,
                    frame.feats.valid & frame.is_stereo,
                )
            # Loop closing (LoopClosing thread equivalent): BoW update +
            # detection + pose-graph correction per new keyframe. Runs
            # BEFORE the local-BA dispatch on the post-insert state: its
            # host-side fetches then wait only on the (cheap) insertion,
            # and the BA below can stay un-fetched (async).
            if self.loop_closer is not None and cfg.loop.enabled:
                with self.metrics.stage("loop_closing"):
                    self.state, closed = self.loop_closer.on_keyframe(
                        self.state, kf_slot  # slot of the KF just inserted
                    )
                if closed:
                    self.n_loops_closed += 1
                    self.metrics.count("loops_closed")
                    T_cw = self.state.kfs.T_cw[kf_slot]
                    T_np = np.asarray(T_cw)
            mirror_state = self.state  # post-insert, pre-BA
            # Local mapping: triangulate + fuse + covis-window BA +
            # maintenance + culling (the LocalMapping thread, P2). With
            # async_mapping the dispatch returns immediately — JAX's
            # async execution IS the worker thread; the host keeps
            # tracking against the in-flight state value and nothing
            # below fetches it (the reference's interrupt flags have no
            # analogue to wait on: the pass is bounded at one window).
            if self._n_kfs + 1 >= 3:
                from orb_slam2_ssd_semantic_tpu.mapping.local_mapping import (
                    local_mapping_step,
                )

                with self.metrics.stage("local_mapping"):
                    self.state = local_mapping_step(self.state, cfg)
                    if not cfg.tracking.async_mapping:
                        # Synchronous mode: re-anchor the live pose on
                        # the BA output (blocks on the solve).
                        T_cw = self.state.kfs.T_cw[kf_slot]
                        T_np = np.asarray(T_cw)
            self._on_keyframe_inserted(mirror_state)
        else:
            self.frames_since_kf += 1
            # Relocalize when LOST — and, in localization-only mode, also
            # while WEAK: the mbVO visual-odometry fallback
            # (Tracking.cc:986-1047). With mapping frozen, WEAK means the
            # map matches died and the pose is riding on temporal
            # (depth-backprojected) points from the last frame — the
            # reference keeps that odometry alive and attempts
            # relocalization every frame, re-anchoring to the map the
            # moment it succeeds.
            vo_mode = self.status == "WEAK" and not self.allow_new_keyframes
            if (
                (self.status == "LOST" or vo_mode)
                and cfg.loop.enable_relocalization
                and self.loop_closer is not None
                and self._n_kfs >= 1
            ):
                from orb_slam2_ssd_semantic_tpu.tracking.reloc import relocalize

                with self.metrics.stage("relocalization"):
                    ok_reloc, T_reloc, n_reloc = relocalize(
                        self.state, frame, self.loop_closer, cfg
                    )
                if ok_reloc:
                    self.status = "OK"
                    T_cw = T_reloc
                    T_np = np.asarray(T_reloc)
                    velocity = jnp.eye(4, dtype=jnp.float32)
                    n_inl = n_reloc

        # Auto-reset: lost early with a tiny map means the map itself is
        # garbage (Tracking.cc:1153-1161 / System::Reset): rebuild from
        # scratch rather than relocalizing into a broken map.
        self._lost_streak = self._lost_streak + 1 if self.status == "LOST" else 0
        if (
            self._lost_streak >= 10
            and self._n_kfs <= cfg.tracking.reset_if_lost_with_kfs
        ):
            self.state = empty_state(cfg)
            self.initialized = False
            self._lost_streak = 0
            self._n_kfs = 0
            self._n_points = 0
            self._last_kf = 0
            self._ref_kf_uid = 0
            self._retired = {}

        self._record(frame, T_cw, T_np, kp_point, velocity, stamp, n_matches, n_inl)
        return T_np

    def _on_keyframe_inserted(self, state=None):
        """Refresh host-side mirrors after a keyframe insertion. With
        async mapping, `state` is the post-insert/pre-BA snapshot so
        these fetches never wait on the in-flight BA (the trajectory
        entry pair (T_rel, ref pose) stays self-consistent; resolution
        against the refined poses happens at save time)."""
        state = self.state if state is None else state
        self._n_kfs = int(state.n_kfs)
        self._n_points = int(state.n_points)
        self._last_kf = int(state.last_kf)
        kfs = state.kfs
        self._ref_kf_uid = int(kfs.uid[self._last_kf])
        self._ref_kf_pose_np = np.asarray(kfs.T_cw[self._last_kf])

    def _capture_retirements(self):
        """Record spanning-tree info of culled keyframes (uid ->
        (parent_uid, T_rel_parent)) before their slots can be reused —
        the host half of the reference's culled-KF trajectory chain
        (System.cc:487-493)."""
        kfs = self.state.kfs
        uid = np.asarray(kfs.uid)
        valid = np.asarray(kfs.valid)
        parent = np.asarray(kfs.parent_uid)
        retired_idx = np.nonzero((uid >= 0) & ~valid)[0]
        if len(retired_idx):
            Trel = np.asarray(kfs.T_rel_parent)
            for i in retired_idx:
                u = int(uid[i])
                if u not in self._retired:
                    self._retired[u] = (int(parent[i]), Trel[i])
        self._merge_ring_retirements()

    def _merge_ring_retirements(self):
        """Fold the device-side retirement ring (map_state.RetiredRing)
        into the host dict — records written by culls AND evictions,
        durable across slot reuse."""
        ring = self.state.retired
        r_uid = np.asarray(ring.uid)
        idx = np.nonzero(r_uid >= 0)[0]
        if len(idx):
            r_parent = np.asarray(ring.parent_uid)
            r_Trel = np.asarray(ring.T_rel)
            for i in idx:
                u = int(r_uid[i])
                if u not in self._retired:
                    self._retired[u] = (int(r_parent[i]), r_Trel[i])

    def _record(self, frame, T_cw, T_np, kp_point, velocity, stamp, n_matches, n_inliers):
        self.last_kp_point = kp_point
        self.velocity = velocity
        self.last_frame = frame
        self.last_T_cw = T_cw
        self.frame_id += 1
        # Record the pose RELATIVE to the current reference keyframe (by
        # uid — slots are reused), so later BA corrections of keyframe
        # poses retroactively improve the whole trajectory
        # (SaveTrajectoryTUM semantics, System.cc:476-502).
        T_rel = T_np @ np.linalg.inv(self._ref_kf_pose_np)
        self.trajectory.append((stamp, self._ref_kf_uid, T_rel))
        self.stats.append(
            {"matches": n_matches, "inliers": n_inliers, "status": self.status,
             "kfs": self._n_kfs, "points": self._n_points}
        )

    # -- outputs ------------------------------------------------------------

    def _kf_pose_by_uid(self):
        """uid -> current T_cw for live keyframes, plus the retired-chain
        resolver (spanning-tree walk for culled reference keyframes,
        System.cc:487-493)."""
        kfs = self.state.kfs
        uid = np.asarray(kfs.uid)
        valid = np.asarray(kfs.valid)
        T = np.asarray(kfs.T_cw)
        parent = np.asarray(kfs.parent_uid)
        Trel = np.asarray(kfs.T_rel_parent)
        live = {int(u): T[i] for i, u in enumerate(uid) if valid[i] and u >= 0}
        self._merge_ring_retirements()
        retired = dict(self._retired)
        for i, u in enumerate(uid):
            if u >= 0 and not valid[i] and int(u) not in retired:
                retired[int(u)] = (int(parent[i]), Trel[i])

        def resolve(u: int):
            chain = []
            seen = set()
            while u not in live:
                if u not in retired or u in seen:
                    # Broken chain: fall back to the newest live keyframe
                    # at or before u.
                    cands = [lu for lu in live if lu <= u]
                    return live[max(cands)] if cands else np.eye(4, np.float32)
                seen.add(u)
                chain.append(retired[u][1])
                u = retired[u][0]
            out = live[u]
            for R in reversed(chain):
                out = R @ out
            return out

        return resolve

    def absolute_poses(self) -> list:
        """[(stamp, T_cw)] with keyframe-relative entries resolved against
        the CURRENT (possibly BA-refined) keyframe poses."""
        resolve = self._kf_pose_by_uid()
        out = []
        for s, ref_uid, T_rel in self.trajectory:
            out.append((s, T_rel @ resolve(ref_uid)))
        return out

    def camera_positions(self) -> np.ndarray:
        """(N, 3) camera centers in world frame."""
        out = []
        for _, T in self.absolute_poses():
            R, t = T[:3, :3], T[:3, 3]
            out.append(-R.T @ t)
        return np.stack(out)

    def save_trajectory_tum(self, path: str):
        """TUM-format camera trajectory (SaveTrajectoryTUM equivalent,
        System.cc:454-505)."""
        from orb_slam2_ssd_semantic_tpu.io.tum import write_trajectory

        stamps, ts, qs = [], [], []
        for s, T in self.absolute_poses():
            R, t = T[:3, :3], T[:3, 3]
            Rwc, twc = R.T, -R.T @ t
            q = np.asarray(se3.rot_to_quat(jnp.asarray(Rwc)))
            stamps.append(s)
            ts.append(twc)
            qs.append(q)
        write_trajectory(path, stamps, ts, qs)
