"""Sparse map persistence: binary save/load of the SLAM map.

Functional equivalent of Map::Save / Map::Load (perfect/src/Map.cc:
385-446 / 228-315): persists map points (positions + descriptors +
bookkeeping) and keyframes (poses, timestamps, keypoints, descriptors,
point associations — the reference's id/xyz/quat/keypoint rows) so a
session can be resumed or re-localized against a prior map. Where the
reference rebuilds BoW vectors, grids and covisibility on load, here
the covisibility is derived on demand from kp_point (map_state.py) so
only the raw arrays need storing. Uses compressed npz rather than a
hand-rolled byte stream; the format is versioned.

Format v2: full fixed-capacity arrays (slots are sparse once culled
slots are reused, so prefix slicing no longer applies; npz compression
makes the empty tail nearly free) plus keyframe uids and spanning-tree
retirement records.
"""

from __future__ import annotations

import numpy as np

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.mapping.map_state import SlamState, empty_state

FORMAT_VERSION = 3


def save_map(path: str, state: SlamState) -> None:
    np.savez_compressed(
        path,
        version=FORMAT_VERSION,
        n_points=int(state.n_points),
        n_kfs=int(state.n_kfs),
        last_kf=int(state.last_kf),
        next_uid=int(state.next_uid),
        # points
        pt_pos=np.asarray(state.points.pos),
        pt_desc=np.asarray(state.points.desc),
        pt_normal=np.asarray(state.points.normal),
        pt_min_dist=np.asarray(state.points.min_dist),
        pt_max_dist=np.asarray(state.points.max_dist),
        pt_n_obs=np.asarray(state.points.n_obs),
        pt_ref_kf=np.asarray(state.points.ref_kf),
        pt_first_kf_uid=np.asarray(state.points.first_kf_uid),
        pt_valid=np.asarray(state.points.valid),
        # keyframes
        kf_T_cw=np.asarray(state.kfs.T_cw),
        kf_uv=np.asarray(state.kfs.uv),
        kf_level=np.asarray(state.kfs.level),
        kf_angle=np.asarray(state.kfs.angle),
        kf_desc=np.asarray(state.kfs.desc),
        kf_depth=np.asarray(state.kfs.depth),
        kf_kp_valid=np.asarray(state.kfs.kp_valid),
        kf_kp_point=np.asarray(state.kfs.kp_point),
        kf_frame_id=np.asarray(state.kfs.frame_id),
        kf_stamp=np.asarray(state.kfs.stamp),
        kf_uid=np.asarray(state.kfs.uid),
        kf_parent_uid=np.asarray(state.kfs.parent_uid),
        kf_T_rel_parent=np.asarray(state.kfs.T_rel_parent),
        kf_valid=np.asarray(state.kfs.valid),
        # retirement ring (v3): durable spanning-tree records
        ret_uid=np.asarray(state.retired.uid),
        ret_parent_uid=np.asarray(state.retired.parent_uid),
        ret_T_rel=np.asarray(state.retired.T_rel),
        ret_count=int(state.retired.count),
    )


def load_map(path: str, cfg: SlamConfig) -> SlamState:
    import jax.numpy as jnp

    z = np.load(path)
    version = int(z["version"])
    if version not in (1, 2, 3):
        raise ValueError(f"unknown map format version {version}")
    state = empty_state(cfg)
    P = cfg.map.max_map_points
    F = cfg.map.max_keyframes
    n_pts = int(z["n_points"])
    n_kfs = int(z["n_kfs"])
    sp = z["pt_pos"].shape[0]
    sf_ = z["kf_T_cw"].shape[0]
    if sp > P or sf_ > F:
        raise ValueError(
            f"saved map capacity ({sp} pts, {sf_} kfs) exceeds configured "
            f"capacity ({P}, {F})"
        )

    def put(arr, key, default=None):
        data = z[key] if key in z.files else default
        if data is None:
            return arr
        n = data.shape[0]
        return arr.at[:n].set(jnp.asarray(data))

    pts = state.points
    pts = pts._replace(
        pos=put(pts.pos, "pt_pos"),
        desc=put(pts.desc, "pt_desc"),
        normal=put(pts.normal, "pt_normal"),
        min_dist=put(pts.min_dist, "pt_min_dist"),
        max_dist=put(pts.max_dist, "pt_max_dist"),
        n_obs=put(pts.n_obs, "pt_n_obs"),
        ref_kf=put(pts.ref_kf, "pt_ref_kf"),
        first_kf_uid=put(pts.first_kf_uid, "pt_first_kf_uid"),
        valid=put(pts.valid, "pt_valid"),
        # Tracking statistics restart neutral on load (the reference
        # resets found/visible too by reconstructing MapPoints).
        n_visible=pts.n_visible.at[:sp].set(1),
        n_found=pts.n_found.at[:sp].set(1),
    )
    kfs = state.kfs
    kfs = kfs._replace(
        T_cw=put(kfs.T_cw, "kf_T_cw"),
        uv=put(kfs.uv, "kf_uv"),
        level=put(kfs.level, "kf_level"),
        angle=put(kfs.angle, "kf_angle"),
        desc=put(kfs.desc, "kf_desc"),
        depth=put(kfs.depth, "kf_depth"),
        kp_valid=put(kfs.kp_valid, "kf_kp_valid"),
        kp_point=put(kfs.kp_point, "kf_kp_point"),
        frame_id=put(kfs.frame_id, "kf_frame_id"),
        stamp=put(kfs.stamp, "kf_stamp"),
        uid=put(kfs.uid, "kf_uid"),
        parent_uid=put(kfs.parent_uid, "kf_parent_uid"),
        T_rel_parent=put(kfs.T_rel_parent, "kf_T_rel_parent"),
        valid=put(kfs.valid, "kf_valid"),
    )
    if version == 1:
        # v1 stored prefix slices with no uids: synthesize insertion order.
        kfs = kfs._replace(
            uid=kfs.uid.at[:n_kfs].set(jnp.arange(n_kfs, dtype=jnp.int32)),
        )
        pts = pts._replace(
            first_kf_uid=jnp.where(
                pts.valid, jnp.clip(pts.ref_kf, 0, None), pts.first_kf_uid
            ),
        )
        last_kf = max(n_kfs - 1, 0)
        next_uid = n_kfs
    else:
        last_kf = int(z["last_kf"])
        next_uid = int(z["next_uid"])

    retired = state.retired
    if version >= 3 and "ret_uid" in z.files:
        n_ret = min(z["ret_uid"].shape[0], retired.uid.shape[0])
        retired = retired._replace(
            uid=retired.uid.at[:n_ret].set(jnp.asarray(z["ret_uid"][:n_ret])),
            parent_uid=retired.parent_uid.at[:n_ret].set(
                jnp.asarray(z["ret_parent_uid"][:n_ret])
            ),
            T_rel=retired.T_rel.at[:n_ret].set(jnp.asarray(z["ret_T_rel"][:n_ret])),
            count=jnp.int32(int(z["ret_count"])),
        )

    return SlamState(
        pts, kfs,
        jnp.int32(n_pts), jnp.int32(n_kfs),
        jnp.int32(last_kf), jnp.int32(next_uid),
        retired,
    )
