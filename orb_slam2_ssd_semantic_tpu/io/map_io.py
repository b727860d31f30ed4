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
"""

from __future__ import annotations

import numpy as np

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.mapping.map_state import SlamState, empty_state

FORMAT_VERSION = 1


def save_map(path: str, state: SlamState) -> None:
    import jax.numpy as jnp  # noqa: F401

    n_kfs = int(state.n_kfs)
    n_pts = int(state.n_points)
    np.savez_compressed(
        path,
        version=FORMAT_VERSION,
        n_points=n_pts,
        n_kfs=n_kfs,
        # points
        pt_pos=np.asarray(state.points.pos[:n_pts]),
        pt_desc=np.asarray(state.points.desc[:n_pts]),
        pt_normal=np.asarray(state.points.normal[:n_pts]),
        pt_min_dist=np.asarray(state.points.min_dist[:n_pts]),
        pt_max_dist=np.asarray(state.points.max_dist[:n_pts]),
        pt_n_obs=np.asarray(state.points.n_obs[:n_pts]),
        pt_ref_kf=np.asarray(state.points.ref_kf[:n_pts]),
        pt_valid=np.asarray(state.points.valid[:n_pts]),
        # keyframes
        kf_T_cw=np.asarray(state.kfs.T_cw[:n_kfs]),
        kf_uv=np.asarray(state.kfs.uv[:n_kfs]),
        kf_level=np.asarray(state.kfs.level[:n_kfs]),
        kf_angle=np.asarray(state.kfs.angle[:n_kfs]),
        kf_desc=np.asarray(state.kfs.desc[:n_kfs]),
        kf_depth=np.asarray(state.kfs.depth[:n_kfs]),
        kf_kp_valid=np.asarray(state.kfs.kp_valid[:n_kfs]),
        kf_kp_point=np.asarray(state.kfs.kp_point[:n_kfs]),
        kf_frame_id=np.asarray(state.kfs.frame_id[:n_kfs]),
        kf_stamp=np.asarray(state.kfs.stamp[:n_kfs]),
        kf_valid=np.asarray(state.kfs.valid[:n_kfs]),
    )


def load_map(path: str, cfg: SlamConfig) -> SlamState:
    import jax.numpy as jnp

    z = np.load(path)
    assert int(z["version"]) == FORMAT_VERSION
    state = empty_state(cfg)
    n_pts = int(z["n_points"])
    n_kfs = int(z["n_kfs"])
    P = cfg.map.max_map_points
    F = cfg.map.max_keyframes
    if n_pts > P or n_kfs > F:
        raise ValueError(
            f"saved map ({n_pts} pts, {n_kfs} kfs) exceeds configured "
            f"capacity ({P}, {F})"
        )
    pts = state.points
    pts = pts._replace(
        pos=pts.pos.at[:n_pts].set(jnp.asarray(z["pt_pos"])),
        desc=pts.desc.at[:n_pts].set(jnp.asarray(z["pt_desc"])),
        normal=pts.normal.at[:n_pts].set(jnp.asarray(z["pt_normal"])),
        min_dist=pts.min_dist.at[:n_pts].set(jnp.asarray(z["pt_min_dist"])),
        max_dist=pts.max_dist.at[:n_pts].set(jnp.asarray(z["pt_max_dist"])),
        n_obs=pts.n_obs.at[:n_pts].set(jnp.asarray(z["pt_n_obs"])),
        ref_kf=pts.ref_kf.at[:n_pts].set(jnp.asarray(z["pt_ref_kf"])),
        valid=pts.valid.at[:n_pts].set(jnp.asarray(z["pt_valid"])),
        # Tracking statistics restart neutral on load (the reference
        # resets found/visible too by reconstructing MapPoints).
        n_visible=pts.n_visible.at[:n_pts].set(1),
        n_found=pts.n_found.at[:n_pts].set(1),
    )
    kfs = state.kfs
    kfs = kfs._replace(
        T_cw=kfs.T_cw.at[:n_kfs].set(jnp.asarray(z["kf_T_cw"])),
        uv=kfs.uv.at[:n_kfs].set(jnp.asarray(z["kf_uv"])),
        level=kfs.level.at[:n_kfs].set(jnp.asarray(z["kf_level"])),
        angle=kfs.angle.at[:n_kfs].set(jnp.asarray(z["kf_angle"])),
        desc=kfs.desc.at[:n_kfs].set(jnp.asarray(z["kf_desc"])),
        depth=kfs.depth.at[:n_kfs].set(jnp.asarray(z["kf_depth"])),
        kp_valid=kfs.kp_valid.at[:n_kfs].set(jnp.asarray(z["kf_kp_valid"])),
        kp_point=kfs.kp_point.at[:n_kfs].set(jnp.asarray(z["kf_kp_point"])),
        frame_id=kfs.frame_id.at[:n_kfs].set(jnp.asarray(z["kf_frame_id"])),
        stamp=kfs.stamp.at[:n_kfs].set(jnp.asarray(z["kf_stamp"])),
        valid=kfs.valid.at[:n_kfs].set(jnp.asarray(z["kf_valid"])),
    )
    import jax.numpy as jnp2

    return SlamState(pts, kfs, jnp2.int32(n_pts), jnp2.int32(n_kfs))
