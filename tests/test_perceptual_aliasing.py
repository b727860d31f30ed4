"""Perceptual-aliasing stress (VERDICT r3 #6): place recognition must
not close FALSE loops between two visually similar but distinct rooms.

Scenario: the camera laps room A, then laps room B — same geometry,
same texture STATISTICS (the regime where a weak BoW gives near-flat
scores and flags cross-room candidates), different texture realization.
Keyframe capacity is below the total insertion count, so slot reuse /
eviction is active throughout (the r3-flagged hazard: uid-adjacency
consistency chains crossing unrelated keyframes after reuse).

The gate: ZERO loops accepted — BoW may flag whatever it likes; the
geometric verification chain (3D-3D RANSAC + Sim3 refinement + guided
map-neighborhood confirmation + minimum-discrepancy gate) must reject
every cross-room candidate. A same-room revisit control must still
close, proving the rejection isn't vacuous.

Reference behavior: KeyFrameDatabase covis-group consistency +
LoopClosing's Sim3/SearchByProjection gates (KeyFrameDatabase.cc:
76-197, LoopClosing.cc:304-543)."""

import dataclasses

import numpy as np

import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.io.synthetic import BoxRoom
from orb_slam2_ssd_semantic_tpu.mapping.local_mapping import fuse_map_points
from orb_slam2_ssd_semantic_tpu.mapping.loop_closing import LoopCloser
from orb_slam2_ssd_semantic_tpu.mapping.map_state import empty_state
from orb_slam2_ssd_semantic_tpu.tracking import tracker as tk


def _circle_poses(n, room=(5.0, 3.0, 6.0), radius=0.55):
    sx, sy, sz = room
    out = []
    for i in range(n):
        a = 2 * np.pi * i / n
        ca, sa = np.cos(a), np.sin(a)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(
            [[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], np.float32)
        T[:3, 3] = [sx / 2 + radius * np.sin(a), sy / 2,
                    sz / 2 + radius * (np.cos(a) - 1.0) * 0.5]
        out.append(T)
    return out


def _cfg(max_kf=12):
    base = SlamConfig()
    return SlamConfig(
        camera=base.camera,
        map=dataclasses.replace(
            base.map, max_keyframes=max_kf, local_ba_window=4,
            local_ba_fixed_anchors=2, triangulation_neighbors=2,
            fuse_neighbors=2,
        ),
        loop=dataclasses.replace(
            base.loop, enabled=True, min_kfs_before_loop=3,
            covisibility_consistency_th=2, run_global_ba=False,
        ),
    )


def test_no_false_loops_across_similar_rooms_with_slot_reuse():
    cfg = _cfg(max_kf=12)  # 16 inserts -> eviction/slot reuse active
    room_a = BoxRoom(seed=3, cam=cfg.camera)
    room_b = BoxRoom(seed=11, cam=cfg.camera)  # same geometry, new texture
    poses = _circle_poses(8)
    lc = LoopCloser(cfg)
    state = empty_state(cfg)
    closed = []
    uid = 0
    for room_tag, room in (("A", room_a), ("B", room_b)):
        for i, T_wc in enumerate(poses):
            gray, depth = room.render(T_wc)
            frame = tk.build_frame(jnp.asarray(gray, jnp.float32),
                                   jnp.asarray(depth), cfg)
            # Room B lives in a disjoint world region (the camera
            # "moved to another room"): offset the pose estimate.
            T_cw = np.linalg.inv(T_wc).astype(np.float32)
            if room_tag == "B":
                off = np.eye(4, dtype=np.float32)
                off[:3, 3] = [-20.0, 0.0, 0.0]
                T_cw = T_cw @ off
            kp = jnp.full((cfg.orb.max_keypoints,), -1, jnp.int32)
            state, kp = tk.insert_keyframe(
                state, frame, jnp.asarray(T_cw), kp, uid, float(uid), cfg,
                spawn_all=True)
            if uid > 0:
                state = fuse_map_points(state, cfg)
            state, did = lc.on_keyframe(state, int(state.last_kf))
            if did:
                closed.append((room_tag, uid))
            uid += 1
    assert closed == [], f"false loop closure(s): {closed}"


def test_same_room_revisit_still_closes():
    """Control: the rejection above must not be vacuous — an actual
    revisit of the SAME room (with drift) still closes."""
    cfg = _cfg(max_kf=24)
    room = BoxRoom(seed=3, cam=cfg.camera)
    n_pose = 10
    poses = [_circle_poses(n_pose)[i % n_pose] for i in range(14)]
    lc = LoopCloser(cfg)
    state = empty_state(cfg)
    closed = []
    for i, T_wc in enumerate(poses):
        gray, depth = room.render(T_wc)
        frame = tk.build_frame(jnp.asarray(gray, jnp.float32),
                               jnp.asarray(depth), cfg)
        d = 0.25 * i / 13
        T_cw = np.linalg.inv(T_wc).astype(np.float32)
        drift = np.eye(4, dtype=np.float32)
        drift[:3, 3] = [d, 0.0, 0.4 * d]
        kp = jnp.full((cfg.orb.max_keypoints,), -1, jnp.int32)
        state, kp = tk.insert_keyframe(
            state, frame, jnp.asarray(T_cw @ drift), kp, i, float(i), cfg,
            spawn_all=True)
        if i > 0:
            state = fuse_map_points(state, cfg)
        state, did = lc.on_keyframe(state, int(state.last_kf))
        if did:
            closed.append(i)
    assert closed, "the control revisit failed to close any loop"
