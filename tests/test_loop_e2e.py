"""End-to-end loop closure on a revisit (VERDICT r1 #4 done-criterion):
a drifted circular trajectory through the synthetic room — real rendered
images, real ORB descriptors, consecutive keyframes fused for
covisibility — must (a) detect the loop when the view revisits the
start, (b) estimate the accumulated drift via 3D-3D RANSAC + Sim3
refinement, (c) reduce the endpoint error after pose-graph correction;
and a non-revisiting run of the same length must close zero loops.

Reference path: LoopClosing::DetectLoop/ComputeSim3/CorrectLoop
(perfect/src/LoopClosing.cc:119,304,544)."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import CameraConfig, SlamConfig
from orb_slam2_ssd_semantic_tpu.io.synthetic import BoxRoom
from orb_slam2_ssd_semantic_tpu.mapping.loop_closing import LoopCloser
from orb_slam2_ssd_semantic_tpu.mapping.local_mapping import fuse_map_points
from orb_slam2_ssd_semantic_tpu.mapping.map_state import empty_state
from orb_slam2_ssd_semantic_tpu.tracking import tracker as tk


def _circle_poses(n, radius=0.55, room=(5.0, 3.0, 6.0)):
    """Camera-to-world poses around a circle with the camera YAWING a
    full 360 degrees over the loop: views midway face the opposite walls
    (no shared landmarks with the start — a genuine covisibility break,
    without which the whole room is one clique and there is nothing to
    close), and the final views face the start's wall again (the
    revisit)."""
    sx, sy, sz = room
    out = []
    for i in range(n):
        a = 2 * np.pi * i / n
        ca, sa = np.cos(a), np.sin(a)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(
            [[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], np.float32
        )
        T[:3, 3] = [sx / 2 + radius * np.sin(a), sy / 2,
                    sz / 2 + radius * (np.cos(a) - 1.0) * 0.5]
        out.append(T)
    return out


def _cfg():
    base = SlamConfig()
    return SlamConfig(
        camera=base.camera,
        map=dataclasses.replace(
            base.map, max_keyframes=32, local_ba_window=4,
            local_ba_fixed_anchors=2, triangulation_neighbors=2,
            fuse_neighbors=2,
        ),
        loop=dataclasses.replace(
            base.loop, enabled=True, min_kfs_before_loop=4,
            covisibility_consistency_th=2, run_global_ba=False,
        ),
    )


def _run(n_kf, drift_total, revisit=True):
    cfg = _cfg()
    room = BoxRoom(seed=3, cam=cfg.camera)
    if revisit:
        # 1.3 laps: the last ~30% of keyframes RE-TRAVERSE the start of
        # the circle — several consecutive revisit keyframes, as the
        # consecutive-consistency rule requires (a single end-of-lap
        # brush past the start can never build a 2-chain).
        n_pose = max(int(n_kf / 1.3), 4)
        poses = [_circle_poses(n_pose)[i % n_pose] for i in range(n_kf)]
    else:
        poses = _circle_poses(2 * n_kf)[:n_kf]  # open arc
    state = empty_state(cfg)
    lc = LoopCloser(cfg)
    closed_at = []
    err_before = err_after = None
    for i, T_wc in enumerate(poses):
        gray, depth = room.render(T_wc)
        frame = tk.build_frame(jnp.asarray(gray, jnp.float32),
                               jnp.asarray(depth), cfg)
        # Accumulated drift: grows linearly along the trajectory
        # (the estimate the tracker would have built).
        d = drift_total * i / max(n_kf - 1, 1)
        T_cw_true = np.linalg.inv(T_wc).astype(np.float32)
        T_drift = np.eye(4, dtype=np.float32)
        T_drift[:3, 3] = [d, 0.0, 0.4 * d]
        T_cw_est = T_cw_true @ T_drift  # world-frame drift of the estimate
        kp = jnp.full((cfg.orb.max_keypoints,), -1, jnp.int32)
        state, kp = tk.insert_keyframe(
            state, frame, jnp.asarray(T_cw_est), kp, i, float(i), cfg,
            spawn_all=True,
        )
        slot = int(state.last_kf)
        # Covisibility via duplicate fusion with the previous keyframes
        # (SearchInNeighbors stand-in for full local mapping).
        if i > 0:
            state = fuse_map_points(state, cfg)
        e_pre = float(np.linalg.norm(
            np.asarray(state.kfs.T_cw[slot])[:3, 3] - T_cw_true[:3, 3]
        ))
        state, closed = lc.on_keyframe(state, slot)
        if closed:
            closed_at.append(i)
            # The correction is judged at the closure keyframe: its
            # drifted insertion pose vs its pose after CorrectLoop
            # (keyframes inserted later get fresh injected drift by
            # construction, so the sequence end is not the place to
            # measure).
            if err_before is None:
                err_before = e_pre
                err_after = float(np.linalg.norm(
                    np.asarray(state.kfs.T_cw[slot])[:3, 3]
                    - T_cw_true[:3, 3]
                ))
    if err_before is None and n_kf > 0:
        err_before = err_after = e_pre
    return closed_at, err_before, err_after


def test_loop_closes_on_revisit_and_reduces_drift():
    closed_at, err_before, err_after = _run(n_kf=18, drift_total=0.30,
                                            revisit=True)
    assert closed_at, "no loop closed on a revisiting trajectory"
    # The loop fires in the revisit phase (late keyframes).
    assert min(closed_at) >= 12
    assert err_before > 0.15  # the injected drift was really there
    assert err_after < 0.6 * err_before, (err_before, err_after)


def test_no_false_loops_without_revisit():
    closed_at, _, _ = _run(n_kf=18, drift_total=0.30, revisit=False)
    assert closed_at == [], f"false loop(s) at {closed_at}"
