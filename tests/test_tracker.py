"""End-to-end odometry on the synthetic sequence + map-state invariants.

This is the engine-level integration gate (SURVEY.md §7 stage 1 exit
criterion): track a rendered RGB-D sequence and bound the ATE against
exact ground truth.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.eval.ate import evaluate_ate_xyz
from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence
from orb_slam2_ssd_semantic_tpu.mapping.map_state import covisibility, empty_state
from orb_slam2_ssd_semantic_tpu.tracking import tracker as tk


@pytest.fixture(scope="module")
def tracked_sequence():
    cfg = SlamConfig()
    seq = SyntheticSequence(n_frames=30)
    tr = tk.Tracker(cfg)
    for i in range(len(seq)):
        gray, depth = seq.gray_depth(i)
        tr.process(gray, depth, float(seq.stamps[i]))
    return cfg, seq, tr


def test_synthetic_odometry_ate(tracked_sequence):
    _, seq, tr = tracked_sequence
    res = evaluate_ate_xyz(tr.camera_positions(), seq.gt_positions())
    # Exact depth, static scene: must track at centimeter level.
    assert res.rmse < 0.01, res


def test_tracking_stays_ok(tracked_sequence):
    _, _, tr = tracked_sequence
    statuses = [s["status"] for s in tr.stats[1:]]
    assert statuses.count("OK") >= 0.9 * len(statuses)
    assert all(s["inliers"] >= 100 for s in tr.stats[2:])


def test_map_grows_points(tracked_sequence):
    _, seq, tr = tracked_sequence
    assert int(tr.state.n_points) >= 900
    assert int(tr.state.n_kfs) >= 1
    pts = tr.state.points
    v = np.asarray(pts.valid)
    # Culling may invalidate slots below the allocation cursor.
    assert 0 < v.sum() <= int(tr.state.n_points)
    # Map points live in the tracker's world frame (= camera-0 frame);
    # transform into room coordinates before bounds-checking. A small
    # tail of silhouette-edge spawns with mixed fg/bg depth is expected
    # until multi-view culling removes them.
    pos = np.asarray(pts.pos)[v]
    T0 = seq.poses_wc[0]  # camera0 -> room
    pos_room = pos @ T0[:3, :3].T + T0[:3, 3]
    for axis, hi in enumerate([5.0, 3.0, 6.0]):
        assert np.quantile(pos_room[:, axis], 0.02) > -0.5
        assert np.quantile(pos_room[:, axis], 0.98) < hi + 0.5


def test_found_visible_statistics(tracked_sequence):
    _, _, tr = tracked_sequence
    pts = tr.state.points
    v = np.asarray(pts.valid)
    assert np.asarray(pts.n_visible)[v].max() > 10
    assert np.all(np.asarray(pts.n_found)[v] <= np.asarray(pts.n_visible)[v] + 1)


def test_trajectory_save_roundtrip(tmp_path, tracked_sequence):
    _, _, tr = tracked_sequence
    from orb_slam2_ssd_semantic_tpu.io.tum import read_trajectory

    path = str(tmp_path / "traj.txt")
    tr.save_trajectory_tum(path)
    stamps, t, q = read_trajectory(path)
    assert len(stamps) == len(tr.trajectory)
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-6)


@pytest.mark.slow
def test_mbvo_localization_fallback():
    """mbVO visual-odometry fallback in localization-only mode
    (Tracking.cc:986-1047; VERDICT r2 #8): when the map matches die,
    tracking must keep odometry alive on temporal (depth-backprojected)
    points with WEAK status — not go LOST — attempt relocalization each
    frame, and re-anchor the moment the map returns."""
    import jax.numpy as jnp

    cfg = SlamConfig()
    seq = SyntheticSequence(n_frames=18)
    tr = tk.Tracker(cfg)
    for i in range(10):
        g, d = seq.gray_depth(i)
        tr.process(g, d, float(seq.stamps[i]))
    assert tr.status == "OK"

    # Localization-only: mapping frozen (InformOnlyTracking).
    tr.allow_new_keyframes = False
    # Simulate the map dropping out (the camera leaving the mapped
    # volume): invalidate every landmark.
    saved_valid = tr.state.points.valid
    tr.state = tr.state._replace(
        points=tr.state.points._replace(
            valid=jnp.zeros_like(saved_valid))
    )
    for i in range(10, 14):
        g, d = seq.gray_depth(i)
        tr.process(g, d, float(seq.stamps[i]))
        # Odometry survives on temporal points — never LOST. (The
        # status may bounce straight back to OK: the keyframe database
        # is intact here, so the per-frame mbVO relocalization attempt
        # re-anchors immediately — exactly Tracking.cc:1000-1047.)
        assert tr.status != "LOST", tr.status
    # The VO fallback attempted relocalization (WEAK + frozen mapping
    # triggers it every frame until one succeeds).
    st = tr.metrics.stages.get("relocalization")
    assert st is not None and st.count >= 1

    # Map returns: tracking re-anchors.
    tr.state = tr.state._replace(
        points=tr.state.points._replace(valid=saved_valid)
    )
    for i in range(14, 18):
        g, d = seq.gray_depth(i)
        tr.process(g, d, float(seq.stamps[i]))
    assert tr.status == "OK"
    # The whole run — including the dropout segment ridden on VO — stays
    # accurate (temporal points carry the pose, like the reference).
    res = evaluate_ate_xyz(tr.camera_positions(), seq.gt_positions())
    assert res.rmse < 0.05, res


def test_covisibility_matrix():
    kp_point = jnp.asarray(
        [
            [0, 1, 2, -1],
            [0, 1, -1, -1],
            [5, 6, 7, 8],
        ],
        dtype=jnp.int32,
    )
    kf_valid = jnp.asarray([True, True, True])
    W = np.asarray(covisibility(kp_point, kf_valid, 16))
    assert W[0, 1] == 2 and W[1, 0] == 2
    assert W[0, 2] == 0 and W[2, 1] == 0
    assert np.all(np.diag(W) == 0)


def test_empty_state_shapes():
    cfg = SlamConfig()
    st = empty_state(cfg)
    assert st.points.pos.shape == (cfg.map.max_map_points, 3)
    assert st.kfs.desc.shape == (cfg.map.max_keyframes, cfg.orb.max_keypoints, 8)
    assert int(st.n_points) == 0 and int(st.n_kfs) == 0
