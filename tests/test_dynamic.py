"""Dynamic-environment filter: flow mask, geometry mask, homography."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_ssd_semantic_tpu.config import CameraConfig, DynamicConfig, SlamConfig
from orb_slam2_ssd_semantic_tpu.dynamic.flowmask import flow_dynamic_mask, static_area_fraction
from orb_slam2_ssd_semantic_tpu.dynamic.geommask import (
    empty_ref_views,
    geometry_dynamic_mask,
    insert_ref_view,
)
from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence
from orb_slam2_ssd_semantic_tpu.ops import flow as flow_ops
from orb_slam2_ssd_semantic_tpu.ops.homography import apply_homography, find_homography_ransac


def test_dense_flow_recovers_translation(rng):
    base = rng.uniform(0, 255, (40, 52)).astype(np.float32)
    from orb_slam2_ssd_semantic_tpu.ops.image import resize_bilinear

    img = np.asarray(resize_bilinear(jnp.asarray(base), 160, 208))
    shift = 3
    prev = img[:, : 208 - 8][:152]
    cur = img[:, shift : 208 - 8 + shift][:152]
    # cur(x) = img(x + shift): content moves LEFT, so flow_x = -shift.
    f = np.asarray(flow_ops.dense_flow(jnp.asarray(prev), jnp.asarray(cur)))
    inner = f[30:-30, 30:-30]
    assert abs(np.median(inner[..., 0]) + shift) < 0.35
    assert abs(np.median(inner[..., 1])) < 0.35


def test_homography_ransac_with_outliers(rng):
    H_true = np.array([[1.02, 0.01, 4.0], [-0.01, 0.99, -2.0], [1e-5, -2e-5, 1.0]], np.float32)
    n = 200
    src = rng.uniform(50, 590, (n, 2)).astype(np.float32)
    dst = np.array(apply_homography(jnp.asarray(H_true), jnp.asarray(src[None])))[0]
    dst[:50] += rng.uniform(20, 80, (50, 2)).astype(np.float32)  # outliers
    valid = np.ones(n, bool)
    H, inl, n_inl = find_homography_ransac(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(valid), jax.random.PRNGKey(0)
    )
    assert int(n_inl) > 130
    proj = np.asarray(apply_homography(H, jnp.asarray(src[50:][None])))[0]
    err = np.linalg.norm(proj - dst[50:], axis=-1)
    assert np.median(err) < 1.0


@pytest.fixture(scope="module")
def dyn_seq():
    return SyntheticSequence(n_frames=8, dynamic_objects=True)


def test_flow_mask_detects_moving_object(dyn_seq):
    g0, _ = dyn_seq.gray_depth(2)
    g1, _ = dyn_seq.gray_depth(3)
    gt = dyn_seq.dynamic_mask(3)
    static = np.asarray(
        flow_dynamic_mask(jnp.asarray(g0), jnp.asarray(g1), DynamicConfig())
    )
    dynamic = ~static
    # Most detected-dynamic pixels should be on/near the true moving
    # object, and a decent share of the object must be caught.
    recall = dynamic[gt].mean() if gt.any() else 0.0
    false_rate = dynamic[~gt].mean()
    assert recall > 0.25, recall
    assert false_rate < 0.08, false_rate
    assert static_area_fraction(jnp.asarray(static)) > 0.8


def test_flow_mask_fitted_homography(dyn_seq):
    """The fitted-H path (TrackHomo + findHomography parity, VERDICT #6):
    precision/recall on ground-truth moving pixels, with the camera
    translating (the rotation-only H round 1 used cannot cancel this)."""
    from orb_slam2_ssd_semantic_tpu.dynamic.flowmask import flow_dynamic_mask_fitted

    g0, _ = dyn_seq.gray_depth(2)
    g1, _ = dyn_seq.gray_depth(3)
    gt = dyn_seq.dynamic_mask(3)
    static = np.asarray(
        flow_dynamic_mask_fitted(jnp.asarray(g0), jnp.asarray(g1), DynamicConfig())
    )
    dynamic = ~static
    recall = dynamic[gt].mean() if gt.any() else 0.0
    false_rate = dynamic[~gt].mean()
    # Recall bar is a little lower than the raw-flow test's: the fitted H
    # removes the ego-motion flow that inflates border detections there,
    # and the reference's double-erode then trims the object boundary.
    assert recall > 0.15, recall
    assert false_rate < 0.05, false_rate
    assert static_area_fraction(jnp.asarray(static)) > 0.8


def test_geometry_mask_detects_moving_object(dyn_seq):
    cam = CameraConfig()
    cfg = DynamicConfig()
    db = empty_ref_views(cfg.geom_db_size, 1024)
    # Reference view: frame 0 WITHOUT the moving object (static scene) —
    # keypoints on a grid with exact depth.
    _, d_ref = dyn_seq.room.render(dyn_seq.poses_wc[0], ss=1)
    ys, xs = np.mgrid[24:456:14, 24:616:14]
    uv = np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.float32)[:1024]
    depth_kp = d_ref[uv[:, 1].astype(int), uv[:, 0].astype(int)]
    T0 = np.linalg.inv(dyn_seq.poses_wc[0]).astype(np.float32)
    pad = 1024 - uv.shape[0]
    uv_p = np.pad(uv, ((0, pad), (0, 0)))
    d_p = np.pad(depth_kp, (0, pad))
    v_p = np.pad(np.ones(uv.shape[0], bool), (0, pad))
    db = insert_ref_view(db, jnp.asarray(T0), jnp.asarray(uv_p), jnp.asarray(d_p), jnp.asarray(v_p))

    # Current frame 6 WITH the moving object in view.
    i = 6
    _, d_cur = dyn_seq.gray_depth(i)
    gt = dyn_seq.dynamic_mask(i)
    T_cur = np.linalg.inv(dyn_seq.poses_wc[i]).astype(np.float32)
    static = np.asarray(
        geometry_dynamic_mask(db, jnp.asarray(T_cur), jnp.asarray(d_cur), cam, cfg)
    )
    dynamic = ~static
    assert gt.any()
    recall = dynamic[gt].mean()
    false_rate = dynamic[~gt].mean()
    assert recall > 0.4, recall
    assert false_rate < 0.05, false_rate


def test_masked_tracking_on_dynamic_scene(dyn_seq):
    """End-to-end: flow-masked tracking on the dynamic scene tracks at
    least as well as unmasked (config 3 of BASELINE.json)."""
    from orb_slam2_ssd_semantic_tpu.eval.ate import evaluate_ate_xyz
    from orb_slam2_ssd_semantic_tpu.tracking.tracker import Tracker

    seq = SyntheticSequence(n_frames=12, dynamic_objects=True)
    results = {}
    for name, dyn_cfg in [
        ("plain", DynamicConfig()),
        ("flow", DynamicConfig(enable_flow=True)),
    ]:
        cfg = SlamConfig(dynamic=dyn_cfg)
        tr = Tracker(cfg)
        for i in range(len(seq)):
            g, d = seq.gray_depth(i)
            tr.process(g, d, float(seq.stamps[i]))
        results[name] = evaluate_ate_xyz(tr.camera_positions(), seq.gt_positions()).rmse
    assert results["flow"] < 0.02
    assert results["flow"] <= results["plain"] * 1.5 + 0.002
