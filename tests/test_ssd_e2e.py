"""End-to-end semantic pipeline with TRAINED weights: detector ->
depth-window fusion -> object database (reference path Detector.cc:27-75
-> Merge2d3d.cc:30-131 -> ObjectDatabase.cc:78-147; VERDICT r1 #7
done-criterion: >= 1 object with centroid error < 0.3 m)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

CKPT = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints", "ssdlite_synthetic.npz"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT),
    reason="trained SSDLite checkpoint not present (apps/train_ssdlite.py)",
)


def _render_scene(c: int = 2, n_classes: int = 3, w: int = 640, h: int = 480):
    """Match the training distribution (semantic/train.py
    synthetic_detection_batch): noisy background, solid-intensity
    rectangle whose intensity band encodes the class."""
    rng = np.random.default_rng(7)
    img = rng.normal(0.0, 0.08, (h, w, 3)).astype(np.float32)
    x1, y1, bw, bh = 0.3, 0.3, 0.35, 0.35  # normalized
    px = [int(x1 * w), int(y1 * h), int((x1 + bw) * w), int((y1 + bh) * h)]
    level = -0.8 + 1.6 * c / n_classes
    img[px[1]:px[3], px[0]:px[2], :] = level + rng.normal(
        0.0, 0.05, (px[3] - px[1], px[2] - px[0], 3)
    )
    rgb = np.clip(img * 127.5 + 127.5, 0, 255).astype(np.uint8)
    return rgb, np.asarray(px, np.float32)


def test_detector_fusion_objectdb_end_to_end():
    from orb_slam2_ssd_semantic_tpu.config import CameraConfig, SemanticConfig
    from orb_slam2_ssd_semantic_tpu.semantic.detector import Detector
    from orb_slam2_ssd_semantic_tpu.semantic.fusion import fuse_depth_window
    from orb_slam2_ssd_semantic_tpu.semantic.object_db import add_objects, empty_db
    from orb_slam2_ssd_semantic_tpu.semantic.ssdlite import load_params

    cam = CameraConfig()
    cfg = SemanticConfig(num_classes=4, det_score_threshold=0.4,
                         fusion_prob_threshold=0.4)
    det = Detector(cfg)
    det.params = load_params(CKPT, det.params)

    target_cls = 2
    rgb, gt_px = _render_scene(c=target_cls)
    out = det(rgb)
    boxes = np.asarray(out.boxes)
    classes = np.asarray(out.classes)
    valid = np.asarray(out.valid)

    def iou(a, b):
        lt = np.maximum(a[:2], b[:2])
        rb = np.minimum(a[2:], b[2:])
        inter = np.prod(np.maximum(rb - lt, 0))
        ua = np.prod(a[2:] - a[:2]) + np.prod(b[2:] - b[:2]) - inter
        return inter / max(ua, 1e-9)

    hits = [
        i for i in range(len(valid))
        if valid[i] and classes[i] == target_cls and iou(boxes[i], gt_px) > 0.3
    ]
    assert hits, (
        f"no detection matched class {target_cls} at {gt_px}: "
        f"{[(int(classes[i]), boxes[i].round(0)) for i in range(len(valid)) if valid[i]][:5]}"
    )

    # Fusion at a 2 m fronto-parallel plane -> expected 3D centroid.
    depth = np.full(rgb.shape[:2], 2.0, np.float32)
    cents, sizes, probs, cls_ids, ok = fuse_depth_window(
        out, jnp.asarray(depth), jnp.eye(4), cam, cfg
    )
    ok = np.asarray(ok)
    assert ok.any()
    cx_px = (gt_px[0] + gt_px[2]) / 2
    cy_px = (gt_px[1] + gt_px[3]) / 2
    expected = np.array([
        (cx_px - cam.cx) / cam.fx * 2.0, (cy_px - cam.cy) / cam.fy * 2.0, 2.0,
    ])

    db = add_objects(
        empty_db(32), cents, sizes, probs, out.classes, jnp.asarray(ok) & out.valid
    )
    dbc = np.asarray(db.centroid)
    dbv = np.asarray(db.valid)
    dbcls = np.asarray(db.class_id)
    errs = [
        np.linalg.norm(dbc[i] - expected)
        for i in range(len(dbv)) if dbv[i] and dbcls[i] == target_cls
    ]
    assert errs and min(errs) < 0.3, errs


CKPT21 = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints", "ssdlite_synthetic_c21.npz"
)


@pytest.mark.skipif(not os.path.exists(CKPT21),
                    reason="21-class checkpoint not present")
def test_default_detector_autoloads_trained_weights():
    """`Detector()` with the DEFAULT config must boot on the trained
    21-class checkpoint (the reference always loads its ncnn model,
    Detector.cc:22-23; VERDICT r2 #2) and actually detect."""
    from orb_slam2_ssd_semantic_tpu.config import SemanticConfig
    from orb_slam2_ssd_semantic_tpu.semantic.detector import Detector
    from orb_slam2_ssd_semantic_tpu.semantic.ssdlite import load_params
    import jax

    det = Detector(SemanticConfig(det_score_threshold=0.4))
    # Weights differ from random init (the checkpoint was loaded).
    _, rand = __import__(
        "orb_slam2_ssd_semantic_tpu.semantic.ssdlite", fromlist=["init_ssdlite"]
    ).init_ssdlite(jax.random.PRNGKey(0), 21)
    leaves_l = jax.tree_util.tree_leaves(det.params)
    leaves_r = jax.tree_util.tree_leaves(rand)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_l, leaves_r)
    )

    target_cls = 2
    rgb, gt_px = _render_scene(c=target_cls)
    out = det(rgb)
    boxes = np.asarray(out.boxes)
    classes = np.asarray(out.classes)
    valid = np.asarray(out.valid)

    def iou(a, b):
        lt = np.maximum(a[:2], b[:2])
        rb = np.minimum(a[2:], b[2:])
        inter = np.prod(np.maximum(rb - lt, 0))
        ua = np.prod(a[2:] - a[:2]) + np.prod(b[2:] - b[:2]) - inter
        return inter / max(ua, 1e-9)

    hits = [
        i for i in range(len(valid))
        if valid[i] and classes[i] == target_cls and iou(boxes[i], gt_px) > 0.3
    ]
    assert hits, (
        f"default detector found nothing for class {target_cls}: "
        f"{[(int(classes[i]), boxes[i].round(0)) for i in range(len(valid)) if valid[i]][:5]}"
    )


def test_batched_bf16_detection_matches_single():
    """detect_batch runs the whole queue through ONE bf16 forward
    (RunDetect.cc:44 processes its queue per wake); it must find the
    same objects as the f32 single-image path on trained weights."""
    from orb_slam2_ssd_semantic_tpu.config import SemanticConfig
    from orb_slam2_ssd_semantic_tpu.semantic.detector import Detector
    from orb_slam2_ssd_semantic_tpu.semantic.ssdlite import load_params

    cfg = SemanticConfig(num_classes=4, det_score_threshold=0.4)
    det = Detector(cfg)
    det.params = load_params(CKPT, det.params)

    scenes = [_render_scene(c=c)[0] for c in (1, 2, 3)]
    singles = [det(s) for s in scenes]
    batched = det.detect_batch(scenes)
    assert len(batched) == 3
    for s, b in zip(singles, batched):
        sv = np.asarray(s.valid)
        bv = np.asarray(b.valid)
        assert sv.sum() == bv.sum() > 0
        # Same classes, boxes within a couple of pixels, scores within
        # the bf16 activation noise.
        np.testing.assert_array_equal(
            np.asarray(s.classes)[sv], np.asarray(b.classes)[bv]
        )
        np.testing.assert_allclose(
            np.asarray(s.boxes)[sv], np.asarray(b.boxes)[bv], atol=3.0
        )
        np.testing.assert_allclose(
            np.asarray(s.scores)[sv], np.asarray(b.scores)[bv], atol=0.05
        )
