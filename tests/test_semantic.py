"""Semantic pipeline: SSDLite forward, NMS, object DB, fusion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_ssd_semantic_tpu.config import CameraConfig, SemanticConfig
from orb_slam2_ssd_semantic_tpu.semantic.detector import Detections, Detector, nms_fixed
from orb_slam2_ssd_semantic_tpu.semantic.fusion import fuse_depth_window, segment_objects
from orb_slam2_ssd_semantic_tpu.semantic.object_db import (
    MERGE_RADII,
    add_objects,
    empty_db,
    summarize,
)
from orb_slam2_ssd_semantic_tpu.semantic.ssdlite import (
    VOC_CLASSES,
    decode_boxes,
    init_ssdlite,
    ssd_anchors,
)


def test_ssdlite_forward_shapes():
    model, params = init_ssdlite(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 300, 300, 3), jnp.float32)
    loc, conf = model.apply(params, x)
    A = ssd_anchors().shape[0]
    assert loc.shape == (1, A, 4)
    assert conf.shape == (1, A, 21)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # MobileNetV2-SSDLite is a ~3-5M parameter model.
    assert 2e6 < n_params < 8e6, n_params


def test_anchor_decode_identity():
    anchors = jnp.asarray(ssd_anchors())
    boxes = decode_boxes(jnp.zeros_like(anchors), anchors)
    # Zero offsets decode to the anchors themselves (clipped).
    cx = (boxes[:, 0] + boxes[:, 2]) / 2
    inside = (anchors[:, 0] > 0.2) & (anchors[:, 0] < 0.8) & (anchors[:, 2] < 0.4)
    np.testing.assert_allclose(
        np.asarray(cx[inside]), np.asarray(anchors[inside, 0]), atol=1e-5
    )


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [0, 0, 10, 10]],
        jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    classes = jnp.asarray([1, 1, 1, 2])  # last overlaps first but other class
    _, _, _, keep = nms_fixed(boxes, scores, classes, 4, 0.45)
    assert np.asarray(keep).tolist() == [True, False, True, True]


def test_detector_runs_end_to_end():
    det = Detector(SemanticConfig())
    rgb = np.random.default_rng(0).uniform(0, 255, (480, 640, 3)).astype(np.uint8)
    out = det(rgb)
    assert out.boxes.shape == (32, 4)
    assert out.valid.dtype == bool
    # Untrained net: just structural sanity — valid boxes inside image.
    v = np.asarray(out.valid)
    if v.any():
        b = np.asarray(out.boxes)[v]
        assert b[:, 0].min() >= 0 and b[:, 2].max() <= 640


def test_object_db_merge_and_append():
    db = empty_db(16)
    c = jnp.asarray([[1.0, 0.0, 2.0], [1.02, 0.0, 2.0], [4.0, 0.0, 2.0]])
    s = jnp.ones((3, 3), jnp.float32) * 0.3
    p = jnp.asarray([0.8, 0.9, 0.7])
    cls = jnp.asarray([9, 9, 9], jnp.int32)  # chair, radius 0.5
    db = add_objects(db, c, s, p, cls, jnp.ones(3, bool))
    # First two merge (2 cm apart < 0.5 m radius), third appends.
    assert int(db.cursor) == 2
    objs = summarize(db)
    assert len(objs) == 2
    assert objs[0]["observations"] == 2
    np.testing.assert_allclose(objs[0]["centroid"], [1.01, 0.0, 2.0], atol=1e-5)


def test_object_db_class_separation():
    db = empty_db(16)
    c = jnp.asarray([[1.0, 0.0, 2.0], [1.0, 0.0, 2.0]])
    s = jnp.ones((2, 3), jnp.float32) * 0.2
    p = jnp.asarray([0.8, 0.8])
    cls = jnp.asarray([9, 15], jnp.int32)  # chair vs person at same spot
    db = add_objects(db, c, s, p, cls, jnp.ones(2, bool))
    assert int(db.cursor) == 2  # different classes never merge


def test_fuse_depth_window_synthetic():
    cam = CameraConfig()
    depth = np.full((480, 640), 3.0, np.float32)
    # An "object" at depth 1.5 m filling a known box.
    depth[180:300, 260:380] = 1.5
    det = Detections(
        boxes=jnp.asarray([[260, 180, 380, 300]] + [[0, 0, 1, 1]] * 31, jnp.float32),
        scores=jnp.asarray([0.9] + [0.0] * 31),
        classes=jnp.asarray([9] * 32, jnp.int32),
        valid=jnp.asarray([True] + [False] * 31),
    )
    T_cw = jnp.eye(4, dtype=jnp.float32)
    c, s, p, cls, ok = fuse_depth_window(det, jnp.asarray(depth), T_cw, cam)
    assert bool(ok[0]) and not bool(np.asarray(ok)[1:].any())
    c0 = np.asarray(c[0])
    assert abs(c0[2] - 1.5) < 0.05  # centroid at the object depth
    assert abs(c0[0] - (320 - cam.cx) / cam.fx * 1.5) < 0.1


def test_segment_objects_labels_blob():
    depth = np.full((120, 160), 3.0, np.float32)
    depth[40:80, 60:100] = 1.2  # floating box in front of a wall
    cam = CameraConfig(width=160, height=120, cx=80.0, cy=60.0, fx=200.0, fy=200.0)
    labels = np.asarray(
        segment_objects(jnp.asarray(depth), cam, SemanticConfig(), n_iters=96)
    )
    inner = labels[50:70, 70:90]
    assert (inner >= 0).mean() > 0.9  # blob is labeled
    assert len(np.unique(inner[inner >= 0])) == 1  # one connected component
    wall = labels[:30, :40]
    assert (wall < 0).mean() > 0.9  # plane removed


def test_merge_radii_table():
    assert MERGE_RADII[VOC_CLASSES.index("bottle")] == np.float32(0.06)
    assert MERGE_RADII[VOC_CLASSES.index("person")] == np.float32(0.35)
    assert MERGE_RADII[VOC_CLASSES.index("tvmonitor")] == np.float32(0.25)


def test_detect_locate_app_runs(tmp_path):
    """The standalone detect+locate demo (realtime_dect_loc equivalent)
    runs end-to-end on npy frame pairs without SLAM."""
    import numpy as np

    from orb_slam2_ssd_semantic_tpu.apps import detect_locate

    rng = np.random.default_rng(3)
    for i in range(2):
        rgb = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        depth = np.full((48, 64), 2.0, np.float32)
        np.save(tmp_path / f"rgb_{i}.npy", rgb)
        np.save(tmp_path / f"depth_{i}.npy", depth)
    db = detect_locate.main(["--frames", "2", "--source", str(tmp_path)])
    assert db is not None


def test_object_db_save_load_roundtrip(tmp_path):
    """Object-database persistence: npz roundtrip preserves all columns;
    the txt dump matches the objectD.txt-style listing."""
    from orb_slam2_ssd_semantic_tpu.semantic.object_db import (
        load_db,
        save_db,
        save_objects_txt,
    )

    db = empty_db(8)
    c = jnp.asarray([[1.0, 0.0, 2.0], [4.0, 1.0, 3.0]])
    s = jnp.ones((2, 3), jnp.float32) * 0.3
    db = add_objects(
        db, c, s, jnp.asarray([0.8, 0.7]), jnp.asarray([9, 15], jnp.int32),
        jnp.ones(2, bool),
    )
    path = str(tmp_path / "objects.npz")
    save_db(path, db)
    db2 = load_db(path)
    assert int(db2.cursor) == int(db.cursor)
    np.testing.assert_allclose(np.asarray(db2.centroid), np.asarray(db.centroid))
    assert summarize(db2) == summarize(db)

    txt = str(tmp_path / "objectD.txt")
    save_objects_txt(txt, db2)
    lines = open(txt).read().strip().splitlines()
    assert len(lines) == 2
    assert lines[0].split()[0] == "chair"
    assert lines[1].split()[0] == "person"
