"""Stereo matching + TrackStereo / TrackMonocular system modes."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.frontend.extractor import extract
from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence
from orb_slam2_ssd_semantic_tpu.ops import image as image_ops
from orb_slam2_ssd_semantic_tpu.ops.stereo import stereo_match
from orb_slam2_ssd_semantic_tpu.system import SlamSystem

CFG = SlamConfig()


def textured(rng, h=480, w=640):
    base = rng.uniform(0, 255, size=(h // 8, w // 8)).astype(np.float32)
    return np.asarray(image_ops.resize_bilinear(jnp.asarray(base), h, w))


def stereo_pair(rng, z=2.0):
    """Fronto-parallel textured plane at depth z: right = left shifted by
    the constant disparity bf/z (exact for a rectified pair)."""
    disp = CFG.camera.bf / z
    left = textured(rng)
    right = np.roll(left, -int(round(disp)), axis=1)
    return left, right, int(round(disp))


def test_stereo_match_constant_depth(rng):
    left, right, disp = stereo_pair(rng, z=2.0)
    fl = extract(jnp.asarray(left), CFG.orb)
    fr = extract(jnp.asarray(right), CFG.orb)
    depth, ur, ok = stereo_match(fl, fr, CFG.camera, CFG.orb)
    okn = np.asarray(ok)
    assert okn.sum() > 100
    z_est = np.asarray(depth)[okn]
    z_true = CFG.camera.bf / disp
    # Median recovered depth within 5% (integer-disparity rendering).
    assert abs(np.median(z_est) - z_true) / z_true < 0.05


def test_track_stereo_smoke(rng):
    left, right, _ = stereo_pair(rng, z=2.0)
    sys_ = SlamSystem(CFG)
    T0 = sys_.track_stereo(left, right, 0.0)
    # Same pair again: pose must stay near identity.
    T1 = sys_.track_stereo(left, right, 1 / 30)
    assert np.all(np.isfinite(T1))
    assert np.linalg.norm(T1[:3, 3]) < 0.05
    assert sys_.tracker._n_kfs >= 1


def test_stereo_extracts_each_image_once(rng):
    """VERDICT r2 #8 done-criterion: the stereo path must run ORB
    extraction exactly once per image — left features from the stereo
    front end thread into the frame build (Frame.cc:196-197 runs L/R
    extraction exactly once, in two threads). Counted at TRACE time with
    a uniquely-shaped config so every program compiles fresh."""
    import dataclasses

    from orb_slam2_ssd_semantic_tpu.config import CameraConfig, OrbConfig
    from orb_slam2_ssd_semantic_tpu.frontend import extractor as ex
    from orb_slam2_ssd_semantic_tpu.tracking import tracker as tk

    # Unique image size => every jit in the path traces in this test.
    cam = CameraConfig(fx=211.0, fy=212.0, cx=126.0, cy=94.0,
                       width=252, height=188, bf=21.0)
    cfg = dataclasses.replace(
        SlamConfig(), camera=cam,
        orb=OrbConfig(n_features=300, max_keypoints=320),
    )
    h, w = cam.height, cam.width
    base = rng.uniform(0, 255, size=(h // 4, w // 4)).astype(np.float32)
    left = np.asarray(image_ops.resize_bilinear(jnp.asarray(base), h, w))
    right = np.roll(left, -10, axis=1)

    calls = {"n": 0}
    orig = ex.extract

    def counting_extract(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    ex.extract = counting_extract
    tk.extract = counting_extract  # tracker imported the symbol directly
    try:
        sys_ = SlamSystem(cfg)
        sys_.track_stereo(left, right, 0.0)
        first = calls["n"]
        sys_.track_stereo(left, right, 1 / 30)
        second = calls["n"] - first
    finally:
        ex.extract = orig
        tk.extract = orig
    # Trace-time: the stereo front end traces extract twice (L + R); the
    # tracking-side programs must trace it ZERO times (they consume the
    # precomputed features). Frame 2 compiles the fused step — again no
    # extraction trace.
    assert first == 2, first
    assert second == 0, second


@pytest.mark.slow
def test_track_monocular_initializes_and_tracks():
    seq = SyntheticSequence(n_frames=12)
    sys_ = SlamSystem(CFG)
    poses = []
    for i in range(len(seq)):
        g, _ = seq.gray_depth(i)
        gray = np.clip(g, 0, 255).astype(np.float32)
        poses.append(sys_.track_monocular(gray, i / 30.0))
    assert sys_.tracker.initialized
    assert sys_.tracker._n_kfs >= 2
    T = poses[-1]
    assert np.all(np.isfinite(T))
    # Camera must have moved (up to the arbitrary monocular scale).
    assert np.linalg.norm(T[:3, 3]) > 1e-3
