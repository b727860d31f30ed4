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
