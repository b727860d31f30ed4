"""ORB front end: FAST detection, selection, orientation, descriptors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_ssd_semantic_tpu.config import OrbConfig
from orb_slam2_ssd_semantic_tpu.frontend.extractor import Features, extract, scale_factors
from orb_slam2_ssd_semantic_tpu.ops import fast as fast_ops
from orb_slam2_ssd_semantic_tpu.ops import image as image_ops
from orb_slam2_ssd_semantic_tpu.ops import select as select_ops
from orb_slam2_ssd_semantic_tpu.ops.orb_descriptor import ic_angle, steered_brief


def checkerboard(h=120, w=160, sq=16, lo=40.0, hi=220.0):
    y, x = np.mgrid[0:h, 0:w]
    img = np.where(((y // sq) + (x // sq)) % 2 == 0, hi, lo)
    return img.astype(np.float32)


def textured_image(rng, h=480, w=640):
    """Smooth random texture with strong blob corners — deterministic."""
    base = rng.uniform(0, 255, size=(h // 8, w // 8)).astype(np.float32)
    img = np.asarray(image_ops.resize_bilinear(jnp.asarray(base), h, w))
    return img


def test_fast_detects_square_corners():
    # Grid of isolated bright squares: L-junction corners have ~12
    # contiguous darker circle pixels — true FAST-9 corners. (A perfect
    # checkerboard X-junction only has 8 contiguous and is correctly
    # rejected by FAST-9.)
    img = np.full((120, 160), 40.0, dtype=np.float32)
    for y0 in range(8, 120 - 16, 32):
        for x0 in range(8, 160 - 16, 32):
            img[y0 : y0 + 16, x0 : x0 + 16] = 220.0
    score = fast_ops.nms3x3(fast_ops.fast_score_map(jnp.asarray(img)))
    ys, xs = np.nonzero(np.asarray(score) > 20)
    assert len(ys) >= 40  # ~4 corners per square, 15 squares
    # Detected corners lie within ~3 px of a square's inner corner pixels.
    corners = [
        (yy, xx)
        for y0 in range(8, 120 - 16, 32)
        for x0 in range(8, 160 - 16, 32)
        for yy in (y0, y0 + 15)
        for xx in (x0, x0 + 15)
    ]
    cy = np.array([c[0] for c in corners])
    cx = np.array([c[1] for c in corners])
    d = np.min(np.abs(ys[:, None] - cy[None]) + np.abs(xs[:, None] - cx[None]), axis=1)
    assert np.median(d) <= 3


def test_fast_rejects_flat_and_edges():
    img = np.full((64, 64), 100.0, dtype=np.float32)
    img[:, 32:] = 200.0  # pure vertical edge
    score = fast_ops.fast_score_map(jnp.asarray(img))
    # Flat regions and straight edges are not FAST corners.
    assert float(jnp.max(score)) < 1.0


def test_fast_score_is_max_threshold():
    img = np.full((32, 32), 100.0, dtype=np.float32)
    img[16, 16] = 180.0  # isolated bright dot: all 16 neighbors darker by 80
    score = fast_ops.fast_score_map(jnp.asarray(img))
    assert abs(float(score[16, 16]) - 80.0) < 1e-4


def test_nms_keeps_single_max():
    img = np.zeros((32, 32), dtype=np.float32)
    img[10, 10] = 5.0
    img[10, 11] = 7.0
    out = np.asarray(fast_ops.nms3x3(jnp.asarray(img)))
    assert out[10, 11] == 7.0 and out[10, 10] == 0.0


def test_select_two_threshold_fallback():
    score = np.zeros((64, 64), dtype=np.float32)
    score[24, 24] = 30.0  # strong cell
    score[40, 40] = 10.0  # weak cell: below ini (20), above min (7)
    uv, s, valid = select_ops.select_keypoints(
        jnp.asarray(score), 20.0, 7.0, cell_size=16, max_per_cell=4, quota=8, border=4
    )
    got = {tuple(map(int, p)) for p, v in zip(np.asarray(uv), np.asarray(valid)) if v}
    assert (24, 24) in got and (40, 40) in got


def test_select_respects_quota_and_uniformity():
    rng = np.random.default_rng(3)
    score = rng.uniform(0, 50, size=(128, 128)).astype(np.float32)
    uv, s, valid = select_ops.select_keypoints(
        jnp.asarray(score), 20.0, 7.0, cell_size=16, max_per_cell=4, quota=32, border=4
    )
    assert int(np.sum(np.asarray(valid))) == 32
    # Round-robin rank ordering => first picks cover distinct cells.
    cells = {(int(x) // 16, int(y) // 16) for x, y in np.asarray(uv)[np.asarray(valid)][:16]}
    assert len(cells) >= 14


def test_ic_angle_rotation_consistency(rng):
    """Rotating an image by 90 deg should rotate IC angles by ~90 deg."""
    img = textured_image(rng, 96, 96)
    j = jnp.asarray(img)
    uv = jnp.asarray([[48.0, 48.0], [40.0, 52.0]])
    valid = jnp.asarray([True, True])
    a0 = np.asarray(ic_angle(j, uv, valid))
    # Rotate image 90 deg CCW: new[y, x] = old[x, H-1-y].
    jr = jnp.asarray(np.rot90(img, k=1).copy())
    h = img.shape[0]
    uv_r = jnp.stack([uv[:, 1], (h - 1) - uv[:, 0]], axis=-1)
    a1 = np.asarray(ic_angle(jr, uv_r, valid))
    # Image-coordinate rotation by +90deg CCW display = angle shift of -90deg in
    # (x right, y down) coords.
    d = np.angle(np.exp(1j * (a1 - a0 + np.pi / 2)))
    assert np.all(np.abs(d) < 0.15)


def test_brief_descriptor_rotation_invariance(rng):
    """Steered BRIEF should be stable under in-plane rotation (90 deg)."""
    img = textured_image(rng, 128, 128)
    j = jnp.asarray(img)
    blurred = image_ops.gaussian_blur(j, 7, 2.0)
    uv = jnp.asarray([[64.0, 64.0], [56.0, 70.0], [72.0, 58.0]])
    valid = jnp.asarray([True, True, True])
    ang = ic_angle(j, uv, valid)
    d0 = np.asarray(steered_brief(blurred, uv, ang, valid))

    imr = np.rot90(img, k=1).copy()
    jr = jnp.asarray(imr)
    h = img.shape[0]
    uv_r = jnp.stack([uv[:, 1], (h - 1) - uv[:, 0]], axis=-1)
    ang_r = ic_angle(jr, uv_r, valid)
    d1 = np.asarray(steered_brief(image_ops.gaussian_blur(jr, 7, 2.0), uv_r, ang_r, valid))

    dist = _hamming(d0, d1)
    rng2 = np.random.default_rng(7)
    rand_pairs = _hamming(d0, d0[[1, 2, 0]])
    # Same keypoint across rotation must be far closer than mismatched pairs.
    assert np.all(dist < 80), dist
    assert np.mean(dist) < np.mean(rand_pairs)


def _hamming(a, b):
    x = np.bitwise_xor(a, b)
    return np.array([bin(int(w)).count("1") for row in x for w in row]).reshape(a.shape).sum(-1)


def test_extract_end_to_end(rng):
    img = textured_image(rng, 480, 640)
    cfg = OrbConfig()
    feats = extract(jnp.asarray(img), cfg)
    assert isinstance(feats, Features)
    n = int(feats.count())
    assert feats.capacity == cfg.max_keypoints
    assert 200 <= n <= cfg.n_features
    v = np.asarray(feats.valid)
    uv = np.asarray(feats.uv)[v]
    assert uv[:, 0].max() < 640 and uv[:, 1].max() < 480
    assert uv[:, 0].min() >= 0 and uv[:, 1].min() >= 0
    lv = np.asarray(feats.level)[v]
    assert lv.min() == 0 and lv.max() >= 2  # multiple pyramid levels used
    d = np.asarray(feats.desc)[v]
    assert np.unique(d, axis=0).shape[0] > 0.9 * d.shape[0]  # descriptors diverse


def test_extract_jit_cache(rng):
    """Second call with same shapes must not retrace (static cfg)."""
    img = jnp.asarray(textured_image(rng, 240, 320))
    cfg = OrbConfig(n_features=500)
    f1 = extract(img, cfg)
    f2 = extract(img + 1.0, cfg)
    assert f1.uv.shape == f2.uv.shape


def test_scale_factors():
    cfg = OrbConfig()
    sf = np.asarray(scale_factors(cfg))
    assert abs(sf[1] - 1.2) < 1e-6 and abs(sf[7] - 1.2**7) < 1e-4
