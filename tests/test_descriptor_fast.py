"""Fast (dense/MXU) descriptor path vs the gather-based reference forms."""

import jax.numpy as jnp
import numpy as np

from orb_slam2_ssd_semantic_tpu.ops import image as image_ops
from orb_slam2_ssd_semantic_tpu.ops.orb_descriptor import (
    N_ANGLE_BINS,
    binned_brief,
    extract_patches,
    ic_angle,
    ic_angle_from_patches,
    quantize_angle,
    steered_brief,
)


def textured(rng, h=200, w=240):
    base = rng.uniform(0, 255, size=(h // 8, w // 8)).astype(np.float32)
    # Integer-valued, like every real input (uint8 frames, the rounded
    # pyramid): the fast paths' bf16 one-hot matmuls are exact exactly
    # on this domain.
    return np.round(np.asarray(image_ops.resize_bilinear(jnp.asarray(base), h, w)))


def keypoints(rng, n, h, w, margin=20):
    uv = np.stack(
        [rng.uniform(margin, w - margin, n), rng.uniform(margin, h - margin, n)], -1
    ).astype(np.float32)
    return jnp.asarray(uv), jnp.ones((n,), bool)


def test_ic_angle_from_patches_exact(rng):
    img = jnp.asarray(textured(rng))
    uv, valid = keypoints(rng, 64, *img.shape)
    a_ref = np.asarray(ic_angle(img, uv, valid))
    a_fast = np.asarray(ic_angle_from_patches(extract_patches(img, uv), valid))
    np.testing.assert_allclose(a_fast, a_ref, atol=1e-4)


def test_extract_patches_exact(rng):
    img = jnp.asarray(textured(rng))
    uv, valid = keypoints(rng, 32, *img.shape)
    p = np.asarray(extract_patches(img, uv))
    x0 = np.round(np.asarray(uv)[:, 0]).astype(int)
    y0 = np.round(np.asarray(uv)[:, 1]).astype(int)
    im = np.asarray(img)
    for k in range(8):
        ref = im[y0[k] - 15 : y0[k] + 16, x0[k] - 15 : x0[k] + 16]
        np.testing.assert_allclose(p[k], ref, atol=1e-4)


def test_binned_brief_matches_steered_at_bin_centers(rng):
    """At bin-center angles the fast path must equal steered_brief bit
    for bit (both use rotate-then-round one-hot sampling)."""
    img = jnp.asarray(textured(rng))
    blurred = jnp.round(image_ops.gaussian_blur(img, 7, 2.0))
    uv, valid = keypoints(rng, 48, *img.shape)
    bins = jnp.asarray(np.arange(48) % N_ANGLE_BINS, jnp.int32)
    ang = bins.astype(jnp.float32) * (2.0 * np.pi / N_ANGLE_BINS)
    d_ref = np.asarray(steered_brief(blurred, uv, ang, valid))
    patches = extract_patches(blurred, uv)
    d_fast = np.asarray(binned_brief(patches, ang, valid))
    np.testing.assert_array_equal(d_fast, d_ref)


def test_quantize_angle_wraps():
    a = jnp.asarray([0.0, 2 * np.pi - 1e-3, -0.05, np.pi])
    b = np.asarray(quantize_angle(a))
    assert b[0] == 0 and b[1] == 0 and b[2] == 0 and b[3] == N_ANGLE_BINS // 2


def test_binned_brief_rotation_invariance(rng):
    """90-deg rotations land exactly on a bin; descriptors must be
    near-identical across the rotation."""
    img = textured(rng, 128, 128)
    j = jnp.asarray(img)
    uv = jnp.asarray([[64.0, 64.0], [56.0, 70.0], [72.0, 58.0]])
    valid = jnp.asarray([True, True, True])
    ang = ic_angle(j, uv, valid)
    p0 = extract_patches(jnp.round(image_ops.gaussian_blur(j, 7, 2.0)), uv)
    d0 = np.asarray(binned_brief(p0, ang, valid))

    imr = np.rot90(img, k=1).copy()
    jr = jnp.asarray(imr)
    h = img.shape[0]
    uv_r = jnp.stack([uv[:, 1], (h - 1) - uv[:, 0]], axis=-1)
    ang_r = ic_angle(jr, uv_r, valid)
    p1 = extract_patches(jnp.round(image_ops.gaussian_blur(jr, 7, 2.0)), uv_r)
    d1 = np.asarray(binned_brief(p1, ang_r, valid))

    x = np.bitwise_xor(d0, d1)
    dist = np.array([bin(int(w)).count("1") for row in x for w in row]).reshape(3, 8).sum(-1)
    assert np.all(dist < 80), dist


def test_blur_patches_matches_full_image_blur(rng):
    from orb_slam2_ssd_semantic_tpu.ops.orb_descriptor import BLUR_PAD, blur_patches

    img = jnp.asarray(textured(rng))
    uv, valid = keypoints(rng, 24, *img.shape, margin=25)
    full = jnp.round(image_ops.gaussian_blur(img, 7, 2.0))
    ref = extract_patches(full, uv)  # 31x31 from the full-image blur
    padded = extract_patches(img, uv, half=15 + BLUR_PAD)
    got = blur_patches(padded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)
