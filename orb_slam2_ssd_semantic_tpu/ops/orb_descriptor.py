"""ORB keypoint orientation (intensity-centroid angle) and steered-BRIEF
256-bit descriptors as batched gathers.

Replaces the reference's per-keypoint loops (IC_Angle
perfect/src/ORBextractor.cc:59-90, computeOrbDescriptor
ORBextractor.cc:92-152). Design differences, deliberate and TPU-first:

- Orientation uses the same intensity-centroid moments over the same
  radius-15 circular patch, computed with one batched gather per
  keypoint set rather than per-keypoint row scans.
- The BRIEF sampling pattern is NOT OpenCV's learned bit_pattern_31_
  table (we build from scratch); it is a deterministic Gaussian pattern
  (sigma = patch/5, the BRIEF paper's recipe) seeded once. Descriptors
  are self-consistent within this engine — matching, BoW scoring and
  map serialization all use this pattern — and rotation-steered exactly
  like ORB.
- Descriptors are packed to (N, 8) uint32 words; Hamming distance is
  XOR + popcount on the words (ops/match.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15
N_BITS = 256


@functools.lru_cache()
def _circular_offsets(radius: int = HALF_PATCH) -> np.ndarray:
    """(P, 2) integer (dy, dx) offsets of the circular patch (same disk
    the reference's u_max table walks)."""
    ys, xs = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    m = ys**2 + xs**2 <= radius**2
    return np.stack([ys[m], xs[m]], axis=-1).astype(np.int32)


@functools.lru_cache()
def brief_pattern(seed: int = 1234, n_bits: int = N_BITS, radius: int = 13) -> np.ndarray:
    """(n_bits, 4) float32 (x1, y1, x2, y2) sampling-pair pattern.

    Gaussian-distributed (sigma = patch_size/5 = 6.2) with norm clamped
    to `radius` so any rotation keeps samples inside the half-patch.
    Deterministic: the same pattern for every extractor instance, so
    descriptors serialize/compare across sessions."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, 31 / 5.0, size=(n_bits, 2, 2))
    norm = np.linalg.norm(pts, axis=-1, keepdims=True)
    scale = np.minimum(1.0, radius / np.maximum(norm, 1e-9))
    pts = pts * scale
    return pts.reshape(n_bits, 4).astype(np.float32)


@jax.jit
def ic_angle(img: jnp.ndarray, uv: jnp.ndarray, valid: jnp.ndarray):
    """Intensity-centroid angle at integer keypoint coords.

    img: (H, W) float32, uv: (N, 2) [x, y] (level-local pixel units),
    valid: (N,) bool. Returns angle (N,) float32 radians in [-pi, pi].
    """
    offs = jnp.asarray(_circular_offsets())  # (P, 2) dy, dx
    h, w = img.shape
    x0 = jnp.round(uv[:, 0]).astype(jnp.int32)
    y0 = jnp.round(uv[:, 1]).astype(jnp.int32)
    ys = jnp.clip(y0[:, None] + offs[None, :, 0], 0, h - 1)  # (N, P)
    xs = jnp.clip(x0[:, None] + offs[None, :, 1], 0, w - 1)
    patch = img[ys, xs]  # (N, P)
    m01 = jnp.sum(patch * offs[None, :, 0].astype(img.dtype), axis=1)
    m10 = jnp.sum(patch * offs[None, :, 1].astype(img.dtype), axis=1)
    ang = jnp.arctan2(m01, m10)
    return jnp.where(valid, ang, 0.0)


@jax.jit
def steered_brief(img_blurred: jnp.ndarray, uv: jnp.ndarray, angle: jnp.ndarray, valid: jnp.ndarray):
    """Rotation-steered BRIEF-256 on a blurred image.

    img_blurred: (H, W) float32 (Gaussian pre-blur, as ORB does),
    uv: (N, 2) [x, y] level-local coords, angle: (N,) radians.
    Returns descriptors (N, 8) uint32.
    """
    pat = jnp.asarray(brief_pattern())  # (256, 4)
    h, w = img_blurred.shape
    ca = jnp.cos(angle)[:, None]
    sa = jnp.sin(angle)[:, None]

    def rotate(px, py):
        # (N, 256) rotated integer offsets (reference rounds to int too:
        # ORBextractor.cc GET_VALUE uses cvRound on rotated coords).
        rx = jnp.round(px[None, :] * ca - py[None, :] * sa).astype(jnp.int32)
        ry = jnp.round(px[None, :] * sa + py[None, :] * ca).astype(jnp.int32)
        return rx, ry

    x0 = jnp.round(uv[:, 0]).astype(jnp.int32)[:, None]
    y0 = jnp.round(uv[:, 1]).astype(jnp.int32)[:, None]

    vals = []
    for k in (0, 1):
        rx, ry = rotate(pat[:, 2 * k], pat[:, 2 * k + 1])
        xs = jnp.clip(x0 + rx, 0, w - 1)
        ys = jnp.clip(y0 + ry, 0, h - 1)
        vals.append(img_blurred[ys, xs])  # (N, 256)
    bits = (vals[0] < vals[1]).astype(jnp.uint32)  # (N, 256)
    return _pack_bits(bits, valid)


def _pack_bits(bits: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """(N, 256) 0/1 -> (N, 8) uint32 words (bit b of word w = w*32+b)."""
    bits = bits.reshape(bits.shape[0], 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = jnp.sum(bits << shifts[None, None, :], axis=-1, dtype=jnp.uint32)
    return jnp.where(valid[:, None], words, jnp.uint32(0))


# ---------------------------------------------------------------------------
# Fast TPU path: dense (MXU) formulations of the same operators.
#
# The batched-gather forms above are the readable reference, but 1024
# keypoints x ~1200 samples/keypoint of scalar gathers cost ~12 ms/frame
# on a v5e — gathers are the canonical TPU anti-pattern. The production
# path used by frontend/extractor.py:
#   * orientation: the intensity-centroid moments of EVERY pixel's patch
#     are two 31x31 convolutions (MXU implicit GEMM); keypoints sample
#     the moment maps (2 scalar gathers each). Bit-exact with ic_angle()
#     for keypoints >= 16 px from the border (guaranteed by the
#     extractor's edge margin).
#   * descriptors: the steering rotation is quantized to N_ANGLE_BINS
#     discrete orientations (the original ORB paper's construction: 30
#     bins of 12 deg; we use 32). Each bin's rotated+rounded sampling
#     pattern is a one-hot (512, 961) matrix; sampling every keypoint's
#     31x31 patch against all bins is one (N, 961) x (961, 32*512)
#     matmul, then each keypoint selects its bin's row. One-hot f32
#     matmuls are exact, so this equals steered_brief() evaluated at the
#     bin-center angle.
#   * patches: per-keypoint 31x31 windows extracted with one-hot
#     row/column selector matmuls (exact; ~10x faster than XLA gathers).
# ---------------------------------------------------------------------------

N_ANGLE_BINS = 32
_PATCH = 2 * HALF_PATCH + 1  # 31


@functools.lru_cache()
def _moment_weights() -> np.ndarray:
    """(961, 2) per-pixel (dx*disk, dy*disk) weights for the
    intensity-centroid moments over the radius-15 disk."""
    r = HALF_PATCH
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    disk = (ys**2 + xs**2 <= r**2).astype(np.float32)
    return np.stack([(xs * disk).reshape(-1), (ys * disk).reshape(-1)], -1)


@jax.jit
def ic_angle_from_patches(patches: jnp.ndarray, valid: jnp.ndarray):
    """Intensity-centroid angle from pre-extracted RAW-image patches:
    one (N, 961) x (961, 2) matmul. Bit-identical to ic_angle()."""
    w = jnp.asarray(_moment_weights(), jnp.bfloat16)
    # bf16 is exact here: pixels are integers <= 255, weights integers
    # <= 15; MXU products are exact and accumulate in f32 (sums < 2^24).
    m = jnp.dot(patches.reshape(patches.shape[0], -1).astype(jnp.bfloat16), w,
                preferred_element_type=jnp.float32)  # (N, 2) [m10, m01]
    return jnp.where(valid, jnp.arctan2(m[:, 1], m[:, 0]), 0.0)


@functools.partial(jax.jit, static_argnames=("half",))
def extract_patches(img: jnp.ndarray, uv: jnp.ndarray, half: int = HALF_PATCH) -> jnp.ndarray:
    """Exact (2*half+1)^2 patches at rounded keypoint coords via one-hot
    row/column selector matmuls (clamped at borders, matching the
    gather-based forms). img (H, W) f32, uv (N, 2) -> (N, P, P)."""
    h, w = img.shape
    offs = jnp.arange(-half, half + 1, dtype=jnp.int32)
    x0 = jnp.round(uv[:, 0]).astype(jnp.int32)
    y0 = jnp.round(uv[:, 1]).astype(jnp.int32)
    ys = jnp.clip(y0[:, None] + offs[None, :], 0, h - 1)  # (N, P)
    xs = jnp.clip(x0[:, None] + offs[None, :], 0, w - 1)
    # bf16 one-hot selection is exact for integer-valued images (the
    # pyramid is integer-valued; see image_ops.build_pyramid) and runs at
    # full MXU rate.
    er = (ys[:, :, None] == jnp.arange(h, dtype=jnp.int32)[None, None, :]).astype(jnp.bfloat16)
    rows = jnp.einsum("nrh,hw->nrw", er, img.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    ec = (xs[:, :, None] == jnp.arange(w, dtype=jnp.int32)[None, None, :]).astype(jnp.bfloat16)
    return jnp.einsum("nrw,ncw->nrc", rows.astype(jnp.bfloat16), ec,
                      preferred_element_type=jnp.float32)


BLUR_PAD = 3  # 7x7 gaussian half-width


@jax.jit
def blur_patches(patches: jnp.ndarray) -> jnp.ndarray:
    """Valid-mode 7x7 sigma-2 Gaussian on (N, 31+6, 31+6) patches ->
    (N, 31, 31). For keypoints >= half+BLUR_PAD px inside the image this
    equals sampling image_ops.gaussian_blur(img) at the same window, so
    one padded patch extraction replaces the full-image blur + second
    extraction."""
    from orb_slam2_ssd_semantic_tpu.ops.image import _conv1d_axis, gaussian_kernel1d

    k = jnp.asarray(gaussian_kernel1d(7, 2.0))
    out = _conv1d_axis(patches, k, axis=1)
    # Round like the reference's CV_8U GaussianBlur output
    # (ORBextractor.cc:1105); integer values keep the bf16 BRIEF
    # sampling matmul exact.
    return jnp.round(_conv1d_axis(out, k, axis=2))


@functools.lru_cache()
def _binned_sampling_matrix(n_bins: int = N_ANGLE_BINS) -> np.ndarray:
    """(961, n_bins * 512) one-hot sampling matrix: column (b*512 + s)
    selects the patch pixel of BRIEF sample s under bin-b rotation,
    using the same rotate-then-round rule as steered_brief()."""
    pat = brief_pattern().reshape(N_BITS * 2, 2)  # (512,) [x, y] points
    mats = np.zeros((n_bins, N_BITS * 2, _PATCH * _PATCH), np.float32)
    for b in range(n_bins):
        th = 2.0 * np.pi * b / n_bins
        ca, sa = np.cos(th), np.sin(th)
        rx = np.round(pat[:, 0] * ca - pat[:, 1] * sa).astype(np.int64)
        ry = np.round(pat[:, 0] * sa + pat[:, 1] * ca).astype(np.int64)
        rx = np.clip(rx, -HALF_PATCH, HALF_PATCH)
        ry = np.clip(ry, -HALF_PATCH, HALF_PATCH)
        idx = (ry + HALF_PATCH) * _PATCH + (rx + HALF_PATCH)
        mats[b, np.arange(N_BITS * 2), idx] = 1.0
    return np.ascontiguousarray(mats.transpose(2, 0, 1).reshape(_PATCH * _PATCH, -1))


def quantize_angle(angle: jnp.ndarray, n_bins: int = N_ANGLE_BINS) -> jnp.ndarray:
    """Nearest steering bin (int32 in [0, n_bins))."""
    step = 2.0 * jnp.pi / n_bins
    return jnp.mod(jnp.round(angle / step).astype(jnp.int32), n_bins)


@jax.jit
def binned_brief(patches: jnp.ndarray, angle: jnp.ndarray, valid: jnp.ndarray):
    """Steered BRIEF-256 from pre-extracted 31x31 blurred patches with
    bin-quantized rotation. patches (N, 31, 31) f32 -> (N, 8) uint32.

    Equals steered_brief(img, uv, bin_center_angle, valid) exactly."""
    n = patches.shape[0]
    S = jnp.asarray(_binned_sampling_matrix(), jnp.bfloat16)  # one-hot
    flat = patches.reshape(n, _PATCH * _PATCH).astype(jnp.bfloat16)
    # One-hot selection of integer-valued (rounded-blur) patches: exact
    # in bf16, 4x the f32 MXU rate on this (N, 961) x (961, 16384) GEMM.
    samples = jnp.dot(flat, S, preferred_element_type=jnp.float32)
    samples = samples.reshape(n, N_ANGLE_BINS, N_BITS * 2)
    b = quantize_angle(angle)
    sel = jnp.take_along_axis(samples, b[:, None, None], axis=1)[:, 0]  # (N, 512)
    bits = (sel[:, 0::2] < sel[:, 1::2]).astype(jnp.uint32)  # (N, 256)
    return _pack_bits(bits, valid)
