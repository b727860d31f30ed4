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

    # Pack 256 bits -> 8 uint32 words (bit b of word w = bit index w*32+b).
    bits = bits.reshape(bits.shape[0], 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = jnp.sum(bits << shifts[None, None, :], axis=-1, dtype=jnp.uint32)
    return jnp.where(valid[:, None], words, jnp.uint32(0))
