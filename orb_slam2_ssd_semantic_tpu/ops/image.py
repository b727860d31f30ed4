"""Dense image ops: separable Gaussian blur, bilinear resize, pyramids.

TPU-native replacements for the cv:: routines in the reference front end
(GaussianBlur + resize in perfect/src/ORBextractor.cc:1105-1143). All ops
take (H, W) float32 images (batch dims via vmap) and are jit-friendly
with static shapes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    """Matches cv::getGaussianKernel for odd ksize."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur with reflect padding (BORDER_REFLECT_101
    equivalent), as applied before BRIEF sampling (ORBextractor.cc:1105)."""
    k = jnp.asarray(gaussian_kernel1d(ksize, sigma))
    pad = ksize // 2
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="reflect")
    # Row convolution via stacked rolls (small k, VPU-friendly).
    x = _conv1d_axis(x, k, axis=0)[..., :, :]
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    x = _conv1d_axis(x, k, axis=1)
    return x


def _conv1d_axis(x: jnp.ndarray, k: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Valid-mode 1D correlation along `axis` using shifted slices."""
    ksize = k.shape[0]
    n = x.shape[axis] - ksize + 1
    out = None
    for i in range(ksize):
        sl = jax.lax.slice_in_dim(x, i, i + n, axis=axis)
        out = sl * k[i] if out is None else out + sl * k[i]
    return out


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize (cv::resize INTER_LINEAR equivalent)."""
    return jax.image.resize(img, (out_h, out_w), method="linear")


def pyramid_shapes(h: int, w: int, n_levels: int, scale_factor: float):
    """Per-level (h, w) with the reference's rounding
    (ORBextractor::ComputePyramid, ORBextractor.cc:1117-1146: cvRound of
    base/scale)."""
    shapes = []
    for lvl in range(n_levels):
        inv = 1.0 / (scale_factor**lvl)
        shapes.append((int(round(h * inv)), int(round(w * inv))))
    return shapes


def build_pyramid(img: jnp.ndarray, n_levels: int, scale_factor: float):
    """List of per-level images, level 0 = input. Successive-resize like the
    reference (each level resized from the previous, not from level 0).

    Levels are rounded to integer values — the reference's pyramid is
    CV_8U (ORBextractor.cc:1117-1146), so every downstream consumer sees
    integer pixels there too. Integer-valued levels also make the
    extractor's bf16 one-hot patch/descriptor matmuls exact (integers
    <= 255 are representable in bf16)."""
    h, w = img.shape
    shapes = pyramid_shapes(h, w, n_levels, scale_factor)
    levels = [img]
    for lvl in range(1, n_levels):
        levels.append(jnp.round(resize_bilinear(levels[-1], *shapes[lvl])))
    return levels


def sobel(img: jnp.ndarray):
    """Sobel gradients (gx, gy) with reflect padding."""
    kd = jnp.asarray([-1.0, 0.0, 1.0], dtype=img.dtype)
    ks = jnp.asarray([1.0, 2.0, 1.0], dtype=img.dtype)
    p = jnp.pad(img, 1, mode="reflect")
    gx = _conv1d_axis(_conv1d_axis(p, kd, axis=1), ks, axis=0)
    gy = _conv1d_axis(_conv1d_axis(p, ks, axis=1), kd, axis=0)
    return gx, gy


def box_filter(img: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Mean filter with reflect padding (normalized box)."""
    k = jnp.full((ksize,), 1.0 / ksize, dtype=img.dtype)
    pad = ksize // 2
    x = jnp.pad(img, ((pad, pad), (pad, pad)), mode="reflect")
    x = _conv1d_axis(x, k, axis=0)
    x = _conv1d_axis(x, k, axis=1)
    return x


def bilinear_sample(img: jnp.ndarray, uv: jnp.ndarray, fill: float = 0.0):
    """Sample img (H, W) at continuous pixel coords uv (..., 2) = (u=x, v=y).

    Returns (values (...,), in_bounds mask (...,)). The batched equivalent
    of per-keypoint subpixel reads scattered through the reference."""
    h, w = img.shape
    u = uv[..., 0]
    v = uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    valid = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)

    def tap(vi, ui):
        vi = jnp.clip(vi, 0, h - 1)
        ui = jnp.clip(ui, 0, w - 1)
        return img[vi, ui]

    val = (
        tap(v0i, u0i) * (1 - du) * (1 - dv)
        + tap(v0i, u0i + 1) * du * (1 - dv)
        + tap(v0i + 1, u0i) * (1 - du) * dv
        + tap(v0i + 1, u0i + 1) * du * dv
    )
    return jnp.where(valid, val, fill), valid


def nearest_sample(img: jnp.ndarray, uv: jnp.ndarray, fill: float = 0.0):
    """Nearest-neighbor sample (used for depth maps, where interpolation
    across depth discontinuities is wrong)."""
    h, w = img.shape
    ui = jnp.round(uv[..., 0]).astype(jnp.int32)
    vi = jnp.round(uv[..., 1]).astype(jnp.int32)
    valid = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
    val = img[jnp.clip(vi, 0, h - 1), jnp.clip(ui, 0, w - 1)]
    return jnp.where(valid, val, fill), valid


def robust_depth_sample(depth: jnp.ndarray, uv: jnp.ndarray,
                        rel_tol: float = 0.02):
    """Depth sample at continuous coords: BILINEAR where the 2x2
    neighborhood is depth-consistent, NEAREST at discontinuities.

    Nearest-only sampling (the reference reads mImDepth at the rounded
    keypoint pixel, Frame.cc ComputeStereoFromRGBD) carries a half-pixel
    positional bias: on a surface seen at a grazing angle the depth
    gradient across one pixel is several cm at 5 m, so the rounded-pixel
    read is a *biased* estimate of the depth at the keypoint's subpixel
    location. That bias is what forced the depth-residual weight down to
    depth_bf=40 (r3); with consistent-neighborhood bilinear sampling the
    smooth-surface bias vanishes while depth edges (neighbor spread >
    rel_tol * depth, or any invalid neighbor) still fall back to the
    nearest valid read.

    Returns (depth (...,), valid (...,)): valid where in-bounds and the
    chosen sample is > 0."""
    h, w = depth.shape
    u = uv[..., 0]
    v = uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    in_b = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)

    def tap(vi, ui):
        return depth[jnp.clip(vi, 0, h - 1), jnp.clip(ui, 0, w - 1)]

    d00 = tap(v0i, u0i)
    d10 = tap(v0i, u0i + 1)
    d01 = tap(v0i + 1, u0i)
    d11 = tap(v0i + 1, u0i + 1)
    taps = jnp.stack([d00, d10, d01, d11], axis=-1)
    all_pos = jnp.all(taps > 1e-6, axis=-1)
    spread = jnp.max(taps, axis=-1) - jnp.min(taps, axis=-1)
    mean_d = jnp.mean(taps, axis=-1)
    smooth = all_pos & (spread <= rel_tol * mean_d)

    bil = (
        d00 * (1 - du) * (1 - dv)
        + d10 * du * (1 - dv)
        + d01 * (1 - du) * dv
        + d11 * du * dv
    )
    near, _ = nearest_sample(depth, uv)
    val = jnp.where(smooth, bil, near)
    valid = in_b & (val > 1e-6)
    return jnp.where(valid, val, 0.0), valid


def erode(mask: jnp.ndarray, ksize: int, iterations: int = 1) -> jnp.ndarray:
    """Binary erosion with a ksize x ksize ellipse structuring element
    (cv::erode equivalent; Flow.cc:42-48 uses MORPH_ELLIPSE 21x21)."""
    se = _ellipse_se(ksize)
    out = mask.astype(jnp.float32)
    for _ in range(iterations):
        out = -_dilate_se(-out, se)
    return out > 0.5


def dilate(mask: jnp.ndarray, ksize: int, iterations: int = 1) -> jnp.ndarray:
    se = _ellipse_se(ksize)
    out = mask.astype(jnp.float32)
    for _ in range(iterations):
        out = _dilate_se(out, se)
    return out > 0.5


def _ellipse_se(ksize: int) -> np.ndarray:
    r = (ksize - 1) / 2.0
    y, x = np.mgrid[-math.floor(r) : math.floor(r) + 1, -math.floor(r) : math.floor(r) + 1]
    return ((x / r) ** 2 + (y / r) ** 2 <= 1.0 + 1e-9).astype(np.float32)


def _dilate_se(x: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    """Grayscale dilation (max-pool with arbitrary SE) via reduce_window."""
    k = se.shape[0]
    pad = k // 2
    # Use max over shifted slices where SE is set (SE is small and static).
    xp = jnp.pad(x, pad, mode="constant", constant_values=-jnp.inf)
    out = jnp.full_like(x, -jnp.inf)
    h, w = x.shape
    for dy in range(k):
        for dx in range(k):
            if se[dy, dx] > 0:
                out = jnp.maximum(out, jax.lax.dynamic_slice(xp, (dy, dx), (h, w)))
    return out
