"""Pinhole camera model: projection, back-projection, undistortion.

Replaces the reference's per-keypoint cv:: calls (Frame::UndistortKeyPoints
perfect/src/Frame.cc:439-467, Frame::UnprojectStereo Frame.cc:522+) with
batched array ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import CameraConfig


def intrinsics_matrix(cam: CameraConfig, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array(
        [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]], dtype=dtype
    )


def project(pts_cam: jnp.ndarray, cam: CameraConfig):
    """Project camera-frame points (..., 3) -> pixel coords (..., 2) and depth.

    Returns (uv, z). Callers gate on z > 0 themselves.
    """
    z = pts_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * pts_cam[..., 0] / z_safe + cam.cx
    v = cam.fy * pts_cam[..., 1] / z_safe + cam.cy
    return jnp.stack([u, v], axis=-1), z


def backproject(uv: jnp.ndarray, depth: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    """Pixel coords (..., 2) + depth (...,) -> camera-frame points (..., 3)."""
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def in_image(uv: jnp.ndarray, cam: CameraConfig, border: float = 0.0) -> jnp.ndarray:
    """(..., 2) -> bool mask of points inside the image bounds."""
    u, v = uv[..., 0], uv[..., 1]
    return (
        (u >= border)
        & (u < cam.width - border)
        & (v >= border)
        & (v < cam.height - border)
    )


def distort(uv_norm: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    """Apply radial/tangential distortion to normalized coords (..., 2)."""
    x, y = uv_norm[..., 0], uv_norm[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2 + cam.k3 * r2 * r2 * r2
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(uv: jnp.ndarray, cam: CameraConfig, iters: int = 5) -> jnp.ndarray:
    """Iteratively undistort pixel coords (..., 2) (fixed-point inverse of
    `distort`, the batched equivalent of cv::undistortPoints as used in
    Frame::UndistortKeyPoints). No-op when all coefficients are zero."""
    if cam.k1 == 0.0 and cam.k2 == 0.0 and cam.p1 == 0.0 and cam.p2 == 0.0 and cam.k3 == 0.0:
        return uv
    xn = (uv[..., 0] - cam.cx) / cam.fx
    yn = (uv[..., 1] - cam.cy) / cam.fy
    x, y = xn, yn
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2 + cam.k3 * r2 * r2 * r2
        dx = 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
        dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
        x = (xn - dx) / radial
        y = (yn - dy) / radial
    return jnp.stack([x * cam.fx + cam.cx, y * cam.fy + cam.cy], axis=-1)


def stereo_right_u(uv: jnp.ndarray, depth: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    """Virtual right-camera u coordinate from RGB-D depth
    (Frame::ComputeStereoFromRGBD, perfect/src/Frame.cc:494-520):
    uR = u - bf/z for valid depth, else -1."""
    z_safe = jnp.where(depth > 1e-6, depth, 1.0)
    u_r = uv[..., 0] - cam.depth_bf / z_safe
    return jnp.where(depth > 1e-6, u_r, -1.0)
