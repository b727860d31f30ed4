"""Depth-to-color registration and image undistortion for live cameras.

The reference's live driver re-registers the depth sensor's image into
the color camera's frame on the host per frame (perfect/Examples/RGB-D/
my_rgbd.cc: TY SDK `doRegister`/undistortion before TrackRGBD). Here
both are batched device kernels: registration is a forward-warp
scatter-min (z-buffered so the nearest surface wins occlusions), and
undistortion is one bilinear gather over a precomputed remap grid —
both one XLA program, no per-pixel host loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import CameraConfig
from orb_slam2_ssd_semantic_tpu.geometry import camera as cam_ops
from orb_slam2_ssd_semantic_tpu.ops.image import bilinear_sample


@functools.partial(jax.jit, static_argnames=("cam_d", "cam_c", "out_h", "out_w"))
def register_depth_to_color(
    depth: jnp.ndarray,  # (Hd, Wd) meters, 0 = invalid
    T_cd: jnp.ndarray,  # (4, 4) depth-camera -> color-camera extrinsic
    cam_d: CameraConfig,
    cam_c: CameraConfig,
    out_h: int,
    out_w: int,
) -> jnp.ndarray:
    """Forward-warp the depth image into the color camera's pixel grid.

    Every depth pixel backprojects through cam_d, moves through T_cd,
    and projects through cam_c; collisions resolve by scatter-min on z
    (nearest surface wins), mirroring the TY SDK's register step the
    reference calls before tracking. Returns (out_h, out_w) meters with
    0 where no depth landed.
    """
    Hd, Wd = depth.shape
    v, u = jnp.meshgrid(jnp.arange(Hd, dtype=depth.dtype),
                        jnp.arange(Wd, dtype=depth.dtype), indexing="ij")
    uv = jnp.stack([u.ravel(), v.ravel()], -1)  # (N, 2)
    z = depth.ravel()
    p_d = cam_ops.backproject(uv, z, cam_d)  # (N, 3)
    R, t = T_cd[:3, :3], T_cd[:3, 3]
    p_c = p_d @ R.T + t
    zc = p_c[:, 2]
    ok = (z > 0) & (zc > 1e-6)
    uc = jnp.round(cam_c.fx * p_c[:, 0] / jnp.maximum(zc, 1e-6) + cam_c.cx).astype(jnp.int32)
    vc = jnp.round(cam_c.fy * p_c[:, 1] / jnp.maximum(zc, 1e-6) + cam_c.cy).astype(jnp.int32)
    ok &= (uc >= 0) & (uc < out_w) & (vc >= 0) & (vc < out_h)
    # Invalid rays scatter into a trash cell past the image.
    flat = jnp.where(ok, vc * out_w + uc, out_h * out_w)
    out = jnp.full((out_h * out_w + 1,), jnp.inf, depth.dtype)
    out = out.at[flat].min(jnp.where(ok, zc, jnp.inf))
    out = out[:-1].reshape(out_h, out_w)
    return jnp.where(jnp.isfinite(out), out, 0.0)


@functools.partial(jax.jit, static_argnames=("cam",))
def undistort_image(img: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    """Undistort an (H, W) or (H, W, C) image by inverse mapping: for
    each rectified pixel, distort its normalized ray (the reference's
    cv::undistort/initUndistortRectifyMap role in my_rgbd.cc) and
    bilinearly sample the raw image."""
    H, W = img.shape[0], img.shape[1]
    v, u = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    xn = (u - cam.cx) / cam.fx
    yn = (v - cam.cy) / cam.fy
    uvn = jnp.stack([xn.ravel(), yn.ravel()], -1)
    uvd = cam_ops.distort(uvn, cam)  # normalized, distortion applied
    src = jnp.stack([uvd[:, 0] * cam.fx + cam.cx,
                     uvd[:, 1] * cam.fy + cam.cy], -1)
    if img.ndim == 2:
        out, _ = bilinear_sample(img.astype(jnp.float32), src)
        return out.reshape(H, W)
    chans = [bilinear_sample(img[..., c].astype(jnp.float32), src)[0].reshape(H, W)
             for c in range(img.shape[-1])]
    return jnp.stack(chans, -1)
