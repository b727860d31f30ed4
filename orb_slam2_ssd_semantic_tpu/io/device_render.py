"""Device-side synthetic RGB-D rendering (JAX port of io/synthetic.py's
BoxRoom ray-caster).

Why this exists: the benchmark host is attached to the TPU through a
slow relay — uploading a 60-frame 640x480 sequence costs MINUTES of
wall clock and the numpy supersampled raytrace costs ~3 s/frame on the
2-core host. Rendering on the device turns the whole data phase into
one jitted call: only the (N, 4, 4) poses cross the link, and the VPU
raycasts every frame in parallel.

The scene matches BoxRoom (same walls/furniture layout and the same
multi-scale value-noise texture family; integer hashing runs in uint32
instead of int64, so the texture REALIZATION differs from the numpy
renderer while its statistics — cell pitches, contrast, corner density
— are identical). Ground-truth poses are exact, so ATE evaluation is
unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_ssd_semantic_tpu.config import CameraConfig
from orb_slam2_ssd_semantic_tpu.io.synthetic import _default_boxes


def _hash2(ix, iy, seed):
    """Integer lattice hash -> [0, 1) float32; uint32 wrap arithmetic.
    `seed` may be a per-pixel array (face-dependent texture seeds)."""
    h = (
        ix.astype(jnp.uint32) * jnp.uint32(374761393)
        + iy.astype(jnp.uint32) * jnp.uint32(668265263)
        + seed.astype(jnp.uint32) * jnp.uint32(144665461)
    )
    h = (h ^ (h >> 13)) * jnp.uint32(1274126177)
    h = h ^ (h >> 16)
    return (h & jnp.uint32(0xFFFFFF)).astype(jnp.float32) / jnp.float32(0x1000000)


def _value_noise(x, y, scale, seed):
    fx = x / scale
    fy = y / scale
    ix = jnp.floor(fx).astype(jnp.int32)
    iy = jnp.floor(fy).astype(jnp.int32)
    tx = fx - ix
    ty = fy - iy
    v00 = _hash2(ix, iy, seed)
    v10 = _hash2(ix + 1, iy, seed)
    v01 = _hash2(ix, iy + 1, seed)
    v11 = _hash2(ix + 1, iy + 1, seed)
    return (
        v00 * (1 - tx) * (1 - ty)
        + v10 * tx * (1 - ty)
        + v01 * (1 - tx) * ty
        + v11 * tx * ty
    )


def _texture(u, v, s):
    """Gray texture in [0, 255]; `s` is the per-pixel face seed array."""
    cells = _hash2(jnp.floor(u / 0.25).astype(jnp.int32),
                   jnp.floor(v / 0.25).astype(jnp.int32), s)
    cells2 = _hash2(jnp.floor(u / 0.08).astype(jnp.int32),
                    jnp.floor(v / 0.08).astype(jnp.int32), s + 4)
    cells3 = _hash2(jnp.floor(u / 0.03).astype(jnp.int32),
                    jnp.floor(v / 0.03).astype(jnp.int32), s + 5)
    t = 0.34 * cells + 0.22 * cells2 + 0.12 * cells3
    t = t + 0.22 * _value_noise(u, v, 0.40, s + 1)
    t = t + 0.10 * _value_noise(u, v, 0.10, s + 2)
    return 30.0 + 200.0 * t


def _render_once(T_wc, du, dv, cam: CameraConfig, size, boxes, seed):
    """One point-sampled render: (gray (H, W), depth (H, W))."""
    h, w = cam.height, cam.width
    u = jnp.arange(w, dtype=jnp.float32)[None, :] + du
    v = jnp.arange(h, dtype=jnp.float32)[:, None] + dv
    dx = (u - cam.cx) / cam.fx * jnp.ones((h, 1), jnp.float32)
    dy = (v - cam.cy) / cam.fy * jnp.ones((1, w), jnp.float32)
    dz = jnp.ones((h, w), jnp.float32)
    R = T_wc[:3, :3]
    o = T_wc[:3, 3]
    dirs = [
        R[0, 0] * dx + R[0, 1] * dy + R[0, 2] * dz,
        R[1, 0] * dx + R[1, 1] * dy + R[1, 2] * dz,
        R[2, 0] * dx + R[2, 1] * dy + R[2, 2] * dz,
    ]

    sx, sy, sz = size
    bounds = ((0.0, sx), (0.0, sy), (0.0, sz))
    t_best = jnp.full((h, w), jnp.inf, jnp.float32)
    face_best = jnp.full((h, w), -1, jnp.int32)
    axis_best = jnp.zeros((h, w), jnp.int32)

    # Room walls (viewed from inside).
    for axis in range(3):
        for side in range(2):
            d = dirs[axis]
            denom = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
            t = (bounds[axis][side] - o[axis]) / denom
            ok = t > 1e-6
            for other in range(3):
                if other == axis:
                    continue
                ho = o[other] + t * dirs[other]
                ok &= (ho >= -1e-4) & (ho <= bounds[other][1] + 1e-4)
            closer = ok & (t < t_best)
            t_best = jnp.where(closer, t, t_best)
            face_best = jnp.where(closer, axis * 2 + side, face_best)
            axis_best = jnp.where(closer, axis, axis_best)

    # Furniture boxes (viewed from outside): slab method.
    for bi, (bmin, bmax) in enumerate(boxes):
        tnear = jnp.full((h, w), -jnp.inf, jnp.float32)
        tfar = jnp.full((h, w), jnp.inf, jnp.float32)
        enter_axis = jnp.zeros((h, w), jnp.int32)
        for axis in range(3):
            d = dirs[axis]
            denom = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
            t1 = (bmin[axis] - o[axis]) / denom
            t2 = (bmax[axis] - o[axis]) / denom
            tlo = jnp.minimum(t1, t2)
            thi = jnp.maximum(t1, t2)
            enter_axis = jnp.where(tlo > tnear, axis, enter_axis)
            tnear = jnp.maximum(tnear, tlo)
            tfar = jnp.minimum(tfar, thi)
        hit_ok = (tnear > 1e-6) & (tnear <= tfar)
        closer = hit_ok & (tnear < t_best)
        t_best = jnp.where(closer, tnear, t_best)
        face_best = jnp.where(closer, 6 + bi * 3 + enter_axis, face_best)
        axis_best = jnp.where(closer, enter_axis, axis_best)

    # Texture lookup: one evaluation with per-pixel plane coords + seed.
    hit = [o[c] + t_best * dirs[c] for c in range(3)]
    uc = jnp.where(axis_best == 0, hit[1], hit[0])
    vc = jnp.where(axis_best <= 1, hit[2], hit[1])
    s = jnp.where(face_best >= 0, seed * 7 + face_best, 0)
    gray = _texture(uc, vc, s)
    depth = jnp.where(jnp.isfinite(t_best), t_best, 0.0)
    return gray, depth


@functools.partial(
    jax.jit, static_argnames=("cam", "size", "boxes", "seed", "ss")
)
def render_frames(
    poses_wc: jnp.ndarray,  # (N, 4, 4) camera-to-world
    cam: CameraConfig,
    size=(5.0, 3.0, 6.0),
    boxes=None,
    seed: int = 17,
    ss: int = 3,
):
    """All frames in one device program.

    Returns (grays (N, H, W) uint8, depths (N, H, W) uint16 millimeters)
    — the compact dtypes the scan tracker consumes. `ss` supersamples
    the gray channel (box filter; anti-aliasing is what keeps FAST
    corners viewpoint-stable — io/synthetic.py docstring); depth uses
    the center ray, like a real depth camera."""
    if boxes is None:
        boxes = tuple(_default_boxes(size))

    def one(T_wc):
        gray = jnp.zeros((cam.height, cam.width), jnp.float32)
        depth = None
        for iy in range(ss):
            for ix in range(ss):
                du = (ix + 0.5) / ss - 0.5
                dv = (iy + 0.5) / ss - 0.5
                g, d = _render_once(T_wc, du, dv, cam, size, boxes, seed)
                gray = gray + g
                if abs(du) < 0.5 / ss and abs(dv) < 0.5 / ss:
                    depth = d
        if depth is None:  # even ss: render the exact center ray
            _, depth = _render_once(T_wc, 0.0, 0.0, cam, size, boxes, seed)
        gray = gray / (ss * ss)
        g8 = jnp.clip(gray, 0, 255).astype(jnp.uint8)
        d16 = jnp.clip(depth * 1000.0, 0, 65535).astype(jnp.uint16)
        return g8, d16

    return jax.lax.map(one, poses_wc)
