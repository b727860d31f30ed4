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


def _render_once(T_wc, du, dv, cam: CameraConfig, size, boxes_arr, seed,
                 box_gray_arr=None, n_static=None):
    """One point-sampled render: (gray (H, W), depth (H, W)).

    Fully vectorized over walls and furniture boxes (stacked (B, 2, 3)
    array; slab method batched over B) — no per-box Python unrolling, so
    the traced program stays small and compiles fast even through the
    remote-TPU relay (round 2's unrolled variant put the driver one
    cache eviction away from a compile timeout)."""
    h, w = cam.height, cam.width
    u = jnp.arange(w, dtype=jnp.float32)[None, :] + du
    v = jnp.arange(h, dtype=jnp.float32)[:, None] + dv
    dx = (u - cam.cx) / cam.fx * jnp.ones((h, 1), jnp.float32)
    dy = (v - cam.cy) / cam.fy * jnp.ones((1, w), jnp.float32)
    dz = jnp.ones((h, w), jnp.float32)
    R = T_wc[:3, :3]
    o = T_wc[:3, 3]
    dirs = jnp.stack([
        R[0, 0] * dx + R[0, 1] * dy + R[0, 2] * dz,
        R[1, 0] * dx + R[1, 1] * dy + R[1, 2] * dz,
        R[2, 0] * dx + R[2, 1] * dy + R[2, 2] * dz,
    ])  # (3, H, W)
    denom = jnp.where(jnp.abs(dirs) < 1e-9, 1e-9, dirs)

    size_v = jnp.asarray(size, jnp.float32)

    # Room walls (viewed from inside): 6 faces = axis a, side s.
    # t = (bound - o_a) / d_a for each (a, s); in-bounds test on the two
    # other coordinates.
    bound = jnp.stack([jnp.zeros(3), size_v], axis=1)  # (3, 2)
    t_wall = (bound[:, :, None, None] - o[:, None, None, None]) / denom[:, None]
    hitw = o[:, None, None, None, None] + t_wall[None] * dirs[:, None, None]
    # hitw: (3 coord, 3 axis, 2 side, H, W)
    inb = (hitw >= -1e-4) & (hitw <= size_v[:, None, None, None, None] + 1e-4)
    not_self = ~jnp.eye(3, dtype=bool)  # (coord, axis)
    ok_w = (t_wall > 1e-6) & jnp.all(
        inb | ~not_self[:, :, None, None, None], axis=0
    )  # (3, 2, H, W)
    t_w = jnp.where(ok_w, t_wall, jnp.inf).reshape(6, h, w)
    wall_face = jnp.argmin(t_w, axis=0)  # axis*2+side
    t_wall_best = jnp.min(t_w, axis=0)
    wall_axis = wall_face // 2

    # Furniture boxes (viewed from outside): slab method over (B,).
    bmin = boxes_arr[:, 0]  # (B, 3)
    bmax = boxes_arr[:, 1]
    t1 = (bmin[:, :, None, None] - o[None, :, None, None]) / denom[None]
    t2 = (bmax[:, :, None, None] - o[None, :, None, None]) / denom[None]
    tlo = jnp.minimum(t1, t2)  # (B, 3, H, W)
    thi = jnp.maximum(t1, t2)
    tnear = jnp.max(tlo, axis=1)  # (B, H, W)
    tfar = jnp.min(thi, axis=1)
    enter_axis = jnp.argmax(tlo, axis=1).astype(jnp.int32)  # (B, H, W)
    hit_ok = (tnear > 1e-6) & (tnear <= tfar)
    t_b = jnp.where(hit_ok, tnear, jnp.inf)  # (B, H, W)
    bi = jnp.argmin(t_b, axis=0)  # (H, W)
    t_box_best = jnp.min(t_b, axis=0)
    box_axis = jnp.take_along_axis(enter_axis, bi[None], axis=0)[0]

    box_wins = t_box_best < t_wall_best
    t_best = jnp.where(box_wins, t_box_best, t_wall_best)
    face_best = jnp.where(
        box_wins, 6 + bi * 3 + box_axis, wall_face
    )
    face_best = jnp.where(jnp.isfinite(t_best), face_best, -1)
    axis_best = jnp.where(box_wins, box_axis, wall_axis)

    # Texture lookup: one evaluation with per-pixel plane coords + seed.
    hit = o[:, None, None] + t_best[None] * dirs  # (3, H, W)
    uc = jnp.where(axis_best == 0, hit[1], hit[0])
    vc = jnp.where(axis_best <= 1, hit[2], hit[1])
    if n_static is not None and boxes_arr.shape[0] > n_static:
        # MOVING boxes (index >= n_static): anchor the texture to the
        # box's own min corner so the pattern travels WITH the box — a
        # world-anchored texture on a moving surface would look static
        # to optical flow and to the tracker, which defeats the whole
        # dynamic-scene simulation. Static boxes keep the historical
        # world-anchored realization (accuracy gates are tuned on it).
        bmin_sel = bmin[bi]  # (H, W, 3)
        moving = box_wins & (bi >= n_static)
        off_u = jnp.where(axis_best == 0, bmin_sel[..., 1], bmin_sel[..., 0])
        off_v = jnp.where(axis_best <= 1, bmin_sel[..., 2], bmin_sel[..., 1])
        uc = jnp.where(moving, uc - off_u, uc)
        vc = jnp.where(moving, vc - off_v, vc)
    s = jnp.where(face_best >= 0, seed * 7 + face_best, 0)
    gray = _texture(uc, vc, s)
    if box_gray_arr is not None:
        flat = box_gray_arr[bi]
        gray = jnp.where(box_wins & (flat >= 0), flat, gray)
    depth = jnp.where(jnp.isfinite(t_best), t_best, 0.0)
    return gray, depth


@functools.partial(
    jax.jit,
    static_argnames=("cam", "size", "boxes", "seed", "ss", "depth_noise",
                     "box_gray", "moving_gray"),
)
def render_frames(
    poses_wc: jnp.ndarray,  # (N, 4, 4) camera-to-world
    cam: CameraConfig,
    size=(5.0, 3.0, 6.0),
    boxes=None,
    seed: int = 17,
    ss: int = 3,
    depth_noise: float = 0.0,
    box_gray=None,
    moving_boxes=None,
    moving_gray=None,
):
    """All frames in one device program.

    Returns (grays (N, H, W) uint8, depths (N, H, W) uint16 millimeters)
    — the compact dtypes the scan tracker consumes. `ss` supersamples
    the gray channel (box filter; anti-aliasing is what keeps FAST
    corners viewpoint-stable — io/synthetic.py docstring); depth uses
    the center ray, like a real depth camera. `depth_noise` adds
    Kinect-like multiplicative Gaussian depth noise (sigma =
    depth_noise * z, e.g. 0.01 for ~1% — the realistic structured-light
    error model that the exact ray-traced depth otherwise lacks).
    `box_gray`: optional length-B tuple of flat gray overrides per box
    (-1 = textured): boxes with a flat level render as solid-intensity
    rectangles — detectable objects for the synthetic-task SSD (its
    training distribution is solid rectangles on clutter,
    semantic/train.py).

    `moving_boxes`: optional (N, M, 2, 3) per-frame AABBs of MOVING
    boxes (the synthetic analogue of the walking people in TUM
    fr3_walking) rendered in front of the static scene with
    box-anchored texture so their surface pattern travels with them;
    `moving_gray`: optional length-M flat-gray tuple for them (same
    convention as `box_gray`). Ground-truth camera poses are unchanged,
    so ATE evaluation stays exact."""
    if boxes is None:
        boxes = tuple(_default_boxes(size))
    boxes_arr = jnp.asarray(boxes, jnp.float32)  # (B, 2, 3)
    n_static = int(boxes_arr.shape[0])
    mb = None
    if moving_boxes is not None:
        mb = jnp.asarray(moving_boxes, jnp.float32)  # (N, M, 2, 3)
    box_gray_arr = None
    if box_gray is not None or moving_gray is not None:
        g_static = tuple(box_gray) if box_gray is not None else (-1.0,) * n_static
        g_moving = ()
        if mb is not None:
            n_mov = int(mb.shape[1])
            g_moving = (tuple(moving_gray) if moving_gray is not None
                        else (-1.0,) * n_mov)
        box_gray_arr = jnp.asarray(g_static + g_moving, jnp.float32)

    offs = jnp.asarray(
        [
            ((ix + 0.5) / ss - 0.5, (iy + 0.5) / ss - 0.5)
            for iy in range(ss)
            for ix in range(ss)
        ],
        jnp.float32,
    )  # (ss*ss, 2)

    def one(T_wc, frame_boxes=None):
        # Subsamples via lax.map: the render body is traced ONCE, not
        # ss^2 times — the program is ~9x smaller and compiles that much
        # faster (the data phase's wall-clock risk is compile, not
        # compute).
        if frame_boxes is not None:
            all_boxes = jnp.concatenate([boxes_arr, frame_boxes], axis=0)
        else:
            all_boxes = boxes_arr

        def sub(off):
            g, _ = _render_once(
                T_wc, off[0], off[1], cam, size, all_boxes, seed,
                box_gray_arr, n_static=n_static,
            )
            return g
        gray = jnp.mean(jax.lax.map(sub, offs), axis=0)
        # Depth uses the exact center ray, like a real depth camera.
        _, depth = _render_once(T_wc, 0.0, 0.0, cam, size, all_boxes, seed,
                                box_gray_arr, n_static=n_static)
        if depth_noise > 0.0:
            # Deterministic per-pose noise field (keyed on the camera
            # position so every frame differs but reps are identical).
            key = jax.random.fold_in(
                jax.random.PRNGKey(seed),
                (jnp.abs(T_wc[0, 3] * 1e4) + jnp.abs(T_wc[2, 3] * 1e2))
                .astype(jnp.int32),
            )
            depth = depth * (
                1.0 + depth_noise * jax.random.normal(key, depth.shape)
            )
        g8 = jnp.clip(gray, 0, 255).astype(jnp.uint8)
        d16 = jnp.clip(depth * 1000.0, 0, 65535).astype(jnp.uint16)
        return g8, d16

    if mb is not None:
        return jax.lax.map(lambda args: one(*args), (poses_wc, mb))
    return jax.lax.map(one, poses_wc)
