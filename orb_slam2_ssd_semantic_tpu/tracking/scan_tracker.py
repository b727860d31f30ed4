"""Whole-sequence tracking as a single device-side program.

The offline/throughput mode: all frames are uploaded once (compact
uint8/uint16), the full SLAM update — frame build, motion-model and
local-map tracking, keyframe decision, keyframe insertion with point
spawning, windowed local BA, culling — runs as one `lax.scan` with the
keyframe branch under `lax.cond`, and only the trajectory comes back.
Zero per-frame host round trips: on hardware where each dispatch/fetch
costs tens of milliseconds (remote-attached TPU) this is the difference
between ~1.5 fps and device-limited throughput; it is also exactly the
XLA-idiomatic shape for batch processing (SURVEY.md §7: keep the
per-frame path in one jit; static shapes; lax control flow).

Loop closing stays a host-side pass (it is rare and sequence-global);
run it afterwards on the returned state if desired.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.mapping.local_mapping import local_mapping_step
from orb_slam2_ssd_semantic_tpu.mapping.map_state import SlamState, empty_state
from orb_slam2_ssd_semantic_tpu.tracking import tracker as tk


class ScanCarry(NamedTuple):
    state: SlamState
    last_frame: tk.Frame
    last_T_cw: jnp.ndarray
    last_kp_point: jnp.ndarray
    velocity: jnp.ndarray
    frames_since_kf: jnp.ndarray
    ref_kf_inliers: jnp.ndarray
    frame_idx: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def init_scan(state: SlamState, gray0, depth0, cfg: SlamConfig):
    frame = tk.build_frame(gray0, depth0, cfg)
    T0 = jnp.eye(4, dtype=jnp.float32)
    kp_point = jnp.full((frame.feats.capacity,), -1, jnp.int32)
    state, kp_point = tk.insert_keyframe(
        state, frame, T0, kp_point, 0, 0.0, cfg, spawn_all=True
    )
    carry = ScanCarry(
        state=state,
        last_frame=frame,
        last_T_cw=T0,
        last_kp_point=kp_point,
        velocity=jnp.eye(4, dtype=jnp.float32),
        frames_since_kf=jnp.int32(0),
        ref_kf_inliers=jnp.sum((frame.is_stereo & frame.feats.valid).astype(jnp.int32)),
        frame_idx=jnp.int32(1),
    )
    return carry


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("carry",))
def track_sequence_scan(carry: ScanCarry, grays: jnp.ndarray, depths: jnp.ndarray,
                        cfg: SlamConfig):
    """grays (N, H, W) uint8, depths (N, H, W) uint16 mm.

    Returns (carry, T_cw (N, 4, 4), stats (N, 3) [status, n_inl, n_kfs])."""
    t = cfg.tracking

    def step(carry: ScanCarry, inputs):
        gray, depth = inputs
        state = carry.state
        frame = tk.build_frame(gray, depth, cfg)

        T_pred = carry.velocity @ carry.last_T_cw
        T_mm, _, n_inl_mm = tk.track_motion_model(
            frame, carry.last_frame, carry.last_T_cw, T_pred, cfg,
            map_pos=state.points.pos, map_valid=state.points.valid,
            last_kp_point=carry.last_kp_point,
        )
        mm_jump = jnp.linalg.norm(T_mm[:3, 3] - T_pred[:3, 3])
        ok_mm = (n_inl_mm >= t.min_inliers_track) & (mm_jump < 0.5)

        # TrackReferenceKeyFrame fallback (Tracking.cc:955-966).
        T_ref, n_inl_ref = jax.lax.cond(
            ok_mm,
            lambda: (T_mm, n_inl_mm),
            lambda: tk.track_reference_kf(state, frame, carry.last_T_cw, cfg),
        )
        ok_ref = (~ok_mm) & (n_inl_ref >= t.min_inliers_track)
        ok_pre = ok_mm | ok_ref
        T_seed = jnp.where(ok_mm, T_mm, jnp.where(ok_ref, T_ref, T_pred))

        state, res = tk.track_local_map(state, frame, T_seed, cfg)
        ok_lm = res.n_inliers >= t.min_inliers_local_map
        T_cw = jnp.where(ok_lm, res.T_cw, jnp.where(ok_pre, T_seed, carry.last_T_cw))
        status = jnp.where(ok_lm, 0, jnp.where(ok_pre, 1, 2))

        close = frame.feats.valid & (frame.kp_depth > 0) & (
            frame.kp_depth < cfg.camera.depth_threshold
        )
        n_close_tracked = jnp.sum((close & (res.kp_point >= 0)).astype(jnp.int32))
        n_close_untracked = jnp.sum((close & (res.kp_point < 0)).astype(jnp.int32))
        need_close = (n_close_tracked < t.min_close_points) & (
            n_close_untracked > t.max_non_tracked_close
        )
        need_kf = ok_lm & (
            (carry.frames_since_kf >= t.max_frames_between_kfs)
            | need_close
            | (res.n_inliers < 0.75 * jnp.maximum(carry.ref_kf_inliers, 1))
        ) & (res.n_inliers >= t.min_inliers_track)

        def do_insert(op):
            state, kp_point = op
            state, kp_point = tk.insert_keyframe(
                state, frame, T_cw, kp_point, carry.frame_idx,
                carry.frame_idx.astype(jnp.float32), cfg,
            )
            state = jax.lax.cond(
                state.n_kfs >= 3,
                lambda s: local_mapping_step(s, cfg),
                lambda s: s,
                state,
            )
            return state, kp_point

        state, kp_point = jax.lax.cond(
            need_kf, do_insert, lambda op: op, (state, res.kp_point)
        )
        # Re-anchor on the BA-refined pose when a keyframe was made.
        T_cw = jnp.where(
            need_kf,
            state.kfs.T_cw[state.last_kf],
            T_cw,
        )

        rel = T_cw @ se3.se3_inverse(carry.last_T_cw)
        vel = jnp.where(
            status == 2,
            jnp.eye(4, dtype=jnp.float32),
            se3.se3_exp(t.velocity_damping * se3.se3_log(rel)),
        )
        new_carry = ScanCarry(
            state=state,
            last_frame=frame,
            last_T_cw=T_cw,
            last_kp_point=kp_point,
            velocity=vel,
            frames_since_kf=jnp.where(need_kf, 0, carry.frames_since_kf + 1),
            ref_kf_inliers=jnp.where(need_kf, res.n_inliers, carry.ref_kf_inliers),
            frame_idx=carry.frame_idx + 1,
        )
        out = (T_cw, jnp.stack([status, res.n_inliers, state.n_kfs]))
        return new_carry, out

    carry, (T_all, stats) = jax.lax.scan(step, carry, (grays, depths))
    return carry, T_all, stats


def track_sequence(grays, depths, cfg: SlamConfig):
    """Host entry: numpy (N, H, W) uint8 grays + uint16 mm depths ->
    (poses (N, 4, 4) incl. frame 0, final SlamState, stats)."""
    import numpy as np

    g = jnp.asarray(grays)
    d = jnp.asarray(depths)
    state = empty_state(cfg)
    carry = init_scan(state, g[0], d[0], cfg)
    carry, T_all, stats = track_sequence_scan(carry, g[1:], d[1:], cfg)
    T0 = np.eye(4, dtype=np.float32)[None]
    return (
        np.concatenate([T0, np.asarray(T_all)]),
        carry.state,
        np.asarray(stats),
    )
