"""The device-resident SLAM map: fixed-capacity pytrees of keyframes and
map points with validity masks.

This replaces the reference's mutex-guarded heap-object graph
(perfect/src/Map.cc, KeyFrame.cc, MapPoint.cc — SURVEY.md §2.1 L2) with
the functional idiom from SURVEY.md §7: one `SlamState` value threaded
through jitted step functions. Growth is an allocation cursor into
pre-sized arrays; deletion is mask clearing; "pointers" are int32 ids
(-1 = null). The covisibility graph is derived on demand from the
kp->point association tables rather than maintained as mutable edge
lists (KeyFrame::UpdateConnections equivalent, see covisibility()).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import SlamConfig


class MapPoints(NamedTuple):
    """Columnar MapPoint store (reference MapPoint.cc fields)."""

    pos: jnp.ndarray  # (P, 3) world position
    desc: jnp.ndarray  # (P, 8) uint32 representative descriptor
    normal: jnp.ndarray  # (P, 3) mean viewing direction
    min_dist: jnp.ndarray  # (P,) scale-invariance range (MapPoint.cc:397-446)
    max_dist: jnp.ndarray  # (P,)
    n_obs: jnp.ndarray  # (P,) int32 keyframe observation count
    n_visible: jnp.ndarray  # (P,) int32 times predicted visible in tracking
    n_found: jnp.ndarray  # (P,) int32 times actually matched in tracking
    ref_kf: jnp.ndarray  # (P,) int32 creating keyframe id
    valid: jnp.ndarray  # (P,) bool


class KeyFrames(NamedTuple):
    """Columnar KeyFrame store: pose + feature snapshot + associations."""

    T_cw: jnp.ndarray  # (F, 4, 4) world->camera
    uv: jnp.ndarray  # (F, K, 2) keypoint pixel coords (undistorted)
    level: jnp.ndarray  # (F, K) int32
    angle: jnp.ndarray  # (F, K) float32
    desc: jnp.ndarray  # (F, K, 8) uint32
    depth: jnp.ndarray  # (F, K) float32 keypoint depth (0 = none)
    kp_valid: jnp.ndarray  # (F, K) bool
    kp_point: jnp.ndarray  # (F, K) int32 map-point id per keypoint (-1 none)
    frame_id: jnp.ndarray  # (F,) int32 source frame index
    stamp: jnp.ndarray  # (F,) float32 timestamp
    valid: jnp.ndarray  # (F,) bool


class SlamState(NamedTuple):
    points: MapPoints
    kfs: KeyFrames
    n_points: jnp.ndarray  # () int32 allocation cursor
    n_kfs: jnp.ndarray  # () int32 allocation cursor


def empty_state(cfg: SlamConfig) -> SlamState:
    P = cfg.map.max_map_points
    F = cfg.map.max_keyframes
    K = cfg.orb.max_keypoints
    points = MapPoints(
        pos=jnp.zeros((P, 3), jnp.float32),
        desc=jnp.zeros((P, 8), jnp.uint32),
        normal=jnp.zeros((P, 3), jnp.float32),
        min_dist=jnp.zeros((P,), jnp.float32),
        max_dist=jnp.zeros((P,), jnp.float32),
        n_obs=jnp.zeros((P,), jnp.int32),
        n_visible=jnp.zeros((P,), jnp.int32),
        n_found=jnp.zeros((P,), jnp.int32),
        ref_kf=jnp.full((P,), -1, jnp.int32),
        valid=jnp.zeros((P,), bool),
    )
    kfs = KeyFrames(
        T_cw=jnp.tile(jnp.eye(4, dtype=jnp.float32), (F, 1, 1)),
        uv=jnp.zeros((F, K, 2), jnp.float32),
        level=jnp.zeros((F, K), jnp.int32),
        angle=jnp.zeros((F, K), jnp.float32),
        desc=jnp.zeros((F, K, 8), jnp.uint32),
        depth=jnp.zeros((F, K), jnp.float32),
        kp_valid=jnp.zeros((F, K), bool),
        kp_point=jnp.full((F, K), -1, jnp.int32),
        frame_id=jnp.full((F,), -1, jnp.int32),
        stamp=jnp.zeros((F,), jnp.float32),
        valid=jnp.zeros((F,), bool),
    )
    return SlamState(points, kfs, jnp.int32(0), jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("point_capacity",))
def covisibility(kp_point: jnp.ndarray, kf_valid: jnp.ndarray, point_capacity: int) -> jnp.ndarray:
    """(F, F) int32 covisibility weights: shared-map-point counts between
    keyframe pairs (reference covisibility graph, KeyFrame.h:54-64;
    weight threshold applied by callers), diagonal zeroed.

    Computed as an observation-incidence product: O[f, p] = 1 iff KF f
    observes point p; W = O @ O^T. One MXU matmul replaces the per-KF
    hash-map walks of KeyFrame::UpdateConnections (KeyFrame.cc:370-440).
    """
    F, K = kp_point.shape
    obs = jnp.zeros((F, point_capacity + 1), jnp.float32)
    ids = jnp.where(kp_point >= 0, kp_point, point_capacity)
    obs = obs.at[jnp.arange(F)[:, None], ids].set(1.0)
    obs = obs[:, :point_capacity] * kf_valid[:, None]
    W = (obs @ obs.T).astype(jnp.int32)
    return W - jnp.diag(jnp.diag(W))


@functools.partial(jax.jit, static_argnames=("point_capacity",))
def covisibility_row(
    kp_point: jnp.ndarray, kf_valid: jnp.ndarray, kf_id, point_capacity: int
) -> jnp.ndarray:
    """(F,) shared-point counts between keyframe `kf_id` and every other
    keyframe — the single covisibility row, without materializing the
    (F, P) incidence matrix (used per-keyframe by loop detection)."""
    F, K = kp_point.shape
    ids = kp_point[kf_id]
    present = jnp.zeros((point_capacity + 1,), jnp.float32).at[
        jnp.where(ids >= 0, ids, point_capacity)
    ].set(1.0, mode="drop")
    other = jnp.where(kp_point >= 0, kp_point, point_capacity)
    shared = jnp.sum(present[other], axis=1)  # (F,)
    shared = shared * kf_valid
    return shared.at[kf_id].set(0.0).astype(jnp.int32)


@jax.jit
def point_positions_valid(state: SlamState):
    return state.points.pos, state.points.valid
