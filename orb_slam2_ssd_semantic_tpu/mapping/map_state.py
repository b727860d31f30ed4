"""The device-resident SLAM map: fixed-capacity pytrees of keyframes and
map points with validity masks.

This replaces the reference's mutex-guarded heap-object graph
(perfect/src/Map.cc, KeyFrame.cc, MapPoint.cc — SURVEY.md §2.1 L2) with
the functional idiom from SURVEY.md §7: one `SlamState` value threaded
through jitted step functions. Growth allocates the lowest-index free
slots (erase+reuse, like the reference's KeyFrame/MapPoint deletion —
`Map::EraseMapPoint` Map.cc:38-47 — rather than a monotonic cursor, so
long runs never exhaust capacity); deletion is mask clearing plus
reference clearing; "pointers" are int32 slot ids (-1 = null).

Keyframes additionally carry a monotonically-increasing `uid` (the
reference's KeyFrame::mnId): slots are reused, uids never are. Temporal
ordering (which KF is newest, culling ages, loop-closure gating) uses
uids; indexing uses slots. When a keyframe is culled its slot records
the spanning-tree parent (`parent_uid`, `T_rel_parent`) so trajectory
entries referenced to it resolve through the parent exactly like the
reference's SaveTrajectoryTUM spanning-tree walk (System.cc:487-493).

The covisibility graph is derived on demand from the kp->point
association tables rather than maintained as mutable edge lists
(KeyFrame::UpdateConnections equivalent, see covisibility()).
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
    ref_kf: jnp.ndarray  # (P,) int32 reference keyframe SLOT
    first_kf_uid: jnp.ndarray  # (P,) int32 uid of the creating keyframe
    #   (MapPoint::mnFirstKFid, used for culling age — uids are the
    #   monotonic time axis; slots are not).
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
    kp_point: jnp.ndarray  # (F, K) int32 map-point slot per keypoint (-1 none)
    frame_id: jnp.ndarray  # (F,) int32 source frame index
    stamp: jnp.ndarray  # (F,) float32 timestamp
    uid: jnp.ndarray  # (F,) int32 global insertion counter (-1 = never used;
    #   never reused — the reference's KeyFrame::mnId)
    parent_uid: jnp.ndarray  # (F,) int32 spanning-tree parent uid, recorded
    #   when this slot's keyframe is CULLED (-1 while live). With
    #   T_rel_parent this reproduces the reference's culled-KF trajectory
    #   resolution (Tcr chains, System.cc:487-493).
    T_rel_parent: jnp.ndarray  # (F, 4, 4) T_cw(this) @ inv(T_cw(parent)) at cull
    valid: jnp.ndarray  # (F,) bool


class RetiredRing(NamedTuple):
    """Device-side ring buffer of keyframe retirement records.

    Slot-resident retirement info (KeyFrames.parent_uid/T_rel_parent) is
    destroyed the moment a slot is reused; during a long device-side
    `lax.scan` the host never gets a chance to snapshot it. Every cull or
    ring-buffer eviction therefore ALSO appends (uid, parent_uid, T_rel)
    here, so trajectory references to retired keyframes resolve through
    the spanning tree regardless of when the host looks
    (SaveTrajectoryTUM chain semantics, System.cc:487-493)."""

    uid: jnp.ndarray  # (R,) int32 retired keyframe uid (-1 = empty)
    parent_uid: jnp.ndarray  # (R,) int32 spanning-tree parent uid
    T_rel: jnp.ndarray  # (R, 4, 4) T_cw(retired) @ inv(T_cw(parent))
    count: jnp.ndarray  # () int32 total records ever pushed


class SlamState(NamedTuple):
    points: MapPoints
    kfs: KeyFrames
    n_points: jnp.ndarray  # () int32 — count of LIVE map points
    n_kfs: jnp.ndarray  # () int32 — count of LIVE keyframes
    last_kf: jnp.ndarray  # () int32 — slot of the newest keyframe
    next_uid: jnp.ndarray  # () int32 — next keyframe uid to assign
    retired: RetiredRing


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
        first_kf_uid=jnp.full((P,), -1, jnp.int32),
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
        uid=jnp.full((F,), -1, jnp.int32),
        parent_uid=jnp.full((F,), -1, jnp.int32),
        T_rel_parent=jnp.tile(jnp.eye(4, dtype=jnp.float32), (F, 1, 1)),
        valid=jnp.zeros((F,), bool),
    )
    R = cfg.map.retired_ring_capacity
    retired = RetiredRing(
        uid=jnp.full((R,), -1, jnp.int32),
        parent_uid=jnp.full((R,), -1, jnp.int32),
        T_rel=jnp.tile(jnp.eye(4, dtype=jnp.float32), (R, 1, 1)),
        count=jnp.int32(0),
    )
    return SlamState(
        points, kfs,
        jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
        retired,
    )


def push_retired(
    ring: RetiredRing,
    mask: jnp.ndarray,  # (N,) bool — which rows to record
    uids: jnp.ndarray,  # (N,) int32
    parent_uids: jnp.ndarray,  # (N,) int32
    T_rels: jnp.ndarray,  # (N, 4, 4)
) -> RetiredRing:
    """Append the masked records at the ring cursor (oldest records are
    overwritten once the ring wraps — trajectory chains older than R
    retirements then fall back to the broken-chain resolver)."""
    R = ring.uid.shape[0]
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    pos = (ring.count + rank) % R
    pos_safe = jnp.where(mask, pos, R)
    return ring._replace(
        uid=ring.uid.at[pos_safe].set(uids, mode="drop"),
        parent_uid=ring.parent_uid.at[pos_safe].set(parent_uids, mode="drop"),
        T_rel=ring.T_rel.at[pos_safe].set(T_rels, mode="drop"),
        count=ring.count + jnp.sum(mask.astype(jnp.int32)),
    )


def alloc_slots(valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """(k,) lowest-index FREE slots of a validity mask, in ascending
    order; entries equal to capacity mean "no free slot" (callers scatter
    with mode='drop', so overflow allocations are silently rejected).

    This is the erase+reuse allocator that replaces round 1's monotonic
    cursor: culled slots return to circulation, so the map runs
    indefinitely within fixed capacity (the reference equivalent is heap
    delete + new; SURVEY.md §7 hard part 1)."""
    n = valid.shape[0]
    score = jnp.where(valid, 0.0, (n - jnp.arange(n)).astype(jnp.float32))
    top, idx = jax.lax.top_k(score, k)
    return jnp.where(top > 0.0, idx, n).astype(jnp.int32)


def clear_point_refs(kp_point: jnp.ndarray, dead: jnp.ndarray) -> jnp.ndarray:
    """Clear keypoint->point associations referencing dead points.

    Without this, reusing a culled point's slot would silently rebind
    every stale reference to the new landmark (the reference's
    MapPoint::SetBadFlag erases itself from each observing keyframe,
    MapPoint.cc:184-205)."""
    P = dead.shape[0]
    stale = (kp_point >= 0) & dead[jnp.clip(kp_point, 0, P - 1)]
    return jnp.where(stale, -1, kp_point)


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
    # The sentinel bucket collects every INVALID keypoint's write; zero it
    # or padding slots count as "shared" between all keyframe pairs.
    present = present.at[point_capacity].set(0.0)
    other = jnp.where(kp_point >= 0, kp_point, point_capacity)
    shared = jnp.sum(present[other], axis=1)  # (F,)
    shared = shared * kf_valid
    return shared.at[kf_id].set(0.0).astype(jnp.int32)


@jax.jit
def point_positions_valid(state: SlamState):
    return state.points.pos, state.points.valid
