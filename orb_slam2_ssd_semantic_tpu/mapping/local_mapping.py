"""Local mapping: triangulation, duplicate fusion, covisibility-window
BA, map-point maintenance, and culling.

The engine's equivalent of the LocalMapping thread's per-keyframe work
(perfect/src/LocalMapping.cc:70-156): after each keyframe insertion the
host calls `local_mapping_step`, which (on device, fixed shapes):

  1. triangulates new landmarks between the newest keyframe and its
     best covisible neighbors (CreateNewMapPoints, LocalMapping.cc:349;
     the reference's 10 best neighbors),
  2. fuses duplicate landmarks with the covisible neighborhood
     (SearchInNeighbors, LocalMapping.cc:652 → ORBmatcher::Fuse,
     ORBmatcher.cc:1031, with MapPoint::Replace merge semantics,
     MapPoint.cc:225),
  3. assembles the local BA problem from the newest keyframe's
     covisibility window plus fixed anchor keyframes that observe the
     local points (Optimizer.cc:624-682), runs the Schur-complement
     local BA (mapping/ba.py), writes back, prunes outlier observations,
  4. refreshes each local point's representative descriptor (min-median
     Hamming, MapPoint::ComputeDistinctiveDescriptors,
     MapPoint.cc:305-368) and viewing normal / scale-invariance depths
     (MapPoint::UpdateNormalAndDepth, MapPoint.cc:397-446),
  5. culls bad map points (MapPointCulling, LocalMapping.cc:270-344) and
     redundant keyframes (KeyFrameCulling, LocalMapping.cc:764-860),
     releasing their slots for reuse.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.frontend.extractor import scale_factors
from orb_slam2_ssd_semantic_tpu.geometry import camera as cam_ops
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.mapping.ba import BAProblem, local_bundle_adjust
from orb_slam2_ssd_semantic_tpu.mapping.map_state import (
    SlamState,
    alloc_slots,
    covisibility,
    covisibility_row,
)
from orb_slam2_ssd_semantic_tpu.mapping.triangulation import triangulate_pair
from orb_slam2_ssd_semantic_tpu.ops import match as match_ops


@functools.partial(jax.jit, static_argnames=("cfg",))
def create_new_map_points(state: SlamState, cfg: SlamConfig) -> SlamState:
    """Triangulate landmarks between the newest keyframe and its best
    covisible neighbors (LocalMapping::CreateNewMapPoints,
    LocalMapping.cc:349-649; the reference takes the 10 best covisible,
    LocalMapping.cc:360). Only keypoints with no association spawn —
    close-depth ones already spawned at insertion; this is how landmarks
    beyond the RGB-D depth range (and all monocular landmarks) enter the
    map. Neighbors with a baseline shorter than the (virtual) stereo
    baseline are skipped (LocalMapping.cc:399-421)."""
    F = state.kfs.valid.shape[0]
    P = state.points.pos.shape[0]
    K = state.kfs.kp_point.shape[1]
    sf = scale_factors(cfg.orb)
    kf1 = state.last_kf

    neighbors, ok_nb = _neighbor_slots(state, kf1, cfg.map.triangulation_neighbors)

    uv1 = state.kfs.uv[kf1]
    desc1 = state.kfs.desc[kf1]
    level1 = state.kfs.level[kf1]
    T1 = state.kfs.T_cw[kf1]
    kf_uid1 = state.kfs.uid[kf1]
    c1 = se3.se3_inverse(T1)[:3, 3]
    baseline_min = cfg.camera.depth_bf / cfg.camera.fx  # stereo baseline (m)

    # All neighbor pairs triangulate IN PARALLEL (round 1 scanned them
    # sequentially — ~10 dependent device rounds per keyframe event);
    # each kf1 keypoint then keeps its first successful neighbor
    # (= best-covisibility priority, the same winner the sequential
    # "skip already-bound keypoints" rule produced).
    valid1 = state.kfs.kp_valid[kf1] & (state.kfs.kp_point[kf1] < 0)

    def tri_one(kf2, ok_nb2):
        ok_pair = ok_nb2 & state.kfs.valid[kf2] & (kf2 != kf1)
        T2 = state.kfs.T_cw[kf2]
        c2 = se3.se3_inverse(T2)[:3, 3]
        ok_pair = ok_pair & (jnp.linalg.norm(c1 - c2) > baseline_min)
        valid2 = state.kfs.kp_valid[kf2] & (state.kfs.kp_point[kf2] < 0)
        tri = triangulate_pair(
            uv1, desc1, level1, valid1 & ok_pair,
            state.kfs.uv[kf2], state.kfs.desc[kf2], state.kfs.level[kf2],
            valid2 & ok_pair,
            T1, T2, cfg.camera, cfg.orb,
        )
        return tri.pts_w, tri.idx2, tri.valid & ok_pair

    Xs, idx2s, oks = jax.vmap(tri_one)(neighbors, ok_nb)  # (Nn,K,3),(Nn,K),(Nn,K)

    any_ok = jnp.any(oks, axis=0)  # (K,)
    nsel = jnp.argmax(oks, axis=0)  # first successful neighbor per keypoint
    kcols = jnp.arange(K, dtype=jnp.int32)
    X = Xs[nsel, kcols]  # (K, 3)
    j2 = idx2s[nsel, kcols]  # (K,)
    kf2_sel = neighbors[nsel]  # (K,)

    # Allocate free map-point slots for the survivors.
    free = alloc_slots(state.points.valid, K)
    rank = jnp.cumsum(any_ok.astype(jnp.int32)) - 1
    slot = free[jnp.clip(rank, 0, K - 1)]
    ok = any_ok & (slot < P)
    slot_safe = jnp.where(ok, slot, P)

    dist = jnp.linalg.norm(X - c1[None], axis=-1)
    lv = jnp.clip(level1, 0, cfg.orb.n_levels - 1)
    max_dist = dist * sf[lv]
    min_dist = max_dist / sf[-1]
    normal = (X - c1[None]) / jnp.maximum(dist, 1e-6)[:, None]

    pts = state.points
    pts = pts._replace(
        pos=pts.pos.at[slot_safe].set(X, mode="drop"),
        desc=pts.desc.at[slot_safe].set(desc1, mode="drop"),
        normal=pts.normal.at[slot_safe].set(normal, mode="drop"),
        min_dist=pts.min_dist.at[slot_safe].set(min_dist, mode="drop"),
        max_dist=pts.max_dist.at[slot_safe].set(max_dist, mode="drop"),
        n_obs=pts.n_obs.at[slot_safe].set(2, mode="drop"),
        n_visible=pts.n_visible.at[slot_safe].set(2, mode="drop"),
        n_found=pts.n_found.at[slot_safe].set(2, mode="drop"),
        ref_kf=pts.ref_kf.at[slot_safe].set(kf1, mode="drop"),
        first_kf_uid=pts.first_kf_uid.at[slot_safe].set(kf_uid1, mode="drop"),
        valid=pts.valid.at[slot_safe].set(True, mode="drop"),
    )

    # Bind both observations: kf1's keypoint row, and the matched
    # keypoint of the SELECTED neighbor (idx2 is already unique within
    # each neighbor; different keypoints may select different neighbors).
    kfs = state.kfs
    kp1 = jnp.where(ok, slot, kfs.kp_point[kf1])
    kp = kfs.kp_point.at[kf1].set(kp1)
    kp = kp.at[
        jnp.where(ok, kf2_sel, F), jnp.where(ok, j2, 0)
    ].set(jnp.where(ok, slot, -1), mode="drop")
    kfs = kfs._replace(kp_point=kp)

    return state._replace(
        points=pts, kfs=kfs,
        n_points=state.n_points + jnp.sum(ok.astype(jnp.int32)),
    )


# ---------------------------------------------------------------------------
# Duplicate-landmark fusion (SearchInNeighbors / Fuse / Replace)
# ---------------------------------------------------------------------------

def _apply_merges(state: SlamState, loser: jnp.ndarray, winner: jnp.ndarray) -> SlamState:
    """Merge map points: every reference to `loser[i]` is rebound to
    `winner[i]`, the winner absorbs the loser's statistics, the loser is
    invalidated — MapPoint::Replace semantics (MapPoint.cc:225-273),
    vectorized as a remap-table gather over all associations.

    `loser` entries equal to P are sentinels (no merge)."""
    pts = state.points
    P = pts.pos.shape[0]
    remap = jnp.arange(P + 1, dtype=jnp.int32)
    winner_eff = jnp.where(loser < P, winner, P)
    remap = remap.at[jnp.clip(loser, 0, P)].set(winner_eff)
    # Collapse chains (a->b->c->...) by repeated squaring: winner
    # selection is a strict order (more obs, then lower id) so the merge
    # graph is acyclic; 5 squarings resolve chains up to depth 32, and
    # the stale-reference clear below catches anything deeper.
    for _ in range(5):
        remap = remap[remap]
    self_mapped = remap[:P] == jnp.arange(P)
    merged = (~self_mapped) & pts.valid
    w_of = remap[:P]

    add_to = jnp.where(merged, w_of, P)
    n_obs = pts.n_obs.at[add_to].add(pts.n_obs, mode="drop")
    n_vis = pts.n_visible.at[add_to].add(pts.n_visible, mode="drop")
    n_fnd = pts.n_found.at[add_to].add(pts.n_found, mode="drop")
    pts = pts._replace(
        n_obs=n_obs, n_visible=n_vis, n_found=n_fnd,
        valid=pts.valid & ~merged,
    )

    kp = state.kfs.kp_point
    kp = jnp.where(kp >= 0, remap[jnp.clip(kp, 0, P)], kp)
    # Insurance against merge chains deeper than the squaring depth: a
    # keypoint still bound to an invalidated loser is exactly the
    # slot-reuse rebind hazard clear_point_refs exists to prevent.
    from orb_slam2_ssd_semantic_tpu.mapping.map_state import clear_point_refs

    kp = clear_point_refs(kp, merged)
    return state._replace(
        points=pts,
        kfs=state.kfs._replace(kp_point=kp),
        n_points=state.n_points - jnp.sum(merged.astype(jnp.int32)),
    )


def _fuse_directions_batched(state: SlamState, src, dst, ok_d, cfg: SlamConfig
                             ) -> SlamState:
    """All (src -> dst) fuse directions at once (ORBmatcher::Fuse,
    ORBmatcher.cc:1031-1196): a match against an UNBOUND keypoint adds
    an observation; a match against a keypoint already bound to a
    different landmark merges the two (keeping the one with more
    observations, ORBmatcher.cc:1140-1148).

    Round 1 of this engine ran the directions as a sequential lax.scan —
    ~20 dependent device rounds per keyframe event. The matching of each
    direction is independent given the pre-fuse state, so it vmaps into
    ONE batched round; binds and merges then apply globally (write
    conflicts resolve arbitrarily, and the observation dedup pass cleans
    the rare overlaps — the same outcome SearchInNeighbors converges to
    over consecutive keyframes)."""
    cam = cfg.camera
    sf = scale_factors(cfg.orb)
    pts = state.points
    kfs = state.kfs
    P = pts.pos.shape[0]
    F = kfs.valid.shape[0]
    K = kfs.kp_point.shape[1]
    D = src.shape[0]

    def match_dir(src_f, dst_f, okf):
        ids = kfs.kp_point[src_f]  # (K,) point ids observed by src
        idc = jnp.clip(ids, 0, P - 1)
        q_valid = okf & (ids >= 0) & pts.valid[idc] & kfs.kp_valid[src_f]
        X = pts.pos[idc]
        T_dst = kfs.T_cw[dst_f]
        pc = se3.transform_points(T_dst, X)
        uv, z = cam_ops.project(pc, cam)
        dist = jnp.linalg.norm(pc, axis=-1)
        c_dst = se3.se3_inverse(T_dst)[:3, 3]
        view = (X - c_dst[None]) / jnp.maximum(dist, 1e-6)[:, None]
        cos_view = jnp.sum(view * pts.normal[idc], axis=-1)
        q_valid = (
            q_valid
            & (z > 0.05)
            & cam_ops.in_image(uv, cam)
            # Scale-invariance distance band + <60 deg viewing angle vs
            # the landmark normal (ORBmatcher.cc:1079-1096).
            & (dist > 0.8 * pts.min_dist[idc])
            & (dist < 1.3 * pts.max_dist[idc])
            & (cos_view > 0.5)
        )
        ratio = jnp.maximum(pts.max_dist[idc] / jnp.maximum(dist, 1e-6), 1e-6)
        pred_level = jnp.clip(
            jnp.ceil(jnp.log(ratio) / jnp.log(cfg.orb.scale_factor)).astype(jnp.int32),
            0, cfg.orb.n_levels - 1,
        )
        radius = cfg.map.fuse_search_radius * sf[pred_level]
        # match_by_window routes through the fused Pallas kernel on TPU
        # (ops/pallas_match.py) — the (K, K) distance/mask intermediates
        # of the XLA path were the dominant HBM traffic of the fuse
        # stage (~2/5 of the whole keyframe event).
        m = match_ops.match_by_window(
            pts.desc[idc], kfs.desc[dst_f], uv, kfs.uv[dst_f],
            q_valid, kfs.kp_valid[dst_f], radius,
            max_dist=match_ops.TH_LOW,
        )
        j = jnp.clip(m.idx, 0, K - 1)
        # Reference acceptance gates the window search alone lacks
        # (ORBmatcher::Fuse, ORBmatcher.cc:1090-1135): the target
        # keypoint's octave must be within [pred_level-1, pred_level],
        # and the FULL reprojection chi2 — including the stereo/depth
        # uR term for keypoints with depth — must pass (5.99 mono /
        # 7.8 stereo). Without the depth term, repetitive texture
        # (similar corners at different depths, e.g. a box edge vs the
        # wall behind it) merges landmarks across depth layers; each
        # wrong merge drags point positions, and the following BA
        # rotates the local window to fit — the dominant yaw-drift
        # injection at high keyframe cadence (r4 finding).
        kp_lvl = kfs.level[dst_f][j]
        lvl_ok = (kp_lvl >= pred_level - 1) & (kp_lvl <= pred_level)
        du = kfs.uv[dst_f][j] - uv
        e2_mono = jnp.sum(du * du, axis=-1)
        ur_proj = uv[:, 0] - cam.depth_bf / jnp.maximum(z, 1e-6)
        kp_d = kfs.depth[dst_f][j]
        kp_ur = kfs.uv[dst_f][j, 0] - cam.depth_bf / jnp.maximum(kp_d, 1e-6)
        has_d = kp_d > 1e-6
        dur = ur_proj - kp_ur
        e2 = jnp.where(has_d, e2_mono + dur * dur, e2_mono)
        inv_sigma2 = 1.0 / (sf[jnp.clip(kp_lvl, 0, sf.shape[0] - 1)] ** 2)
        chi2_th = jnp.where(has_d, 7.8, 5.99)
        gate = lvl_ok & (e2 * inv_sigma2 <= chi2_th)
        ok_m = m.valid & gate
        existing = kfs.kp_point[dst_f][j]
        bind = ok_m & (existing < 0)
        merge = ok_m & (existing >= 0) & (existing != ids)
        # Winner = more observations, ties broken by LOWER id: the
        # opposite directions of a pair then propose the SAME merge
        # (without the deterministic tie-break they propose opposite
        # ones, which cancel as 2-cycles in the remap table).
        nq = pts.n_obs[idc]
        ne = pts.n_obs[jnp.clip(existing, 0, P - 1)]
        q_wins = (nq > ne) | ((nq == ne) & (ids < existing))
        winner = jnp.where(q_wins, ids, existing)
        loser = jnp.where(merge, jnp.where(q_wins, existing, ids), P)
        return j, ids, bind, loser, winner

    j, ids, bind, loser, winner = jax.vmap(match_dir)(src, dst, ok_d)

    # Apply all binds in one scatter (conflicting writers of the same
    # (dst, j) cell resolve arbitrarily; dedup cleans duplicates).
    rows = jnp.broadcast_to(dst[:, None], (D, K))
    kp = kfs.kp_point.at[
        jnp.where(bind, rows, F), jnp.where(bind, j, 0)
    ].set(jnp.where(bind, ids, -1), mode="drop")
    # Observation counts derive from the cells that ACTUALLY became
    # bound (one increment per newly bound cell): when two directions
    # propose different points for the same (dst, j) cell, only the
    # surviving binding's point gets credited — incrementing from the
    # proposals would leave the loser's n_obs permanently inflated.
    new_bound = (kp >= 0) & (kfs.kp_point < 0)
    n_obs = pts.n_obs.at[jnp.where(new_bound, kp, P).reshape(-1)].add(
        1, mode="drop"
    )
    state = state._replace(
        points=pts._replace(n_obs=n_obs),
        kfs=kfs._replace(kp_point=kp),
    )
    return _apply_merges(state, loser.reshape(-1), winner.reshape(-1))


def _dedup_observations(state: SlamState, rows: jnp.ndarray | None = None
                        ) -> SlamState:
    """Drop duplicate (keyframe, point) observations created when a
    merge rebinds a landmark a keyframe already observes — the
    reference's Replace keeps the existing observation and erases the
    duplicate (MapPoint.cc:240-252). First-occurrence test via a
    scatter-min over a flat (R*(P+1)) bucket space, restricted to the
    `rows` the fuse pass could have touched (deduping all F keyframe
    rows scanned a 16M-bucket space per keyframe event)."""
    kfs = state.kfs
    pts = state.points
    F, K = kfs.kp_point.shape
    P = pts.pos.shape[0]
    if rows is None:
        rows = jnp.arange(F, dtype=jnp.int32)
    R = rows.shape[0]
    row_ok = rows < F  # sentinel F = padding row (dropped on write-back)
    kp = kfs.kp_point[jnp.clip(rows, 0, F - 1)]  # (R, K)
    valid = (kp >= 0) & row_ok[:, None]
    key = jnp.where(
        valid, kp + jnp.arange(R, dtype=jnp.int32)[:, None] * (P + 1),
        R * (P + 1),
    ).reshape(-1)
    col = jnp.tile(jnp.arange(K, dtype=jnp.int32), R)
    first = jnp.full((R * (P + 1) + 1,), K, jnp.int32).at[key].min(
        col, mode="drop"
    )
    dup = (valid.reshape(-1) & (first[key] != col)).reshape(R, K)
    # Duplicate rows in `rows` would double-dedup; callers pass distinct
    # slots (top-k neighbor sets are distinct by construction).
    dec_ids = jnp.where(dup, kp, P).reshape(-1)
    n_obs = pts.n_obs.at[dec_ids].add(-1, mode="drop")
    new_rows = jnp.where(dup, -1, kp)
    return state._replace(
        points=pts._replace(n_obs=jnp.maximum(n_obs, 0)),
        kfs=kfs._replace(
            kp_point=kfs.kp_point.at[rows].set(new_rows, mode="drop")
        ),
    )


def _neighbor_slots(state: SlamState, kf1, k: int):
    """Top-k fusion/triangulation partners of keyframe `kf1`: covisible
    keyframes first (reference: best covisible, LocalMapping.cc:360,656),
    falling back to the most RECENT keyframes when covisibility is still
    empty (bootstrap — before tracking has bound shared landmarks).
    Returns (slots (k,), ok (k,))."""
    P = state.points.pos.shape[0]
    F = state.kfs.valid.shape[0]
    covis = covisibility_row(
        state.kfs.kp_point, state.kfs.valid.astype(jnp.float32), kf1, P
    ).astype(jnp.float32)
    eligible = state.kfs.valid & (jnp.arange(F) != kf1) & (state.kfs.uid >= 0)
    covis_sc = jnp.where(eligible, covis, -1.0)
    rec_sc = jnp.where(eligible, state.kfs.uid.astype(jnp.float32), -1.0)
    sc = jnp.where(covis_sc > 0, 1e9 + covis_sc, rec_sc)
    top, slots = jax.lax.top_k(sc, k)
    return slots, top >= 0.0


@functools.partial(jax.jit, static_argnames=("cfg",))
def fuse_map_points(state: SlamState, cfg: SlamConfig) -> SlamState:
    """SearchInNeighbors (LocalMapping.cc:652-763): fuse the newest
    keyframe's landmarks into each of its best covisible neighbors and
    vice versa, then deduplicate observations."""
    Nf = cfg.map.fuse_neighbors
    kf1 = state.last_kf
    # Top-31 covisible slots: the first Nf are the fuse partners; the
    # full set bounds where merge rebinds can land (any keyframe
    # co-observing a merged landmark is a covisible neighbor of the
    # window), so deduping these rows covers the rebind fallout without
    # the full-F bucket scan.
    F_cap = state.kfs.valid.shape[0]
    wide, ok_w = _neighbor_slots(state, kf1, min(max(31, Nf), F_cap))
    neighbors, ok_n = wide[:Nf], ok_w[:Nf]
    kf1_rep = jnp.full((Nf,), kf1, jnp.int32)
    src = jnp.concatenate([kf1_rep, neighbors])
    dst = jnp.concatenate([neighbors, kf1_rep])
    ok_d = jnp.concatenate([ok_n, ok_n])
    state = _fuse_directions_batched(state, src, dst, ok_d, cfg)
    F = state.kfs.valid.shape[0]
    rows = jnp.concatenate([
        jnp.asarray(kf1, jnp.int32).reshape(1),
        jnp.where(ok_w, wide, F),  # sentinel-pad invalid neighbor slots
    ])
    return _dedup_observations(state, rows)


@functools.partial(jax.jit, static_argnames=("cfg",))
def fuse_pair(state: SlamState, kf_a, kf_b, cfg: SlamConfig) -> SlamState:
    """Bidirectional landmark fusion between two specific keyframes —
    the building block of LoopClosing::SearchAndFuse (LoopClosing.cc:
    791-824), which projects loop-side landmarks into the corrected
    current-side keyframes so the two sides of a closed loop share
    observations (and thus covisibility edges) from then on."""
    a = jnp.asarray(kf_a, jnp.int32).reshape(1)
    b = jnp.asarray(kf_b, jnp.int32).reshape(1)
    ok = jnp.ones((2,), bool)
    state = _fuse_directions_batched(
        state, jnp.concatenate([a, b]), jnp.concatenate([b, a]), ok, cfg
    )
    return _dedup_observations(state, jnp.concatenate([a, b]))


# ---------------------------------------------------------------------------
# Map-point maintenance (descriptor refresh + normal/depth update)
# ---------------------------------------------------------------------------

def _refresh_local_points(
    state: SlamState, kf_ids, row_ok, local_ids, slot, point_valid, cfg: SlamConfig
) -> SlamState:
    """Refresh the representative descriptor (min-median Hamming over
    observations, MapPoint::ComputeDistinctiveDescriptors,
    MapPoint.cc:305-368) and the viewing normal / scale-invariance
    depths (MapPoint::UpdateNormalAndDepth, MapPoint.cc:397-446) of the
    local points, from their observations within the BA window — bounded
    to `maintenance_max_obs` samples per point to keep shapes fixed."""
    pts = state.points
    P = pts.pos.shape[0]
    M = cfg.map.maintenance_max_obs
    N = local_ids.shape[0]
    Wt, K = slot.shape
    sf = scale_factors(cfg.orb)

    kp_ok = state.kfs.kp_valid[kf_ids] & row_ok[:, None]
    s = jnp.where((slot >= 0) & kp_ok, slot, N).reshape(-1)
    order = jnp.argsort(s)
    ss = s[order]
    start = jnp.searchsorted(ss, ss, side="left")
    j = jnp.arange(ss.shape[0], dtype=jnp.int32) - start.astype(jnp.int32)
    keep = (ss < N) & (j < M)
    rows = jnp.where(keep, ss, N)
    cols = jnp.where(keep, j, 0)

    desc_flat = state.kfs.desc[kf_ids].reshape(Wt * K, 8)[order]
    level_flat = state.kfs.level[kf_ids].reshape(-1)[order]
    w_flat = (jnp.arange(Wt * K, dtype=jnp.int32) // K)[order]
    uid_flat = state.kfs.uid[kf_ids][w_flat]

    obs_desc = jnp.zeros((N + 1, M, 8), jnp.uint32).at[rows, cols].set(
        desc_flat, mode="drop"
    )[:N]
    cnt = jnp.zeros((N + 1,), jnp.int32).at[rows].add(
        keep.astype(jnp.int32), mode="drop"
    )[:N]

    # --- descriptor: min-median pairwise Hamming -------------------------
    x = jnp.bitwise_xor(obs_desc[:, :, None, :], obs_desc[:, None, :, :])
    ham = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)  # (N,M,M)
    in_cnt = jnp.arange(M, dtype=jnp.int32)[None, :] < cnt[:, None]
    hv = jnp.where(in_cnt[:, None, :], ham, 512)
    hs = jnp.sort(hv, axis=-1)
    med_idx = jnp.clip((cnt - 1) // 2, 0, M - 1)
    med = jnp.take_along_axis(
        hs, jnp.broadcast_to(med_idx[:, None, None], (N, M, 1)), axis=-1
    )[..., 0]  # (N, M)
    med = jnp.where(in_cnt, med, 1 << 20)
    best = jnp.argmin(med, axis=-1)
    best_desc = jnp.take_along_axis(
        obs_desc, jnp.broadcast_to(best[:, None, None], (N, 1, 8)), axis=1
    )[:, 0]
    upd = point_valid & (cnt >= 2)
    upd_ids = jnp.where(upd, local_ids, P)
    pts = pts._replace(
        desc=pts.desc.at[upd_ids].set(best_desc, mode="drop"),
    )

    # --- normal + scale-invariance depths --------------------------------
    centers = jax.vmap(se3.se3_inverse)(state.kfs.T_cw[kf_ids])[:, :3, 3]  # (Wt,3)
    Xl = jnp.concatenate([pts.pos[local_ids], jnp.zeros((1, 3), jnp.float32)], 0)
    Xobs = Xl[rows]  # (Wt*K, 3)
    v = Xobs - centers[w_flat]
    d = jnp.linalg.norm(v, axis=-1)
    vn = v / jnp.maximum(d, 1e-6)[:, None]
    nsum = jnp.zeros((N + 1, 3), jnp.float32).at[rows].add(
        vn * keep[:, None], mode="drop"
    )[:N]
    normal_new = nsum / jnp.maximum(jnp.linalg.norm(nsum, axis=-1), 1e-6)[:, None]

    # Reference depth band from the NEWEST observation (the reference
    # uses the reference keyframe's observation, MapPoint.cc:428-440;
    # the newest observer is the live stand-in).
    ref_uid = jnp.full((N + 1,), -1, jnp.int32).at[rows].max(
        jnp.where(keep, uid_flat, -1), mode="drop"
    )[:N]
    is_ref = keep & (uid_flat == ref_uid[jnp.clip(ss, 0, N - 1)]) & (ss < N)
    ref_rows = jnp.where(is_ref, ss, N)
    dist_ref = jnp.zeros((N + 1,), jnp.float32).at[ref_rows].set(d, mode="drop")[:N]
    level_ref = jnp.zeros((N + 1,), jnp.int32).at[ref_rows].set(
        level_flat, mode="drop"
    )[:N]
    lv = jnp.clip(level_ref, 0, cfg.orb.n_levels - 1)
    max_d = dist_ref * sf[lv]
    min_d = max_d / sf[-1]
    upd_d = upd & (dist_ref > 1e-6)
    upd_d_ids = jnp.where(upd_d, local_ids, P)
    pts = pts._replace(
        normal=pts.normal.at[upd_ids].set(normal_new, mode="drop"),
        max_dist=pts.max_dist.at[upd_d_ids].set(max_d, mode="drop"),
        min_dist=pts.min_dist.at[upd_d_ids].set(min_d, mode="drop"),
    )
    return state._replace(points=pts)


# ---------------------------------------------------------------------------
# The per-keyframe local mapping pass
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def local_mapping_step(state: SlamState, cfg: SlamConfig) -> SlamState:
    """Run one triangulate + fuse + local-BA + maintenance + culling pass
    anchored at the newest keyframe (the LocalMapping thread's per-KF
    sequence, LocalMapping.cc:89-125)."""
    if cfg.map.triangulate_new_points:
        state = create_new_map_points(state, cfg)
    if cfg.map.fuse_neighbors > 0:
        state = fuse_map_points(state, cfg)
    return _ba_and_maintain(state, cfg)


def assemble_local_ba(state: SlamState, cfg: SlamConfig):
    """Window assembly only (the covis window, local point set, anchors,
    observation tensors) — exposed for diagnostics/tests. Returns
    (prob, kf_ids, all_ids, row_ok, local_ids, point_valid,
    slot_of_point, kp_point_all)."""
    return _assemble(state, cfg)


def _assemble(state: SlamState, cfg: SlamConfig):
    W = cfg.map.local_ba_window
    A = cfg.map.local_ba_fixed_anchors
    N = cfg.map.local_ba_max_points
    P = state.points.pos.shape[0]
    F = state.kfs.valid.shape[0]
    K = state.kfs.uv.shape[1]
    sf = scale_factors(cfg.orb)
    last = state.last_kf

    # ---- window: the newest KF + its best covisible neighbors ------------
    # (Optimizer.cc:624-636 lLocalKeyFrames; round 1 used a recency
    # window, which is wrong after loop closures/revisits.)
    covrow = covisibility_row(
        state.kfs.kp_point, state.kfs.valid.astype(jnp.float32), last, P
    ).astype(jnp.float32)
    sc = jnp.where(state.kfs.valid, covrow, -1.0).at[last].set(jnp.float32(1e9))
    top_sc, kf_ids = jax.lax.top_k(sc, W)
    in_window = top_sc > 0.0

    kp_point = state.kfs.kp_point[kf_ids]  # (W, K)
    kp_point = jnp.where(in_window[:, None], kp_point, -1)

    # ---- local point set --------------------------------------------------
    ids_flat = kp_point.reshape(-1)
    present = jnp.zeros((P,), jnp.float32).at[
        jnp.where(ids_flat >= 0, ids_flat, P)
    ].add(1.0, mode="drop")
    present = present * state.points.valid
    _, local_ids = jax.lax.top_k(present, N)  # (N,) point ids (desc by count)
    point_valid = present[local_ids] > 0
    slot_of_point = jnp.full((P + 1,), -1, jnp.int32).at[local_ids].set(
        jnp.arange(N, dtype=jnp.int32)
    )

    # ---- fixed anchors: outside-window observers of the local points ------
    # (Optimizer.cc:661-682 lFixedCameras; they constrain the points but
    # contribute no pose block.)
    presentN = jnp.zeros((P + 1,), jnp.float32).at[
        jnp.where(point_valid, local_ids, P)
    ].set(1.0, mode="drop")
    presentN = presentN.at[P].set(0.0)  # sentinel bucket must not count
    obs_cnt_kf = jnp.sum(
        presentN[jnp.where(state.kfs.kp_point >= 0, state.kfs.kp_point, P)]
        * state.kfs.kp_valid,
        axis=1,
    )  # (F,)
    in_win_f = jnp.zeros((F,), bool).at[kf_ids].set(in_window, mode="drop")
    anchor_sc = jnp.where(state.kfs.valid & ~in_win_f, obs_cnt_kf, -1.0)
    a_sc, anchor_ids = jax.lax.top_k(anchor_sc, A)
    anchor_ok = a_sc > 0

    all_ids = jnp.concatenate([kf_ids, anchor_ids])
    row_ok = jnp.concatenate([in_window, anchor_ok])
    # Gauge: anchors are fixed. If there are none (early map), fix the
    # oldest keyframe in the window.
    any_anchor = jnp.any(anchor_ok)
    uid_w = jnp.where(in_window, state.kfs.uid[kf_ids], jnp.int32(2 ** 30))
    oldest_pos = jnp.argmin(uid_w)
    fix_gauge = (jnp.arange(W) == oldest_pos) & (~any_anchor)
    fixed = jnp.concatenate([
        fix_gauge | (~in_window), jnp.ones((A,), bool)
    ])

    kp_point_all = jnp.where(row_ok[:, None], state.kfs.kp_point[all_ids], -1)
    slot = slot_of_point[jnp.where(kp_point_all >= 0, kp_point_all, P)]  # (W+A, K)

    # ---- observations -----------------------------------------------------
    lv = jnp.clip(state.kfs.level[all_ids], 0, cfg.orb.n_levels - 1)
    inv_sigma2 = 1.0 / (sf[lv] ** 2)
    depth = state.kfs.depth[all_ids]
    uv = state.kfs.uv[all_ids]
    z_safe = jnp.where(depth > 1e-6, depth, 1.0)
    ur = jnp.where(depth > 1e-6, uv[..., 0] - cfg.camera.depth_bf / z_safe, -1.0)
    obs_uvr = jnp.concatenate([uv, ur[..., None]], axis=-1)

    prob = BAProblem(
        T_cw=state.kfs.T_cw[all_ids],
        fixed=fixed,
        points=state.points.pos[local_ids],
        point_valid=point_valid,
        point_slot=jnp.where(state.kfs.kp_valid[all_ids], slot, -1),
        obs_uvr=obs_uvr,
        inv_sigma2=inv_sigma2,
        is_stereo=depth > 1e-6,
    )
    return (prob, kf_ids, all_ids, row_ok, local_ids, point_valid,
            slot_of_point, kp_point_all)


def _ba_and_maintain(state: SlamState, cfg: SlamConfig) -> SlamState:
    P = state.points.pos.shape[0]
    F = state.kfs.valid.shape[0]
    (prob, kf_ids, all_ids, row_ok, local_ids, point_valid,
     slot_of_point, kp_point_all) = _assemble(state, cfg)
    fixed = prob.fixed
    res = local_bundle_adjust(prob, cfg.camera, cfg.optimizer)

    # ---- write back -------------------------------------------------------
    free = (~fixed) & row_ok
    # Whole-pass trust region (OptimizerConfig.local_ba_max_pose_move):
    # if any free pose moved implausibly far, the window was degenerate;
    # revert the entire pass (poses + points + pruning stay untouched).
    dt = jnp.linalg.norm(res.T_cw[:, :3, 3] - prob.T_cw[:, :3, 3], axis=-1)
    dR = jnp.einsum("fij,fkj->fik", res.T_cw[:, :3, :3],
                    prob.T_cw[:, :3, :3],
                    precision=jax.lax.Precision.HIGHEST)
    tr = dR[:, 0, 0] + dR[:, 1, 1] + dR[:, 2, 2]
    ang = jnp.degrees(jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)))
    oc = cfg.optimizer
    accept = ~jnp.any(
        free & ((dt > oc.local_ba_max_pose_move)
                | (ang > oc.local_ba_max_pose_rot_deg))
    )
    res = res._replace(
        T_cw=jnp.where(accept, res.T_cw, prob.T_cw),
        points=jnp.where(accept, res.points, prob.points),
        inlier=res.inlier | ~accept,
    )
    kfs = state.kfs
    new_T = jnp.where(free[:, None, None], res.T_cw, prob.T_cw)
    kfs = kfs._replace(
        T_cw=kfs.T_cw.at[jnp.where(row_ok, all_ids, F)].set(new_T, mode="drop")
    )

    pts = state.points
    new_pos = jnp.where(point_valid[:, None], res.points, prob.points)
    pts = pts._replace(
        pos=pts.pos.at[jnp.where(point_valid, local_ids, P)].set(new_pos, mode="drop")
    )

    # ---- observation pruning (erase BA outliers) --------------------------
    had_obs = prob.point_slot >= 0
    pruned = had_obs & (~res.inlier)
    if not cfg.map.prune_ba_outliers:
        pruned = jnp.zeros_like(pruned)
    new_kp_point = jnp.where(pruned, -1, kp_point_all)
    kfs = kfs._replace(kp_point=kfs.kp_point.at[jnp.where(row_ok, all_ids, F)].set(
        jnp.where(row_ok[:, None], new_kp_point, state.kfs.kp_point[all_ids]),
        mode="drop",
    ))
    # Decrement n_obs for pruned observations.
    pruned_ids = jnp.where(pruned & row_ok[:, None], kp_point_all, P).reshape(-1)
    n_obs = pts.n_obs.at[pruned_ids].add(-1, mode="drop")
    pts = pts._replace(n_obs=jnp.maximum(n_obs, 0))
    state = state._replace(points=pts, kfs=kfs)

    # ---- map-point maintenance -------------------------------------------
    slot_after = slot_of_point[
        jnp.where(kfs.kp_point[all_ids] >= 0, kfs.kp_point[all_ids], P)
    ]
    state = _refresh_local_points(
        state, all_ids, row_ok, local_ids, slot_after, point_valid, cfg
    )

    state = cull_points(state, cfg)
    return cull_keyframes(state, cfg)


# ---------------------------------------------------------------------------
# Culling (with slot release)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def cull_keyframes(state: SlamState, cfg: SlamConfig) -> SlamState:
    """KeyFrameCulling (LocalMapping.cc:764-860): a keyframe is redundant
    when >= 90% of its tracked map points are observed by at least 3
    other keyframes. Candidates are the covisible neighbors of the
    newest keyframe (as in the reference), excluding the origin and the
    two newest. Culled keyframes record their spanning-tree parent
    (strongest surviving covisible neighbor — KeyFrame::SetBadFlag
    parent reassignment, KeyFrame.cc:558-620) so trajectory references
    resolve through them, and their slots return to the allocator."""
    kfs = state.kfs
    pts0 = state.points
    P = pts0.pos.shape[0]
    F = kfs.valid.shape[0]
    last = state.last_kf
    uid = kfs.uid
    last_uid = uid[last]
    covrow = covisibility_row(kfs.kp_point, kfs.valid.astype(jnp.float32), last, P)

    ids = jnp.where(kfs.kp_point >= 0, kfs.kp_point, P)
    obs = pts0.n_obs
    obs_of = jnp.where(ids < P, obs[jnp.clip(ids, 0, P - 1)], 0)  # (F, K)
    tracked = (kfs.kp_point >= 0) & kfs.kp_valid
    redundant_obs = tracked & (obs_of >= cfg.map.min_observations + 1)
    n_tracked = jnp.sum(tracked.astype(jnp.float32), axis=1)
    ratio = jnp.sum(redundant_obs.astype(jnp.float32), axis=1) / jnp.maximum(
        n_tracked, 1.0
    )
    # Candidate set: the newest keyframe's best covisible neighbors only
    # (the reference iterates exactly those, LocalMapping.cc:766) — a
    # bounded top-C gather instead of full-F vote scatters, which were
    # ~1/4 of the keyframe-event cost at F=512.
    C = min(32, F)
    cand_base = (
        kfs.valid
        & (covrow > 0)
        & (uid > 0)
        & (uid < last_uid - 1)
    )
    cov_sc, cand_rows = jax.lax.top_k(
        jnp.where(cand_base, covrow.astype(jnp.float32), -1.0), C
    )
    rows_ok = cov_sc > 0
    cull_rows = (
        rows_ok
        & (ratio[cand_rows] > cfg.map.kf_redundancy_ratio)
        & (n_tracked[cand_rows] > 10)
    )
    cull = jnp.zeros((F,), bool).at[cand_rows].set(cull_rows, mode="drop")

    def do_cull(state):
        kfs = state.kfs
        pts0 = state.points
        # Re-point orphaned map points (whose ref_kf slot is culled) at a
        # surviving observer so loop corrections keep carrying them.
        surv_obs = jnp.where(
            (kfs.valid & ~cull)[:, None] & tracked, kfs.kp_point, P
        ).reshape(-1)
        surv_ref = jnp.full((P + 1,), -1, jnp.int32).at[surv_obs].max(
            jnp.repeat(jnp.arange(F, dtype=jnp.int32), kfs.kp_point.shape[1]),
            mode="drop",
        )[:P]

        # Spanning-tree parent of each culled keyframe: the surviving
        # observer that covers most of its tracked points — the mode of
        # its points' surviving-observer votes, computed only for the C
        # candidate rows (same strongest-survivor semantics,
        # KeyFrame.cc:558-620).
        kp_rows = kfs.kp_point[cand_rows]  # (C, K)
        pt_surv = surv_ref[jnp.clip(kp_rows, 0, P - 1)]  # (C, K)
        vote_ok = cull_rows[:, None] & tracked[cand_rows] & (pt_surv >= 0)
        votes = jnp.zeros((C, F + 1), jnp.float32).at[
            jnp.arange(C, dtype=jnp.int32)[:, None],
            jnp.where(vote_ok, pt_surv, F),
        ].add(1.0, mode="drop")[:, :F]
        parent_rows = jnp.argmax(votes, axis=1).astype(jnp.int32)
        parent_rows = jnp.where(jnp.max(votes, axis=1) > 0, parent_rows, last)
        parent = jnp.full((F,), last, jnp.int32).at[cand_rows].set(
            parent_rows, mode="drop"
        )
        T_par_inv = jax.vmap(se3.se3_inverse)(kfs.T_cw[parent])  # (F, 4, 4)
        T_rel = jnp.einsum("fij,fjk->fik", kfs.T_cw, T_par_inv)
        ref_culled = (pts0.ref_kf >= 0) & cull[jnp.clip(pts0.ref_kf, 0, F - 1)]
        new_ref = jnp.where(
            ref_culled, jnp.where(surv_ref >= 0, surv_ref, last), pts0.ref_kf
        )

        # Decrement observation counts of the culled keyframes' points
        # and clear their associations.
        culled_ids = jnp.where(cull[:, None] & tracked, kfs.kp_point, P)
        n_obs = pts0.n_obs.at[culled_ids.reshape(-1)].add(-1, mode="drop")
        pts = pts0._replace(n_obs=jnp.maximum(n_obs, 0), ref_kf=new_ref)
        kfs = kfs._replace(
            valid=kfs.valid & ~cull,
            kp_point=jnp.where(cull[:, None], -1, kfs.kp_point),
            parent_uid=jnp.where(cull, uid[parent], kfs.parent_uid),
            T_rel_parent=jnp.where(cull[:, None, None], T_rel, kfs.T_rel_parent),
        )
        # Durable copy of the retirement records: the slot-resident
        # fields above are destroyed on slot reuse, which during a
        # device-side scan happens before the host can snapshot them.
        from orb_slam2_ssd_semantic_tpu.mapping.map_state import push_retired

        retired = push_retired(state.retired, cull, uid, uid[parent], T_rel)
        return state._replace(
            points=pts, kfs=kfs, retired=retired,
            n_kfs=state.n_kfs - jnp.sum(cull.astype(jnp.int32)),
        )

    # The retirement bookkeeping (surviving-observer scatter, votes,
    # spanning-tree records) only pays when a keyframe is actually
    # culled — most keyframe events cull nothing.
    return jax.lax.cond(jnp.any(cull), do_cull, lambda s: s, state)


@functools.partial(jax.jit, static_argnames=("cfg",))
def cull_points(state: SlamState, cfg: SlamConfig) -> SlamState:
    """MapPointCulling (LocalMapping.cc:270-344): drop points with poor
    found/visible ratio, and young points that failed to gather
    observations. Culled points release their slots: every stale
    keypoint association is cleared so reuse cannot rebind it."""
    from orb_slam2_ssd_semantic_tpu.mapping.map_state import clear_point_refs

    pts = state.points
    cur_uid = state.kfs.uid[state.last_kf]
    age = cur_uid - pts.first_kf_uid  # keyframes since creation (uid units)
    visible = jnp.maximum(pts.n_visible, 1)
    ratio = pts.n_found.astype(jnp.float32) / visible.astype(jnp.float32)
    bad_ratio = (pts.n_visible >= 8) & (ratio < cfg.map.min_found_ratio)
    # Young point must reach >=3 observations by age 3 (cnThObs for
    # stereo, LocalMapping.cc:284-300); culling window closes at age 4.
    bad_young = (age >= 3) & (age <= 4) & (pts.n_obs < cfg.map.min_observations)
    lonely = pts.n_obs <= 0
    cull = pts.valid & (bad_ratio | bad_young | lonely)
    kp_point = clear_point_refs(state.kfs.kp_point, cull)
    return state._replace(
        points=pts._replace(valid=pts.valid & ~cull),
        kfs=state.kfs._replace(kp_point=kp_point),
        n_points=state.n_points - jnp.sum(cull.astype(jnp.int32)),
    )
