"""Local mapping: window assembly, local BA dispatch, and map-point culling.

The engine's equivalent of the LocalMapping thread's per-keyframe work
(perfect/src/LocalMapping.cc:70-156): after each keyframe insertion the
host calls `local_mapping_step`, which (on device, fixed shapes):

  1. assembles the local BA problem from the newest `local_ba_window`
     keyframes and the points they observe (the recency window stands in
     for the covisibility window of Optimizer.cc:624-682 — identical for
     exploratory motion; covisibility selection arrives with loop
     closing),
  2. runs the Schur-complement local BA (mapping/ba.py),
  3. writes refined poses/points back into the SlamState and prunes
     outlier observations (Optimizer.cc:936-957 erase step),
  4. culls bad map points (MapPointCulling, LocalMapping.cc:270-344:
     found/visible ratio < 0.25, or too few observations while young).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.frontend.extractor import scale_factors
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.mapping.ba import BAProblem, local_bundle_adjust
from orb_slam2_ssd_semantic_tpu.mapping.map_state import SlamState, covisibility_row
from orb_slam2_ssd_semantic_tpu.mapping.triangulation import triangulate_pair

N_TRIANGULATION_NEIGHBORS = 2  # covis neighbors per new KF (reference: 10 best)


@functools.partial(jax.jit, static_argnames=("cfg",))
def create_new_map_points(state: SlamState, cfg: SlamConfig) -> SlamState:
    """Triangulate landmarks between the newest keyframe and its best
    covisible neighbors (LocalMapping::CreateNewMapPoints,
    LocalMapping.cc:349-649). Only keypoints with no association spawn —
    close-depth ones already spawned at insertion; this is how landmarks
    beyond the RGB-D depth range (and all monocular landmarks) enter the
    map. Neighbors with a baseline shorter than the (virtual) stereo
    baseline are skipped (LocalMapping.cc:399-421)."""
    F = state.kfs.valid.shape[0]
    P = state.points.pos.shape[0]
    sf = scale_factors(cfg.orb)
    kf1 = jnp.maximum(state.n_kfs - 1, 0)

    covis = covisibility_row(state.kfs.kp_point, state.kfs.valid.astype(jnp.float32),
                             kf1, P).astype(jnp.float32)
    _, neighbors = jax.lax.top_k(covis, N_TRIANGULATION_NEIGHBORS)

    uv1 = state.kfs.uv[kf1]
    desc1 = state.kfs.desc[kf1]
    level1 = state.kfs.level[kf1]
    T1 = state.kfs.T_cw[kf1]
    c1 = se3.se3_inverse(T1)[:3, 3]
    baseline_min = cfg.camera.depth_bf / cfg.camera.fx  # stereo baseline (m)

    for n in range(N_TRIANGULATION_NEIGHBORS):
        kf2 = neighbors[n]
        ok_pair = (covis[kf2] > 0) & state.kfs.valid[kf2] & (kf2 != kf1)
        T2 = state.kfs.T_cw[kf2]
        c2 = se3.se3_inverse(T2)[:3, 3]
        ok_pair = ok_pair & (jnp.linalg.norm(c1 - c2) > baseline_min)

        valid1 = state.kfs.kp_valid[kf1] & (state.kfs.kp_point[kf1] < 0)
        valid2 = state.kfs.kp_valid[kf2] & (state.kfs.kp_point[kf2] < 0)
        tri = triangulate_pair(
            uv1, desc1, level1, valid1 & ok_pair,
            state.kfs.uv[kf2], state.kfs.desc[kf2], state.kfs.level[kf2],
            valid2 & ok_pair,
            T1, T2, cfg.camera, cfg.orb,
        )
        ok = tri.valid & ok_pair

        # Allocate map-point slots for the survivors.
        rank = jnp.cumsum(ok.astype(jnp.int32)) - 1
        slot = state.n_points + rank
        ok = ok & (slot < P)
        slot_safe = jnp.where(ok, slot, P)

        X = tri.pts_w
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
            valid=pts.valid.at[slot_safe].set(True, mode="drop"),
        )

        # Bind both observations.
        kfs = state.kfs
        kp1 = jnp.where(ok, slot, kfs.kp_point[kf1])
        kfs = kfs._replace(kp_point=kfs.kp_point.at[kf1].set(kp1))
        K2 = kfs.kp_point.shape[1]
        j2 = jnp.where(ok, tri.idx2, K2)
        kp2 = kfs.kp_point[kf2].at[j2].set(jnp.where(ok, slot, -1), mode="drop")
        kfs = kfs._replace(kp_point=kfs.kp_point.at[kf2].set(kp2))

        state = state._replace(
            points=pts, kfs=kfs,
            n_points=state.n_points + jnp.sum(ok.astype(jnp.int32)),
        )
    return state


@functools.partial(jax.jit, static_argnames=("cfg",))
def local_mapping_step(state: SlamState, cfg: SlamConfig) -> SlamState:
    """Run one triangulate + local-BA + culling pass anchored at the
    newest keyframe (the LocalMapping thread's per-KF sequence,
    LocalMapping.cc:89-125)."""
    if cfg.map.triangulate_new_points:
        state = create_new_map_points(state, cfg)
    W = cfg.map.local_ba_window
    N = cfg.map.local_ba_max_points
    P = state.points.pos.shape[0]
    F = state.kfs.valid.shape[0]
    K = state.kfs.uv.shape[1]
    sf = scale_factors(cfg.orb)

    # ---- window: newest W keyframes --------------------------------------
    kf_ids_raw = state.n_kfs - W + jnp.arange(W)  # oldest..newest
    in_window = kf_ids_raw >= 0
    kf_ids = jnp.clip(kf_ids_raw, 0, F - 1)
    # Gauge: fix the oldest valid KF in the window (and every slot that
    # falls before keyframe 0). With <=2 KFs everything is fixed (no-op).
    first_pos = jnp.argmax(in_window)  # first True
    fixed = (~in_window) | (jnp.arange(W) == first_pos)

    kp_point = state.kfs.kp_point[kf_ids]  # (W, K)
    kp_point = jnp.where(in_window[:, None], kp_point, -1)

    # ---- local point set --------------------------------------------------
    ids_flat = kp_point.reshape(-1)
    present = jnp.zeros((P,), jnp.float32).at[
        jnp.where(ids_flat >= 0, ids_flat, P)
    ].add(1.0, mode="drop")
    present = present * state.points.valid
    _, local_ids = jax.lax.top_k(present, N)  # (N,) point ids (desc by count)
    slot_of_point = jnp.full((P + 1,), -1, jnp.int32).at[local_ids].set(
        jnp.arange(N, dtype=jnp.int32)
    )
    point_valid = present[local_ids] > 0

    slot = slot_of_point[jnp.where(kp_point >= 0, kp_point, P)]  # (W, K)

    # ---- observations -----------------------------------------------------
    lv = jnp.clip(state.kfs.level[kf_ids], 0, cfg.orb.n_levels - 1)
    inv_sigma2 = 1.0 / (sf[lv] ** 2)
    depth = state.kfs.depth[kf_ids]
    uv = state.kfs.uv[kf_ids]
    z_safe = jnp.where(depth > 1e-6, depth, 1.0)
    ur = jnp.where(depth > 1e-6, uv[..., 0] - cfg.camera.depth_bf / z_safe, -1.0)
    obs_uvr = jnp.concatenate([uv, ur[..., None]], axis=-1)

    prob = BAProblem(
        T_cw=state.kfs.T_cw[kf_ids],
        fixed=fixed,
        points=state.points.pos[local_ids],
        point_valid=point_valid,
        point_slot=jnp.where(state.kfs.kp_valid[kf_ids], slot, -1),
        obs_uvr=obs_uvr,
        inv_sigma2=inv_sigma2,
        is_stereo=depth > 1e-6,
    )
    res = local_bundle_adjust(prob, cfg.camera, cfg.optimizer)

    # ---- write back -------------------------------------------------------
    free = (~fixed) & in_window
    kfs = state.kfs
    new_T = jnp.where(free[:, None, None], res.T_cw, prob.T_cw)
    kfs = kfs._replace(T_cw=kfs.T_cw.at[kf_ids].set(new_T))

    pts = state.points
    new_pos = jnp.where(point_valid[:, None], res.points, prob.points)
    pts = pts._replace(
        pos=pts.pos.at[jnp.where(point_valid, local_ids, P)].set(new_pos, mode="drop")
    )

    # ---- observation pruning (erase BA outliers) --------------------------
    had_obs = prob.point_slot >= 0
    pruned = had_obs & (~res.inlier)
    new_kp_point = jnp.where(pruned, -1, kp_point)
    kfs = kfs._replace(kp_point=kfs.kp_point.at[kf_ids].set(
        jnp.where(in_window[:, None], new_kp_point, state.kfs.kp_point[kf_ids])
    ))
    # Decrement n_obs for pruned observations.
    pruned_ids = jnp.where(pruned, kp_point, P).reshape(-1)
    n_obs = pts.n_obs.at[pruned_ids].add(-1, mode="drop")
    pts = pts._replace(n_obs=jnp.maximum(n_obs, 0))

    state = state._replace(points=pts, kfs=kfs)
    state = cull_points(state, cfg)
    return cull_keyframes(state, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def cull_keyframes(state: SlamState, cfg: SlamConfig) -> SlamState:
    """KeyFrameCulling (LocalMapping.cc:764-860): a keyframe is redundant
    when >= 90% of its tracked map points are observed by at least 3
    other keyframes. Applied to the recent window excluding the newest
    two (the reference culls local covisible keyframes of the new KF)."""
    kfs = state.kfs
    P = state.points.pos.shape[0]
    ids = jnp.where(kfs.kp_point >= 0, kfs.kp_point, P)
    obs = state.points.n_obs
    obs_of = jnp.where(ids < P, obs[jnp.clip(ids, 0, P - 1)], 0)  # (F, K)
    tracked = (kfs.kp_point >= 0) & kfs.kp_valid
    redundant_obs = tracked & (obs_of >= cfg.map.min_observations + 1)
    n_tracked = jnp.sum(tracked.astype(jnp.float32), axis=1)
    ratio = jnp.sum(redundant_obs.astype(jnp.float32), axis=1) / jnp.maximum(
        n_tracked, 1.0
    )
    kf_idx = jnp.arange(kfs.valid.shape[0])
    in_window = (kf_idx >= state.n_kfs - cfg.map.local_ba_window) & (
        kf_idx < state.n_kfs - 2
    ) & (kf_idx > 0)
    cull = kfs.valid & in_window & (ratio > cfg.map.kf_redundancy_ratio) & (
        n_tracked > 10
    )
    # Decrement observation counts of the culled keyframes' points and
    # clear their associations.
    culled_ids = jnp.where(cull[:, None] & tracked, kfs.kp_point, P)
    n_obs = state.points.n_obs.at[culled_ids.reshape(-1)].add(-1, mode="drop")
    pts = state.points._replace(n_obs=jnp.maximum(n_obs, 0))
    kfs = kfs._replace(
        valid=kfs.valid & ~cull,
        kp_point=jnp.where(cull[:, None], -1, kfs.kp_point),
    )
    return state._replace(points=pts, kfs=kfs)


@functools.partial(jax.jit, static_argnames=("cfg",))
def cull_points(state: SlamState, cfg: SlamConfig) -> SlamState:
    """MapPointCulling (LocalMapping.cc:270-344): drop points with poor
    found/visible ratio, and young points that failed to gather
    observations."""
    pts = state.points
    age = state.n_kfs - 1 - pts.ref_kf  # keyframes since creation
    visible = jnp.maximum(pts.n_visible, 1)
    ratio = pts.n_found.astype(jnp.float32) / visible.astype(jnp.float32)
    bad_ratio = (pts.n_visible >= 8) & (ratio < cfg.map.min_found_ratio)
    # Young point must reach >=3 observations by age 3 (cnThObs for
    # stereo, LocalMapping.cc:284-300); culling window closes at age 4.
    bad_young = (age >= 3) & (age <= 4) & (pts.n_obs < cfg.map.min_observations)
    lonely = pts.n_obs <= 0
    cull = pts.valid & (bad_ratio | bad_young | lonely)
    return state._replace(points=pts._replace(valid=pts.valid & ~cull))
