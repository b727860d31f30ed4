"""Segmented whole-sequence tracking with MID-RUN loop correction.

`track_sequence_scan` (scan_tracker.py) runs the full per-frame SLAM
update on device and *flags* loop candidates; corrections there happen
once, host-side, after the whole sequence. The reference instead
interrupts tracking to correct the map the moment a loop verifies
(LoopClosing::CorrectLoop stops LocalMapping and rewrites poses/points
mid-run, LoopClosing.cc:544-640), so all subsequent tracking benefits.

This module reproduces that behavior in the scan regime: the sequence
runs as equal-length scan segments (ONE compile, reused), and between
segments the host:

  1. reads the segment's per-frame stats (status, inliers, flagged loop
     candidate slots),
  2. geometrically verifies each flagged candidate (3D-3D RANSAC + Sim3
     refine, LoopCloser._estimate_loop_transform),
  3. on success applies the pose-graph correction + rigid point carry +
     cross-loop fusion + global BA (LoopCloser._correct), and
  4. remaps the live tracking anchor (last_T_cw) by its reference
     keyframe's correction so the next segment tracks against the
     corrected map without a pose jump.

The per-frame trajectory is recorded keyframe-relative (uid + T_rel),
exactly like the reference's SaveTrajectoryTUM (System.cc:476-502):
corrections applied at ANY later point retroactively improve every
earlier frame through its reference keyframe.
"""

from __future__ import annotations

import time
from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.mapping.loop_closing import LoopCloser
from orb_slam2_ssd_semantic_tpu.mapping.map_state import empty_state
from orb_slam2_ssd_semantic_tpu.tracking import scan_tracker


class SegmentedResult(NamedTuple):
    carry: object  # final ScanCarry
    T_all: np.ndarray  # (N, 4, 4) tracked world->camera poses (frame 0 = I)
    stats: np.ndarray  # (N-1, 4) per-frame [status, inliers, n_kfs, cand]
    traj: list  # per-frame (ref_kf_uid, T_rel) keyframe-relative records
    corrections: list  # (frame_idx, kf_slot, cand_slot, wall_s)
    n_loop_events: int  # flagged candidate events (pre-verification)
    scan_s: float  # wall time inside the jitted segment scans
    correct_s: float  # wall time inside verification+correction


def resolve_trajectory(result: SegmentedResult) -> np.ndarray:
    """(N, 3) camera centers with every keyframe-relative record resolved
    against the FINAL (corrected) keyframe poses."""
    carry = result.carry
    uid = np.asarray(carry.state.kfs.uid)
    valid = np.asarray(carry.state.kfs.valid)
    T_kf = np.asarray(carry.state.kfs.T_cw)
    by_uid = {int(u): T_kf[i] for i, u in enumerate(uid) if valid[i] and u >= 0}
    uids_sorted = sorted(by_uid)

    def kf_pose(u: int) -> np.ndarray:
        if u in by_uid:
            return by_uid[u]
        # Culled/evicted reference: nearest earlier live keyframe.
        earlier = [x for x in uids_sorted if x <= u]
        return by_uid[earlier[-1] if earlier else uids_sorted[0]]

    out = []
    for ref_uid, T_rel in result.traj:
        T = T_rel @ kf_pose(ref_uid)
        out.append(-T[:3, :3].T @ T[:3, 3])
    return np.stack(out)


def track_sequence_segmented(
    g_dev,
    d_dev,
    cfg: SlamConfig,
    vocab=None,
    voc_k: int = 10,
    voc_depth: int = 3,
    voc_words: int = 1000,
    segment_len: int = 48,
    loop_closer: LoopCloser | None = None,
    verbose: bool = False,
) -> SegmentedResult:
    """g_dev (N, H, W) uint8 grays, d_dev (N, H, W) uint16 mm depths on
    device. N must satisfy (N - 1) % segment_len == 0 (frame 0 seeds
    init_scan; every segment then has identical static shapes -> one
    compile)."""
    n = g_dev.shape[0]
    assert (n - 1) % segment_len == 0, (n, segment_len)
    n_seg = (n - 1) // segment_len

    lc = loop_closer or LoopCloser(cfg)
    va = vocab
    kw = {}
    if va is not None:
        kw = dict(vocab=va, voc_k=voc_k, voc_depth=voc_depth,
                  voc_words=voc_words)

    t0 = time.perf_counter()
    carry = scan_tracker.init_scan(
        empty_state(cfg), g_dev[0], d_dev[0], cfg,
        vocab=va, voc_k=voc_k, voc_depth=voc_depth,
    )
    T_parts: list = [np.eye(4, dtype=np.float32)[None]]
    stats_parts: list = []
    traj: list = [(0, np.eye(4, dtype=np.float32))]
    corrections: list = []
    n_loop_events = 0
    scan_s = 0.0
    correct_s = 0.0
    last_corrected_uid = -(10**9)

    for s in range(n_seg):
        lo = 1 + s * segment_len
        hi = lo + segment_len
        t_scan = time.perf_counter()
        carry, T_seg, stats_seg = scan_tracker.track_sequence_scan(
            carry, g_dev[lo:hi], d_dev[lo:hi], cfg, **kw
        )
        T_host = np.asarray(T_seg)
        stats_host = np.asarray(stats_seg)
        scan_s += time.perf_counter() - t_scan
        T_parts.append(T_host)
        stats_parts.append(stats_host)
        if verbose:
            print(f"# segment {s}: frames {lo}..{hi - 1} "
                  f"n_points={int(np.asarray(carry.state.points.valid.sum()))} "
                  f"n_kfs={int(np.asarray(carry.state.n_kfs))} "
                  f"inl_min={int(stats_host[:, 1].min())}")

        # Keyframe-relative trajectory records for this segment, against
        # the CURRENT keyframe snapshot (refined by any BA so far).
        kfs = carry.state.kfs
        k_uid = np.asarray(kfs.uid)
        k_valid = np.asarray(kfs.valid)
        k_fid = np.asarray(kfs.frame_id)
        k_T = np.asarray(kfs.T_cw)
        live = k_valid & (k_uid >= 0)
        fid_live = np.where(live, k_fid, -1)
        order = np.argsort(fid_live)
        fids_sorted = fid_live[order]
        for i in range(segment_len):
            f = lo + i
            j = np.searchsorted(fids_sorted, f, side="right") - 1
            slot = int(order[max(j, int((fids_sorted >= 0).argmax()))])
            T_rel = T_host[i] @ np.linalg.inv(k_T[slot])
            traj.append((int(k_uid[slot]), T_rel))

        # ---- mid-run loop verification + correction ------------------
        cands = stats_host[:, 3]
        events = np.nonzero(cands >= 0)[0]
        n_loop_events += len(events)
        if len(events) == 0:
            continue
        t_corr = time.perf_counter()
        state = carry.state
        valid = np.asarray(state.kfs.valid)
        fid = np.asarray(state.kfs.frame_id)
        uid = np.asarray(state.kfs.uid)
        corrected = False
        for i in events:
            cand = int(cands[i])
            if not valid[cand]:
                continue
            slots = np.nonzero(valid & (fid == lo + i))[0]
            if not len(slots):
                continue
            kf = int(slots[0])
            # Throttle: one correction per revisit neighborhood
            # (LoopClosing's mLastLoopKFid gate, LoopClosing.cc:129).
            if int(uid[kf]) - last_corrected_uid < cfg.loop.min_kfs_before_loop:
                continue
            ok, T_ji, n_inl = lc._estimate_loop_transform(state, kf, cand)
            if not ok:
                continue
            state_new = lc._correct(state, kf, cand, T_ji)
            Tn = np.asarray(state_new.kfs.T_cw)
            if not np.isfinite(Tn[np.asarray(state_new.kfs.valid)]).all():
                if verbose:
                    print("# segmented: correction produced non-finite "
                          "poses; skipped")
                continue
            state = state_new
            corrected = True
            last_corrected_uid = int(uid[kf])
            corrections.append((lo + int(i), kf, cand,
                                time.perf_counter() - t_corr))
            if verbose:
                print(f"# segmented: loop corrected at frame {lo + int(i)} "
                      f"(kf slot {kf} -> cand {cand}, {n_inl} inliers)")
            break  # one correction per segment; rest re-detect next pass

        if corrected:
            # Remap the live anchor by its reference keyframe's
            # correction (CorrectLoop's mLastFrame/current-frame update):
            # T'_cur = T_rel_to_ref @ T'_ref with T_rel measured against
            # the pre-correction reference pose.
            ref = int(np.asarray(carry.state.last_kf))
            T_ref_old = np.asarray(carry.state.kfs.T_cw[ref])
            T_ref_new = np.asarray(state.kfs.T_cw[ref])
            T_last = np.asarray(carry.last_T_cw)
            T_last_new = (T_last @ np.linalg.inv(T_ref_old)) @ T_ref_new
            carry = carry._replace(
                state=state,
                last_T_cw=jnp.asarray(T_last_new.astype(np.float32)),
                # Reset the consistency chains: the corrected map's
                # geometry changed under the counters.
                cons_count=jnp.zeros_like(carry.cons_count),
            )
        correct_s += time.perf_counter() - t_corr

    T_all = np.concatenate(T_parts)
    stats = np.concatenate(stats_parts) if stats_parts else np.zeros((0, 4))
    return SegmentedResult(carry, T_all, stats, traj, corrections,
                           n_loop_events, scan_s, correct_s)
