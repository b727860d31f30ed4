"""Measure what the local-BA outlier prune actually erases: window-row
vs anchor-row observations, chi2 distributions, per-pass erase rate."""

import dataclasses
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from orb_slam2_ssd_semantic_tpu.config import SlamConfig
    from orb_slam2_ssd_semantic_tpu.io import vocabulary as voc
    from orb_slam2_ssd_semantic_tpu.io.artifacts import find_checkpoint
    from orb_slam2_ssd_semantic_tpu.io.device_render import render_frames
    from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence
    from orb_slam2_ssd_semantic_tpu.mapping.ba import local_bundle_adjust
    from orb_slam2_ssd_semantic_tpu.mapping.local_mapping import (
        assemble_local_ba,
    )
    from orb_slam2_ssd_semantic_tpu.mapping.map_state import empty_state
    from orb_slam2_ssd_semantic_tpu.tracking import scan_tracker

    n_frames = int(os.environ.get("N", "120"))
    base = SlamConfig()
    cfg = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, th_depth=80.0),
        map=dataclasses.replace(base.map, max_keyframes=128,
                                max_map_points=16384),
        tracking=dataclasses.replace(
            base.tracking, local_map_candidates=1536,
            kf_min_inliers=0, kf_ref_ratio=0.15),
    )
    seq = SyntheticSequence(n_frames=n_frames, trajectory="loop",
                            loop_laps=2.3 * n_frames / 337)
    poses = jnp.asarray(np.stack(seq.poses_wc).astype(np.float32))
    g_dev, d_dev = render_frames(
        poses, cfg.camera, size=seq.room.size,
        boxes=tuple(tuple(map(tuple, b)) for b in seq.room.boxes),
        seed=seq.seed,
    )
    np.asarray(g_dev[0][0, 0])

    carry = scan_tracker.init_scan(empty_state(cfg), g_dev[0], d_dev[0], cfg)
    carry, T_seg, stats_seg = scan_tracker.track_sequence_scan(
        carry, g_dev[1:], d_dev[1:], cfg)
    np.asarray(T_seg)
    state = carry.state

    (prob, kf_ids, all_ids, row_ok, local_ids, point_valid,
     slot_of_point, kp_point_all) = assemble_local_ba(state, cfg)
    res = local_bundle_adjust(prob, cfg.camera, cfg.optimizer)

    had = np.asarray(prob.point_slot >= 0)
    inl = np.asarray(res.inlier)
    chi = np.asarray(res.chi2)
    fixed = np.asarray(prob.fixed)
    rok = np.asarray(row_ok)
    W = cfg.map.local_ba_window
    print(f"# rows: window={rok[:W].sum()} anchors={rok[W:].sum()}")
    for name, rows in (("window", slice(0, W)), ("anchor", slice(W, None))):
        h = had[rows] & rok[rows][:, None]
        pr = h & ~inl[rows]
        c = chi[rows][h]
        print(f"# {name}: obs={h.sum()} pruned={pr.sum()} "
              f"({100*pr.sum()/max(h.sum(),1):.1f}%) chi med "
              f"{np.median(c):.2f} p90 {np.percentile(c,90):.1f} "
              f"p99 {np.percentile(c,99):.1f}")
    # inter-KF observation sharing
    kp = np.asarray(state.kfs.kp_point)
    kv = np.asarray(state.kfs.kp_valid)
    valid = np.asarray(state.kfs.valid)
    uidF = np.asarray(state.kfs.uid)
    live = np.nonzero(valid)[0]
    live = live[np.argsort(uidF[live])]
    sets = {int(uidF[f]): set(kp[f][(kp[f] >= 0) & kv[f]].tolist())
            for f in live}
    us = sorted(sets)
    for a, b in zip(us[:-1], us[1:]):
        inter = len(sets[a] & sets[b])
        print(f"# share uid {a}({len(sets[a])}) & uid {b}({len(sets[b])}): "
              f"{inter}")
    # per-frame stats: how many tracked inliers did the scan report?
    sh = np.asarray(stats_seg)
    print("# last 12 frames [status inl kfs]:",
          sh[-12:, :3].astype(int).tolist())
    # per-row pruning detail
    uid = np.asarray(state.kfs.uid)[np.asarray(all_ids)]
    for r in range(len(rok)):
        if not rok[r]:
            continue
        h = had[r]
        pr = h & ~inl[r]
        tag = "W" if r < W else "A"
        if h.sum():
            print(f"#  {tag} row {r} uid {uid[r]} fixed={fixed[r]} "
                  f"obs={h.sum()} pruned={pr.sum()} "
                  f"chi_med={np.median(chi[r][h]):.2f}")


if __name__ == "__main__":
    main()
