"""Multi-lap segmented-tracking diagnosis: mid-run loop corrections,
final corrected ATE. Usage: python diag_loop.py [n_frames] [laps]
Env knobs: D_* as in diag_drift.py, plus D_SEG (segment length).
"""

import dataclasses
import os
import sys
import time

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
    from orb_slam2_ssd_semantic_tpu.eval.ate import evaluate_ate_xyz
    from orb_slam2_ssd_semantic_tpu.io import vocabulary as voc
    from orb_slam2_ssd_semantic_tpu.io.artifacts import find_checkpoint
    from orb_slam2_ssd_semantic_tpu.io.device_render import render_frames
    from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence
    from orb_slam2_ssd_semantic_tpu.tracking import scan_tracker
    from orb_slam2_ssd_semantic_tpu.tracking.segmented import (
        resolve_trajectory,
        track_sequence_segmented,
    )

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 337
    laps = float(sys.argv[2]) if len(sys.argv) > 2 else 2.3
    env = os.environ
    seg = int(env.get("D_SEG", "48"))

    base = SlamConfig()
    cfg = dataclasses.replace(
        base,
        camera=dataclasses.replace(
            base.camera, th_depth=80.0,
            depth_bf=float(env.get("D_DEPTH_BF", base.camera.depth_bf)),
        ),
        map=dataclasses.replace(
            base.map, max_keyframes=128, max_map_points=16384,
            local_ba_window=int(env.get("D_BA_WINDOW",
                                        base.map.local_ba_window)),
            triangulate_new_points=env.get("D_TRIANGULATE", "1") == "1",
            fuse_neighbors=int(env.get("D_FUSE", base.map.fuse_neighbors)),
            prune_ba_outliers=env.get("D_PRUNE", "1") == "1",
        ),
        tracking=dataclasses.replace(
            base.tracking, local_map_candidates=1536,
            subpixel_depth=env.get("D_SUBPIX", "1") == "1",
            max_new_points_per_kf=int(env.get("D_FAR_SPAWN", "100")),
            kf_min_inliers=int(env.get("D_KF_FLOOR", "0")),
            kf_ref_ratio=float(env.get("D_KF_RATIO", "0.15")),
            reanchor_on_kf=env.get("D_REANCHOR", "0") == "1",
        ),
        loop=dataclasses.replace(
            base.loop,
            run_global_ba=env.get("D_GBA", "1") == "1",
        ),
        optimizer=dataclasses.replace(
            base.optimizer,
            global_ba_iters=int(env.get("D_GBA_ITERS", base.optimizer.global_ba_iters)),
        ),
    )
    print(f"# cfg: subpix={cfg.tracking.subpixel_depth} "
          f"far={cfg.tracking.max_new_points_per_kf} "
          f"floor={cfg.tracking.kf_min_inliers} "
          f"ratio={cfg.tracking.kf_ref_ratio} seg={seg} gba={cfg.loop.run_global_ba}")

    seq = SyntheticSequence(n_frames=n_frames, trajectory="loop",
                            loop_laps=laps,
                            seed=int(env.get("D_SEED", "17")))
    poses = jnp.asarray(np.stack(seq.poses_wc).astype(np.float32))
    g_dev, d_dev = render_frames(
        poses, cfg.camera, size=seq.room.size,
        boxes=tuple(tuple(map(tuple, b)) for b in seq.room.boxes),
        seed=seq.seed,
        depth_noise=float(env.get("D_NOISE", "0")),
    )
    np.asarray(g_dev[0][0, 0])
    print(f"# rendered {n_frames} frames, laps={laps}")

    vocab_path = find_checkpoint(env.get("D_VOCAB", "orbvoc_synth.npz"))
    vocab = voc.load_binary(vocab_path)
    va = scan_tracker.VocabArrays.from_vocabulary(vocab)

    t0 = time.perf_counter()
    res = track_sequence_segmented(
        g_dev, d_dev, cfg, vocab=va, voc_k=vocab.k, voc_depth=vocab.depth,
        voc_words=vocab.n_words, segment_len=seg, verbose=True,
    )
    wall = time.perf_counter() - t0
    gt = seq.gt_positions()

    # Tracked (uncorrected) ATE from raw scan poses.
    est_raw = np.stack([-T[:3, :3].T @ T[:3, 3] for T in res.T_all])
    ate_raw = evaluate_ate_xyz(est_raw, gt).rmse
    # Corrected ATE through keyframe-relative resolution.
    est_corr = resolve_trajectory(res)
    ate_corr = evaluate_ate_xyz(est_corr, gt).rmse

    st = res.stats[:, 0]
    kfs = int(res.stats[-1, 2])
    print(f"# wall {wall:.1f}s (scan {res.scan_s:.1f}s, "
          f"correct {res.correct_s:.1f}s)")
    print(f"# loop events flagged: {res.n_loop_events}; corrections "
          f"applied: {len(res.corrections)} at "
          f"{[c[0] for c in res.corrections]}")
    for c in res.corrections:
        print(f"#   frame {c[0]}: kf {c[1]} -> cand {c[2]} ({c[3]:.2f}s)")
    print(f"# status ok={int((st==0).sum())}/{len(st)} kfs={kfs} "
          f"inl_mean={res.stats[:,1].mean():.0f} min={int(res.stats[:,1].min())}")
    print(f"# ATE tracked {ate_raw:.4f} m -> resolved/corrected "
          f"{ate_corr:.4f} m")
    n_pts = int(np.asarray(res.carry.state.n_points))
    n_valid = int(np.asarray(res.carry.state.points.valid).sum())
    print(f"# points: n_points={n_pts} valid={n_valid} "
          f"cap={cfg.map.max_map_points}")
    bad = np.nonzero(st != 0)[0]
    if len(bad):
        print(f"# bad frames ({len(bad)}): {bad[:40] + 1} ...")
        # inlier trace around the first bad stretch
        b0 = bad[0]
        lo2, hi2 = max(0, b0 - 6), min(len(st), b0 + 12)
        print("# inliers around first bad:",
              res.stats[lo2:hi2, 1].astype(int).tolist())


if __name__ == "__main__":
    main()
