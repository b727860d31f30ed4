"""Benchmark: RGB-D SLAM throughput AND accuracy on the real TPU chip.

Prints ONE JSON line (driver contract):
  {"metric": "tracking_fps", "value": N, "unit": "frames/s",
   "vs_baseline": N, "ate_m": A, ...}
plus a per-config table on stderr.

Baseline: the reference runs "real-time" tracking (~30 Hz) on an
i7-class CPU (reference README.md:286; BASELINE.md) at the same
operating point (640x480 RGB-D, 1000 ORB features, 8 pyramid levels).
vs_baseline = our frames/s / 30 — GATED on accuracy: if the final
(corrected) trajectory ATE exceeds ATE_GATE_M (0.15 m, the reference's
published geom-mask accuracy class, reference README.md:146-153),
vs_baseline is reported as 0.0. Speed at broken accuracy is not a
result (VERDICT r3 weak #1).

Method (multi-lap revision, VERDICT r3 #1/#2): a 2.3-lap LOOP-CIRCUIT
trajectory around a four-wall-furnished room (337 frames at the same
~2.45 deg/frame yaw + ~15 cm/frame motion as the r3 bench), rendered ON
DEVICE. The full per-frame SLAM update (ORB extraction, motion-model +
local-map tracking, keyframe events with triangulation/fusion/local
BA/culling, in-scan BoW loop detection) runs as equal-length device
scan segments; BETWEEN segments the host verifies flagged loop
candidates and applies the pose-graph + global-BA correction MID-RUN
(the reference's CorrectLoop interrupts tracking the same way,
LoopClosing.cc:544-580). Corrections are warm after the first rep;
their wall time is reported separately and excluded from fps, matching
the reference's background-thread GBA.

Configs:
  track      — tracking + mapping, no place recognition
  full_slam  — + in-scan loop detection + MID-RUN corrections <- PRIMARY
  dynamic    — + per-frame optical-flow dynamic masking in-scan
  semantic   — + batched SSD detection + depth-window fusion + object
               database + occupancy insertion over the keyframe queue
               (the full async keyframe-consumer pipeline)

ATE is evaluated against exact ground truth: both the raw tracked
trajectory and the keyframe-relative resolved trajectory (corrections
applied retroactively, SaveTrajectoryTUM semantics) are reported; the
JSON carries the RESOLVED one — no best-of reduction (VERDICT r3
weak #1).
"""

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_FPS = 30.0
ATE_GATE_M = 0.15
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "337"))
SEGMENT = int(os.environ.get("BENCH_SEGMENT", "84"))
REPS = int(os.environ.get("BENCH_REPS", "3"))
CONFIGS = os.environ.get(
    "BENCH_CONFIGS", "track,full_slam,dynamic,semantic").split(",")
PRIMARY = os.environ.get("BENCH_PRIMARY", "full_slam")
LAPS = float(os.environ.get("BENCH_LAPS", "2.3"))


def main():
    import numpy as np

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
    from orb_slam2_ssd_semantic_tpu.mapping.loop_closing import LoopCloser
    from orb_slam2_ssd_semantic_tpu.tracking import scan_tracker
    from orb_slam2_ssd_semantic_tpu.tracking.segmented import (
        resolve_trajectory,
        track_sequence_segmented,
    )

    t_phase = time.perf_counter()

    def phase(name):
        nonlocal t_phase
        now = time.perf_counter()
        print(f"# phase {name}: {now - t_phase:.1f}s", file=sys.stderr)
        t_phase = now

    # Dataset-level configuration, like the reference's per-sequence yaml
    # (TUM3.yaml): ThDepth=80 extends the close-point range to ~6 m for
    # the 8x10 m room; capacities sized for the workload (2.3 laps peak
    # ~25 live keyframes / ~2.5k points).
    base = SlamConfig()
    cfg = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, th_depth=80.0),
        map=dataclasses.replace(
            base.map, max_keyframes=128, max_map_points=16384
        ),
        tracking=dataclasses.replace(base.tracking, local_map_candidates=1536),
    )
    seq = SyntheticSequence(n_frames=N_FRAMES, trajectory="loop",
                            loop_laps=LAPS)
    poses = jnp.asarray(np.stack(seq.poses_wc).astype(np.float32))
    g_dev, d_dev = render_frames(
        poses, cfg.camera, size=seq.room.size,
        boxes=tuple(tuple(map(tuple, b)) for b in seq.room.boxes),
        seed=seq.seed,
    )
    np.asarray(g_dev[0][0, 0])
    phase("device render")

    vocab_path = find_checkpoint("orbvoc_synth.npz")
    vocab = voc.load_binary(vocab_path) if vocab_path else None
    va = scan_tracker.VocabArrays.from_vocabulary(vocab) if vocab else None
    gt = seq.gt_positions()

    def run_cfg(name):
        use_vocab = name in ("full_slam", "dynamic", "semantic") and va is not None
        use_flow = name == "dynamic"
        kw = {}
        if use_vocab:
            kw = dict(vocab=va, voc_k=vocab.k, voc_depth=vocab.depth,
                      voc_words=vocab.n_words)

        def run():
            lc = LoopCloser(cfg, vocab=vocab) if use_vocab else None
            return track_sequence_segmented(
                g_dev, d_dev, cfg, segment_len=SEGMENT,
                loop_closer=lc, use_flow=use_flow, **kw,
            )

        res = run()  # compile warmup (scan + correction paths)
        semantic_extra = None
        if name == "semantic":
            semantic_extra = make_semantic_pass(res.carry, cfg)
            semantic_extra()  # warm
        phase(f"compile+warmup [{name}]")

        fps_list, sem_s = [], 0.0
        for _ in range(REPS):
            t0 = time.perf_counter()
            res = run()
            track_wall = time.perf_counter() - t0 - res.correct_s
            if semantic_extra is not None:
                t1 = time.perf_counter()
                n_objects = semantic_extra()
                sem_s = time.perf_counter() - t1
                track_wall += sem_s
            fps_list.append(N_FRAMES / track_wall)
        fps = float(np.mean(fps_list))

        est_raw = np.stack([-T[:3, :3].T @ T[:3, 3] for T in res.T_all])
        ate_raw = evaluate_ate_xyz(est_raw, gt).rmse
        est = resolve_trajectory(res)
        ate = evaluate_ate_xyz(est, gt).rmse
        n_kfs = int(res.stats[-1, 2])
        warm_corr = [c[3] for c in res.corrections]
        print(
            f"# [{name}] {N_FRAMES} frames -> {fps:.1f} fps; "
            f"ATE tracked {ate_raw:.4f} -> resolved {ate:.4f} m; "
            f"ok={int((res.stats[:, 0] == 0).sum())}/{len(res.stats)} "
            f"kfs={n_kfs} loop_flags={res.n_loop_events} "
            f"corrections={len(res.corrections)} "
            f"(warm wall {', '.join(f'{w:.2f}s' for w in warm_corr) or '-'})"
            + (f" objects={n_objects}" if name == "semantic" else "")
            + (f" sem_pass={sem_s:.2f}s" if name == "semantic" else ""),
            file=sys.stderr,
        )
        return dict(fps=fps, ate=ate, ate_raw=ate_raw, kfs=n_kfs,
                    flags=res.n_loop_events, corr=len(res.corrections),
                    corr_s=max(warm_corr) if warm_corr else 0.0)

    def make_semantic_pass(carry, cfg):
        """Batched keyframe consumers over the sequence's keyframes: SSD
        detection, depth-window fusion (Merge2d3d), object-database
        merge, occupancy insertion — the reference's RunDetect +
        MapDrawer::UpdateOctomap pipeline including the fusion the r3
        bench omitted (VERDICT r3 weak #3)."""
        import functools

        from orb_slam2_ssd_semantic_tpu.dense.occupancy import (
            empty_grid,
            insert_scan,
        )
        from orb_slam2_ssd_semantic_tpu.dense.pointcloud import keyframe_cloud
        from orb_slam2_ssd_semantic_tpu.geometry import se3 as se3_ops
        from orb_slam2_ssd_semantic_tpu.semantic.detector import Detector
        from orb_slam2_ssd_semantic_tpu.semantic.fusion import (
            fuse_depth_window,
        )
        from orb_slam2_ssd_semantic_tpu.semantic.object_db import (
            add_objects,
            empty_db,
        )

        det = Detector(cfg.semantic)
        dense_cfg = dataclasses.replace(
            cfg.dense,
            max_ray_steps=int(cfg.dense.cloud_max_depth / 0.1) + 8,
        )
        state = carry.state
        kf_valid = np.asarray(state.kfs.valid)
        kf_frames = np.asarray(state.kfs.frame_id)[kf_valid]
        kf_slots = np.nonzero(kf_valid)[0]
        kf_frames = np.clip(kf_frames, 0, N_FRAMES - 1)

        @functools.partial(jax.jit)
        def consume(g_dev, d_dev, T_cw_all, grid_lo):
            grid = empty_grid(extent=(16.0, 4.0, 16.0), resolution=0.1,
                              origin=(-2.0, 0.0, -2.0))
            grid = grid._replace(log_odds=grid_lo)

            # Detection: the WHOLE keyframe queue in one bf16 forward
            # (RunDetect.cc:44 queue semantics; batch>1 fills the MXU).
            fis = jnp.asarray(kf_frames, jnp.int32)
            grays = g_dev[fis].astype(jnp.float32)
            rgbs = jnp.repeat(grays[..., None], 3, -1)
            dd = det._detect_batched(det.params, rgbs, cfg.camera.height,
                                     cfg.camera.width)
            ndet = dd.valid.sum(-1)

            # Per-keyframe: depth-window fusion of the detections into
            # 3D clusters + object-database merge + occupancy insertion.
            db = empty_db(cfg.semantic.max_objects)

            def body2(carry_in, inp):
                grid, db = carry_in
                i, fi, slot = inp
                depth = d_dev[fi].astype(jnp.float32) * 1e-3
                T_cw = T_cw_all[slot]
                det_i = jax.tree.map(lambda x: x[i], dd)
                cen, siz, prob, cls, ok = fuse_depth_window(
                    det_i, depth, T_cw, cfg.camera, cfg.semantic)
                db = add_objects(db, cen, siz, prob, cls, ok)
                pts, valid = keyframe_cloud(depth, T_cw, cfg.camera,
                                            dense_cfg)
                origin = se3_ops.se3_inverse(T_cw)[:3, 3]
                grid = insert_scan(grid, origin, pts, valid, cfg=dense_cfg)
                return (grid, db), 0

            idx = jnp.arange(len(kf_frames), dtype=jnp.int32)
            (grid, db), _ = jax.lax.scan(
                body2, (grid, db),
                (idx, fis, jnp.asarray(kf_slots, jnp.int32)),
            )
            return grid.log_odds, ndet, db.valid.sum()

        grid0 = jnp.zeros((160, 40, 160), jnp.float32)

        def go():
            lo, nd, n_obj = consume(g_dev, d_dev, carry.state.kfs.T_cw, grid0)
            return int(n_obj)

        return go

    results = {}
    for name in CONFIGS:
        results[name] = run_cfg(name)

    print("# config        fps     ATE(m)  raw(m)  kfs flags corr",
          file=sys.stderr)
    for name, r in results.items():
        print(
            f"# {name:12s} {r['fps']:7.1f} {r['ate']:7.4f} "
            f"{r['ate_raw']:7.4f} {r['kfs']:4d} {r['flags']:4d} "
            f"{r['corr']:4d}",
            file=sys.stderr,
        )

    r = results[PRIMARY if PRIMARY in results else CONFIGS[0]]
    gate_ok = r["ate"] <= ATE_GATE_M
    print(
        json.dumps(
            {
                "metric": "tracking_fps",
                "value": round(r["fps"], 2),
                "unit": "frames/s",
                "vs_baseline": round(r["fps"] / BASELINE_FPS, 3)
                if gate_ok else 0.0,
                "ate_m": round(r["ate"], 4),
                "ate_gate_m": ATE_GATE_M,
                "loop_corrections": r["corr"],
            }
        )
    )


if __name__ == "__main__":
    main()
