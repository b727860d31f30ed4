"""Benchmark: RGB-D SLAM throughput AND accuracy on the real TPU chip.

Prints ONE JSON line (driver contract):
  {"metric": "tracking_fps", "value": N, "unit": "frames/s",
   "vs_baseline": N, "ate_m": A, ...}
plus a per-config table on stderr.

Baseline: the reference runs "real-time" tracking (~30 Hz) on an
i7-class CPU (reference README.md:286; BASELINE.md) at the same
operating point (640x480 RGB-D, 1000 ORB features, 8 pyramid levels).
vs_baseline = our frames/s / 30 — GATED on accuracy: if the final
(resolved) trajectory ATE exceeds ATE_GATE_M (0.15 m, the reference's
published geom-mask accuracy class, reference README.md:146-153),
vs_baseline is reported as 0.0. Speed at broken accuracy is not a
result (VERDICT r3 weak #1).

Scenes (rendered ON DEVICE, io/device_render.py):
  loop      — 2.3-lap circuit around a four-wall-furnished 8x10 m room
              (337 frames, ~2.45 deg/frame yaw + ~15 cm/frame motion):
              the loop-closure regime.
  loop_sem  — the same circuit with four furniture boxes rendered as
              flat-intensity rectangles (io/device_render box_gray):
              DETECTABLE objects for the synthetic-task SSD, with known
              ground-truth placements for the centroid-error metric.
  sway_dyn  — fr3_walking-style dynamic scene: quasi-static swaying
              camera, three crossing walkers with walk/stand cycles +
              1% depth noise (io/synthetic.sway_trajectory +
              cross_walkers). Slow stand-then-drift phases evade
              per-frame chi2 gating (only multi-view geometry catches
              them); brisk crossings are what the flow threshold
              catches — together the reference's mask hierarchy
              (README.md:133-153: src 0.702 / flow 0.388 / geom 0.152).

Configs:
  track      — tracking + mapping on `loop`, no place recognition
  full_slam  — + in-scan loop detection + MID-RUN corrections <- PRIMARY
  dynamic    — `sway_dyn` with the per-frame optical-flow mask; the
               same scene is also run UNMASKED (reported as
               ate_unmasked — it must FAIL the gate for the scene to
               mean anything)
  geom       — `sway_dyn` with the multi-view geometry mask (the
               reference's best-accuracy mask, Geometry.cc)
  semantic   — `loop_sem` + batched SSD detection + fusion + object
               database + ground-split + occupancy insertion over the
               keyframe queue (the full async keyframe-consumer
               pipeline, semantic/consume.py); reports the OBJECT COUNT
               and centroid error vs the known box placements

ATE is evaluated against exact ground truth: both the raw tracked
trajectory and the keyframe-relative resolved trajectory (in-scan
SaveTrajectoryTUM records resolved against final poses) are reported;
the JSON carries the RESOLVED one — no best-of reduction.
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
    "BENCH_CONFIGS", "track,full_slam,dynamic,geom,semantic").split(",")
PRIMARY = os.environ.get("BENCH_PRIMARY", "full_slam")
LAPS = float(os.environ.get("BENCH_LAPS", "2.3"))

# Flat-intensity furniture for the semantic scene: box index ->
# gray level. The levels are the synthetic detection task's class
# intensity bands (semantic/train.py: class c of 3 -> 127.5*(1 +
# (-0.8 + 1.6*c/3))): 93.5=c1, 161.5=c2, 229.5=c3.
SEM_FLAT_BOXES = {0: 161.5, 3: 93.5, 5: 161.5, 7: 229.5}


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
    from orb_slam2_ssd_semantic_tpu.io.synthetic import (
        SyntheticSequence,
        cross_walkers,
    )
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
    # the 8x10 m room; capacities sized for the workload.
    base = SlamConfig()
    opt = base.optimizer
    if os.environ.get("BENCH_MIN_DEC"):  # diagnostic: BA early-exit gain
        opt = dataclasses.replace(
            opt, local_ba_min_rel_decrease=float(os.environ["BENCH_MIN_DEC"]))
    cfg = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, th_depth=80.0),
        map=dataclasses.replace(
            base.map, max_keyframes=128, max_map_points=16384
        ),
        tracking=dataclasses.replace(base.tracking, local_map_candidates=1536),
        optimizer=opt,
    )
    # The dynamic scene's masks stay live through the corrupting close
    # walker passes with a 45% static-area floor (the reference
    # hardcodes 65%, Frame.cc:357-374; here it is config — the scene's
    # walkers peak at ~50% coverage).
    cfg_dyn = dataclasses.replace(
        cfg,
        dynamic=dataclasses.replace(base.dynamic, min_static_area=0.45),
    )

    scenes = {}

    def get_scene(name):
        if name in scenes:
            return scenes[name]
        if name in ("loop", "loop_sem"):
            seq = SyntheticSequence(n_frames=N_FRAMES, trajectory="loop",
                                    loop_laps=LAPS)
            poses = jnp.asarray(np.stack(seq.poses_wc).astype(np.float32))
            boxes = tuple(tuple(map(tuple, b)) for b in seq.room.boxes)
            kw = {}
            if name == "loop_sem":
                gray_levels = [-1.0] * len(boxes)
                for i, g in SEM_FLAT_BOXES.items():
                    gray_levels[i] = g
                kw["box_gray"] = tuple(gray_levels)
            g_dev, d_dev = render_frames(
                poses, cfg.camera, size=seq.room.size, boxes=boxes,
                seed=seq.seed, **kw,
            )
        else:  # sway_dyn
            seq = SyntheticSequence(n_frames=N_FRAMES, trajectory="sway")
            poses = jnp.asarray(np.stack(seq.poses_wc).astype(np.float32))
            boxes = tuple(tuple(map(tuple, b)) for b in seq.room.boxes)
            walkers = cross_walkers(N_FRAMES, seq.room.size, n_objects=3)
            g_dev, d_dev = render_frames(
                poses, cfg.camera, size=seq.room.size, boxes=boxes,
                seed=seq.seed, moving_boxes=jnp.asarray(walkers),
                depth_noise=0.01,
            )
        np.asarray(g_dev[0][0, 0])
        scenes[name] = (seq, g_dev, d_dev)
        phase(f"device render [{name}]")
        return scenes[name]

    vocab_path = find_checkpoint("orbvoc_synth.npz")
    vocab = voc.load_binary(vocab_path) if vocab_path else None
    va = scan_tracker.VocabArrays.from_vocabulary(vocab) if vocab else None

    SPECS = {
        "track": dict(scene="loop", cfg=cfg, vocab=False),
        "full_slam": dict(scene="loop", cfg=cfg, vocab=True),
        "dynamic": dict(scene="sway_dyn", cfg=cfg_dyn, vocab=True,
                        use_flow=True, also_unmasked=True),
        "geom": dict(scene="sway_dyn", cfg=cfg_dyn, vocab=True,
                     use_geom=True),
        "semantic": dict(scene="loop_sem", cfg=cfg, vocab=True,
                         semantic=True),
    }

    def run_cfg(name):
        spec = SPECS[name]
        rcfg = spec["cfg"]
        seq, g_dev, d_dev = get_scene(spec["scene"])
        gt = seq.gt_positions()
        use_vocab = spec.get("vocab") and va is not None
        kw = {}
        if use_vocab:
            kw = dict(vocab=va, voc_k=vocab.k, voc_depth=vocab.depth,
                      voc_words=vocab.n_words)
        mask_kw = dict(use_flow=spec.get("use_flow", False),
                       use_geom=spec.get("use_geom", False))

        def run(masked=True):
            lc = LoopCloser(rcfg, vocab=vocab) if use_vocab else None
            mk = mask_kw if masked else {}
            return track_sequence_segmented(
                g_dev, d_dev, rcfg, segment_len=SEGMENT,
                loop_closer=lc, **mk, **kw,
            )

        res = run()  # compile warmup (scan + correction paths)
        semantic_extra = None
        if spec.get("semantic"):
            est_w = np.stack(
                [-T[:3, :3].T @ T[:3, 3] for T in res.T_all])
            semantic_extra = make_semantic_pass(res.carry, rcfg,
                                                (g_dev, d_dev), est_w, gt)
            semantic_extra()  # warm
        phase(f"compile+warmup [{name}]")

        fps_list, sem_s, sem_out = [], 0.0, None
        for _ in range(REPS):
            t0 = time.perf_counter()
            res = run()
            track_wall = time.perf_counter() - t0 - res.correct_s
            if semantic_extra is not None:
                t1 = time.perf_counter()
                sem_out = semantic_extra()
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
        out = dict(fps=fps, ate=ate, ate_raw=ate_raw, kfs=n_kfs,
                   flags=res.n_loop_events, corr=len(res.corrections),
                   corr_s=max(warm_corr) if warm_corr else 0.0)

        if spec.get("also_unmasked"):
            # The same dynamic scene WITHOUT the mask: must DEGRADE past
            # the gate for the scene to prove the mask's benefit
            # (the reference's src->flow story, README.md:133-144).
            r_u = run(masked=False)
            ate_u = evaluate_ate_xyz(resolve_trajectory(r_u), gt).rmse
            out["ate_unmasked"] = ate_u
        if sem_out is not None:
            out.update(sem_out)

        print(
            f"# [{name}] {N_FRAMES} frames -> {fps:.1f} fps; "
            f"ATE tracked {ate_raw:.4f} -> resolved {ate:.4f} m; "
            f"ok={int((res.stats[:, 0] == 0).sum())}/{len(res.stats)} "
            f"kfs={n_kfs} loop_flags={res.n_loop_events} "
            f"corrections={len(res.corrections)} "
            f"(warm wall {', '.join(f'{w:.2f}s' for w in warm_corr) or '-'})"
            + (f" ate_unmasked={out['ate_unmasked']:.4f}"
               if "ate_unmasked" in out else "")
            + (f" objects={out['objects']} "
               f"centroid_err={out['centroid_err']:.3f}m "
               f"spurious={out['spurious']} "
               f"sem_pass={sem_s:.2f}s" if sem_out is not None else ""),
            file=sys.stderr,
        )
        return out

    def make_semantic_pass(carry, rcfg, scene_dev, est_w, gt):
        """Batched keyframe consumers over the run's keyframe queue
        (semantic/consume.py — the engine's _on_new_keyframe pipeline in
        batch form, parity-pinned by tests/test_semantic.py), plus the
        object-count and centroid-error-vs-GT metrics (VERDICT r4 #1).

        Centroids live in the SLAM world frame (anchored at camera 0);
        the same Horn SE3 alignment ATE evaluation uses maps them into
        the ground-truth room frame for the error metric."""
        from orb_slam2_ssd_semantic_tpu.eval.ate import horn_align
        from orb_slam2_ssd_semantic_tpu.semantic.consume import (
            gt_box_localization,
            make_batched_consume,
        )

        _, R_al, t_al = horn_align(est_w, gt)
        g_dev, d_dev = scene_dev
        state = carry.state
        kf_valid = np.asarray(state.kfs.valid)
        kf_frames = np.clip(
            np.asarray(state.kfs.frame_id)[kf_valid], 0, N_FRAMES - 1)
        kf_slots = np.nonzero(kf_valid)[0]
        consume, _ = make_batched_consume(rcfg, kf_frames, kf_slots)
        grid0 = jnp.zeros((160, 40, 160), jnp.float32)
        key = jax.random.PRNGKey(7)

        seq = scenes["loop_sem"][0]
        gt_boxes = np.asarray(
            [seq.room.boxes[i] for i in SEM_FLAT_BOXES], np.float32)

        def go():
            lo, nd, db = consume(g_dev, d_dev, carry.state.kfs.T_cw,
                                 grid0, key)
            n_obj = int(np.asarray(db.valid).sum())
            db = db._replace(
                centroid=np.asarray(db.centroid) @ np.asarray(R_al).T
                + np.asarray(t_al))
            per_gt, n_spur = gt_box_localization(db, gt_boxes)
            return dict(
                objects=n_obj,
                centroid_err=float(per_gt.max()),
                spurious=n_spur,
                detections=int(np.asarray(nd).sum()),
            )

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
    extra = {}
    if "dynamic" in results:
        extra["dynamic_ate_m"] = round(results["dynamic"]["ate"], 4)
        if "ate_unmasked" in results["dynamic"]:
            extra["dynamic_unmasked_ate_m"] = round(
                results["dynamic"]["ate_unmasked"], 4)
    if "geom" in results:
        extra["geom_ate_m"] = round(results["geom"]["ate"], 4)
    if "semantic" in results and "objects" in results["semantic"]:
        extra["objects"] = results["semantic"]["objects"]
        extra["object_centroid_err_m"] = round(
            results["semantic"]["centroid_err"], 3)
        extra["objects_spurious"] = results["semantic"]["spurious"]
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
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
