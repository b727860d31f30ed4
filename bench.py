"""Benchmark: RGB-D SLAM tracking throughput on the real TPU chip.

Prints ONE JSON line:
  {"metric": "tracking_fps", "value": N, "unit": "frames/s", "vs_baseline": N}

Baseline: the reference runs "real-time" tracking (~30 Hz) on an
i7-class CPU (reference README.md:286; BASELINE.md) at the same
operating point (640x480 RGB-D, 1000 ORB features, 8 pyramid levels).
vs_baseline = our frames/s / 30.

Method: render a deterministic synthetic sequence ON DEVICE
(io/device_render.py; only poses cross the host link), then run the
FULL per-frame SLAM
update — ORB extraction, motion-model matching + pose GN, local-map
matching + pose GN, keyframe decision/insertion with point spawning,
windowed Schur-complement local BA, culling — as one device-side
lax.scan (tracking/scan_tracker.py) and time the scan. This measures
on-device throughput, which is what the chip delivers when it is
host-attached; per-frame host round trips through this environment's
remote-TPU relay cost ~30 ms each and are an artifact of the tunnel,
not the engine (the interactive path exists in tracking/tracker.py).
Tracking quality is checked against exact ground truth in the same run.
"""

import json
import os
import sys
import time

# Persistent XLA compilation cache: first-compile through the remote-TPU
# relay costs minutes per program; cached reruns skip it entirely.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_FPS = 30.0
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "60"))


def main():
    import numpy as np

    import jax

    # The env vars above are NOT picked up under this environment's
    # sitecustomize backend boot — the cache stays "disabled/not
    # initialized" unless set through jax.config (measured: round 1's
    # driver bench cold-compiled ~5.5 min and timed out, rc=124).
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from orb_slam2_ssd_semantic_tpu.config import SlamConfig
    from orb_slam2_ssd_semantic_tpu.eval.ate import evaluate_ate_xyz
    from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence
    from orb_slam2_ssd_semantic_tpu.tracking import scan_tracker
    from orb_slam2_ssd_semantic_tpu.mapping.map_state import empty_state

    import jax.numpy as jnp

    from orb_slam2_ssd_semantic_tpu.io.device_render import render_frames

    t_phase = time.perf_counter()

    def phase(name):
        nonlocal t_phase
        now = time.perf_counter()
        print(f"# phase {name}: {now - t_phase:.1f}s", file=sys.stderr)
        t_phase = now

    cfg = SlamConfig()
    # The synthetic sequence renders ON DEVICE (io/device_render.py):
    # the host raytrace costs ~3 s/frame on this 2-core box and pushing
    # 55 MB of frames through the remote-TPU relay costs minutes more —
    # both previously dwarfed the benchmark itself. Only the ground-truth
    # poses cross the link.
    seq = SyntheticSequence(n_frames=N_FRAMES)
    poses = jnp.asarray(np.stack(seq.poses_wc).astype(np.float32))
    g_dev, d_dev = render_frames(poses, cfg.camera, seed=seq.seed)
    np.asarray(g_dev[0][0, 0])
    phase("device render")

    def run():
        carry = scan_tracker.init_scan(empty_state(cfg), g_dev[0], d_dev[0], cfg)
        carry, T_all, stats = scan_tracker.track_sequence_scan(
            carry, g_dev[1:], d_dev[1:], cfg
        )
        return carry, T_all, stats

    # Warmup/compile (materialize to host — block_until_ready alone does
    # not reliably synchronize through the remote-TPU relay).
    carry, T_all, stats = run()
    np.asarray(T_all)
    phase("compile+warmup")

    # Time REPS independent full runs with a single host sync at the
    # end: each remote-relay round trip costs ~50-100 ms, which is >10%
    # of one 0.4 s scan — amortizing over several runs removes the noise.
    REPS = int(os.environ.get("BENCH_REPS", "3"))
    t0 = time.perf_counter()
    outs = [run() for _ in range(REPS)]
    T_host = np.asarray(outs[-1][1])
    stats_host = np.asarray(outs[-1][2])
    dt = (time.perf_counter() - t0) / REPS
    fps = (N_FRAMES - 1) / dt

    poses = np.concatenate([np.eye(4, dtype=np.float32)[None], T_host])
    est = np.stack([-T[:3, :3].T @ T[:3, 3] for T in poses])
    res = evaluate_ate_xyz(est, seq.gt_positions())
    stats = stats_host
    print(
        f"# {N_FRAMES} frames in {dt:.2f}s on-device; ATE RMSE {res.rmse:.4f} m; "
        f"ok_frames={int((stats[:, 0] == 0).sum())}/{len(stats)} "
        f"kfs={int(stats[-1, 2])}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "tracking_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
