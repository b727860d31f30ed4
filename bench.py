"""Benchmark: RGB-D tracking throughput on the real TPU chip.

Prints ONE JSON line:
  {"metric": "tracking_fps", "value": N, "unit": "frames/s", "vs_baseline": N}

Baseline: the reference runs "real-time" tracking (~30 Hz) on an
i7-class CPU (reference README.md:286; BASELINE.md) at the same
operating point (640x480 RGB-D, 1000 ORB features, 8 pyramid levels).
vs_baseline = our frames/s / 30.

Method: render a deterministic synthetic sequence up front (host), warm
up compile, then time the full per-frame SLAM path — ORB extraction,
motion-model matching + pose GN, local-map matching + pose GN, keyframe
insertion policy — end to end including host orchestration.
"""

import json
import os
import sys
import time

BASELINE_FPS = 30.0
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "60"))


def main():
    import numpy as np

    from orb_slam2_ssd_semantic_tpu.config import SlamConfig
    from orb_slam2_ssd_semantic_tpu.eval.ate import evaluate_ate_xyz
    from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence
    from orb_slam2_ssd_semantic_tpu.tracking.tracker import Tracker

    cfg = SlamConfig()
    seq = SyntheticSequence(n_frames=N_FRAMES)
    # Compact sensor dtypes (uint8 gray, uint16 mm depth) — what a real
    # camera delivers, and 4x less host->device traffic.
    frames = []
    for i in range(len(seq)):
        g, d = seq.gray_depth(i)
        frames.append(
            (np.clip(g, 0, 255).astype(np.uint8), (d * 1000).astype(np.uint16))
        )

    # Warmup: compile every jit in the loop (first KF + 3 tracked frames).
    warm = Tracker(cfg)
    for i in range(min(4, len(frames))):
        warm.process(frames[i][0], frames[i][1], float(seq.stamps[i]))

    tracker = Tracker(cfg)
    t0 = time.perf_counter()
    for i, (gray, depth) in enumerate(frames):
        tracker.process(gray, depth, float(seq.stamps[i]))
    dt = time.perf_counter() - t0
    fps = len(frames) / dt

    res = evaluate_ate_xyz(tracker.camera_positions(), seq.gt_positions())
    print(
        f"# {len(frames)} frames in {dt:.2f}s; ATE RMSE {res.rmse:.4f} m; "
        f"kfs={int(tracker.state.n_kfs)} points={int(tracker.state.n_points)}",
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
