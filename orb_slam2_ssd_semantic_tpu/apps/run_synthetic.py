"""End-to-end SLAM run on the synthetic RGB-D sequence.

The engine's equivalent of the reference's rgbd_tum driver
(perfect/Examples/RGB-D/rgbd_tum.cc) for an environment with no TUM
images: renders a deterministic furnished-room sequence, tracks it, and
reports ATE against the exact ground truth plus per-frame timing
(median/mean, as rgbd_tum.cc:125-133 prints).

Usage:
    python -m orb_slam2_ssd_semantic_tpu.apps.run_synthetic --frames 60
    python -m orb_slam2_ssd_semantic_tpu.apps.run_synthetic --platform tpu
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "default"])
    p.add_argument("--depth-noise", type=float, default=0.0)
    p.add_argument("--save", default=None, help="write TUM trajectory here")
    p.add_argument("--seed", type=int, default=17)
    p.add_argument(
        "--dynamic", default="off", choices=["off", "none", "flow", "geom", "both"],
        help="render a moving object and enable the dynamic-pixel filter",
    )
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    elif args.platform == "tpu":
        jax.config.update("jax_platforms", "axon")

    import numpy as np

    from orb_slam2_ssd_semantic_tpu.config import DynamicConfig, SlamConfig
    from orb_slam2_ssd_semantic_tpu.eval.ate import evaluate_ate_xyz
    from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence
    from orb_slam2_ssd_semantic_tpu.tracking.tracker import Tracker

    cfg = SlamConfig()
    render_dynamic = args.dynamic not in ("off",)
    if args.dynamic in ("flow", "both"):
        cfg = cfg.replace(dynamic=DynamicConfig(
            enable_flow=True, enable_geometry=args.dynamic == "both"))
    elif args.dynamic == "geom":
        cfg = cfg.replace(dynamic=DynamicConfig(enable_geometry=True))
    seq = SyntheticSequence(
        n_frames=args.frames, seed=args.seed, depth_noise=args.depth_noise,
        dynamic_objects=render_dynamic,
    )
    tracker = Tracker(cfg)

    frame_times = []
    for i in range(len(seq)):
        gray, depth = seq.gray_depth(i)
        t0 = time.perf_counter()
        tracker.process(gray, depth, float(seq.stamps[i]))
        frame_times.append(time.perf_counter() - t0)
        if i % 10 == 0:
            s = tracker.stats[-1]
            print(
                f"frame {i:4d}  status={s['status']:5s} inliers={s['inliers']:4d} "
                f"kfs={s['kfs']:3d} points={s['points']:6d} t={frame_times[-1]*1e3:.1f}ms"
            )

    ft = np.array(frame_times[1:])  # skip compile frame
    res = evaluate_ate_xyz(tracker.camera_positions(), seq.gt_positions())
    print()
    print(f"median tracking time: {np.median(ft)*1e3:.2f} ms")
    print(f"mean tracking time:   {np.mean(ft)*1e3:.2f} ms")
    print(f"ATE RMSE: {res.rmse:.6f} m (mean {res.mean:.6f}, median {res.median:.6f})")
    if args.save:
        tracker.save_trajectory_tum(args.save)
        print(f"trajectory written to {args.save}")
    return res


if __name__ == "__main__":
    main()
