"""Offline TUM RGB-D driver.

Drop-in equivalent of the reference's rgbd_tum executable
(perfect/Examples/RGB-D/rgbd_tum.cc): loads a TUM sequence via its
association file, tracks every frame, reports median/mean tracking time
(rgbd_tum.cc:125-133), and writes CameraTrajectory.txt and
KeyFrameTrajectory.txt (rgbd_tum.cc:136-137). Settings load from either
a reference-format OpenCV YAML (TUM1/2/3.yaml) or a JSON SlamConfig.

Usage:
  python -m orb_slam2_ssd_semantic_tpu.apps.rgbd_tum \
      --sequence /data/rgbd_dataset_freiburg3_walking_xyz \
      --settings TUM3.yaml --dynamic flow \
      [--association associate.txt] [--groundtruth groundtruth.txt]
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sequence", required=True, help="TUM sequence directory")
    p.add_argument("--settings", default=None, help="OpenCV YAML or JSON config")
    p.add_argument("--association", default=None)
    p.add_argument("--groundtruth", default=None, help="evaluate ATE against this")
    p.add_argument("--dynamic", default="off", choices=["off", "flow", "geom", "both"])
    p.add_argument("--semantics", action="store_true")
    p.add_argument("--dense-map", action="store_true")
    p.add_argument("--platform", default="default", choices=["default", "cpu", "tpu"])
    p.add_argument("--out", default=".", help="output directory")
    p.add_argument("--max-frames", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from orb_slam2_ssd_semantic_tpu.config import DynamicConfig, SlamConfig
    from orb_slam2_ssd_semantic_tpu.io.tum import TumSequence
    from orb_slam2_ssd_semantic_tpu.system import SlamSystem

    if args.settings and args.settings.endswith((".yaml", ".yml")):
        cfg = SlamConfig.from_opencv_yaml(args.settings)
    elif args.settings:
        cfg = SlamConfig.from_json(open(args.settings).read())
    else:
        cfg = SlamConfig()
    if args.dynamic != "off":
        cfg = cfg.replace(
            dynamic=DynamicConfig(
                enable_flow=args.dynamic in ("flow", "both"),
                enable_geometry=args.dynamic in ("geom", "both"),
                flow_threshold=cfg.dynamic.flow_threshold,
            )
        )

    seq = TumSequence.open(
        args.sequence, args.association, cfg.camera.depth_map_factor
    )
    n = len(seq) if args.max_frames <= 0 else min(len(seq), args.max_frames)
    print(f"sequence: {args.sequence} ({n} frames)")

    sys_ = SlamSystem(cfg, enable_semantics=args.semantics, enable_dense_map=args.dense_map)
    times = []
    for i in range(n):
        stamp, rgb, depth = seq[i]
        t0 = time.perf_counter()
        sys_.track_rgbd(rgb, depth, stamp)
        times.append(time.perf_counter() - t0)
        if i % 50 == 0:
            s = sys_.tracker.stats[-1]
            print(f"frame {i:5d} status={s['status']:5s} inliers={s['inliers']:4d} "
                  f"kfs={s['kfs']} points={s['points']}")

    ft = np.array(times[1:]) if len(times) > 1 else np.array(times)
    print(f"median tracking time: {np.median(ft)*1e3:.2f} ms")
    print(f"mean tracking time:   {np.mean(ft)*1e3:.2f} ms")
    # Per-stage breakdown (utils.metrics — the structured replacement
    # for the reference's ad-hoc chrono prints, SURVEY.md §5).
    print(sys_.tracker.metrics.report())

    cam_path = os.path.join(args.out, "CameraTrajectory.txt")
    kf_path = os.path.join(args.out, "KeyFrameTrajectory.txt")
    sys_.save_trajectory_tum(cam_path)
    sys_.save_keyframe_trajectory_tum(kf_path)
    print(f"trajectories written to {cam_path}, {kf_path}")

    if args.groundtruth:
        from orb_slam2_ssd_semantic_tpu.eval.ate import evaluate_ate

        res = evaluate_ate(args.groundtruth, cam_path)
        print(f"ATE RMSE: {res.rmse:.6f} m ({res.n_pairs} pairs)")
    if args.semantics:
        for o in sys_.objects():
            print("object:", o)
    return sys_


if __name__ == "__main__":
    main()
