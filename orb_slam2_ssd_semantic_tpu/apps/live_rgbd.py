"""Live RGB-D camera driver.

Equivalent of the reference's Percipio/TY live executable
(perfect/Examples/RGB-D/my_rgbd.cc): acquire RGB-D frames from a
camera-like source, optionally undistort the color image and register
the depth image into the color frame (the TY SDK doRegister/undistort
steps, my_rgbd.cc), feed TrackRGBD, and on exit save trajectories, the
sparse map, the occupancy map, and the semantic object database (the
Viewer "Save" menu, Viewer.cc:188-195).

There is no camera SDK in this environment, so sources are pluggable:

  --source synthetic        ray-traced synthetic world, real-time paced
  --source watch:DIR        poll DIR for TUM-style rgb/*.png depth/*.png
                            pairs appearing over time (a live stream
                            spooled to disk); new files are tracked as
                            they arrive
  --source v4l:INDEX        OpenCV VideoCapture if cv2 exists (gated)

Registration/undistortion run as device kernels (ops/register.py).
"""

from __future__ import annotations

import argparse
import os
import time


def iter_synthetic(n_frames: int, cfg):
    from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence

    seq = SyntheticSequence(n_frames=n_frames)
    for i in range(len(seq)):
        rgb, depth = seq.rgb_depth(i) if hasattr(seq, "rgb_depth") else (None, None)
        if rgb is None:
            import numpy as np

            g, d = seq.gray_depth(i)
            rgb = np.clip(np.stack([g, g, g], -1), 0, 255).astype("uint8")
            depth = d
        yield rgb, depth, i / cfg.camera.fps


def iter_watch(root: str, depth_map_factor: float, idle_timeout_s: float = 10.0):
    """Yield TUM-style (rgb, depth, stamp) pairs as files appear in
    root/rgb and root/depth; stop after idle_timeout_s without a new
    frame (the live analogue of the association file)."""
    import numpy as np
    from PIL import Image

    seen = set()
    last_new = time.time()
    while time.time() - last_new < idle_timeout_s:
        rgbs = sorted(os.listdir(os.path.join(root, "rgb"))) \
            if os.path.isdir(os.path.join(root, "rgb")) else []
        for name in rgbs:
            if name in seen or not name.endswith(".png"):
                continue
            dpath = os.path.join(root, "depth", name)
            if not os.path.exists(dpath):
                continue
            seen.add(name)
            last_new = time.time()
            rgb = np.asarray(Image.open(os.path.join(root, "rgb", name)))
            depth = np.asarray(Image.open(dpath)).astype(np.float32) / depth_map_factor
            yield rgb, depth, float(os.path.splitext(name)[0])
        time.sleep(0.05)


def iter_v4l(index: int, cfg):
    try:
        import cv2  # noqa: F401
    except ImportError as e:  # pragma: no cover - no cv2 in this image
        raise SystemExit("v4l source needs OpenCV (cv2), not available") from e
    import numpy as np

    cap = cv2.VideoCapture(index)
    i = 0
    while True:
        ok, bgr = cap.read()
        if not ok:
            return
        rgb = bgr[..., ::-1]
        # No depth sensor on a plain webcam: flat far plane keeps the
        # pipeline alive for demo purposes.
        depth = np.full(rgb.shape[:2], 3.0, np.float32)
        yield rgb, depth, i / cfg.camera.fps
        i += 1


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--source", default="synthetic")
    p.add_argument("--settings", default=None, help="OpenCV YAML or JSON config")
    p.add_argument("--frames", type=int, default=120, help="synthetic source length")
    p.add_argument("--semantics", action="store_true")
    p.add_argument("--dense-map", action="store_true")
    p.add_argument("--undistort", action="store_true",
                   help="undistort color frames on device before tracking")
    p.add_argument("--register-depth", default=None, metavar="NPZ",
                   help="npz with T_cd (4x4) + depth-cam fx fy cx cy: register "
                        "depth into the color frame on device")
    p.add_argument("--out", default=".", help="output directory for saves")
    p.add_argument("--platform", default="default", choices=["default", "cpu", "tpu"])
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from orb_slam2_ssd_semantic_tpu.config import CameraConfig, SlamConfig
    from orb_slam2_ssd_semantic_tpu.system import SlamSystem

    if args.settings and args.settings.endswith((".yaml", ".yml")):
        cfg = SlamConfig.from_opencv_yaml(args.settings)
    elif args.settings:
        cfg = SlamConfig.from_json(open(args.settings).read())
    else:
        cfg = SlamConfig()

    if args.source == "synthetic":
        frames = iter_synthetic(args.frames, cfg)
    elif args.source.startswith("watch:"):
        frames = iter_watch(args.source[6:], cfg.camera.depth_map_factor)
    elif args.source.startswith("v4l:"):
        frames = iter_v4l(int(args.source[4:]), cfg)
    else:
        raise SystemExit(f"unknown source {args.source!r}")

    reg = None
    if args.register_depth:
        from orb_slam2_ssd_semantic_tpu.ops.register import register_depth_to_color

        d = np.load(args.register_depth)
        cam_d = CameraConfig(fx=float(d["fx"]), fy=float(d["fy"]),
                             cx=float(d["cx"]), cy=float(d["cy"]),
                             width=cfg.camera.width, height=cfg.camera.height)
        T_cd = np.asarray(d["T_cd"], np.float32)

        def reg(depth):
            return np.asarray(register_depth_to_color(
                depth, T_cd, cam_d, cfg.camera,
                cfg.camera.height, cfg.camera.width))

    und = None
    if args.undistort:
        from orb_slam2_ssd_semantic_tpu.ops.register import undistort_image

        def und(rgb):
            return np.asarray(undistort_image(rgb, cfg.camera)).astype(np.uint8)

    sys_ = SlamSystem(cfg, enable_semantics=args.semantics,
                      enable_dense_map=args.dense_map)
    times, n = [], 0
    for rgb, depth, stamp in frames:
        if und is not None:
            rgb = und(rgb)
        if reg is not None:
            depth = reg(np.asarray(depth, np.float32))
        t0 = time.perf_counter()
        sys_.track_rgbd(np.asarray(rgb), np.asarray(depth, np.float32), stamp)
        times.append(time.perf_counter() - t0)
        if n % 30 == 0:
            s = sys_.tracker.stats[-1]
            print(f"frame {n:5d} status={s['status']:5s} inliers={s['inliers']:4d} "
                  f"kfs={s['kfs']} points={s['points']} "
                  f"({1.0 / max(times[-1], 1e-9):.1f} fps)")
        n += 1

    if not times:
        print("no frames received")
        return sys_
    ft = np.array(times[1:]) if len(times) > 1 else np.array(times)
    print(f"{n} frames; median {np.median(ft) * 1e3:.2f} ms, "
          f"mean {np.mean(ft) * 1e3:.2f} ms")
    sys_.save_trajectory_tum(os.path.join(args.out, "CameraTrajectory.txt"))
    sys_.save_keyframe_trajectory_tum(os.path.join(args.out, "KeyFrameTrajectory.txt"))
    sys_.save_map(os.path.join(args.out, "map.npz"))
    if args.dense_map:
        sys_.save_octomap(os.path.join(args.out, "octomap.npz"))
    if args.semantics:
        sys_.save_objects(os.path.join(args.out, "objects.npz"))
    print(f"saved trajectories + map to {args.out}")
    return sys_


if __name__ == "__main__":
    main()
