"""Standalone real-time detect + locate demo (no SLAM).

The engine's equivalent of the reference's `realtime_dect_loc/` demo
(realtime_dect_loc/src/main.cpp:34-159): a camera-free driver that runs
RGB-D frames through the SSD detector and one of the two 2D->3D fusion
schemes (2d_3d_merge.cpp ≙ fuse_depth_window; mergeSG.cpp ≙
fuse_segmentation), accumulating localized objects in the semantic
ObjectDatabase and printing each frame's labeled detections — exactly
the demo's console/viewer output, headless.

Frame sources:
  --source synthetic     deterministic rendered room (default)
  --source <dir>         directory of paired `rgb_*.npy` / `depth_*.npy`
                         arrays (uint8 HxWx3, float32 meters)

Usage:
    python -m orb_slam2_ssd_semantic_tpu.apps.detect_locate --frames 10
    python -m orb_slam2_ssd_semantic_tpu.apps.detect_locate --scheme seg
"""

from __future__ import annotations

import argparse
import time


def iter_frames(source: str, n_frames: int):
    """Yield (rgb uint8 HxWx3, depth float32 m) pairs."""
    import numpy as np

    if source == "synthetic":
        from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence

        seq = SyntheticSequence(n_frames=n_frames)
        for i in range(len(seq)):
            gray, depth = seq.gray_depth(i)
            rgb = np.repeat(
                np.clip(gray, 0, 255).astype(np.uint8)[..., None], 3, axis=-1
            )
            yield rgb, depth.astype(np.float32)
    else:
        import glob
        import os

        rgbs = sorted(glob.glob(os.path.join(source, "rgb_*.npy")))[:n_frames]
        for rp in rgbs:
            dp = rp.replace("rgb_", "depth_")
            yield np.load(rp), np.load(dp).astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=5)
    p.add_argument("--source", default="synthetic")
    p.add_argument("--scheme", default="depth", choices=["depth", "seg"],
                   help="fusion scheme: depth window (Merge2d3d) or "
                        "segmentation (MergeSG)")
    p.add_argument("--params", default=None, help="trained SSDLite params (.npz)")
    p.add_argument("--score", type=float, default=None,
                   help="detection score threshold override")
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "default"])
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    elif args.platform == "tpu":
        jax.config.update("jax_platforms", "axon")

    import jax.numpy as jnp
    import numpy as np

    from orb_slam2_ssd_semantic_tpu.config import CameraConfig, SemanticConfig
    from orb_slam2_ssd_semantic_tpu.semantic import fusion
    from orb_slam2_ssd_semantic_tpu.semantic.detector import Detector
    from orb_slam2_ssd_semantic_tpu.semantic.object_db import (
        add_objects,
        empty_db,
        summarize,
    )
    from orb_slam2_ssd_semantic_tpu.semantic.ssdlite import VOC_CLASSES, load_params

    import dataclasses

    cam = CameraConfig()
    sem = SemanticConfig()
    if args.score is not None:
        sem = dataclasses.replace(sem, det_score_threshold=args.score)
    det = Detector(sem)
    if args.params:
        det.params = load_params(args.params, det.params)
    db = empty_db()
    T_identity = jnp.eye(4, dtype=jnp.float32)

    times = []
    for i, (rgb, depth) in enumerate(iter_frames(args.source, args.frames)):
        t0 = time.perf_counter()
        d = det(rgb)
        depth_j = jnp.asarray(depth)
        if args.scheme == "depth":
            cen, size, prob, cls, ok = fusion.fuse_depth_window(
                d, depth_j, T_identity, cam, sem
            )
        else:
            cen, size, prob, cls, ok = fusion.fuse_segmentation(
                d, depth_j, T_identity, cam, sem
            )
        db = add_objects(db, cen, size, prob, cls, ok)
        ok_np = np.asarray(ok)
        times.append(time.perf_counter() - t0)
        labels = [
            f"{VOC_CLASSES[int(c)]}:{float(s):.2f}@{np.round(np.asarray(cen)[j], 2).tolist()}"
            for j, (c, s) in enumerate(zip(np.asarray(d.classes), np.asarray(d.scores)))
            if ok_np[j]
        ]
        print(f"frame {i:3d}  {len(labels)} localized  {labels}")

    print(f"\nmedian frame time: {np.median(times) * 1000:.1f} ms")
    print("object database:")
    for row in summarize(db):
        print(" ", row)
    return db


if __name__ == "__main__":
    main()
