"""Point-cloud -> occupancy-map converter.

The engine's equivalent of the reference's `tool/pcd2octomap.cc` (read a
PCD point cloud, insert every point into an octomap, write `.ot`): read
a point cloud (.npz with `points` (N,3) [+ optional `colors`], or ASCII
.xyz/.txt with one `x y z` row per line), raycast-insert it into the
log-odds voxel grid from a given sensor origin, and save the grid
(dense/occupancy.py save format).

Usage:
    python -m orb_slam2_ssd_semantic_tpu.apps.cloud_to_occupancy \
        cloud.npz map.npz --resolution 0.05 --origin 0 0 0
"""

from __future__ import annotations

import argparse


def load_cloud(path: str):
    import numpy as np

    if path.endswith(".npz"):
        data = np.load(path)
        return np.asarray(data["points"], np.float32)
    pts = np.loadtxt(path, dtype=np.float32)
    if pts.ndim == 1:
        pts = pts[None]
    return pts[:, :3]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("cloud", help="input .npz (points key) or ASCII xyz")
    p.add_argument("out", help="output occupancy map (.npz)")
    p.add_argument("--resolution", type=float, default=0.05)
    p.add_argument("--origin", type=float, nargs=3, default=[0.0, 0.0, 0.0],
                   help="sensor origin for free-space carving")
    p.add_argument("--extent", type=float, nargs=3, default=[10.0, 6.0, 10.0])
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "default"])
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    elif args.platform == "tpu":
        jax.config.update("jax_platforms", "axon")

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from orb_slam2_ssd_semantic_tpu.config import DenseMapConfig
    from orb_slam2_ssd_semantic_tpu.dense import occupancy as occ

    cfg = dataclasses.replace(DenseMapConfig(), resolution=args.resolution)
    pts = load_cloud(args.cloud)
    grid = occ.empty_grid(tuple(args.extent), cfg.resolution)
    origin = jnp.asarray(args.origin, jnp.float32)

    # Insert in fixed-size chunks (static shapes -> one compile).
    CHUNK = 16384
    n = len(pts)
    pad = (-n) % CHUNK
    pts_p = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    for i in range(0, len(pts_p), CHUNK):
        chunk = jnp.asarray(pts_p[i : i + CHUNK])
        v = jnp.asarray(valid[i : i + CHUNK])
        grid = occ.insert_scan(grid, origin, chunk, v, cfg=cfg)

    occ.save_grid(args.out, grid, cfg)
    n_occ = int(np.asarray(occ.occupied_mask(grid, cfg)).sum())
    print(f"{n} points -> {n_occ} occupied voxels @ {args.resolution} m -> {args.out}")


if __name__ == "__main__":
    main()
