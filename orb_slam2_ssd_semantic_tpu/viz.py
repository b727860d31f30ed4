"""Headless visualization: trajectory comparison plots, map renders,
frame overlays.

The observability surface standing in for the reference's Pangolin
viewer + OpenCV frame drawer (perfect/src/Viewer.cc, FrameDrawer.cc,
MapDrawer.cc GL half) in a display-less environment: everything renders
to PNG via matplotlib (Agg). Also covers tool/draw_trajectory.py
(ground truth vs estimated trajectory comparison plot).
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_trajectories(path: str, named_trajs: dict, axes=(0, 2), title="trajectory"):
    """named_trajs: {label: (N, 3) positions}. Top-down (x-z) by default
    — the tool/draw_trajectory.py comparison figure."""
    fig, ax = plt.subplots(figsize=(8, 8))
    a, b = axes
    for label, xyz in named_trajs.items():
        xyz = np.asarray(xyz)
        ax.plot(xyz[:, a], xyz[:, b], label=label, linewidth=1.2)
        ax.scatter([xyz[0, a]], [xyz[0, b]], marker="o", s=30)
    ax.set_xlabel("xyz"[a] + " [m]")
    ax.set_ylabel("xyz"[b] + " [m]")
    ax.set_aspect("equal")
    ax.legend()
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def plot_map(path: str, state, max_points: int = 20000, gt_positions=None,
             est_positions=None):
    """Sparse map + keyframes top-down render (MapDrawer sparse view)."""
    import jax.numpy as jnp  # noqa: F401

    fig, ax = plt.subplots(figsize=(9, 9))
    v = np.asarray(state.points.valid)
    pos = np.asarray(state.points.pos)[v]
    if len(pos) > max_points:
        pos = pos[:: len(pos) // max_points]
    ax.scatter(pos[:, 0], pos[:, 2], s=0.5, c="black", alpha=0.4, label="map points")
    kv = np.asarray(state.kfs.valid)
    uid = np.asarray(state.kfs.uid)
    order = np.argsort(np.where(kv, uid, 2 ** 30))[: int(kv.sum())]
    kf_T = np.asarray(state.kfs.T_cw)[order]
    n_kfs = len(kf_T)
    centers = np.stack([-T[:3, :3].T @ T[:3, 3] for T in kf_T]) if n_kfs else np.zeros((0, 3))
    if n_kfs:
        ax.plot(centers[:, 0], centers[:, 2], "b.-", markersize=4, label="keyframes")
    if est_positions is not None:
        e = np.asarray(est_positions)
        ax.plot(e[:, 0], e[:, 2], "g-", linewidth=0.8, label="trajectory")
    if gt_positions is not None:
        g = np.asarray(gt_positions)
        ax.plot(g[:, 0], g[:, 2], "r--", linewidth=0.8, label="ground truth")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def plot_frame(path: str, gray: np.ndarray, feats=None, mask=None, stats=None):
    """Keypoint/state overlay (FrameDrawer::DrawFrame equivalent)."""
    fig, ax = plt.subplots(figsize=(10, 7.5))
    ax.imshow(np.asarray(gray), cmap="gray", vmin=0, vmax=255)
    if mask is not None:
        m = ~np.asarray(mask)
        overlay = np.zeros(m.shape + (4,))
        overlay[m] = (1.0, 0.0, 0.0, 0.35)
        ax.imshow(overlay)
    if feats is not None:
        v = np.asarray(feats.valid)
        uv = np.asarray(feats.uv)[v]
        ax.scatter(uv[:, 0], uv[:, 1], s=6, facecolors="none", edgecolors="lime",
                   linewidths=0.6)
    if stats:
        txt = " | ".join(f"{k}: {v}" for k, v in stats.items())
        ax.set_title(txt, fontsize=9)
    ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def plot_occupancy(path: str, grid, cfg, max_voxels: int = 40000):
    """Occupied-voxel scatter, top-down + side (octomap view equivalent)."""
    from orb_slam2_ssd_semantic_tpu.dense.occupancy import occupied_centers

    centers, colors = occupied_centers(grid, cfg)
    if len(centers) > max_voxels:
        step = len(centers) // max_voxels
        centers, colors = centers[::step], colors[::step]
    fig, axes = plt.subplots(1, 2, figsize=(14, 7))
    c = np.clip(colors / 255.0, 0, 1)
    axes[0].scatter(centers[:, 0], centers[:, 2], s=1.5, c=c)
    axes[0].set_title("top-down (x-z)")
    axes[1].scatter(centers[:, 0], centers[:, 1], s=1.5, c=c)
    axes[1].invert_yaxis()
    axes[1].set_title("front (x-y)")
    for ax in axes:
        ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def draw_trajectory_main(argv=None):
    """CLI mirror of the reference's tool/draw_trajectory.py: plot the
    ground truth against one or more estimated trajectories."""
    import argparse

    from orb_slam2_ssd_semantic_tpu.io.tum import read_trajectory

    p = argparse.ArgumentParser(description="trajectory comparison plot")
    p.add_argument("groundtruth")
    p.add_argument("estimates", nargs="+", help="TUM-format trajectory files")
    p.add_argument("-o", "--out", default="trajectories.png")
    args = p.parse_args(argv)
    named = {}
    stamps, t, _ = read_trajectory(args.groundtruth)
    named["groundtruth"] = t
    for path in args.estimates:
        _, t, _ = read_trajectory(path)
        import os

        named[os.path.basename(path)] = t
    plot_trajectories(args.out, named)
    print(f"wrote {args.out} ({', '.join(named)})")


if __name__ == "__main__":
    draw_trajectory_main()
