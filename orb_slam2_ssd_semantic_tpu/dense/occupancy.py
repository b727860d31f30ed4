"""Probabilistic occupancy mapping (the octomap-equivalent).

TPU-native re-architecture of the reference's ColorOcTree pipeline
(perfect/src/MapDrawer.cc:376-1025): per-keyframe organized point
clouds are raycast into a log-odds voxel field with the reference's
sensor model — hit 0.7, miss 0.4, clamping 0.12/0.97, occupancy
threshold 0.8 (MapDrawer.cc:51-56,394) — but instead of a pointer-based
octree with per-ray `computeRayKeys` walks, the map is a dense voxel
grid over a configured working volume, updated by batched scatter-adds:

- endpoint (occupied) updates: one scatter-add of +log_odds_hit;
- free-space carving: a fixed-step batched DDA — every ray samples
  `max_ray_steps` points between origin and endpoint and scatter-adds
  log_odds_miss with de-duplication per ray step (a voxel crossed by
  many rays in one scan still receives one miss per ray, as octomap's
  insertScan de-duplicates per scan).

A dense room-scale grid at the reference's 0.05 m resolution is ~4M
voxels (16 MB f32) — comfortably HBM-resident and far faster than
pointer chasing; the multi-host story shards the grid into spatial
blocks over the mesh (SURVEY.md §2.6 P12). Color is carried as a
running-mean RGB per voxel (averageNodeColor equivalent).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_ssd_semantic_tpu.config import DenseMapConfig


def _logit(p: float) -> float:
    return float(np.log(p / (1.0 - p)))


class VoxelGrid(NamedTuple):
    log_odds: jnp.ndarray  # (X, Y, Z) float32
    color: jnp.ndarray  # (X, Y, Z, 3) float32 running mean RGB
    n_color: jnp.ndarray  # (X, Y, Z) float32
    origin: jnp.ndarray  # (3,) world position of voxel (0,0,0) corner

    @property
    def shape(self):
        return self.log_odds.shape


def empty_grid(extent=(10.0, 6.0, 10.0), resolution: float = 0.05,
               origin=(-2.0, -3.0, -2.0)) -> VoxelGrid:
    dims = tuple(int(round(e / resolution)) for e in extent)
    return VoxelGrid(
        log_odds=jnp.zeros(dims, jnp.float32),
        color=jnp.zeros(dims + (3,), jnp.float32),
        n_color=jnp.zeros(dims, jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("grid",))
def insert_scan(
    grid: VoxelGrid,
    origin_w: jnp.ndarray,  # (3,) sensor origin in world
    points_w: jnp.ndarray,  # (N, 3) endpoints in world
    point_valid: jnp.ndarray,  # (N,)
    colors: jnp.ndarray | None = None,  # (N, 3) optional RGB
    carve_only: jnp.ndarray | None = None,  # (N,) rays that only carve (ground)
    cfg: DenseMapConfig = DenseMapConfig(),
) -> VoxelGrid:
    """One sensor scan: free-space carving + endpoint occupancy.

    `carve_only` marks rays whose endpoints must NOT be marked occupied —
    the reference inserts ground points as free-space evidence only
    (MapDrawer::InsertScan, MapDrawer.cc:946-1025)."""
    res = cfg.resolution
    lo_hit = _logit(cfg.prob_hit)
    lo_miss = _logit(cfg.prob_miss)
    lo_min = _logit(cfg.clamp_min)
    lo_max = _logit(cfg.clamp_max)
    X, Y, Z = grid.shape
    if carve_only is None:
        carve_only = jnp.zeros(point_valid.shape, bool)

    def to_voxel(p):
        return jnp.floor((p - grid.origin) / res).astype(jnp.int32)

    def in_grid(v):
        return (
            (v[..., 0] >= 0) & (v[..., 0] < X)
            & (v[..., 1] >= 0) & (v[..., 1] < Y)
            & (v[..., 2] >= 0) & (v[..., 2] < Z)
        )

    def flat_idx(v):
        return (v[..., 0] * Y + v[..., 1]) * Z + v[..., 2]

    # ---- free-space carving: fixed-step DDA -------------------------------
    S = cfg.max_ray_steps
    t = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S  # (S,)
    ray = points_w - origin_w[None, :]
    # Sample strictly before the endpoint voxel (stop half a voxel short).
    ray_len = jnp.linalg.norm(ray, axis=-1, keepdims=True)
    scale = jnp.maximum(ray_len - res, 0.0) / jnp.maximum(ray_len, 1e-9)
    samples = origin_w[None, None, :] + t[None, :, None] * (ray * scale)[:, None, :]
    sv = to_voxel(samples)  # (N, S, 3)
    s_ok = in_grid(sv) & point_valid[:, None]
    s_flat = jnp.where(s_ok, flat_idx(sv), X * Y * Z)
    # De-duplicate consecutive samples within a ray (a voxel crossed by a
    # ray receives ONE miss per scan ray).
    dup = jnp.concatenate(
        [jnp.zeros((s_flat.shape[0], 1), bool), s_flat[:, 1:] == s_flat[:, :-1]],
        axis=1,
    )
    s_flat = jnp.where(dup, X * Y * Z, s_flat)

    lo = grid.log_odds.reshape(-1)
    lo = lo.at[s_flat.reshape(-1)].add(lo_miss, mode="drop")

    # ---- endpoint occupancy ----------------------------------------------
    ev = to_voxel(points_w)
    e_ok = in_grid(ev) & point_valid & (~carve_only)
    e_flat = jnp.where(e_ok, flat_idx(ev), X * Y * Z)
    lo = lo.at[e_flat].add(lo_hit - lo_miss * 0.0, mode="drop")

    lo = jnp.clip(lo, lo_min, lo_max).reshape(X, Y, Z)
    grid = grid._replace(log_odds=lo)

    # ---- color accumulation (averageNodeColor equivalent) -----------------
    if colors is not None:
        csum = grid.color.reshape(-1, 3)
        cn = grid.n_color.reshape(-1)
        csum = csum.at[e_flat].add(colors, mode="drop")
        cn = cn.at[e_flat].add(1.0, mode="drop")
        grid = grid._replace(
            color=csum.reshape(X, Y, Z, 3), n_color=cn.reshape(X, Y, Z)
        )
    return grid


def occupancy_prob(grid: VoxelGrid) -> jnp.ndarray:
    return jax.nn.sigmoid(grid.log_odds)


def occupied_mask(grid: VoxelGrid, cfg: DenseMapConfig = DenseMapConfig()) -> jnp.ndarray:
    """Voxels above the render threshold (MapDrawer.cc:394-412 draws
    occupancy >= 0.8)."""
    return occupancy_prob(grid) >= cfg.occupancy_threshold


def occupied_centers(grid: VoxelGrid, cfg: DenseMapConfig = DenseMapConfig()):
    """Host-side: (M, 3) world centers + (M, 3) colors of occupied voxels."""
    m = np.asarray(occupied_mask(grid, cfg))
    idx = np.argwhere(m)
    centers = (idx + 0.5) * cfg.resolution + np.asarray(grid.origin)
    n = np.maximum(np.asarray(grid.n_color)[m], 1.0)
    colors = np.asarray(grid.color)[m] / n[:, None]
    return centers, colors


# ---- persistence (SaveOctoMap/LoadOctoMap equivalent) ---------------------


def save_grid(path: str, grid: VoxelGrid, cfg: DenseMapConfig = DenseMapConfig()):
    """Binary save (the .ot-file capability, MapDrawer.cc:1103-1111)."""
    np.savez_compressed(
        path,
        log_odds=np.asarray(grid.log_odds),
        color=np.asarray(grid.color),
        n_color=np.asarray(grid.n_color),
        origin=np.asarray(grid.origin),
        resolution=cfg.resolution,
    )


def load_grid(path: str) -> VoxelGrid:
    z = np.load(path)
    return VoxelGrid(
        log_odds=jnp.asarray(z["log_odds"]),
        color=jnp.asarray(z["color"]),
        n_color=jnp.asarray(z["n_color"]),
        origin=jnp.asarray(z["origin"]),
    )
