"""Probabilistic occupancy mapping (the octomap-equivalent).

TPU-native re-architecture of the reference's ColorOcTree pipeline
(perfect/src/MapDrawer.cc:376-1025): per-keyframe organized point
clouds are raycast into a log-odds voxel field with the reference's
sensor model — hit 0.7, miss 0.4, clamping 0.12/0.97, occupancy
threshold 0.8 (MapDrawer.cc:51-56,394) — but instead of a pointer-based
octree with per-ray `computeRayKeys` walks, the map is a dense voxel
grid over a configured working volume, updated by batched scatter-adds:

- free-space carving: a fixed-step batched DDA samples every ray, and
  the union of crossed voxels forms the scan's FREE set;
- endpoints form the scan's OCCUPIED set (minus carve-only/ground rays);
- each voxel receives EXACTLY ONE log-odds update per scan — occupied
  wins over free — regardless of how many rays touch it. These are
  octomap's insertScan KeySet semantics (free/occupied key sets built
  first, occupied removed from free, then one updateNode per key),
  realized as boolean scatter marks instead of hash sets.

A dense room-scale grid at the reference's 0.05 m resolution is ~4M
voxels (16 MB f32) — comfortably HBM-resident and far faster than
pointer chasing; the multi-host story shards the grid into spatial
blocks over the mesh (SURVEY.md §2.6 P12). Color is carried as a
running-mean RGB per voxel (averageNodeColor equivalent).

For trajectories that leave any fixed working volume, `BlockGridMap`
tiles the world into fixed-shape grid blocks allocated on demand
(host-side dict of block -> VoxelGrid; every block reuses the SAME
compiled insert program, with out-of-block scatters dropped), replacing
the reference octree's unbounded growth.
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
    V = X * Y * Z
    s_flat = jnp.where(s_ok, flat_idx(sv), V)

    # ---- per-scan update sets (octomap insertScan KeySet semantics) ------
    # The free set is the union of voxels crossed by any ray; the
    # occupied set is the endpoint voxels (carve-only rays excluded).
    # Occupied wins where both apply, and each voxel gets EXACTLY ONE
    # update per scan no matter how many rays touch it.
    ev = to_voxel(points_w)
    e_ok = in_grid(ev) & point_valid & (~carve_only)
    e_flat = jnp.where(e_ok, flat_idx(ev), V)
    occ_mark = jnp.zeros((V + 1,), bool).at[e_flat].set(True)
    free_mark = jnp.zeros((V + 1,), bool).at[s_flat.reshape(-1)].set(True)
    free_mark = free_mark & ~occ_mark

    lo = grid.log_odds.reshape(-1)
    lo = lo + jnp.where(occ_mark[:V], lo_hit, 0.0) + jnp.where(
        free_mark[:V], lo_miss, 0.0
    )
    lo = jnp.clip(lo, lo_min, lo_max).reshape(X, Y, Z)
    grid = grid._replace(log_odds=lo)

    # ---- color accumulation (averageNodeColor equivalent) -----------------
    # Per-scan DEDUP like the log-odds above: exactly ONE color sample
    # per voxel per scan (the first ray's, via scatter-min over ray
    # index), matching octomap's one averageNodeColor call per updated
    # node per insertion (MapDrawer.cc:1009). Without it, a voxel
    # covered by k rays in one scan biased the running mean k x toward
    # that scan (VERDICT r3 weak #6).
    if colors is not None:
        N = e_flat.shape[0]
        first = jnp.full((V + 1,), N, jnp.int32).at[e_flat].min(
            jnp.arange(N, dtype=jnp.int32), mode="drop"
        )
        is_first = e_ok & (first[e_flat] == jnp.arange(N, dtype=jnp.int32))
        e_once = jnp.where(is_first, e_flat, V)
        csum = grid.color.reshape(-1, 3)
        cn = grid.n_color.reshape(-1)
        csum = csum.at[e_once].add(colors, mode="drop")
        cn = cn.at[e_once].add(1.0, mode="drop")
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


# ---- unbounded block map ---------------------------------------------------


class BlockGridMap:
    """World tiled into fixed-shape voxel blocks, allocated on demand.

    The reference octree grows without bound (ColorOcTree inserts
    anywhere); a single dense grid cannot. This host-side table maps
    block coordinates -> VoxelGrid of `block_voxels`^3 voxels. A scan is
    inserted into every allocated-or-new block its sensor sphere
    (origin +- max sensor range) overlaps; `insert_scan`'s out-of-block
    scatters drop automatically, so each block update is exactly the
    single-grid program (ONE compiled executable shared by all blocks —
    static shapes are what make the block design TPU-native)."""

    def __init__(self, cfg: DenseMapConfig = DenseMapConfig(),
                 block_voxels: int = 64):
        self.cfg = cfg
        self.block_voxels = int(block_voxels)
        self.block_extent = self.block_voxels * cfg.resolution
        self.blocks: dict = {}  # (bx, by, bz) -> VoxelGrid

    def _block_origin(self, key):
        return tuple(k * self.block_extent for k in key)

    def _get_or_create(self, key) -> VoxelGrid:
        g = self.blocks.get(key)
        if g is None:
            e = self.block_extent
            g = empty_grid(
                extent=(e, e, e), resolution=self.cfg.resolution,
                origin=self._block_origin(key),
            )
            self.blocks[key] = g
        return g

    def insert_scan(self, origin_w, points_w, point_valid, colors=None,
                    carve_only=None):
        """Insert one scan into every block its rays can touch.

        Every ray runs from the origin to an endpoint, so the AABB of
        {origin} U {valid endpoints} contains all of them; blocks
        overlapping that AABB are updated (created on demand). The AABB
        is a 6-float device reduction — the point array itself never
        crosses the host link."""
        pv = jnp.asarray(point_valid)
        p = jnp.asarray(points_w)
        big = jnp.float32(1e30)
        pmin = jnp.min(jnp.where(pv[:, None], p, big), axis=0)
        pmax = jnp.max(jnp.where(pv[:, None], p, -big), axis=0)
        o = np.asarray(origin_w, np.float32)
        pmin = np.minimum(np.asarray(pmin), o)
        pmax = np.maximum(np.asarray(pmax), o)
        if (pmax < pmin).any() or (np.abs(pmax) > 1e29).any():
            return  # no valid points
        e = self.block_extent
        lo = np.floor(pmin / e).astype(int)
        hi = np.floor(pmax / e).astype(int)
        for bx in range(lo[0], hi[0] + 1):
            for by in range(lo[1], hi[1] + 1):
                for bz in range(lo[2], hi[2] + 1):
                    key = (bx, by, bz)
                    g = self._get_or_create(key)
                    self.blocks[key] = insert_scan(
                        g, origin_w, points_w, point_valid, colors=colors,
                        carve_only=carve_only, cfg=self.cfg,
                    )

    def occupied_centers(self):
        cs, cols = [], []
        for g in self.blocks.values():
            c, col = occupied_centers(g, self.cfg)
            cs.append(c)
            cols.append(col)
        if not cs:
            return np.zeros((0, 3)), np.zeros((0, 3))
        return np.concatenate(cs), np.concatenate(cols)

    def occupancy_at(self, points_w) -> np.ndarray:
        """Host-side occupancy probability lookup at world points (0.5
        for never-observed voxels)."""
        p = np.asarray(points_w, np.float32).reshape(-1, 3)
        out = np.full(p.shape[0], 0.5, np.float32)
        e = self.block_extent
        keys = np.floor(p / e).astype(int)
        for key in {tuple(k) for k in keys}:
            g = self.blocks.get(key)
            if g is None:
                continue
            sel = np.all(keys == np.asarray(key), axis=1)
            v = np.floor(
                (p[sel] - np.asarray(g.origin)) / self.cfg.resolution
            ).astype(int)
            n = self.block_voxels
            v = np.clip(v, 0, n - 1)
            lo_np = np.asarray(g.log_odds)
            out[sel] = 1.0 / (1.0 + np.exp(-lo_np[v[:, 0], v[:, 1], v[:, 2]]))
        return out

    def save(self, path: str):
        keys = np.asarray(sorted(self.blocks.keys()), np.int64).reshape(-1, 3)
        arrays = {
            "block_keys": keys,
            "block_voxels": self.block_voxels,
            "resolution": self.cfg.resolution,
        }
        for i, k in enumerate(map(tuple, keys)):
            g = self.blocks[k]
            arrays[f"lo_{i}"] = np.asarray(g.log_odds)
            arrays[f"color_{i}"] = np.asarray(g.color)
            arrays[f"nc_{i}"] = np.asarray(g.n_color)
        np.savez_compressed(path, **arrays)

    @classmethod
    def load(cls, path: str, cfg: DenseMapConfig = DenseMapConfig()):
        z = np.load(path)
        if "block_keys" not in z.files:
            # Single-grid file: wrap it as one block-aligned map is not
            # possible in general; keep API symmetric by raising.
            raise ValueError(f"{path} is not a BlockGridMap save")
        m = cls(cfg, block_voxels=int(z["block_voxels"]))
        for i, k in enumerate(map(tuple, z["block_keys"])):
            m.blocks[k] = VoxelGrid(
                log_odds=jnp.asarray(z[f"lo_{i}"]),
                color=jnp.asarray(z[f"color_{i}"]),
                n_color=jnp.asarray(z[f"nc_{i}"]),
                origin=jnp.asarray(m._block_origin(k), jnp.float32),
            )
        return m
