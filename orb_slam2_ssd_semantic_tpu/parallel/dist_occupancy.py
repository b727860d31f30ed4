"""Spatially sharded occupancy mapping over a device mesh.

SURVEY.md §2.6 P12 / BASELINE's multi-host north star: the dense map is
the largest state object (a room at 0.05 m is ~4M voxels; a building is
orders more), so IT is what gets partitioned. The grid is sharded into
X-axis slabs over the mesh's `pt` axis with `shard_map`; every scan's
(origin, endpoints) — a few hundred KB — is REPLICATED to all shards,
and each shard applies the standard per-scan free/occupied KeySet update
(dense/occupancy.py semantics) to its own slab, dropping out-of-slab
scatters. Rays crossing slab boundaries therefore need NO halo exchange:
each shard sees every ray and rasterizes the part that lands in its
volume. Communication per scan is exactly the replicated input
broadcast; the voxel state never moves.

Scope: the SINGLE working volume is sharded. The unbounded
BlockGridMap is not sharded here — at reference scales one slab grid
covers the working volume, and a sharded block table would need a
distributed hash/ownership protocol this engine does not implement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from orb_slam2_ssd_semantic_tpu.config import DenseMapConfig
from orb_slam2_ssd_semantic_tpu.parallel.mesh import PT_AXIS


def _logit(p: float) -> float:
    return float(np.log(p / (1.0 - p)))


def make_sharded_grid(mesh, dims, resolution: float, origin):
    """(X, Y, Z) log-odds grid sharded into X-slabs over PT_AXIS.

    X must divide evenly by the pt-axis size. Returns (log_odds, meta)
    where log_odds is a sharded (X, Y, Z) array."""
    n = mesh.shape[PT_AXIS]
    X, Y, Z = dims
    assert X % n == 0, f"X={X} must divide over {n} shards"
    sh = NamedSharding(mesh, P(PT_AXIS))
    lo = jax.device_put(jnp.zeros((X, Y, Z), jnp.float32), sh)
    meta = dict(dims=dims, resolution=resolution,
                origin=np.asarray(origin, np.float32), n_shards=n)
    return lo, meta


def make_sharded_colors(mesh, dims):
    """Sharded per-voxel color accumulators matching make_sharded_grid's
    slab layout: ((X, Y, Z, 3) color sum, (X, Y, Z) sample count)."""
    n = mesh.shape[PT_AXIS]
    X, Y, Z = dims
    assert X % n == 0, f"X={X} must divide over {n} shards"
    sh = NamedSharding(mesh, P(PT_AXIS))
    color = jax.device_put(jnp.zeros((X, Y, Z, 3), jnp.float32), sh)
    n_color = jax.device_put(jnp.zeros((X, Y, Z), jnp.float32), sh)
    return color, n_color


def make_sharded_insert(mesh, cfg: DenseMapConfig, dims, origin):
    """Compile the sharded per-scan insert.

    Returns insert(log_odds, origin_w, points_w, point_valid,
    carve_only) -> log_odds — or, with per-point `colors` plus the
    (color, n_color) accumulators from make_sharded_colors,
    insert(..., colors=, color=, n_color=) ->
    (log_odds, color, n_color): each shard runs the same first-ray
    per-scan color dedup as the single-device insert (octomap
    averageNodeColor parity, MapDrawer.cc:1009) on its own slab, so
    mesh-mode dense maps keep colors (ADVICE r4). The scan arrays are
    replicated (P()); log_odds/colors are sharded (P(PT_AXIS)) on X."""
    X, Y, Z = dims
    n = mesh.shape[PT_AXIS]
    Xs = X // n
    res = cfg.resolution
    lo_hit = _logit(cfg.prob_hit)
    lo_miss = _logit(cfg.prob_miss)
    lo_min = _logit(cfg.clamp_min)
    lo_max = _logit(cfg.clamp_max)
    origin = jnp.asarray(origin, jnp.float32)
    S = cfg.max_ray_steps

    def _rasterize(lo, origin_w, points_w, point_valid, carve_only):
        """Shared slab rasterization; returns the updated slab plus the
        endpoint scatter targets for the optional color pass."""
        # This shard owns x-slab [idx*Xs, (idx+1)*Xs).
        idx = jax.lax.axis_index(PT_AXIS)
        slab_origin = origin + jnp.asarray(
            [idx.astype(jnp.float32) * Xs * res, 0.0, 0.0], jnp.float32
        )

        def to_voxel(p):
            return jnp.floor((p - slab_origin) / res).astype(jnp.int32)

        def in_grid(v):
            return (
                (v[..., 0] >= 0) & (v[..., 0] < Xs)
                & (v[..., 1] >= 0) & (v[..., 1] < Y)
                & (v[..., 2] >= 0) & (v[..., 2] < Z)
            )

        def flat_idx(v):
            return (v[..., 0] * Y + v[..., 1]) * Z + v[..., 2]

        V = Xs * Y * Z
        t = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
        ray = points_w - origin_w[None, :]
        ray_len = jnp.linalg.norm(ray, axis=-1, keepdims=True)
        scale = jnp.maximum(ray_len - res, 0.0) / jnp.maximum(ray_len, 1e-9)
        samples = (
            origin_w[None, None, :] + t[None, :, None] * (ray * scale)[:, None, :]
        )
        sv = to_voxel(samples)
        s_ok = in_grid(sv) & point_valid[:, None]
        s_flat = jnp.where(s_ok, flat_idx(sv), V)

        ev = to_voxel(points_w)
        e_ok = in_grid(ev) & point_valid & (~carve_only)
        e_flat = jnp.where(e_ok, flat_idx(ev), V)
        occ_mark = jnp.zeros((V + 1,), bool).at[e_flat].set(True)
        free_mark = jnp.zeros((V + 1,), bool).at[s_flat.reshape(-1)].set(True)
        free_mark = free_mark & ~occ_mark

        flat = lo.reshape(-1)
        flat = flat + jnp.where(occ_mark[:V], lo_hit, 0.0) + jnp.where(
            free_mark[:V], lo_miss, 0.0
        )
        return jnp.clip(flat, lo_min, lo_max).reshape(Xs, Y, Z), (
            e_flat, e_ok, V)

    def shard_body(lo, origin_w, points_w, point_valid, carve_only):
        return _rasterize(lo, origin_w, points_w, point_valid, carve_only)[0]

    def shard_body_color(lo, csum3, cn, origin_w, points_w, point_valid,
                         carve_only, colors):
        lo_new, (e_flat, e_ok, V) = _rasterize(
            lo, origin_w, points_w, point_valid, carve_only)
        # First-ray per-scan color dedup (dense/occupancy.py:140-160
        # semantics), shard-local: e_flat already excludes out-of-slab
        # endpoints via the V overflow bucket.
        N = e_flat.shape[0]
        first = jnp.full((V + 1,), N, jnp.int32).at[e_flat].min(
            jnp.arange(N, dtype=jnp.int32), mode="drop"
        )
        is_first = e_ok & (first[e_flat] == jnp.arange(N, dtype=jnp.int32))
        e_once = jnp.where(is_first, e_flat, V)
        cs = csum3.reshape(-1, 3).at[e_once].add(colors, mode="drop")
        cc = cn.reshape(-1).at[e_once].add(1.0, mode="drop")
        return lo_new, cs.reshape(Xs, Y, Z, 3), cc.reshape(Xs, Y, Z)

    inner = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(PT_AXIS), P(), P(), P(), P()),
        out_specs=P(PT_AXIS),
    )
    inner_c = shard_map(
        shard_body_color, mesh=mesh,
        in_specs=(P(PT_AXIS), P(PT_AXIS), P(PT_AXIS), P(), P(), P(), P(),
                  P()),
        out_specs=(P(PT_AXIS), P(PT_AXIS), P(PT_AXIS)),
    )

    @jax.jit
    def insert(log_odds, origin_w, points_w, point_valid, carve_only=None,
               colors=None, color=None, n_color=None):
        if carve_only is None:
            carve_only = jnp.zeros(point_valid.shape, bool)
        if colors is None:
            return inner(log_odds, origin_w, points_w, point_valid,
                         carve_only)
        return inner_c(log_odds, color, n_color, origin_w, points_w,
                       point_valid, carve_only, colors)

    return insert
