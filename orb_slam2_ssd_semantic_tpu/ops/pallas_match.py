"""Fused Pallas TPU kernel for windowed Hamming matching.

The hot inner loop of tracking (the SearchByProjection family,
perfect/src/ORBmatcher.cc:63,1578) is: for each query descriptor with a
predicted pixel location, find the best/second-best Hamming match among
target keypoints inside a search window. The XLA formulation
(ops/match.py) builds the (Q, T) distance matrix via an (Q, T, 8) XOR +
popcount + reduce and a (Q, T) window mask, then top-2-reduces — three
HBM-sized intermediates. This kernel fuses all of it: descriptors,
positions, radii and validity stream once into VMEM, the distance tile,
window mask and top-2 reduction never leave the chip.

Layouts: descriptors are passed transposed as (8, N) uint32 so the lane
axis is the keypoint axis (the natural 128-wide vector axis); positions
as (2, N); validity as (1, N) int32 (Mosaic minor-dim insertion needs
32-bit types). Grid is over query tiles; the full
target set (T <= a few thousand) lives in VMEM per step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1024  # > max Hamming distance (256); same sentinel as ops/match.py

_Q_TILE = 256
# Packed claim key = dist * _Q_STRIDE + query_index: max dist 256 and
# query counts < 2^20 keep the key well inside int32.
_Q_STRIDE = 1 << 20
_BIG_KEY = BIG * _Q_STRIDE


def use_pallas() -> bool:
    """Pallas kernels run on real TPU backends (incl. the axon relay
    plugin); CPU tests take the XLA reference path in ops/match.py."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _window_match_kernel(dq_ref, dt_ref, cq_ref, ct_ref, rad_ref, vq_ref,
                         vt_ref, out_ref, key_ref, *, max_dist: int):
    n_t = dt_ref.shape[1]
    # Hamming distances: XOR + popcount accumulated over the 8 uint32
    # words (DescriptorDistance, ORBmatcher.cc:2124-2142).
    acc = jnp.zeros((dq_ref.shape[1], n_t), jnp.int32)
    for w in range(8):
        x = jnp.bitwise_xor(dq_ref[w, :][:, None], dt_ref[w, :][None, :])
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    # Square search window + validity (GetFeaturesInArea semantics).
    du = jnp.abs(ct_ref[0, :][None, :] - cq_ref[0, :][:, None])
    dv = jnp.abs(ct_ref[1, :][None, :] - cq_ref[1, :][:, None])
    r = rad_ref[0, :][:, None]
    mask = (
        (du <= r) & (dv <= r)
        & (vq_ref[0, :][:, None] != 0)
        & (vt_ref[0, :][None, :] != 0)
    )
    d = jnp.where(mask, acc, BIG)
    best = jnp.min(d, axis=1)
    # Mosaic lacks integer argmin; first-occurrence argmin = min column
    # index among entries equal to the row minimum.
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    idx = jnp.min(jnp.where(d == best[:, None], cols, n_t), axis=1)
    sec = jnp.min(jnp.where(cols == idx[:, None], BIG, d), axis=1)
    # One packed (8, Q_TILE) output block — rows 0/1/2 = best/second/idx
    # (1-D or thin-sublane outputs trip XLA/Mosaic tiling constraints).
    out_ref[0, :] = best
    out_ref[1, :] = sec
    out_ref[2, :] = idx

    # Duplicate-target resolution, fused (ORBmatcher.cc:1634-1655: a
    # better query steals the target): per-target minimum of the packed
    # claim key dist*Q_STRIDE + global_query_index over the queries that
    # claim it, accumulated ACROSS grid steps into one revisited (8, T)
    # block. The XLA formulation was two unsorted scatter-mins — the
    # serialized op that made the matcher dispatch-bound (MFU_r04: 2.5
    # ms at 0.84% HBM; VERDICT r4 next #7). The min key carries the
    # lowest-query-index tie-break for free.
    i = pl.program_id(0)
    n_q = dq_ref.shape[1]
    qg = jax.lax.broadcasted_iota(jnp.int32, (n_q, 1), 0)[:, 0] + i * n_q
    claim_key = jnp.where(best <= max_dist, best * _Q_STRIDE + qg, _BIG_KEY)
    tile_min = jnp.min(
        jnp.where(cols == idx[:, None], claim_key[:, None], _BIG_KEY), axis=0
    )

    @pl.when(i == 0)
    def _():
        key_ref[0, :] = tile_min

    @pl.when(i > 0)
    def _():
        key_ref[0, :] = jnp.minimum(key_ref[0, :], tile_min)


@functools.partial(jax.jit, static_argnames=("max_dist", "interpret"))
def fused_window_match(
    desc_q: jnp.ndarray,
    desc_t: jnp.ndarray,
    centers: jnp.ndarray,
    uv_t: jnp.ndarray,
    radius: jnp.ndarray,
    valid_q: jnp.ndarray,
    valid_t: jnp.ndarray,
    max_dist: int = 256,
    interpret: bool = False,
):
    """Best/second-best windowed Hamming match + fused duplicate-target
    claim keys.

    desc_q (Q, 8) uint32, desc_t (T, 8) uint32, centers (Q, 2) f32
    predicted positions, uv_t (T, 2) f32 target positions, radius scalar
    or (Q,) f32, valid_q (Q,) bool, valid_t (T,) bool.

    Returns (best (Q,) i32, second (Q,) i32, idx (Q,) i32, key_min (T,)
    i32) where masked pairs score BIG; key_min[t] is the minimum
    dist*_Q_STRIDE+q over queries with best match t at dist <= max_dist
    (_BIG_KEY if unclaimed) — query q's claim on its target wins iff
    best[q]*_Q_STRIDE+q == key_min[idx[q]]. Q must be a multiple of
    256; T a multiple of 128.
    """
    q_n, t_n = desc_q.shape[0], desc_t.shape[0]
    assert q_n % _Q_TILE == 0, f"Q={q_n} not a multiple of {_Q_TILE}"
    assert t_n % 128 == 0, f"T={t_n} not a multiple of 128"

    dq = desc_q.T  # (8, Q)
    dt = desc_t.T  # (8, T)
    cq = centers.astype(jnp.float32).T  # (2, Q)
    ct = uv_t.astype(jnp.float32).T  # (2, T)
    rad = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (q_n,))[None, :]
    vq = valid_q.astype(jnp.int32)[None, :]
    vt = valid_t.astype(jnp.int32)[None, :]

    grid = (q_n // _Q_TILE,)
    q_spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, _Q_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    t_spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, t_n), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((8, _Q_TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((8, q_n), jnp.int32)
    # The claim-key block is REVISITED by every grid step (same index) —
    # the cross-tile min accumulates in place.
    key_spec = pl.BlockSpec((8, t_n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    key_sds = jax.ShapeDtypeStruct((8, t_n), jnp.int32)

    packed, keys = pl.pallas_call(
        functools.partial(_window_match_kernel, max_dist=max_dist),
        grid=grid,
        in_specs=[
            q_spec(8), t_spec(8),  # descriptors
            q_spec(2), t_spec(2),  # positions
            q_spec(1),             # radius
            q_spec(1), t_spec(1),  # validity
        ],
        out_specs=(out_spec, key_spec),
        out_shape=(out_sds, key_sds),
        interpret=interpret,
    )(dq, dt, cq, ct, rad, vq, vt)
    return packed[0], packed[1], packed[2], keys[0]
