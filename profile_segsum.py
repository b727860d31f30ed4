"""Measure segment-sum strategies on the real TPU (not a test).

The global-BA CG loop does 2 segment sums per matvec over M=1.28M
observations; at 3.4 s/GN-iter they dominate. Compare implementations.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time

import numpy as np
import jax
import jax.numpy as jnp

M, P, F, K = 1_280_000, 200_000, 10_000, 128
rng = np.random.default_rng(0)
pt = jnp.asarray(np.sort(rng.integers(0, P, M)).astype(np.int32))
pt_unsorted = jnp.asarray(rng.integers(0, P, M).astype(np.int32))
vals3 = jnp.asarray(rng.normal(size=(3, M)).astype(np.float32))
vals3T = vals3.T


def timeit(name, fn, n=10):
    np.asarray(jax.tree.leaves(fn())[0])[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    s = np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:32s}{dt * 1e3:9.2f} ms")


@jax.jit
def scat_axis1(v):
    return jnp.zeros((3, P), jnp.float32).at[:, pt_unsorted].add(v)


@jax.jit
def scat_lead(vT):
    return jnp.zeros((P, 3), jnp.float32).at[pt_unsorted].add(vT)


@jax.jit
def scat_1d(v):
    return jnp.stack([jnp.zeros((P,), jnp.float32).at[pt_unsorted].add(v[i])
                      for i in range(3)])


@jax.jit
def scat_sorted(v):
    return jnp.zeros((3, P), jnp.float32).at[:, pt].add(v)


@jax.jit
def seg_sorted_hint(vT):
    return jax.ops.segment_sum(vT, pt, P, indices_are_sorted=True)


@jax.jit
def cumsum_diff(v):
    cs = jnp.concatenate(
        [jnp.zeros((3, 1), jnp.float32), jnp.cumsum(v, axis=1)], axis=1)
    start = jnp.searchsorted(pt, jnp.arange(P, dtype=jnp.int32), side="left")
    end = jnp.searchsorted(pt, jnp.arange(P, dtype=jnp.int32), side="right")
    return cs[:, end] - cs[:, start]


@jax.jit
def kf_reshape_sum(v):  # the slot-structured keyframe case
    return v.reshape(3, F, K).sum(-1)


timeit("scatter (3,P) axis-1", lambda: scat_axis1(vals3))
timeit("scatter (P,3) leading", lambda: scat_lead(vals3T))
timeit("scatter 1D x3", lambda: scat_1d(vals3))
timeit("scatter (3,P) sorted idx", lambda: scat_sorted(vals3))
timeit("segment_sum sorted hint", lambda: seg_sorted_hint(vals3T))
timeit("cumsum-diff (sorted)", lambda: cumsum_diff(vals3))
timeit("kf reshape-sum", lambda: kf_reshape_sum(vals3))
