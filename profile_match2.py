"""Break down the windowed matcher's 2.8 ms (VERDICT r4 #7): raw Pallas
kernel vs the match_by_window wrapper stages."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.ops import match as match_ops
from orb_slam2_ssd_semantic_tpu.ops import pallas_match

rng = np.random.default_rng(0)
C, K = 1536, 1024
dq = jnp.asarray(rng.integers(0, 2**32, (C, 8), dtype=np.uint64).astype(np.uint32))
dt = jnp.asarray(rng.integers(0, 2**32, (K, 8), dtype=np.uint64).astype(np.uint32))
cq = jnp.asarray(rng.uniform(0, 640, (C, 2)).astype(np.float32))
ct = jnp.asarray(rng.uniform(0, 640, (K, 2)).astype(np.float32))
vq = jnp.ones((C,), bool)
vt = jnp.ones((K,), bool)
rad = jnp.full((C,), 8.0, jnp.float32)


def bench(f, args, n=50):
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


raw = jax.jit(lambda *a: pallas_match.fused_window_match(
    *a, max_dist=match_ops.TH_HIGH))
print(f"raw pallas kernel : {bench(raw, (dq, dt, cq, ct, rad, vq, vt)):.3f} ms")

full = jax.jit(lambda *a: match_ops.match_by_window(
    *a, max_dist=match_ops.TH_HIGH).idx)
print(f"match_by_window   : {bench(full, (dq, dt, cq, ct, vq, vt, rad)):.3f} ms")

# The XLA (non-pallas) formulation for reference.
def xla_path(dq, dt, cq, ct, vq, vt, rad):
    dist = match_ops.hamming_matrix(dq, dt)
    mask = match_ops.window_mask(cq, ct, rad, vq, vt)
    m = match_ops.masked_best_match(dist, mask, max_dist=match_ops.TH_HIGH)
    return match_ops.resolve_duplicate_targets(m, dt.shape[0]).idx

xla = jax.jit(xla_path)
print(f"xla formulation   : {bench(xla, (dq, dt, cq, ct, vq, vt, rad)):.3f} ms")
