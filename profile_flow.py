"""Micro-bench the flow dynamic mask on the real chip (VERDICT r4 #4)."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import DynamicConfig
from orb_slam2_ssd_semantic_tpu.dynamic.flowmask import flow_dynamic_mask_fitted

rng = np.random.default_rng(0)
g0 = jnp.asarray(rng.integers(0, 255, (480, 640)).astype(np.float32))
g1 = jnp.asarray(rng.integers(0, 255, (480, 640)).astype(np.float32))
cfg = DynamicConfig()
print("schedule:", cfg.flow_levels, cfg.flow_window, cfg.flow_iters,
      "downscale", cfg.flow_downscale)

f = jax.jit(lambda a, b: flow_dynamic_mask_fitted(a, b, cfg))
t0 = time.perf_counter()
f(g0, g1).block_until_ready()
print(f"compile {time.perf_counter()-t0:.1f}s")
n = 50
t0 = time.perf_counter()
for _ in range(n):
    out = f(g0, g1)
out.block_until_ready()
dt = (time.perf_counter() - t0) / n
print(f"flow mask: {dt*1e3:.2f} ms/frame")

# Varying inputs + per-call sync to rule out pipelined/cached timing.
gs = [jnp.asarray(rng.integers(0, 255, (480, 640)).astype(np.float32))
      for _ in range(8)]
for g in gs:
    g.block_until_ready()
t0 = time.perf_counter()
for i in range(24):
    f(gs[i % 8], gs[(i + 1) % 8]).block_until_ready()
dt = (time.perf_counter() - t0) / 24
print(f"flow mask (sync each): {dt*1e3:.2f} ms/frame")

from orb_slam2_ssd_semantic_tpu.ops.flow import dense_flow
df = jax.jit(lambda a, b: dense_flow(
    a[::2, ::2], b[::2, ::2], levels=cfg.flow_levels,
    window=cfg.flow_window, iters=cfg.flow_iters))
df(gs[0], gs[1]).block_until_ready()
t0 = time.perf_counter()
for i in range(24):
    df(gs[i % 8], gs[(i + 1) % 8]).block_until_ready()
print(f"dense flow (sync each): {(time.perf_counter()-t0)/24*1e3:.2f} ms")
