"""Stage-wise throughput profiling on the real TPU (not part of tests).

Times lax.scan'd variants of the per-frame path to localize cost:
  extract      — build_frame only
  +motion      — build_frame + motion-model track
  +localmap    — + local-map track
  full         — the complete scan_tracker step (bench.py's program)
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import time

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence
from orb_slam2_ssd_semantic_tpu.mapping.map_state import empty_state
from orb_slam2_ssd_semantic_tpu.tracking import scan_tracker, tracker as tk

N = 60
cfg = SlamConfig()
seq = SyntheticSequence(n_frames=N)
grays, depths = [], []
for i in range(len(seq)):
    g, d = seq.gray_depth(i)
    grays.append(np.clip(g, 0, 255).astype(np.uint8))
    depths.append((d * 1000).astype(np.uint16))
g_dev = jnp.asarray(np.stack(grays))
d_dev = jnp.asarray(np.stack(depths))


def timeit(name, fn):
    out = fn()
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)  # sync
    t0 = time.perf_counter()
    out = fn()
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    dt = time.perf_counter() - t0
    print(f"{name:12s} {dt*1000/ (N-1):8.2f} ms/frame   {(N-1)/dt:7.1f} fps")
    return dt


@jax.jit
def scan_extract(grays, depths):
    def step(c, inp):
        f = tk.build_frame(inp[0], inp[1], cfg)
        return c, (f.feats.uv.sum(), f.feats.desc.sum())
    return jax.lax.scan(step, 0, (grays, depths))


@jax.jit
def scan_motion(grays, depths):
    f0 = tk.build_frame(grays[0], depths[0], cfg)
    T0 = jnp.eye(4, dtype=jnp.float32)

    def step(carry, inp):
        last, T_last = carry
        f = tk.build_frame(inp[0], inp[1], cfg)
        T, n_m, n_i = tk.track_motion_model(f, last, T_last, T_last, cfg)
        return (f, T), n_i
    return jax.lax.scan(step, (f0, T0), (grays, depths))


@jax.jit
def scan_localmap(grays, depths):
    state = empty_state(cfg)
    f0 = tk.build_frame(grays[0], depths[0], cfg)
    T0 = jnp.eye(4, dtype=jnp.float32)
    kp0 = jnp.full((f0.feats.capacity,), -1, jnp.int32)
    state, kp0 = tk.insert_keyframe(state, f0, T0, kp0, 0, 0.0, cfg, spawn_all=True)

    def step(carry, inp):
        last, T_last, kp, state = carry
        f = tk.build_frame(inp[0], inp[1], cfg)
        T, n_m, n_i = tk.track_motion_model(
            f, last, T_last, T_last, cfg,
            map_pos=state.points.pos, map_valid=state.points.valid,
            last_kp_point=kp,
        )
        state, res = tk.track_local_map(state, f, T, cfg)
        return (f, res.T_cw, res.kp_point, state), res.n_inliers
    return jax.lax.scan(step, (f0, T0, kp0, state), (grays, depths))


def full():
    carry = scan_tracker.init_scan(empty_state(cfg), g_dev[0], d_dev[0], cfg)
    return scan_tracker.track_sequence_scan(carry, g_dev[1:], d_dev[1:], cfg)[1]


import sys

stages = sys.argv[1:] or ["extract", "+motion", "+localmap", "full"]
table = {
    "extract": lambda: scan_extract(g_dev[1:], d_dev[1:])[1],
    "+motion": lambda: scan_motion(g_dev[1:], d_dev[1:])[1],
    "+localmap": lambda: scan_localmap(g_dev[1:], d_dev[1:])[1],
    "full": full,
}
for s in stages:
    timeit(s, table[s])
