"""Time the keyframe-branch components on the real TPU."""

import sys
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import time

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence
from orb_slam2_ssd_semantic_tpu.mapping import local_mapping as lm
from orb_slam2_ssd_semantic_tpu.mapping.map_state import empty_state
from orb_slam2_ssd_semantic_tpu.tracking import scan_tracker, tracker as tk

cfg = SlamConfig()
seq = SyntheticSequence(n_frames=12)
grays, depths = [], []
for i in range(len(seq)):
    g, d = seq.gray_depth(i)
    grays.append(np.clip(g, 0, 255).astype(np.uint8))
    depths.append((d * 1000).astype(np.uint16))
g_dev = jnp.asarray(np.stack(grays))
d_dev = jnp.asarray(np.stack(depths))

# Populate a state by tracking the short sequence.
carry = scan_tracker.init_scan(empty_state(cfg), g_dev[0], d_dev[0], cfg)
carry, T_all, stats = scan_tracker.track_sequence_scan(carry, g_dev[1:], d_dev[1:], cfg)
state = carry.state
print("kfs:", int(state.n_kfs), "points:", int(state.n_points), file=sys.stderr)


def timeit(name, fn, n=20):
    out = fn()
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:22s} {dt*1000:8.2f} ms/call")


timeit("local_mapping_step", lambda: lm.local_mapping_step(state, cfg))
timeit("create_new_map_points", lambda: lm.create_new_map_points(state, cfg))
timeit("cull_points", lambda: lm.cull_points(state, cfg))
timeit("cull_keyframes", lambda: lm.cull_keyframes(state, cfg))

frame = tk.build_frame(g_dev[5], d_dev[5], cfg)
timeit("track_local_map", lambda: tk.track_local_map(state, frame, jnp.eye(4), cfg)[1])
timeit(
    "insert_keyframe",
    lambda: tk.insert_keyframe(
        state, frame, jnp.eye(4, dtype=jnp.float32),
        jnp.full((frame.feats.capacity,), -1, jnp.int32), 5, 5.0, cfg,
    )[0].n_kfs,
)
