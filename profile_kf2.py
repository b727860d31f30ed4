"""Device-only timing of KF-branch components (scalar outputs)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
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
gs, ds = [], []
for i in range(len(seq)):
    g, d = seq.gray_depth(i)
    gs.append(np.clip(g, 0, 255).astype(np.uint8))
    ds.append((d * 1000).astype(np.uint16))
g_dev, d_dev = jnp.asarray(np.stack(gs)), jnp.asarray(np.stack(ds))
carry = scan_tracker.init_scan(empty_state(cfg), g_dev[0], d_dev[0], cfg)
carry, _, _ = scan_tracker.track_sequence_scan(carry, g_dev[1:], d_dev[1:], cfg)
state = carry.state
print("kfs:", int(state.n_kfs), "points:", int(state.n_points), file=sys.stderr)

def timeit(name, fn, n=20):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(out)
    print(f"{name:24s} {(time.perf_counter()-t0)/n*1000:8.2f} ms/call")

f_step = jax.jit(lambda s: lm.local_mapping_step(s, cfg).points.pos.sum())
f_tri = jax.jit(lambda s: lm.create_new_map_points(s, cfg).points.pos.sum())
f_cp = jax.jit(lambda s: lm.cull_points(s, cfg).points.valid.sum())
f_ck = jax.jit(lambda s: lm.cull_keyframes(s, cfg).kfs.valid.sum())
frame = tk.build_frame(g_dev[5], d_dev[5], cfg)
f_tlm = jax.jit(lambda s, f: tk.track_local_map(s, f, jnp.eye(4), cfg)[1].n_inliers)
timeit("local_mapping_step", lambda: f_step(state))
timeit("create_new_map_points", lambda: f_tri(state))
timeit("cull_points", lambda: f_cp(state))
timeit("cull_keyframes", lambda: f_ck(state))
timeit("track_local_map", lambda: f_tlm(state, frame))
