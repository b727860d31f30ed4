"""Isolate the in-scan cost of the flow path: track_sequence_scan on the
same rendered segment under one VARIANT per process (plain / geom / flow
/ flow_trivial / flow_lkonly), with a real host fetch in the timed loop.
One variant per process: jit caches key on static args, not closure
contents, so monkeypatched variants in one process silently reuse the
previous executable."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

VARIANT = os.environ.get("VARIANT", "plain")

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.dynamic import flowmask as fm
from orb_slam2_ssd_semantic_tpu.io.device_render import render_frames
from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence, cross_walkers
from orb_slam2_ssd_semantic_tpu.mapping.map_state import empty_state
from orb_slam2_ssd_semantic_tpu.tracking import scan_tracker

if VARIANT == "flow_trivial":
    fm.flow_dynamic_mask_fitted = (
        lambda prev_gray, cur_gray, cfg2=None, **kw:
        jnp.ones_like(cur_gray, dtype=bool))
elif VARIANT == "flow_lkonly":
    def _lk_only(prev_gray, cur_gray, cfg2, **kw):
        from orb_slam2_ssd_semantic_tpu.ops import flow as flow_ops
        from orb_slam2_ssd_semantic_tpu.ops import image as image_ops
        h, w = cur_gray.shape
        s = cfg2.flow_downscale
        ph = image_ops.resize_bilinear(prev_gray, h // s, w // s)
        ch = image_ops.resize_bilinear(cur_gray, h // s, w // s)
        f = flow_ops.dense_flow(ph, ch, levels=cfg2.flow_levels,
                                window=cfg2.flow_window, iters=cfg2.flow_iters)
        dyn = flow_ops.flow_magnitude_sq(f) > 10.0
        return image_ops.resize_bilinear(
            (~dyn).astype(jnp.float32), h, w) > 0.5
    fm.flow_dynamic_mask_fitted = _lk_only

N = 85
base = SlamConfig()
cfg = dataclasses.replace(
    base,
    camera=dataclasses.replace(base.camera, th_depth=80.0),
    map=dataclasses.replace(base.map, max_keyframes=128, max_map_points=16384),
    tracking=dataclasses.replace(base.tracking, local_map_candidates=1536),
    dynamic=dataclasses.replace(base.dynamic, min_static_area=0.45),
)

seq = SyntheticSequence(n_frames=N, trajectory="sway")
poses = jnp.asarray(np.stack(seq.poses_wc).astype(np.float32))
boxes = tuple(tuple(map(tuple, b)) for b in seq.room.boxes)
walkers = cross_walkers(N, seq.room.size, n_objects=3)
g_dev, d_dev = render_frames(poses, cfg.camera, size=seq.room.size,
                             boxes=boxes, seed=seq.seed,
                             moving_boxes=jnp.asarray(walkers),
                             depth_noise=0.01)
np.asarray(g_dev[0][0, 0])

use_geom = VARIANT == "geom"
use_flow = VARIANT.startswith("flow")
kw = {}
if use_flow:
    kw = dict(use_flow=True, prev_grays=g_dev[0:N - 1])
if use_geom:
    kw["use_geom"] = True

carry0 = scan_tracker.init_scan(empty_state(cfg), g_dev[0], d_dev[0], cfg,
                                use_geom=use_geom)
t0 = time.perf_counter()
out = scan_tracker.track_sequence_scan(carry0, g_dev[1:N], d_dev[1:N], cfg, **kw)
np.asarray(out[1])
print(f"{VARIANT} compile+run {time.perf_counter()-t0:.1f}s", file=sys.stderr)

best = 1e9
for _ in range(3):
    carry0 = scan_tracker.init_scan(empty_state(cfg), g_dev[0], d_dev[0], cfg,
                                    use_geom=use_geom)
    t0 = time.perf_counter()
    out = scan_tracker.track_sequence_scan(
        carry0, g_dev[1:N], d_dev[1:N], cfg, **kw)
    np.asarray(out[1])  # real fetch
    best = min(best, time.perf_counter() - t0)
print(f"{VARIANT}: {best/(N-1)*1e3:.2f} ms/frame")
