"""Micro-profile of ORB extraction stages on the real TPU (not a test)."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import time

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.frontend.extractor import extract
from orb_slam2_ssd_semantic_tpu.ops import fast as fast_ops
from orb_slam2_ssd_semantic_tpu.ops import image as image_ops
from orb_slam2_ssd_semantic_tpu.ops import select as select_ops
from orb_slam2_ssd_semantic_tpu.ops.orb_descriptor import (
    BLUR_PAD, HALF_PATCH, binned_brief, blur_patches, extract_patches,
    ic_angle_from_patches,
)

cfg = SlamConfig().orb
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (480, 640)).astype(np.float32))


def timeit(name, fn, n=20):
    out = fn()
    jax.tree_util.tree_map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.tree_util.tree_map(np.asarray, out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:24s}{dt * 1e3:9.3f} ms/call")


timeit("extract (full)", lambda: extract(img, cfg))

pyr = jax.jit(lambda im: image_ops.build_pyramid(im, cfg.n_levels, cfg.scale_factor))
timeit("build_pyramid", lambda: pyr(img))
levels = pyr(img)


@jax.jit
def fast_all(levels):
    return [fast_ops.nms3x3(fast_ops.fast_score_map(lv)) for lv in levels]


timeit("FAST+NMS all levels", lambda: fast_all(levels))
scores = fast_all(levels)

quotas = select_ops.level_quotas(cfg.n_features, cfg.n_levels, cfg.scale_factor)


@jax.jit
def select_all(scores):
    outs = []
    for s, q in zip(scores, quotas):
        outs.append(select_ops.select_keypoints(
            s, float(cfg.ini_th_fast), float(cfg.min_th_fast),
            cell_size=cfg.cell_size, max_per_cell=cfg.max_per_cell,
            quota=max(q, 1), border=cfg.edge_threshold))
    return outs


timeit("select all levels", lambda: select_all(scores))
sel = select_all(scores)


@jax.jit
def patches_all(levels, sel):
    return jnp.concatenate([
        extract_patches(lv, s[0], half=HALF_PATCH + BLUR_PAD)
        for lv, s in zip(levels, sel)
    ], axis=0)


timeit("extract_patches", lambda: patches_all(levels, sel))
pr = patches_all(levels, sel)
valid = jnp.concatenate([s[2] for s in sel])


@jax.jit
def orient_desc(pr, valid):
    ang = ic_angle_from_patches(pr[:, BLUR_PAD:-BLUR_PAD, BLUR_PAD:-BLUR_PAD], valid)
    return ang, binned_brief(blur_patches(pr), ang, valid)


timeit("angle+blur+brief", lambda: orient_desc(pr, valid))
