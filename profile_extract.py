"""On-device micro-profile of ORB extraction stages (not a test).

Each variant runs as a lax.scan over N frames entirely on-device
(dispatch overhead through the remote-TPU tunnel would otherwise
dominate); successive differences give per-stage cost.
"""
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
N = 60
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.uniform(0, 255, (N, 480, 640)).astype(np.float32))
quotas = select_ops.level_quotas(cfg.n_features, cfg.n_levels, cfg.scale_factor)


def stage_fn(upto):
    def one(img):
        levels = image_ops.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
        acc = sum(jnp.sum(lv) for lv in levels)
        if upto == "pyramid":
            return acc
        scores_raw = [fast_ops.fast_score_map(lv) for lv in levels]
        scores = [fast_ops.nms3x3(s) for s in scores_raw]
        acc = sum(jnp.sum(s) for s in scores)
        if upto == "fast":
            return acc
        sel = [
            select_ops.select_keypoints(
                s, float(cfg.ini_th_fast), float(cfg.min_th_fast),
                cell_size=cfg.cell_size, max_per_cell=cfg.max_per_cell,
                quota=max(q, 1), border=cfg.edge_threshold)
            for s, q in zip(scores, quotas)
        ]
        acc = sum(jnp.sum(s[0]) + jnp.sum(s[1]) for s in sel)
        if upto == "select":
            return acc
        pr = jnp.concatenate([
            extract_patches(lv, s[0], half=HALF_PATCH + BLUR_PAD)
            for lv, s in zip(levels, sel)
        ], axis=0)
        if upto == "patches":
            return jnp.sum(pr)
        valid = jnp.concatenate([s[2] for s in sel])
        ang = ic_angle_from_patches(
            pr[:, BLUR_PAD:-BLUR_PAD, BLUR_PAD:-BLUR_PAD], valid)
        desc = binned_brief(blur_patches(pr), ang, valid)
        return jnp.sum(desc.astype(jnp.float32)) + jnp.sum(ang)

    @jax.jit
    def scan_all(imgs):
        def step(c, im):
            return c + one(im), None
        out, _ = jax.lax.scan(step, jnp.float32(0), imgs)
        return out

    return scan_all


@jax.jit
def full_scan(imgs):
    def step(c, im):
        f = extract(im, cfg)
        return c + jnp.sum(f.uv) + jnp.sum(f.desc.astype(jnp.float32)), None
    out, _ = jax.lax.scan(step, jnp.float32(0), imgs)
    return out


def timeit(name, fn, prev=0.0):
    np.asarray(fn(imgs))
    t0 = time.perf_counter()
    np.asarray(fn(imgs))
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:12s}{dt:8.3f} ms/frame   (+{dt - prev:6.3f})")
    return dt


t = timeit("pyramid", stage_fn("pyramid"))
t = timeit("+fast", stage_fn("fast"), t)
t = timeit("+select", stage_fn("select"), t)
t = timeit("+patches", stage_fn("patches"), t)
t = timeit("+desc", stage_fn("desc"), t)
timeit("full extract", full_scan)
