"""Micro-profile of the per-keyframe mapping stages on the real chip.

Builds a realistic mid-run SlamState by scanning 40 synthetic frames,
then times each per-keyframe stage separately: triangulation, fusion,
local BA (+maintenance +culls via local_mapping_step), and the culls.
Used to target optimization of the keyframe-event cost (the bench fps
difference between tracking-only and full-SLAM scan).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def t(fn, *a, n=10, **kw):
    """Amortized timing: dispatch `n` calls, ONE host sync at the end —
    each relay round trip costs ~50-100 ms, far more than the ops."""
    import numpy as np
    import jax

    out = fn(*a, **kw)
    np.asarray(jax.tree.leaves(out)[-1]).ravel()[:1]  # warm + sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a, **kw)
    leaves = jax.tree.leaves(out)
    np.asarray(leaves[0]).ravel()[:1]
    np.asarray(leaves[-1]).ravel()[:1]
    return out, (time.perf_counter() - t0) / n


def main():
    import numpy as np
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from orb_slam2_ssd_semantic_tpu.config import SlamConfig
    from orb_slam2_ssd_semantic_tpu.io.device_render import render_frames
    from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence
    from orb_slam2_ssd_semantic_tpu.mapping import local_mapping as lm
    from orb_slam2_ssd_semantic_tpu.mapping.map_state import empty_state
    from orb_slam2_ssd_semantic_tpu.tracking import scan_tracker

    cfg = SlamConfig()
    seq = SyntheticSequence(n_frames=40)
    poses = jnp.asarray(np.stack(seq.poses_wc).astype(np.float32))
    g_dev, d_dev = render_frames(poses, cfg.camera, seed=seq.seed)
    carry = scan_tracker.init_scan(empty_state(cfg), g_dev[0], d_dev[0], cfg)
    carry, T_all, stats = scan_tracker.track_sequence_scan(
        carry, g_dev[1:], d_dev[1:], cfg
    )
    state = carry.state
    np.asarray(state.n_kfs)
    print(f"state: {int(state.n_kfs)} kfs, {int(state.n_points)} points",
          file=sys.stderr)

    _, dt = t(lm.create_new_map_points, state, cfg)
    print(f"create_new_map_points: {dt*1e3:8.2f} ms")
    _, dt = t(lm.fuse_map_points, state, cfg)
    print(f"fuse_map_points:       {dt*1e3:8.2f} ms")
    _, dt = t(lm.cull_points, state, cfg)
    print(f"cull_points:           {dt*1e3:8.2f} ms")
    _, dt = t(lm.cull_keyframes, state, cfg)
    print(f"cull_keyframes:        {dt*1e3:8.2f} ms")
    _, dt = t(lm.local_mapping_step, state, cfg)
    print(f"local_mapping_step:    {dt*1e3:8.2f} ms (all stages)")

    # Local BA alone at the engine's window shapes.
    from orb_slam2_ssd_semantic_tpu.mapping.ba import local_bundle_adjust
    from orb_slam2_ssd_semantic_tpu.mapping.map_state import covisibility_row
    import jax.numpy as jnp2

    W = cfg.map.local_ba_window + cfg.map.local_ba_fixed_anchors
    K = cfg.orb.max_keypoints
    N = cfg.map.local_ba_max_points
    from orb_slam2_ssd_semantic_tpu.mapping.ba import BAProblem
    rng = np.random.default_rng(0)
    prob = BAProblem(
        T_cw=jnp2.tile(jnp2.eye(4, dtype=jnp2.float32), (W, 1, 1)),
        fixed=jnp2.arange(W) == 0,
        points=jnp2.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32) + [0, 0, 4]),
        point_valid=jnp2.ones((N,), bool),
        point_slot=jnp2.asarray(rng.integers(0, N, (W, K)).astype(np.int32)),
        obs_uvr=jnp2.asarray(rng.uniform(0, 400, (W, K, 3)).astype(np.float32)),
        inv_sigma2=jnp2.ones((W, K)),
        is_stereo=jnp2.ones((W, K), bool),
    )
    _, dt = t(local_bundle_adjust, prob, cfg.camera, cfg.optimizer)
    print(f"local_bundle_adjust:   {dt*1e3:8.2f} ms ({cfg.optimizer.local_ba_iters_initial}+{cfg.optimizer.local_ba_iters_refine} GN iters)")


if __name__ == "__main__":
    main()
