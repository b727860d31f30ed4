"""Diagnostic: bench-scale dynamic scene — unmasked vs masked ATE.

Scene (sway): fr3_walking-style — quasi-static swaying camera, 2
person-sized walkers crossing the view with walk/stand cycles
(io/synthetic.sway_trajectory + cross_walkers). The reference's story:
walking people degrade stock ORB-SLAM2 to 0.702 m; the flow mask
recovers 0.388 m, the geometry mask 0.152 m (reference
README.md:133-163).

Scene (loop): the bench circuit with circulating walkers
(loop_walkers) — fast coherent motion the tracker's chi2 gates handle
largely on their own.

Usage: python diag_dynamic.py [n_frames] [sway|loop] [unmasked,flow,geom]
"""

import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.eval.ate import evaluate_ate_xyz
from orb_slam2_ssd_semantic_tpu.io import vocabulary as voc
from orb_slam2_ssd_semantic_tpu.io.artifacts import find_checkpoint
from orb_slam2_ssd_semantic_tpu.io.device_render import render_frames
from orb_slam2_ssd_semantic_tpu.io.synthetic import (
    SyntheticSequence,
    cross_walkers,
    loop_walkers,
)
from orb_slam2_ssd_semantic_tpu.mapping.loop_closing import LoopCloser
from orb_slam2_ssd_semantic_tpu.tracking import scan_tracker
from orb_slam2_ssd_semantic_tpu.tracking.segmented import (
    resolve_trajectory,
    track_sequence_segmented,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 337
SCENE = sys.argv[2] if len(sys.argv) > 2 else "sway"
VARIANTS = (sys.argv[3].split(",") if len(sys.argv) > 3
            else ["unmasked", "flow", "geom"])
SEG = 84 if (N - 1) % 84 == 0 else (N - 1) // 4
LAPS = 2.3


def main():
    base = SlamConfig()
    cfg = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, th_depth=80.0),
        map=dataclasses.replace(base.map, max_keyframes=128,
                                max_map_points=16384),
        dynamic=dataclasses.replace(
            base.dynamic,
            min_static_area=float(os.environ.get("DIAG_GUARD", "0.45")),
        ),
        tracking=dataclasses.replace(
            base.tracking, local_map_candidates=1536,
            max_frames_between_kfs=int(
                os.environ.get("DIAG_KF_MAX", "30")),
        ),
    )
    seq = SyntheticSequence(n_frames=N, trajectory=SCENE, loop_laps=LAPS)
    poses = jnp.asarray(np.stack(seq.poses_wc).astype(np.float32))
    if SCENE == "sway":
        walkers = cross_walkers(N, seq.room.size,
                                n_objects=int(os.environ.get("DIAG_WALKERS", "3")))
    else:
        walkers = loop_walkers(N, seq.room.size, laps=LAPS)
    g_dyn, d_dyn = render_frames(
        poses, cfg.camera, size=seq.room.size,
        boxes=tuple(tuple(map(tuple, b)) for b in seq.room.boxes),
        seed=seq.seed, moving_boxes=jnp.asarray(walkers),
        depth_noise=float(os.environ.get("DIAG_DEPTH_NOISE", "0.01")),
    )
    np.asarray(g_dyn[0][0, 0])
    print(f"# rendered {SCENE} dynamic scene, {N} frames")

    vocab_path = find_checkpoint("orbvoc_synth.npz")
    vocab = voc.load_binary(vocab_path)
    va = scan_tracker.VocabArrays.from_vocabulary(vocab)
    gt = seq.gt_positions()
    kw = dict(vocab=va, voc_k=vocab.k, voc_depth=vocab.depth,
              voc_words=vocab.n_words)

    for name in VARIANTS:
        mkw = dict(use_flow=name == "flow", use_geom=name == "geom")
        lc = LoopCloser(cfg, vocab=vocab)
        t0 = time.perf_counter()
        res = track_sequence_segmented(
            g_dyn, d_dyn, cfg, segment_len=SEG, loop_closer=lc,
            **mkw, **kw)
        warm = time.perf_counter() - t0
        lc = LoopCloser(cfg, vocab=vocab)
        t0 = time.perf_counter()
        res = track_sequence_segmented(
            g_dyn, d_dyn, cfg, segment_len=SEG, loop_closer=lc,
            **mkw, **kw)
        wall = time.perf_counter() - t0 - res.correct_s
        est_raw = np.stack([-T[:3, :3].T @ T[:3, 3] for T in res.T_all])
        ate_raw = evaluate_ate_xyz(est_raw, gt).rmse
        est = resolve_trajectory(res)
        ate = evaluate_ate_xyz(est, gt).rmse
        print(f"# [{name}] fps={N / wall:.1f} ate_raw={ate_raw:.4f} "
              f"ate_resolved={ate:.4f} kfs={int(res.stats[-1, 2])} "
              f"lost={int((res.stats[:, 0] == 2).sum())} "
              f"flags={res.n_loop_events} corr={len(res.corrections)} "
              f"(first wall {warm:.0f}s)")


if __name__ == "__main__":
    main()
