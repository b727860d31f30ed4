"""Tune the segmented mid-run-correction test scenario (VERDICT r4 #3):
inject drift (depth noise + scale bias) on a multi-lap circuit so that
>=2 corrections APPLY, then measure post-correction ATE improvement and
resolved-vs-raw. CPU run mirroring tests/conftest.py."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_cpu")

import dataclasses
import sys
import time

import numpy as np

import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import (
    CameraConfig, OrbConfig, SlamConfig, TrackingConfig,
)
from orb_slam2_ssd_semantic_tpu.eval.ate import evaluate_ate_xyz
from orb_slam2_ssd_semantic_tpu.io import vocabulary as voc
from orb_slam2_ssd_semantic_tpu.io.artifacts import find_checkpoint
from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence
from orb_slam2_ssd_semantic_tpu.mapping.loop_closing import LoopCloser
from orb_slam2_ssd_semantic_tpu.tracking import scan_tracker
from orb_slam2_ssd_semantic_tpu.tracking.segmented import (
    resolve_trajectory,
    track_sequence_segmented,
)

SMALL_CAM = CameraConfig(
    fx=267.7, fy=269.6, cx=160.0, cy=123.8, width=320, height=240,
    th_depth=80.0,
)

DEPTH_BIAS = float(os.environ.get("BIAS", "1.03"))
NOISE = float(os.environ.get("NOISE", "0.02"))
N = int(os.environ.get("N", "145"))
SEG = int(os.environ.get("SEG", "36"))
LAPS = float(os.environ.get("LAPS", "2.35"))


def main():
    seq = SyntheticSequence(
        n_frames=N, cam=SMALL_CAM, trajectory="loop", loop_laps=LAPS,
        depth_noise=NOISE,
    )
    walkers = None
    if os.environ.get("WALKERS"):
        from orb_slam2_ssd_semantic_tpu.io.synthetic import loop_walkers

        walkers = loop_walkers(N, seq.room.size, laps=LAPS,
                               n_objects=int(os.environ["WALKERS"]),
                               style="stand_drift")
        # Transient corruption: walkers leave after this fraction of the
        # run (drop through the floor), so the post-corruption revisits
        # measure the accumulated drift against a CLEAN scene.
        wstart = float(os.environ.get("WSTART", "0.0"))
        wcut = float(os.environ.get("WCUT", "1.0"))
        if wstart > 0.0:
            walkers[:int(wstart * N)] = 1e3
        if wcut < 1.0:
            walkers[int(wcut * N):] = 1e3  # outside the room, unrendered
    grays, depths = [], []
    for i in range(len(seq)):
        if walkers is not None:
            saved = seq.room.boxes
            seq.room.boxes = saved + [tuple(map(tuple, w))
                                      for w in walkers[i]]
            try:
                g, d = seq.gray_depth(i)
            finally:
                seq.room.boxes = saved
        else:
            g, d = seq.gray_depth(i)
        grays.append(np.clip(g, 0, 255).astype(np.uint8))
        depths.append((d * DEPTH_BIAS * 1000).astype(np.uint16))
    g_dev = jnp.asarray(np.stack(grays))
    d_dev = jnp.asarray(np.stack(depths))

    base = SlamConfig(
        camera=SMALL_CAM,
        orb=OrbConfig(n_features=int(os.environ.get("N_FEAT", "600")),
                      max_keypoints=int(os.environ.get("N_KP", "640"))),
        map=dataclasses.replace(
            SlamConfig().map, max_keyframes=64, max_map_points=8192),
        tracking=TrackingConfig(max_frames_between_kfs=8,
                                local_map_candidates=1536),
        loop=dataclasses.replace(
            SlamConfig().loop, enabled=True, min_kfs_before_loop=6,
            min_total_matches=int(os.environ.get("MTM", "30")),
            guided_radius_wide=float(os.environ.get("RADW", "40")),
            guided_radius_fine=float(os.environ.get("RADF", "8")),
            min_correction_translation=float(os.environ.get("MCT", "0.05")),
            sim3_ransac_threshold=float(os.environ.get("SRT", "0.10")),
            sim3_ransac_threshold_fine=float(os.environ.get("SRTF", "0.05"))),
    )
    if os.environ.get("WEAK_BA"):
        # Drift injection via WEAKENED local BA (VERDICT r4 next #3):
        # odometry noise accumulates but the map stays locally
        # self-consistent — exactly the error a loop correction can
        # genuinely remove (unlike a depth-scale bias, whose corrupted
        # geometry the correction guard rightly refuses to bend).
        wb = int(os.environ["WEAK_BA"])
        base = dataclasses.replace(
            base,
            optimizer=dataclasses.replace(
                base.optimizer, local_ba_iters_initial=wb,
                local_ba_iters_refine=wb),
        )

    vocab_path = find_checkpoint("orbvoc_synth.npz")
    vocab = voc.load_binary(vocab_path)
    va = scan_tracker.VocabArrays.from_vocabulary(vocab)

    gt = seq.gt_positions()

    def run(cfg, with_loop=True):
        lc = LoopCloser(cfg, vocab=vocab) if with_loop else None
        kw = dict(vocab=va, voc_k=vocab.k, voc_depth=vocab.depth,
                  voc_words=vocab.n_words) if with_loop else {}
        t0 = time.perf_counter()
        res = track_sequence_segmented(
            g_dev, d_dev, cfg, segment_len=SEG, loop_closer=lc,
            verbose=True, **kw)
        wall = time.perf_counter() - t0
        est_raw = np.stack([-T[:3, :3].T @ T[:3, 3] for T in res.T_all])
        ate_raw = evaluate_ate_xyz(est_raw, gt).rmse
        ate = evaluate_ate_xyz(resolve_trajectory(res), gt).rmse
        return res, ate_raw, ate, wall

    cfg_off = dataclasses.replace(
        base, loop=dataclasses.replace(base.loop, enabled=False,
                                       enable_relocalization=False))
    res_off, raw_off, ate_off, w_off = run(cfg_off, with_loop=False)
    print(f"loop OFF : raw {raw_off:.4f} resolved {ate_off:.4f} "
          f"({w_off:.0f}s)", file=sys.stderr)

    res_on, raw_on, ate_on, w_on = run(base, with_loop=True)
    walls = [c[3] for c in res_on.corrections]
    print(f"loop ON  : raw {raw_on:.4f} resolved {ate_on:.4f} "
          f"flags={res_on.n_loop_events} corr={len(res_on.corrections)} "
          f"walls={[f'{w:.1f}' for w in walls]} ({w_on:.0f}s)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
