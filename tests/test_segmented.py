"""Drive `track_sequence_segmented` — the engine's mid-run loop
correction runner (VERDICT r4 next #3: the flagship correction path
shipped with no test driving it).

The geometric verify+correct math is covered by tests/test_loop_e2e.py
(LoopCloser on a real revisit) and the real-TPU bench; what needs
driving HERE is the segmented runner's own machinery: in-scan flagged
events -> validity/throttle gates -> transform-level consistency
confirmation (two independently-verified estimates must AGREE before a
correction applies — texture-cell-aliased transforms pass guided
confirmation with 60+ matches but disagree frame to frame; r5 measured
>=12 cm phantom corrections bending 3 cm-ATE runs) -> application +
live-anchor remap + speculative re-dispatch + correction records.

A stub verifier makes the flagged events deterministic: it returns
transforms whose implied correction D is controlled per call, and a
no-op apply, so every gate decision is observable."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import (
    CameraConfig,
    OrbConfig,
    SlamConfig,
    TrackingConfig,
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


def _cfg():
    base = SlamConfig()
    return SlamConfig(
        camera=SMALL_CAM,
        orb=OrbConfig(n_features=600, max_keypoints=640),
        map=dataclasses.replace(
            base.map, max_keyframes=64, max_map_points=8192),
        tracking=TrackingConfig(max_frames_between_kfs=8,
                                local_map_candidates=1536),
        loop=dataclasses.replace(base.loop, enabled=True,
                                 min_kfs_before_loop=6),
    )


class _StubCloser(LoopCloser):
    """Deterministic verifier: every flagged event verifies with a
    transform whose implied correction translation is `d_seq[call]`
    (cycled); `_correct` is a recorded no-op."""

    def __init__(self, cfg, vocab, d_seq):
        super().__init__(cfg, vocab=vocab)
        self.d_seq = [np.asarray(d, np.float32) for d in d_seq]
        self.calls = 0
        self.applied = []

    def _estimate_loop_transform(self, state, kf_id, cand):
        T_cur_rel = np.asarray(state.kfs.T_cw[kf_id]) @ np.linalg.inv(
            np.asarray(state.kfs.T_cw[cand]))
        D = np.eye(4, dtype=np.float32)
        D[:3, 3] = self.d_seq[self.calls % len(self.d_seq)]
        self.calls += 1
        return True, jnp.asarray(D @ T_cur_rel), 999

    def _correct(self, state, kf_id, cand, T_ji):
        self.applied.append((kf_id, cand))
        return state, True


@pytest.fixture(scope="module")
def circuit():
    """Rendered multi-lap circuit whose revisits flag in-scan loop
    candidates (needs the trained vocabulary artifact)."""
    path = find_checkpoint("orbvoc_synth.npz")
    if path is None:
        pytest.skip("no trained vocabulary artifact")
    vocab = voc.load_binary(path)
    va = scan_tracker.VocabArrays.from_vocabulary(vocab)
    seq = SyntheticSequence(n_frames=145, cam=SMALL_CAM, trajectory="loop",
                            loop_laps=2.35, depth_noise=0.01)
    grays, depths = [], []
    for i in range(len(seq)):
        g, d = seq.gray_depth(i)
        grays.append(np.clip(g, 0, 255).astype(np.uint8))
        depths.append((d * 1000).astype(np.uint16))
    return (jnp.asarray(np.stack(grays)), jnp.asarray(np.stack(depths)),
            seq, vocab, va)


def _run(circuit, closer):
    g_dev, d_dev, seq, vocab, va = circuit
    return track_sequence_segmented(
        g_dev, d_dev, _cfg(), segment_len=36, loop_closer=closer,
        vocab=va, voc_k=vocab.k, voc_depth=vocab.depth,
        voc_words=vocab.n_words,
    )


@pytest.mark.slow
def test_confirmed_corrections_apply_and_runner_stays_sound(circuit):
    """Agreeing verified estimates must produce >=2 APPLIED corrections
    across the circuit's revisits (throttled one per neighborhood), the
    speculative re-dispatch must keep the trajectory identical (the
    stub's correction is a no-op on the map), and the records must
    carry measured warm walls."""
    g_dev, d_dev, seq, vocab, va = circuit
    lc = _StubCloser(_cfg(), vocab, [[0.3, 0.0, 0.1]])
    res = _run(circuit, lc)
    assert res.n_loop_events >= 2, res.n_loop_events
    assert len(res.corrections) >= 2, (
        len(res.corrections), res.n_loop_events, lc.calls)
    assert lc.applied and len(lc.applied) == len(res.corrections)
    # Warm correction wall is measured per application (the r3 #2
    # metric; the real-TPU wall is benched in BENCH_r{N}, the stub wall
    # here just proves the plumbing records it).
    assert all(np.isfinite(c[3]) and c[3] >= 0 for c in res.corrections)
    # The no-op correction + anchor remap + re-dispatch must not damage
    # tracking: the resolved trajectory still lands on the ground truth.
    est = resolve_trajectory(res)
    ate = evaluate_ate_xyz(est, seq.gt_positions()).rmse
    assert ate < 0.2, ate
    assert (res.stats[:, 0] == 0).all(), "frames lost after re-dispatch"


@pytest.mark.slow
def test_disagreeing_estimates_never_correct(circuit):
    """Alternating (aliased-style) transform estimates must be declined
    by the transform-level consistency confirmation — zero applied
    corrections, every event consumed by the agree/replace logic."""
    g_dev, d_dev, seq, vocab, va = circuit
    lc = _StubCloser(_cfg(), vocab, [[0.3, 0.0, 0.0], [-0.3, 0.0, 0.2]])
    res = _run(circuit, lc)
    assert res.n_loop_events >= 2, res.n_loop_events
    assert lc.calls >= 2  # estimates WERE attempted...
    assert len(res.corrections) == 0, res.corrections  # ...none applied
    assert not lc.applied
