"""Loop-detection precision/recall: trained vocabulary vs random codebook
on a two-room world (VERDICT r2 #2 done-criterion).

The scenario that destroys a map irrecoverably is a FALSE loop: two
different places scoring as the same (perceptual aliasing). Here two
rooms with independent textures provide the aliasing pressure; a
trajectory visits room A, then room B, then REVISITS room A. For every
revisit view, retrieval against the earlier views must hit the true
room-A counterpart (recall) and must never rank a room-B view first
(precision / zero false loops). The trained hierarchical vocabulary
(checkpoints/orbvoc_synth.npz) must beat the flat random codebook on
separation margin — the property ORBvoc gives the reference
(KeyFrameDatabase.cc:76-197).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import CameraConfig, OrbConfig, SlamConfig

VOCAB = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints", "orbvoc_synth.npz"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(VOCAB),
    reason="trained vocabulary not present (apps/train_vocabulary.py)",
)


def _pose(x, z, yaw, y=1.5):
    T = np.eye(4, dtype=np.float32)
    c, s = np.cos(yaw), np.sin(yaw)
    T[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
    T[:3, 3] = [x, y, z]
    return T


@pytest.fixture(scope="module")
def two_room_views():
    """Descriptors for: 6 room-A views, 6 room-B views, 3 room-A
    revisits (small pose offsets from A views 0-2)."""
    from orb_slam2_ssd_semantic_tpu.frontend.extractor import extract
    from orb_slam2_ssd_semantic_tpu.io.synthetic import BoxRoom

    cfg = SlamConfig(orb=OrbConfig(n_features=500, max_keypoints=512))
    cam = cfg.camera
    roomA = BoxRoom(seed=31, cam=cam)
    roomB = BoxRoom(seed=77, cam=cam)

    def feats(room, T_wc):
        g, _ = room.render(T_wc)
        f = extract(jnp.asarray(g, jnp.float32), cfg.orb)
        return f.desc, f.valid

    poses_A = [
        _pose(2.5, 2.6, 0.25 * k - 0.5) for k in range(6)
    ]
    poses_B = [
        _pose(2.4, 2.8, 0.25 * k - 0.45) for k in range(6)
    ]
    revisit = [
        _pose(2.53, 2.63, 0.25 * k - 0.5 + 0.02) for k in range(3)
    ]
    views = [feats(roomA, T) for T in poses_A]
    views += [feats(roomB, T) for T in poses_B]
    queries = [feats(roomA, T) for T in revisit]
    return views, queries


def _retrieval(views, queries, score_fn):
    """score_fn(q_desc, q_valid, db descs, db valids) -> (len(views),)
    scores. Returns (top1 indices, margin = best_A - best_B per query)."""
    top1, margins = [], []
    for qd, qv in queries:
        s = score_fn(qd, qv, views)
        best_A = max(s[:6])
        best_B = max(s[6:])
        top1.append(int(np.argmax(s)))
        margins.append(best_A - best_B)
    return top1, margins


def test_trained_vocab_beats_codebook_on_two_rooms(two_room_views):
    from orb_slam2_ssd_semantic_tpu.io import vocabulary as voc
    from orb_slam2_ssd_semantic_tpu.mapping import place_recognition as pr

    views, queries = two_room_views
    vocab = voc.load_binary(VOCAB)
    idf = jnp.asarray(vocab.word_weight)

    # Trained-vocab scoring.
    db_w = jnp.stack([voc.quantize(vocab, d, v) for d, v in views])
    db_v = jnp.stack([
        voc.bow_columns(voc.quantize(vocab, d, v), idf) for d, v in views
    ])

    def score_vocab(qd, qv, _):
        w = voc.quantize(vocab, qd, qv)
        vals = voc.bow_columns(w, idf)
        return np.asarray(voc.l1_scores(w, vals, db_w, db_v, vocab.n_words))

    # Flat random-codebook scoring.
    db_bow = jnp.stack([pr.bow_vector(d, v) for d, v in views])

    def score_code(qd, qv, _):
        return np.asarray(pr.bow_scores(pr.bow_vector(qd, qv), db_bow))

    top_v, marg_v = _retrieval(views, queries, score_vocab)
    top_c, marg_c = _retrieval(views, queries, score_code)

    # Zero false loops for the trained vocab: every revisit retrieves a
    # room-A view, with the true counterpart (k) ranked first.
    for k, t in enumerate(top_v):
        assert t < 6, f"trained vocab false loop: query {k} -> view {t}"
        assert t == k, (k, t)
    assert all(m > 0 for m in marg_v), marg_v

    # The trained vocabulary separates the rooms by a wider margin than
    # the codebook on every query (the codebook may or may not false-
    # positive; the trained one must dominate it).
    assert np.mean(marg_v) > np.mean(marg_c) + 0.02, (marg_v, marg_c)
