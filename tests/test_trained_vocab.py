"""The shipped trained vocabulary (checkpoints/orbvoc_synth.npz, built by
apps/train_vocabulary.py — DBoW2-style hierarchical binary k-means +
TF-IDF) must discriminate views: same-view BoW similarity above
different-view similarity on real rendered frames (the property the
reference's ORBvoc gives loop detection, KeyFrameDatabase.cc:76-197)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

VOCAB = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints", "orbvoc_synth.npz"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(VOCAB),
    reason="trained vocabulary not present (apps/train_vocabulary.py)",
)


def test_trained_vocab_discriminates_views():
    from orb_slam2_ssd_semantic_tpu.config import SlamConfig
    from orb_slam2_ssd_semantic_tpu.frontend.extractor import extract
    from orb_slam2_ssd_semantic_tpu.io import vocabulary as voc
    from orb_slam2_ssd_semantic_tpu.io.synthetic import BoxRoom

    vocab = voc.load_binary(VOCAB)
    assert vocab.n_words >= 200
    cfg = SlamConfig()
    # Use a DIFFERENT room seed than the training corpus (seed 17).
    room = BoxRoom(seed=5, cam=cfg.camera)

    def bow(T_wc):
        g, _ = room.render(T_wc)
        f = extract(jnp.asarray(g, jnp.float32), cfg.orb)
        w = voc.quantize(vocab, f.desc, f.valid)
        v = voc.bow_columns(w, jnp.asarray(vocab.word_weight))
        return w, v

    def pose(x, z, yaw):
        T = np.eye(4, dtype=np.float32)
        c, s = np.cos(yaw), np.sin(yaw)
        T[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
        T[:3, 3] = [x, 1.5, z]
        return T

    wA, vA = bow(pose(2.5, 3.0, 0.0))          # view A
    wA2, vA2 = bow(pose(2.55, 3.02, 0.03))     # nearly the same view
    wB, vB = bow(pose(2.5, 3.0, np.pi))        # opposite direction

    db_w = jnp.stack([wA2, wB])
    db_v = jnp.stack([vA2, vB])
    s = np.asarray(voc.l1_scores(wA, vA, db_w, db_v, vocab.n_words))
    assert s[0] > s[1] + 0.05, s  # same view clearly outranks opposite
