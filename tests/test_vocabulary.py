"""DBoW2 vocabulary: text/binary round trips, quantization, L1 scoring."""

import jax.numpy as jnp
import numpy as np

from orb_slam2_ssd_semantic_tpu.io import vocabulary as voc


def test_text_roundtrip(tmp_path, rng):
    v = voc.make_random_vocabulary(seed=1, k=3, depth=3, n_desc=300)
    p = str(tmp_path / "voc.txt")
    voc.save_text_vocabulary(v, p)
    v2 = voc.load_text_vocabulary(p)
    assert v2.k == v.k and v2.depth == v.depth
    assert v2.n_words == v.n_words
    np.testing.assert_array_equal(v2.desc, v.desc)
    np.testing.assert_array_equal(np.sort(v2.children, 1), np.sort(v.children, 1))
    # Quantization is identical through the round trip.
    q = jnp.asarray(rng.integers(0, 2**32, (64, 8), dtype=np.uint32))
    ok = jnp.ones((64,), bool)
    np.testing.assert_array_equal(
        np.asarray(voc.quantize(v, q, ok)), np.asarray(voc.quantize(v2, q, ok))
    )


def test_binary_roundtrip(tmp_path):
    v = voc.make_random_vocabulary(seed=2, k=4, depth=2, n_desc=200)
    p = str(tmp_path / "voc.npz")
    voc.save_binary(v, p)
    v2 = voc.load_binary(p)
    np.testing.assert_array_equal(v2.children, v.children)
    np.testing.assert_array_equal(v2.desc, v.desc)
    assert v2.n_words == v.n_words


def test_quantize_determinism_and_locality(rng):
    v = voc.make_random_vocabulary(seed=3, k=4, depth=3, n_desc=1000)
    q = rng.integers(0, 2**32, (128, 8), dtype=np.uint32)
    ok = jnp.ones((128,), bool)
    w1 = np.asarray(voc.quantize(v, jnp.asarray(q), ok))
    w2 = np.asarray(voc.quantize(v, jnp.asarray(q), ok))
    np.testing.assert_array_equal(w1, w2)
    assert (w1 >= 0).all() and (w1 < v.n_words).all()
    # A 1-bit flip rarely changes the word.
    q_flip = q.copy()
    q_flip[:, 0] ^= 1
    w3 = np.asarray(voc.quantize(v, jnp.asarray(q_flip), ok))
    # Random (unclustered) descriptors: a 1-bit flip keeps the word for
    # the large majority (real ORB descriptors cluster far better).
    assert (w1 == w3).mean() > 0.7


def test_bow_columns_dedup_and_norm():
    idf = np.asarray([1.0, 2.0, 1.0], np.float32)
    words = jnp.asarray([0, 1, 1, -1, 2], jnp.int32)
    vals = np.asarray(voc.bow_columns(words, jnp.asarray(idf)))
    # tf*idf = [1, 4, 1] -> normalized [1/6, 4/6, 1/6]
    np.testing.assert_allclose(vals[0], 1 / 6, rtol=1e-5)
    np.testing.assert_allclose(vals[1], 4 / 6, rtol=1e-5)
    assert vals[2] == 0.0 and vals[3] == 0.0  # duplicate + invalid
    np.testing.assert_allclose(vals.sum(), 1.0, rtol=1e-5)


def test_l1_scores_match_dense(rng):
    n_words = 50
    idf = jnp.asarray(rng.uniform(0.5, 2.0, n_words).astype(np.float32))
    frames = []
    for _ in range(4):
        w = rng.integers(0, n_words, 32).astype(np.int32)
        w[rng.random(32) < 0.2] = -1
        frames.append(jnp.asarray(w))
    cols = [voc.bow_columns(w, idf) for w in frames]

    def dense(w, c):
        d = np.zeros(n_words)
        for wi, ci in zip(np.asarray(w), np.asarray(c)):
            if wi >= 0:
                d[wi] += ci
        return d

    db_w = jnp.stack(frames[1:])
    db_v = jnp.stack(cols[1:])
    s = np.asarray(voc.l1_scores(frames[0], cols[0], db_w, db_v, n_words))
    d0 = dense(frames[0], cols[0])
    for i in range(3):
        di = dense(frames[1 + i], cols[1 + i])
        expected = np.minimum(d0, di).sum()
        np.testing.assert_allclose(s[i], expected, rtol=1e-5)
    # Self-similarity is 1.
    s_self = np.asarray(
        voc.l1_scores(frames[0], cols[0], jnp.stack(frames[:1]), jnp.stack(cols[:1]), n_words)
    )
    np.testing.assert_allclose(s_self[0], 1.0, rtol=1e-5)
