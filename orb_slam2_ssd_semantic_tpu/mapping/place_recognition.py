"""Appearance-based place recognition.

TPU-native replacement for DBoW2 (ORBVocabulary + KeyFrameDatabase,
perfect/src/KeyFrameDatabase.cc). The reference walks a ~1M-node
vocabulary tree per descriptor and maintains an inverted file; its
vocabulary file is not even present in its own repo. Here the
vocabulary is a FLAT random binary codebook (K words): every frame
descriptor is assigned to its nearest word with one batched Hamming
matrix, frames become L2-normalized TF histograms, and similarity is a
dot product — so scoring a keyframe against the whole database is one
matvec on the MXU instead of an inverted-file walk. Behavioral
equivalents of the reference's gates are provided: minimum-score
normalization against covisible neighbors and top-candidate retrieval
(DetectLoopCandidates, KeyFrameDatabase.cc:76-197).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_ssd_semantic_tpu.ops.match import hamming_matrix

VOCAB_SIZE = 256


@functools.lru_cache()
def codebook(seed: int = 7, k: int = VOCAB_SIZE) -> np.ndarray:
    """(k, 8) uint32 random binary words. Deterministic."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**32, size=(k, 8), dtype=np.uint32)


@jax.jit
def bow_vector(desc: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) packed descriptors -> (K,) normalized TF histogram."""
    cb = jnp.asarray(codebook())
    d = hamming_matrix(desc, cb)  # (N, K)
    word = jnp.argmin(d, axis=-1)
    K = cb.shape[0]
    hist = jnp.zeros((K,), jnp.float32).at[jnp.where(valid, word, K)].add(
        1.0, mode="drop"
    )
    return hist / jnp.maximum(jnp.linalg.norm(hist), 1e-9)


@jax.jit
def bow_scores(query: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """query (K,) vs db (F, K) -> (F,) cosine similarities."""
    return db @ query


@functools.partial(jax.jit, static_argnames=("max_candidates",))
def detect_candidates(
    query_vec: jnp.ndarray,
    db_vecs: jnp.ndarray,
    db_valid: jnp.ndarray,
    exclude: jnp.ndarray,
    min_score: jnp.ndarray,
    max_candidates: int = 4,
):
    """Loop-candidate retrieval (DetectLoopCandidates semantics):
    score all database keyframes, drop excluded ones (the query's covis
    neighborhood) and those below min_score (the lowest covis-neighbor
    score, LoopClosing.cc:143-160), return the top candidates.

    Returns (ids (C,), scores (C,), valid (C,)).
    """
    s = bow_scores(query_vec, db_vecs)
    s = jnp.where(db_valid & (~exclude), s, -1.0)
    top_s, top_i = jax.lax.top_k(s, max_candidates)
    ok = top_s >= jnp.maximum(min_score, 0.0)
    return top_i, top_s, ok
