"""Keyframe-sharded place-recognition scoring over a device mesh.

TPU-native scale-out of the KeyFrameDatabase query
(perfect/src/KeyFrameDatabase.cc:76-197, DetectLoopCandidates): the BoW
database — one (K,) TF-IDF/TF vector per keyframe — is the per-keyframe
state that grows with the map, so IT is what gets sharded (SURVEY.md
§2.6 P12, `kf` axis). Each shard scores the replicated query against
its local slice of the database with one matvec on its MXU, applies the
validity/exclusion/min-score gates locally, and selects its LOCAL top-C
candidates; only those C (score, global-id) pairs per device — not the
(F,) score vector — are all-gathered for the final top-C selection.
Communication per query: C * n_devices * 8 bytes, independent of
database size.

Semantics match mapping/place_recognition.detect_candidates (parity
pinned in tests/test_parallel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from orb_slam2_ssd_semantic_tpu.parallel.mesh import KF_AXIS


def make_sharded_detect(mesh, max_candidates: int = 4):
    """Returns detect(query_vec, db_vecs, db_valid, exclude, min_score)
    with db_* sharded over KF_AXIS (leading dim divisible by the axis
    size); query_vec/min_score replicated. Output matches
    place_recognition.detect_candidates: (ids, scores, ok), replicated.
    """
    n_dev = mesh.shape[KF_AXIS]

    def _detect(query_vec, db_vecs, db_valid, exclude, min_score):
        # Local slice: (F/n, K) @ (K,) -> (F/n,) scores on this shard.
        s = db_vecs @ query_vec
        s = jnp.where(db_valid & (~exclude), s, -1.0)
        # Small local slices (F/n < C, e.g. tiny maps on large meshes):
        # take what exists and pad to C with -1 sentinels.
        k_local = min(max_candidates, s.shape[0])
        loc_s, loc_i = jax.lax.top_k(s, k_local)
        if k_local < max_candidates:
            pad = max_candidates - k_local
            loc_s = jnp.concatenate([loc_s, jnp.full((pad,), -1.0, loc_s.dtype)])
            loc_i = jnp.concatenate([loc_i, jnp.zeros((pad,), loc_i.dtype)])
        # Globalize local indices: shard d owns rows [d*F/n, (d+1)*F/n).
        shard = jax.lax.axis_index(KF_AXIS)
        n_local = s.shape[0]
        loc_i = loc_i + shard * n_local
        # Tiny all-gather: C (score, id) pairs per device.
        all_s = jax.lax.all_gather(loc_s, KF_AXIS, tiled=True)
        all_i = jax.lax.all_gather(loc_i, KF_AXIS, tiled=True)
        top_s, sel = jax.lax.top_k(all_s, max_candidates)
        top_i = all_i[sel]
        ok = top_s >= jnp.maximum(min_score, 0.0)
        return top_i, top_s, ok

    mapped = shard_map(
        _detect,
        mesh=mesh,
        in_specs=(P(), P(KF_AXIS), P(KF_AXIS), P(KF_AXIS), P()),
        out_specs=(P(), P(), P()),
        # Outputs ARE replicated (identical post-all_gather on every
        # device) but the varying-mesh-axes check can't infer that
        # through top_k; disable the static check.
        check_vma=False,
    )
    return jax.jit(mapped)


def make_sharded_l1_scores(mesh, n_words: int):
    """Keyframe-sharded DBoW2 L1 scoring — the ENGINE's database-query
    kernel for `SlamSystem(mesh=...)`: db_words/db_vals (F, N) sharded
    over KF_AXIS (rows = keyframes), query columns replicated. Each
    shard scores its local database slice (io/vocabulary.l1_scores) —
    the output (F,) score row comes back kf-sharded and is gathered on
    fetch. Exact-parity with the single-device scorer is pinned in
    tests/test_mesh_engine.py."""
    from orb_slam2_ssd_semantic_tpu.io import vocabulary as voc

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(KF_AXIS), P(KF_AXIS)),
        out_specs=P(KF_AXIS),
    )
    def score(q_words, q_vals, db_words, db_vals):
        return voc.l1_scores(q_words, q_vals, db_words, db_vals, n_words)

    return jax.jit(score)


def make_sharded_bow_vectors(mesh, bow_fn):
    """Batch ``bow_fn(desc, valid) -> (K,)`` over keyframes sharded on
    KF_AXIS: descriptors (F, N, 8) in, (F, K) BoW database out, both
    kf-sharded — the database-build side of the sharded query path."""
    sh = NamedSharding(mesh, P(KF_AXIS))

    @functools.partial(jax.jit, out_shardings=sh)
    def build(desc, valid):
        return jax.vmap(bow_fn)(desc, valid)

    return build
