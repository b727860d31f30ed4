"""DBoW2 ORB vocabulary: text-format loader, binary converter, and a
device-tensor hierarchical quantizer + L1 BoW scoring.

Parity surface for the reference's ORBVocabulary
(perfect/include/ORBVocabulary.h, TemplatedVocabulary loadFromTextFile —
loaded at boot, System.cc:120-136) and the text->binary converter
(tool/text2binary.cc). The reference's actual ORBvoc.txt (~1M nodes,
k=10, L=6) is not shipped in its repo; this module loads any vocabulary
in that text format (first line `k L scoring weighting`, then one node
per line: `parent is_leaf d0..d31 weight`), converts it to a compact
npz, and quantizes descriptors on-device: the tree walk is L batched
gather + Hamming-argmin steps over all keypoints at once, instead of a
per-descriptor pointer chase.

Scoring is DBoW2's L1 score on L1-normalized TF-IDF vectors:
    s(v, w) = 1 - 0.5 * || v/|v| - w/|w| ||_1
computed from a dense query vector and the database's sparse per-frame
(word, weight) columns — one batched gather per database row, no
inverted file.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Vocabulary(NamedTuple):
    children: np.ndarray  # (n_nodes, k) int32, -1 padded
    desc: np.ndarray  # (n_nodes, 8) uint32 packed node descriptors
    word_id: np.ndarray  # (n_nodes,) int32 leaf word id, -1 for inner
    word_weight: np.ndarray  # (n_words,) float32 idf weights
    k: int
    depth: int

    @property
    def n_words(self) -> int:
        return int(self.word_weight.shape[0])


def _pack_desc_bytes(b: np.ndarray) -> np.ndarray:
    """(N, 32) uint8 -> (N, 8) uint32 little-endian words (bit i of byte
    j = descriptor bit j*8+i, matching ops/orb_descriptor packing)."""
    return b.reshape(-1, 8, 4).astype(np.uint32) @ np.asarray(
        [1, 1 << 8, 1 << 16, 1 << 24], np.uint32
    )


def load_text_vocabulary(path: str) -> Vocabulary:
    """Parse the DBoW2 text format (TemplatedVocabulary::loadFromTextFile)."""
    with open(path) as f:
        header = f.readline().split()
        k, depth = int(header[0]), int(header[1])
        parents, leaves, descs, weights = [], [], [], []
        for line in f:
            parts = line.split()
            if not parts:
                continue
            parents.append(int(parts[0]))
            leaves.append(int(parts[1]))
            descs.append([int(x) for x in parts[2:34]])
            weights.append(float(parts[34]))
    n = len(parents) + 1  # + root
    children = np.full((n, k), -1, np.int32)
    child_count = np.zeros((n,), np.int32)
    desc = np.zeros((n, 8), np.uint32)
    desc[1:] = _pack_desc_bytes(np.asarray(descs, np.uint8))
    word_id = np.full((n,), -1, np.int32)
    w = []
    for i, (p, is_leaf) in enumerate(zip(parents, leaves), start=1):
        children[p, child_count[p]] = i
        child_count[p] += 1
        if is_leaf:
            word_id[i] = len(w)
            w.append(weights[i - 1])
    return Vocabulary(
        children=children,
        desc=desc,
        word_id=word_id,
        word_weight=np.asarray(w, np.float32),
        k=k,
        depth=depth,
    )


def save_text_vocabulary(vocab: Vocabulary, path: str) -> None:
    """Write the DBoW2 text format (inverse of load_text_vocabulary;
    node order = node id order, which round-trips exactly)."""
    n = vocab.children.shape[0]
    parent = np.full((n,), -1, np.int32)
    for i in range(n):
        for c in vocab.children[i]:
            if c >= 0:
                parent[c] = i
    # Unpack (8,) uint32 -> 32 bytes little-endian.
    b = vocab.desc.view(np.uint8).reshape(n, 32) if vocab.desc.dtype == np.uint32 else None
    with open(path, "w") as f:
        f.write(f"{vocab.k} {vocab.depth} 0 0\n")
        for i in range(1, n):
            is_leaf = 1 if vocab.word_id[i] >= 0 else 0
            w = vocab.word_weight[vocab.word_id[i]] if is_leaf else 0.0
            byts = " ".join(str(int(x)) for x in b[i])
            f.write(f"{parent[i]} {is_leaf} {byts} {w}\n")


def save_binary(vocab: Vocabulary, path: str) -> None:
    """Compact binary form (tool/text2binary.cc equivalent)."""
    np.savez_compressed(
        path,
        children=vocab.children,
        desc=vocab.desc,
        word_id=vocab.word_id,
        word_weight=vocab.word_weight,
        k=np.int32(vocab.k),
        depth=np.int32(vocab.depth),
    )


def load_binary(path: str) -> Vocabulary:
    z = np.load(path)
    return Vocabulary(
        children=z["children"],
        desc=z["desc"],
        word_id=z["word_id"],
        word_weight=z["word_weight"],
        k=int(z["k"]),
        depth=int(z["depth"]),
    )


@functools.partial(jax.jit, static_argnames=("k", "depth"))
def _quantize(children, desc, word_id, queries, valid, k: int, depth: int):
    n_nodes = desc.shape[0]

    def step(cur, _):
        kids = children[cur]  # (N, k)
        kd = desc[jnp.clip(kids, 0, n_nodes - 1)]  # (N, k, 8)
        x = jnp.bitwise_xor(queries[:, None, :], kd)
        d = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
        d = jnp.where(kids >= 0, d, 1 << 20)
        best = jnp.argmin(d, axis=-1)
        nxt = jnp.take_along_axis(kids, best[:, None], axis=1)[:, 0]
        # Stay put at leaves (no children).
        return jnp.where(nxt >= 0, nxt, cur), None

    cur = jnp.zeros((queries.shape[0],), jnp.int32)
    cur, _ = jax.lax.scan(step, cur, None, length=depth)
    wid = word_id[cur]
    return jnp.where(valid & (wid >= 0), wid, -1)


def quantize(vocab: Vocabulary, desc: jnp.ndarray, valid: jnp.ndarray):
    """(N, 8) packed descriptors -> (N,) word ids (-1 invalid)."""
    return _quantize(
        jnp.asarray(vocab.children),
        jnp.asarray(vocab.desc),
        jnp.asarray(vocab.word_id),
        desc,
        valid,
        k=vocab.k,
        depth=vocab.depth,
    )


@jax.jit
def bow_columns(words: jnp.ndarray, idf: jnp.ndarray):
    """Per-frame sparse BoW column with DEDUPLICATED word slots.

    words (N,) int32 (-1 invalid), idf (n_words,) -> (N,) float32: the
    first slot of each word carries its full L1-normalized TF-IDF value
    v_word; duplicate slots carry 0. So the column sums to 1 and a
    per-slot reduction visits every word exactly once."""
    n_words = idf.shape[0]
    n = words.shape[0]
    ok = words >= 0
    safe = jnp.where(ok, words, n_words)
    counts = jnp.zeros((n_words + 1,), jnp.float32).at[safe].add(1.0)
    tfidf_word = counts[:n_words] * idf  # un-normalized v per word
    norm = jnp.sum(tfidf_word)
    v = tfidf_word[jnp.clip(words, 0, n_words - 1)] / jnp.maximum(norm, 1e-9)
    first = jnp.full((n_words + 1,), n, jnp.int32).at[safe].min(
        jnp.arange(n, dtype=jnp.int32)
    )
    keep = ok & (first[safe] == jnp.arange(n, dtype=jnp.int32))
    return jnp.where(keep, v, 0.0)


@functools.partial(jax.jit, static_argnames=("n_words",))
def l1_scores(q_words, q_vals, db_words, db_vals, n_words: int):
    """DBoW2 L1 score of a query frame against F database frames.

    For L1-normalized non-negative vectors,
        s(v, w) = 1 - 0.5 * ||v - w||_1 = sum_words min(v_word, w_word).
    q_words/q_vals (N,) and db_words/db_vals (F, N) are deduplicated
    sparse columns from bow_columns. Returns (F,) scores in [0, 1]."""
    ok = q_words >= 0
    safe = jnp.where(ok, q_words, n_words)
    dense = jnp.zeros((n_words + 1,), jnp.float32).at[safe].add(q_vals)
    qv = dense[jnp.clip(db_words, 0, n_words - 1)]  # (F, N)
    qv = jnp.where(db_words >= 0, qv, 0.0)
    w = jnp.where(db_words >= 0, db_vals, 0.0)
    return jnp.sum(jnp.minimum(qv, w), axis=-1)


def make_random_vocabulary(
    seed: int = 0, k: int = 4, depth: int = 3, n_desc: int = 2000
) -> Vocabulary:
    """Build a small synthetic vocabulary by hierarchical k-medoids over
    random descriptors — for tests and as a fallback when no ORBvoc file
    is available (the reference repo ships none either)."""
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, (n_desc, 32), np.uint8)

    nodes_children: list[list[int]] = [[]]
    nodes_desc = [np.zeros(32, np.uint8)]
    nodes_parent = [-1]
    word_ids = [-1]

    def popcount_rows(a, b):
        return np.unpackbits(a ^ b[None, :], axis=1).sum(1)

    def build(idx, node, level):
        if level == depth or len(idx) <= 1:
            word_ids[node] = 0  # mark leaf; renumber later
            return
        # k-medoids-ish: pick k seeds, assign, recurse.
        seeds = idx[rng.permutation(len(idx))[: min(k, len(idx))]]
        assign = np.argmin(
            np.stack([popcount_rows(data[idx], data[s]) for s in seeds], 1), axis=1
        )
        for ci, s in enumerate(seeds):
            child_idx = idx[assign == ci]
            if len(child_idx) == 0:
                continue
            cid = len(nodes_desc)
            nodes_desc.append(data[s])
            nodes_parent.append(node)
            nodes_children.append([])
            word_ids.append(-1)
            nodes_children[node].append(cid)
            build(child_idx, cid, level + 1)

    build(np.arange(n_desc), 0, 0)
    n = len(nodes_desc)
    children = np.full((n, k), -1, np.int32)
    for i, ch in enumerate(nodes_children):
        children[i, : len(ch)] = ch
    word_id = np.full((n,), -1, np.int32)
    wc = 0
    for i in range(n):
        if word_ids[i] == 0:
            word_id[i] = wc
            wc += 1
    return Vocabulary(
        children=children,
        desc=_pack_desc_bytes(np.stack(nodes_desc)),
        word_id=word_id,
        word_weight=np.ones((wc,), np.float32),
        k=k,
        depth=depth,
    )


def convert_main(argv=None):
    """CLI mirror of the reference's tool/text2binary.cc: convert a
    DBoW2 vocabulary between text and binary formats (direction from
    file suffixes)."""
    import argparse

    p = argparse.ArgumentParser(description="vocabulary text<->binary converter")
    p.add_argument("src", help=".txt or .bin vocabulary")
    p.add_argument("dst", help=".bin or .txt output")
    args = p.parse_args(argv)
    vocab = load_binary(args.src) if args.src.endswith(".bin") \
        else load_text_vocabulary(args.src)
    if args.dst.endswith(".bin"):
        save_binary(vocab, args.dst)
    else:
        save_text_vocabulary(vocab, args.dst)
    print(f"{args.src} -> {args.dst}: {vocab.n_words} words, "
          f"k={vocab.k} depth={vocab.depth}")


if __name__ == "__main__":
    convert_main()
