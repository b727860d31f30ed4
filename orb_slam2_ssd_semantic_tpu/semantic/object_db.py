"""Persistent 3D semantic object database.

TPU-native equivalent of ObjectDatabase (perfect/src/ObjectDatabase.cc):
a fixed-capacity columnar store of semantic clusters
(Cluster{size, centroid, prob, class_id, object_id}, ObjectDatabase.h:18-27)
with the reference's merge rule (addObject, ObjectDatabase.cc:78-147):
find same-class entries, take the nearest centroid; if it lies within
the per-class merge radius, average prob/centroid/size into it,
otherwise append. Per-class radii follow ObjectDatabase.cc:22-43
(bottle 0.06 m, chair 0.5, person 0.35, tvmonitor 0.25, default 0.6).

The insert is a jitted scatter: all candidate clusters are merged or
appended in one pass, so per-keyframe fusion costs one device call.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_ssd_semantic_tpu.config import SemanticConfig

# Per-class merge radii, meters (ObjectDatabase.cc:22-43); index = VOC id.
MERGE_RADII = np.full((21,), 0.6, dtype=np.float32)
MERGE_RADII[5] = 0.06  # bottle
MERGE_RADII[9] = 0.5  # chair
MERGE_RADII[15] = 0.35  # person
MERGE_RADII[20] = 0.25  # tvmonitor


class ObjectDB(NamedTuple):
    centroid: jnp.ndarray  # (M, 3)
    size: jnp.ndarray  # (M, 3) bounding-box extents
    prob: jnp.ndarray  # (M,)
    class_id: jnp.ndarray  # (M,) int32
    n_merged: jnp.ndarray  # (M,) int32 observation count
    valid: jnp.ndarray  # (M,) bool
    cursor: jnp.ndarray  # () int32


def empty_db(capacity: int = 256) -> ObjectDB:
    return ObjectDB(
        centroid=jnp.zeros((capacity, 3), jnp.float32),
        size=jnp.zeros((capacity, 3), jnp.float32),
        prob=jnp.zeros((capacity,), jnp.float32),
        class_id=jnp.full((capacity,), -1, jnp.int32),
        n_merged=jnp.zeros((capacity,), jnp.int32),
        valid=jnp.zeros((capacity,), bool),
        cursor=jnp.int32(0),
    )


@jax.jit
def add_objects(
    db: ObjectDB,
    centroids: jnp.ndarray,  # (C, 3)
    sizes: jnp.ndarray,  # (C, 3)
    probs: jnp.ndarray,  # (C,)
    class_ids: jnp.ndarray,  # (C,) int32
    cand_valid: jnp.ndarray,  # (C,)
) -> ObjectDB:
    """Merge-or-append a batch of candidate clusters."""
    M = db.valid.shape[0]
    radii = jnp.asarray(MERGE_RADII)

    def insert_one(db, args):
        c, s, p, cid, ok = args
        dist = jnp.linalg.norm(db.centroid - c[None, :], axis=-1)
        same = db.valid & (db.class_id == cid)
        dist = jnp.where(same, dist, jnp.inf)
        j = jnp.argmin(dist)
        near = dist[j] < radii[jnp.clip(cid, 0, radii.shape[0] - 1)]

        # Merge: running average (ObjectDatabase.cc:129-134).
        n = db.n_merged[j].astype(jnp.float32)
        w_new = 1.0 / (n + 1.0)
        merged_centroid = db.centroid[j] * (1 - w_new) + c * w_new
        merged_size = db.size[j] * (1 - w_new) + s * w_new
        merged_prob = db.prob[j] * (1 - w_new) + p * w_new

        slot_new = jnp.minimum(db.cursor, M - 1)
        do_merge = ok & near
        do_append = ok & (~near) & (db.cursor < M)
        idx = jnp.where(do_merge, j, jnp.where(do_append, slot_new, M))

        db = db._replace(
            centroid=db.centroid.at[idx].set(
                jnp.where(do_merge, merged_centroid, c), mode="drop"
            ),
            size=db.size.at[idx].set(jnp.where(do_merge, merged_size, s), mode="drop"),
            prob=db.prob.at[idx].set(jnp.where(do_merge, merged_prob, p), mode="drop"),
            class_id=db.class_id.at[idx].set(cid, mode="drop"),
            n_merged=db.n_merged.at[idx].set(
                jnp.where(do_merge, db.n_merged[j] + 1, 1), mode="drop"
            ),
            valid=db.valid.at[idx].set(True, mode="drop"),
            cursor=db.cursor + do_append.astype(jnp.int32),
        )
        return db, None

    db, _ = jax.lax.scan(
        insert_one, db, (centroids, sizes, probs, class_ids, cand_valid)
    )
    return db


def save_objects_txt(path: str, db: ObjectDB) -> None:
    """Text dump of the semantic database, one object per line
    (class centroid_xyz size_xyz prob observations) — the persistent
    analogue of the reference's objectD.txt / object_loc.txt console
    dumps (the reference never persists ObjectDatabase; SURVEY.md §5)."""
    lines = []
    for o in summarize(db):
        c, s = o["centroid"], o["size"]
        lines.append(
            f"{o['class']} {c[0]:.4f} {c[1]:.4f} {c[2]:.4f} "
            f"{s[0]:.4f} {s[1]:.4f} {s[2]:.4f} {o['prob']:.3f} {o['observations']}"
        )
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))


def save_db(path: str, db: ObjectDB) -> None:
    """Binary save of the full object database (npz columnar dump)."""
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in db._asdict().items()})


def load_db(path: str) -> ObjectDB:
    with np.load(path) as z:
        return ObjectDB(
            centroid=jnp.asarray(z["centroid"]),
            size=jnp.asarray(z["size"]),
            prob=jnp.asarray(z["prob"]),
            class_id=jnp.asarray(z["class_id"]),
            n_merged=jnp.asarray(z["n_merged"]),
            valid=jnp.asarray(z["valid"]),
            cursor=jnp.int32(int(z["cursor"])),
        )


def summarize(db: ObjectDB) -> list:
    """Host-side dump, the analogue of the reference's objectD.txt
    console listing."""
    from orb_slam2_ssd_semantic_tpu.semantic.ssdlite import VOC_CLASSES

    out = []
    v = np.asarray(db.valid)
    for i in np.nonzero(v)[0]:
        out.append(
            {
                "object_id": int(i),
                "class": VOC_CLASSES[int(np.asarray(db.class_id)[i])],
                "centroid": np.asarray(db.centroid)[i].tolist(),
                "size": np.asarray(db.size)[i].tolist(),
                "prob": float(np.asarray(db.prob)[i]),
                "observations": int(np.asarray(db.n_merged)[i]),
            }
        )
    return out
