"""Detection pipeline: preprocessing, jitted forward, decode + NMS.

The TPU replacement of the reference's Detector/RunDetect pair
(perfect/src/Detector.cc:27-75, RunDetect.cc:29-61): instead of a
dedicated CPU thread consuming a condition-variable queue, pending
keyframe images are batched through one jitted forward pass; results
land in fixed-capacity Detection arrays with validity masks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_ssd_semantic_tpu.config import SemanticConfig
from orb_slam2_ssd_semantic_tpu.semantic.ssdlite import (
    SSDLite,
    decode_boxes,
    init_ssdlite,
    ssd_anchors,
)


class Detections(NamedTuple):
    """Fixed-capacity per-image detections (Detector.h:14-20 Object)."""

    boxes: jnp.ndarray  # (D, 4) [x1, y1, x2, y2] in source pixels
    scores: jnp.ndarray  # (D,)
    classes: jnp.ndarray  # (D,) int32 (VOC index, 0 = background)
    valid: jnp.ndarray  # (D,) bool


def preprocess(rgb: jnp.ndarray, size: int = 300) -> jnp.ndarray:
    """(H, W, 3) uint8/float -> (size, size, 3) normalized like the
    reference (mean/std 127.5, Detector.cc:38-41)."""
    img = jax.image.resize(rgb.astype(jnp.float32), (size, size, 3), "linear")
    return (img - 127.5) / 127.5


def _iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    x1 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y1 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x2 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y2 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_fixed(boxes, scores, classes, top_k: int, iou_th: float):
    """Greedy class-aware NMS over a fixed top_k candidate set, fully
    vectorized: keep box i iff no higher-scored same-class box overlaps
    it above iou_th (matrix formulation of greedy suppression)."""
    order = jnp.argsort(-scores)
    boxes, scores, classes = boxes[order], scores[order], classes[order]
    iou = _iou_matrix(boxes)
    same = classes[:, None] == classes[None, :]
    higher = jnp.arange(top_k)[:, None] > jnp.arange(top_k)[None, :]
    suppressed_by = (iou > iou_th) & same & higher

    def body(i, keep):
        sup = jnp.any(suppressed_by[i] & keep, axis=-1)
        return keep.at[i].set(~sup & keep[i])

    keep0 = jnp.ones((top_k,), bool)
    keep = jax.lax.fori_loop(0, top_k, body, keep0)
    return boxes, scores, classes, keep


class Detector:
    """Host wrapper owning model params and the jitted detect function."""

    def __init__(self, cfg: SemanticConfig = SemanticConfig(), params=None, seed: int = 0):
        self.cfg = cfg
        self.model, init_params = init_ssdlite(jax.random.PRNGKey(seed), cfg.num_classes)
        if params is None:
            # Default weights: the trained checkpoint, auto-resolved like
            # the reference's hardcoded always-loaded ncnn model
            # (Detector.cc:22-23). Random weights only as the warned
            # no-artifact fallback.
            from orb_slam2_ssd_semantic_tpu.io.artifacts import (
                find_checkpoint,
                warn_missing,
            )
            from orb_slam2_ssd_semantic_tpu.semantic.ssdlite import load_params

            ckpt = None
            if cfg.checkpoint_path == "auto":
                # Class-count-matched artifact first (the shipped default
                # is the 21-class VOC-layout checkpoint trained by
                # apps/train_ssdlite.py), then the generic name.
                ckpt = find_checkpoint(
                    f"ssdlite_synthetic_c{cfg.num_classes}.npz"
                ) or find_checkpoint("ssdlite_synthetic.npz")
                if ckpt is None:
                    warn_missing("ssdlite_synthetic*.npz", "random SSD weights")
            elif cfg.checkpoint_path:
                ckpt = cfg.checkpoint_path
            params = init_params
            if ckpt:
                try:
                    params = load_params(ckpt, init_params)
                except Exception as e:  # shape mismatch (e.g. class count)
                    import warnings

                    warnings.warn(
                        f"could not load SSD checkpoint {ckpt} into a "
                        f"{cfg.num_classes}-class model ({e}); using random "
                        "weights", stacklevel=2,
                    )
        self.params = params
        self.anchors = jnp.asarray(ssd_anchors(cfg.det_input_size))

        @functools.partial(jax.jit, static_argnames=("h", "w"))
        def _detect(params, rgb, h: int, w: int):
            x = preprocess(rgb, cfg.det_input_size)[None]
            loc, conf = self.model.apply(params, x)
            boxes = decode_boxes(loc[0], self.anchors)
            probs = jax.nn.softmax(conf[0], axis=-1)
            cls_prob = probs[:, 1:]  # drop background
            best_cls = jnp.argmax(cls_prob, axis=-1) + 1
            best_score = jnp.max(cls_prob, axis=-1)
            D = cfg.max_detections
            top_scores, top_idx = jax.lax.top_k(best_score, D)
            b = boxes[top_idx] * jnp.asarray([w, h, w, h], jnp.float32)
            c = best_cls[top_idx]
            b, s, c, keep = nms_fixed(b, top_scores, c, D, cfg.det_nms_iou)
            valid = keep & (s >= cfg.det_score_threshold)
            return Detections(b, s, c.astype(jnp.int32), valid)

        self._detect = _detect

        @functools.partial(jax.jit, static_argnames=("h", "w"))
        def _detect_batched(params, rgbs, h: int, w: int):
            """All pending keyframes through ONE forward (the RunDetect
            consumer processes its whole queue per wake, RunDetect.cc:44;
            batch>1 is what fills the MXU). Conv stack in bf16 — TPU f32
            convs multiply in bf16 anyway, so casting activations+params
            halves HBM traffic without changing the effective mantissa;
            decode/softmax/NMS stay f32."""
            p16 = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a,
                params,
            )
            x = jax.vmap(lambda im: preprocess(im, cfg.det_input_size))(rgbs)
            loc, conf = self.model.apply(p16, x.astype(jnp.bfloat16))
            loc = loc.astype(jnp.float32)
            conf = conf.astype(jnp.float32)

            def post(loc1, conf1):
                boxes = decode_boxes(loc1, self.anchors)
                probs = jax.nn.softmax(conf1, axis=-1)
                cls_prob = probs[:, 1:]
                best_cls = jnp.argmax(cls_prob, axis=-1) + 1
                best_score = jnp.max(cls_prob, axis=-1)
                D = cfg.max_detections
                top_scores, top_idx = jax.lax.top_k(best_score, D)
                b = boxes[top_idx] * jnp.asarray([w, h, w, h], jnp.float32)
                c = best_cls[top_idx]
                b, s, c, keep = nms_fixed(b, top_scores, c, D, cfg.det_nms_iou)
                valid = keep & (s >= cfg.det_score_threshold)
                return Detections(b, s, c.astype(jnp.int32), valid)

            return jax.vmap(post)(loc, conf)

        self._detect_batched = _detect_batched

    def __call__(self, rgb: np.ndarray) -> Detections:
        h, w = rgb.shape[:2]
        return self._detect(self.params, jnp.asarray(rgb), h, w)

    def detect_batch(self, rgbs) -> list:
        """One device dispatch for the whole queue (vs a per-image loop:
        each call through a remote relay costs ~30 ms of latency).

        All queue images must share one (H, W) shape (the keyframe
        queue always does — one camera). Note the batched path runs the
        conv stack in bfloat16 while single-image __call__ runs f32: a
        detection whose score sits exactly at det_score_threshold can
        flip validity between the two paths."""
        if len(rgbs) == 0:
            return []
        shapes = {np.asarray(r).shape[:2] for r in rgbs}
        if len(shapes) != 1:
            raise ValueError(
                f"detect_batch requires uniform image shapes, got {shapes}")
        h, w = next(iter(shapes))
        arr = jnp.asarray(np.stack([np.asarray(r) for r in rgbs]))
        dd = self._detect_batched(self.params, arr, h, w)
        n = arr.shape[0]
        return [
            Detections(dd.boxes[i], dd.scores[i], dd.classes[i], dd.valid[i])
            for i in range(n)
        ]
