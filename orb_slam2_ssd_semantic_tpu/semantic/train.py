"""SSD training: anchor matching, multibox loss, and a jitted train step.

The reference ships only ncnn *inference* with a pretrained
mobilenetv2-ssdlite binary that is absent from the snapshot
(reference .MISSING_LARGE_BLOBS; perfect/src/Detector.cc:22-23
hardcodes the model paths). A TPU-native framework must therefore be
able to (re)train its detector. This module implements the standard
SSD recipe (Liu et al., ECCV'16) the ncnn model was trained with:
IoU anchor matching (best-anchor-per-target forced positive, plus
anchors with IoU > 0.5), smooth-L1 box regression on the encoded
offsets, and cross-entropy classification with 3:1 hard-negative
mining — all batched and jitted.

`apps/train_ssdlite.py` trains on the synthetic box world; weights
save/load via semantic/ssdlite.py save_params/load_params and feed the
Detector(params=...) used by the keyframe pipeline.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from orb_slam2_ssd_semantic_tpu.semantic.ssdlite import ssd_anchors

VARIANCES = (0.1, 0.2)


def _xyxy_to_cxcywh(b):
    wh = jnp.maximum(b[..., 2:] - b[..., :2], 1e-6)
    return jnp.concatenate([b[..., :2] + wh / 2, wh], axis=-1)


def encode_boxes(gt_cxcywh: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ssdlite.decode_boxes: gt (A, 4) cxcywh -> loc targets."""
    d_xy = (gt_cxcywh[..., :2] - anchors[..., :2]) / (
        VARIANCES[0] * anchors[..., 2:]
    )
    d_wh = jnp.log(gt_cxcywh[..., 2:] / anchors[..., 2:]) / VARIANCES[1]
    return jnp.concatenate([d_xy, d_wh], axis=-1)


def _iou_anchors_gt(anchors_xyxy: jnp.ndarray, gt_xyxy: jnp.ndarray) -> jnp.ndarray:
    """(A, 4) x (G, 4) -> (A, G) IoU."""
    lt = jnp.maximum(anchors_xyxy[:, None, :2], gt_xyxy[None, :, :2])
    rb = jnp.minimum(anchors_xyxy[:, None, 2:], gt_xyxy[None, :, 2:])
    inter = jnp.prod(jnp.maximum(rb - lt, 0.0), axis=-1)
    area_a = jnp.prod(anchors_xyxy[:, 2:] - anchors_xyxy[:, :2], axis=-1)
    area_g = jnp.prod(gt_xyxy[:, 2:] - gt_xyxy[:, :2], axis=-1)
    return inter / jnp.maximum(area_a[:, None] + area_g[None, :] - inter, 1e-9)


class AnchorTargets(NamedTuple):
    loc: jnp.ndarray  # (A, 4) regression targets (defined where pos)
    cls: jnp.ndarray  # (A,) int32 class id (0 = background)
    pos: jnp.ndarray  # (A,) bool positive-anchor mask


def match_anchors(
    anchors: jnp.ndarray,  # (A, 4) cxcywh in [0, 1]
    gt_boxes: jnp.ndarray,  # (G, 4) xyxy in [0, 1], padded
    gt_cls: jnp.ndarray,  # (G,) int32 >= 1, padded
    gt_valid: jnp.ndarray,  # (G,) bool
    iou_threshold: float = 0.5,
) -> AnchorTargets:
    """SSD matching: every GT claims its best anchor; anchors with
    IoU > threshold to some GT are also positive."""
    anchors_xyxy = jnp.concatenate(
        [anchors[:, :2] - anchors[:, 2:] / 2, anchors[:, :2] + anchors[:, 2:] / 2],
        axis=-1,
    )
    iou = jnp.where(gt_valid[None, :], _iou_anchors_gt(anchors_xyxy, gt_boxes), -1.0)
    best_gt = jnp.argmax(iou, axis=1)  # (A,)
    best_iou = jnp.max(iou, axis=1)
    # Force-match: the best anchor of each GT becomes positive for it.
    best_anchor = jnp.argmax(iou, axis=0)  # (G,)
    forced = jnp.zeros((anchors.shape[0],), bool).at[best_anchor].set(gt_valid)
    forced_gt = jnp.zeros((anchors.shape[0],), jnp.int32).at[best_anchor].set(
        jnp.arange(gt_boxes.shape[0], dtype=jnp.int32)
    )
    assigned = jnp.where(forced, forced_gt, best_gt)
    pos = forced | (best_iou > iou_threshold)
    gt_for_anchor = gt_boxes[assigned]
    loc_t = encode_boxes(_xyxy_to_cxcywh(gt_for_anchor), anchors)
    cls_t = jnp.where(pos, gt_cls[assigned], 0)
    return AnchorTargets(loc=loc_t, cls=cls_t, pos=pos)


def multibox_loss(
    loc_pred: jnp.ndarray,  # (A, 4)
    conf_pred: jnp.ndarray,  # (A, C) logits
    targets: AnchorTargets,
    neg_pos_ratio: float = 3.0,
):
    """Smooth-L1 on positives + CE with hard-negative mining (3:1)."""
    pos = targets.pos
    n_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)

    diff = jnp.abs(loc_pred - targets.loc)
    smooth_l1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
    loss_loc = jnp.sum(jnp.where(pos[:, None], smooth_l1, 0.0)) / n_pos

    logp = jax.nn.log_softmax(conf_pred, axis=-1)
    ce = -jnp.take_along_axis(logp, targets.cls[:, None], axis=-1)[:, 0]
    # Hard-negative mining: rank background anchors by loss, keep 3x pos.
    neg_ce = jnp.where(pos, -jnp.inf, ce)
    order = jnp.argsort(-neg_ce)
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    neg = (~pos) & (rank < neg_pos_ratio * n_pos)
    loss_cls = jnp.sum(jnp.where(pos | neg, ce, 0.0)) / n_pos
    return loss_loc + loss_cls, (loss_loc, loss_cls)


def make_train_step(model, tx, input_size: int = 300):
    """Returns (step, init_opt_state): a jitted SGD/optax step over a
    batch of images + padded GT boxes."""
    anchors = jnp.asarray(ssd_anchors(input_size))

    def loss_fn(params, images, gt_boxes, gt_cls, gt_valid):
        loc, conf = model.apply(params, images)  # (B, A, 4), (B, A, C)

        def one(loc_i, conf_i, b, c, v):
            t = match_anchors(anchors, b, c, v)
            loss, aux = multibox_loss(loc_i, conf_i, t)
            return loss

        losses = jax.vmap(one)(loc, conf, gt_boxes, gt_cls, gt_valid)
        return jnp.mean(losses)

    @jax.jit
    def step(params, opt_state, images, gt_boxes, gt_cls, gt_valid):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, images, gt_boxes, gt_cls, gt_valid
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def synthetic_detection_batch_device(
    key,
    batch: int,
    size: int = 300,
    n_classes: int = 3,
    max_boxes: int = 3,
):
    """Device-side twin of `synthetic_detection_batch`: the whole batch is
    generated with jax.random INSIDE the jitted step chain, so training
    over the remote-TPU relay ships only a PRNG key per step instead of
    ~17 MB of images (host->device transfer is the bottleneck there)."""
    ks = jax.random.split(key, 6)
    imgs = jax.random.normal(ks[0], (batch, size, size, 3)) * 0.08
    wh = jax.random.uniform(ks[1], (batch, max_boxes, 2), minval=0.2, maxval=0.5)
    xy = jax.random.uniform(ks[2], (batch, max_boxes, 2)) * (1.0 - wh)
    cls = jax.random.randint(ks[3], (batch, max_boxes), 1, n_classes + 1)
    nbox = jax.random.randint(ks[4], (batch,), 1, max_boxes + 1)
    valid = jnp.arange(max_boxes)[None, :] < nbox[:, None]
    boxes = jnp.concatenate([xy, xy + wh], axis=-1)  # (B, G, 4) xyxy in [0,1]

    grid = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    xs = grid[None, None, :]  # (1, 1, S)
    ys = grid[None, None, :]
    inx = (xs >= boxes[..., 0:1]) & (xs < boxes[..., 2:3])  # (B, G, S)
    iny = (ys >= boxes[..., 1:2]) & (ys < boxes[..., 3:4])
    level = -0.8 + 1.6 * cls.astype(jnp.float32) / n_classes  # (B, G)
    noise = jax.random.normal(ks[5], (batch, size, size, 3)) * 0.05
    for g in range(max_boxes):
        m = iny[:, g, :, None] & inx[:, g, None, :] & valid[:, g, None, None]
        imgs = jnp.where(
            m[..., None], level[:, g, None, None, None] + noise, imgs
        )
    return imgs, boxes, cls * valid, valid


def synthetic_detection_batch(
    rng: np.random.Generator,
    batch: int,
    size: int = 300,
    n_classes: int = 3,
    max_boxes: int = 3,
):
    """Simple synthetic detection task: solid-intensity rectangles on a
    noisy background; the class is the intensity band. Returns
    (images (B,S,S,3) in [-1,1]-ish preprocessed range, boxes (B,G,4)
    xyxy in [0,1], cls (B,G), valid (B,G))."""
    imgs = rng.normal(0.0, 0.08, (batch, size, size, 3)).astype(np.float32)
    boxes = np.zeros((batch, max_boxes, 4), np.float32)
    cls = np.zeros((batch, max_boxes), np.int32)
    valid = np.zeros((batch, max_boxes), bool)
    for b in range(batch):
        n = rng.integers(1, max_boxes + 1)
        for g in range(n):
            w, h = rng.uniform(0.2, 0.5, 2)
            x1 = rng.uniform(0.0, 1.0 - w)
            y1 = rng.uniform(0.0, 1.0 - h)
            c = int(rng.integers(1, n_classes + 1))
            px = [int(x1 * size), int(y1 * size),
                  int((x1 + w) * size), int((y1 + h) * size)]
            level = -0.8 + 1.6 * c / n_classes
            imgs[b, px[1]:px[3], px[0]:px[2], :] = level + rng.normal(
                0.0, 0.05, (px[3] - px[1], px[2] - px[0], 3))
            boxes[b, g] = [x1, y1, x1 + w, y1 + h]
            cls[b, g] = c
            valid[b, g] = True
    return imgs, boxes, cls, valid
