"""SSD training pipeline: anchor matching, multibox loss, and that a
few optimizer steps actually reduce the loss (semantic/train.py)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from orb_slam2_ssd_semantic_tpu.semantic.ssdlite import (
    decode_boxes,
    init_ssdlite,
    load_params,
    save_params,
    ssd_anchors,
)
from orb_slam2_ssd_semantic_tpu.semantic.train import (
    encode_boxes,
    _xyxy_to_cxcywh,
    make_train_step,
    match_anchors,
    multibox_loss,
    synthetic_detection_batch,
)


def test_encode_decode_roundtrip():
    anchors = jnp.asarray(ssd_anchors(300))
    rng = np.random.default_rng(0)
    # Random boxes near some anchors.
    gt = np.zeros((anchors.shape[0], 4), np.float32)
    c = rng.uniform(0.3, 0.7, (anchors.shape[0], 2)).astype(np.float32)
    wh = rng.uniform(0.1, 0.3, (anchors.shape[0], 2)).astype(np.float32)
    gt[:, :2] = c - wh / 2
    gt[:, 2:] = c + wh / 2
    loc = encode_boxes(_xyxy_to_cxcywh(jnp.asarray(gt)), anchors)
    back = decode_boxes(loc, anchors)
    np.testing.assert_allclose(np.asarray(back), gt, atol=1e-4)


def test_match_anchors_basic():
    anchors = jnp.asarray(ssd_anchors(300))
    gt = jnp.asarray([[0.3, 0.3, 0.6, 0.6], [0.0, 0.0, 0.0, 0.0]], jnp.float32)
    cls = jnp.asarray([5, 0], jnp.int32)
    valid = jnp.asarray([True, False])
    t = match_anchors(anchors, gt, cls, valid)
    pos = np.asarray(t.pos)
    assert pos.sum() >= 1  # at least the forced best anchor
    assert np.all(np.asarray(t.cls)[pos] == 5)
    # No anchor may match the padded (invalid) GT.
    assert np.all(np.asarray(t.cls)[~pos] == 0)


def test_multibox_loss_perfect_prediction_is_small():
    anchors = jnp.asarray(ssd_anchors(300))
    gt = jnp.asarray([[0.2, 0.2, 0.5, 0.5]], jnp.float32)
    t = match_anchors(anchors, gt, jnp.asarray([3], jnp.int32), jnp.asarray([True]))
    # Confident background everywhere except the true positives.
    bg = jnp.full((21,), -10.0).at[0].set(10.0)
    fg = jnp.full((21,), -10.0).at[3].set(10.0)
    conf = jnp.where(t.pos[:, None], fg[None, :], bg[None, :])
    loss, (ll, lc) = multibox_loss(t.loc, conf, t)
    assert float(ll) < 1e-5
    assert float(lc) < 1e-3


def test_train_step_reduces_loss():
    model, params = init_ssdlite(jax.random.PRNGKey(0), num_classes=4)
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)
    step = make_train_step(model, tx)
    rng = np.random.default_rng(1)
    # One fixed batch: the loss on it must drop under repeated steps.
    imgs, boxes, cls, valid = synthetic_detection_batch(rng, 2, n_classes=3)
    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state, imgs, boxes, cls, valid)
        losses.append(float(loss))
    assert losses[-1] < 0.6 * losses[0], losses


def test_params_save_load_roundtrip(tmp_path):
    model, params = init_ssdlite(jax.random.PRNGKey(0), num_classes=4)
    path = str(tmp_path / "p.npz")
    save_params(path, params)
    loaded = load_params(path, jax.tree.map(jnp.zeros_like, params))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
