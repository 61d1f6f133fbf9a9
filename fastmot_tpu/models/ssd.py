"""SSD detector family in Flax.

Behavioral reference: fastmot/models/ssd.py (TF frozen-graph -> UFF ->
TensorRT engines for SSDInceptionV2 / SSDMobileNetV1 / SSDMobileNetV2,
300x300 inputs, 91 COCO classes, TOPK=100 with a TRT NMS plugin). Here
each model is a Flax backbone + SSD multibox head; anchor generation
(GridAnchor_TRT's role) and the top-k NMS'd output (NMS_TRT's role) are
pure jnp stages fused into the jitted detector graph (see
detector.SSDDetector). Output layout matches what the reference's
postprocessing consumes: per-image TOPK rows of
``[image_id, label, conf, xmin, ymin, xmax, ymax]`` normalized to [0, 1]
(detector.py:156-178).

Weights are random unless a converted .npz exists (registry.py) — the
architecture and compute path are complete either way.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .registry import SSDModel, register_ssd


class ConvBNReLU6(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    depthwise: bool = False

    @nn.compact
    def __call__(self, x):
        if self.depthwise:
            # shifted-FMA depthwise (see osnet.DepthwiseConv3x3: TPU's
            # grouped-conv lowering is pathologically slow)
            from .osnet import DepthwiseConv3x3
            x = DepthwiseConv3x3(stride=self.stride)(x)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        (self.stride, self.stride), padding='SAME',
                        use_bias=False, dtype=jnp.bfloat16)(x)
        x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32)(x)
        return jnp.minimum(nn.relu(x), 6.0)


class MobileNetV1Backbone(nn.Module):
    """Depthwise-separable backbone; returns the two SSD source scales plus
    extra feature layers."""

    @nn.compact
    def __call__(self, x):
        def dw_sep(x, feats, stride=1):
            x = ConvBNReLU6(0, 3, stride, depthwise=True)(x)
            return ConvBNReLU6(feats, 1)(x)

        x = ConvBNReLU6(32, 3, 2)(x)
        x = dw_sep(x, 64)
        x = dw_sep(x, 128, 2)
        x = dw_sep(x, 128)
        x = dw_sep(x, 256, 2)
        x = dw_sep(x, 256)
        x = dw_sep(x, 512, 2)
        for _ in range(5):
            x = dw_sep(x, 512)
        c11 = x                              # 19x19
        x = dw_sep(x, 1024, 2)
        x = dw_sep(x, 1024)
        c13 = x                              # 10x10
        return c11, c13


class InvertedResidual(nn.Module):
    features: int
    stride: int = 1
    expand: int = 6

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        h = ConvBNReLU6(inp * self.expand, 1)(x) if self.expand > 1 else x
        h = ConvBNReLU6(0, 3, self.stride, depthwise=True)(h)
        h = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=jnp.bfloat16)(h)
        h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32)(h)
        if self.stride == 1 and inp == self.features:
            h = h + x
        return h


class MobileNetV2Backbone(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = ConvBNReLU6(32, 3, 2)(x)
        x = InvertedResidual(16, 1, 1)(x)
        for feats, n, s in [(24, 2, 2), (32, 3, 2), (64, 4, 2), (96, 3, 1)]:
            for i in range(n):
                x = InvertedResidual(feats, s if i == 0 else 1)(x)
        c = x                                # 19x19 expansion point
        for feats, n, s in [(160, 3, 2), (320, 1, 1)]:
            for i in range(n):
                x = InvertedResidual(feats, s if i == 0 else 1)(x)
        x = ConvBNReLU6(1280, 1)(x)          # 10x10
        return c, x


class InceptionV2Backbone(nn.Module):
    """Simplified Inception-V2 trunk producing the two SSD source scales."""

    @nn.compact
    def __call__(self, x):
        def inception(x, b0, b1a, b1b, b2a, b2b, pool):
            br0 = ConvBNReLU6(b0, 1)(x)
            br1 = ConvBNReLU6(b1b, 3)(ConvBNReLU6(b1a, 1)(x))
            br2 = ConvBNReLU6(b2b, 3)(ConvBNReLU6(b2b, 3)(
                ConvBNReLU6(b2a, 1)(x)))
            br3 = ConvBNReLU6(pool, 1)(
                nn.avg_pool(x, (3, 3), (1, 1), padding='SAME'))
            return jnp.concatenate([br0, br1, br2, br3], axis=-1)

        x = ConvBNReLU6(64, 7, 2)(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding='SAME')
        x = ConvBNReLU6(64, 1)(x)
        x = ConvBNReLU6(192, 3)(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding='SAME')
        x = inception(x, 64, 64, 64, 64, 96, 32)
        x = inception(x, 64, 64, 96, 64, 96, 64)
        x = nn.max_pool(x, (3, 3), (2, 2), padding='SAME')
        for _ in range(4):
            x = inception(x, 224, 64, 96, 96, 128, 128)
        c4 = x                               # 19x19
        x = nn.max_pool(x, (3, 3), (2, 2), padding='SAME')
        x = inception(x, 352, 192, 320, 160, 224, 128)
        x = inception(x, 352, 192, 320, 192, 224, 128)
        return c4, x                         # 10x10


class SSDHead(nn.Module):
    """Multibox head over 6 scales with TF-style extra layers.

    ``predictor_kernel`` follows the TF Object Detection configs the
    reference's .pb files were trained from (convolutional_box_predictor
    kernel_size: 1 for ssd_mobilenet_v1_coco, 3 for the others)."""
    num_classes: int
    anchors_per_scale: tuple[int, ...] = (3, 6, 6, 6, 6, 6)
    predictor_kernel: int = 3

    @nn.compact
    def __call__(self, c_mid, c_top):
        feats = [c_mid, c_top]
        x = c_top
        for out_ch in (512, 256, 256, 128):
            x = ConvBNReLU6(out_ch // 2, 1)(x)
            x = ConvBNReLU6(out_ch, 3, 2)(x)
            feats.append(x)

        locs, confs = [], []
        pk = (self.predictor_kernel, self.predictor_kernel)
        for f, a in zip(feats, self.anchors_per_scale):
            loc = nn.Conv(a * 4, pk, padding='SAME',
                          dtype=jnp.float32)(f)
            conf = nn.Conv(a * self.num_classes, pk, padding='SAME',
                           dtype=jnp.float32)(f)
            locs.append(loc.reshape(loc.shape[0], -1, 4))
            confs.append(conf.reshape(conf.shape[0], -1, self.num_classes))
        return jnp.concatenate(locs, axis=1), jnp.concatenate(confs, axis=1)


class SSDNet(nn.Module):
    backbone: str
    num_classes: int
    predictor_kernel: int = 3

    @nn.compact
    def __call__(self, x):
        if self.backbone == 'mobilenet_v1':
            c_mid, c_top = MobileNetV1Backbone()(x)
        elif self.backbone == 'mobilenet_v2':
            c_mid, c_top = MobileNetV2Backbone()(x)
        else:
            c_mid, c_top = InceptionV2Backbone()(x)
        return SSDHead(num_classes=self.num_classes,
                       predictor_kernel=self.predictor_kernel)(c_mid, c_top)


def generate_anchors(input_size=300,
                     feature_sizes=(19, 10, 5, 3, 2, 1),
                     anchors_per_scale=(3, 6, 6, 6, 6, 6),
                     min_scale=0.2, max_scale=0.95):
    """TF Object Detection API grid anchors (GridAnchor_TRT's role).

    Returns [num_anchors, 4] (cx, cy, w, h) normalized to [0, 1].
    """
    num_layers = len(feature_sizes)
    scales = [min_scale + (max_scale - min_scale) * i / (num_layers - 1)
              for i in range(num_layers)] + [1.0]
    all_anchors = []
    for idx, (fs, n_a) in enumerate(zip(feature_sizes, anchors_per_scale)):
        s = scales[idx]
        s_next = np.sqrt(s * scales[idx + 1])
        if n_a == 3:
            specs = [(s, 1.0), (s, 2.0), (s, 0.5)]
        else:
            specs = [(s, 1.0), (s, 2.0), (s, 0.5), (s, 3.0),
                     (s, 1.0 / 3.0), (s_next, 1.0)]
        ys, xs = np.meshgrid(np.arange(fs), np.arange(fs), indexing='ij')
        cx = (xs + 0.5) / fs
        cy = (ys + 0.5) / fs
        for scale_a, ar in specs[:n_a]:
            w = scale_a * np.sqrt(ar)
            h = scale_a / np.sqrt(ar)
            a = np.stack([cx, cy, np.full_like(cx, w), np.full_like(cy, h)],
                         axis=-1).reshape(-1, 4)
            all_anchors.append(a)
        # interleave anchors per location the way the head emits them
        per_loc = np.stack(all_anchors[-n_a:], axis=1).reshape(-1, 4)
        del all_anchors[-n_a:]
        all_anchors.append(per_loc)
    return np.concatenate(all_anchors, axis=0).astype(np.float32)


def decode_ssd(locs, confs, anchors, topk, variances=(0.1, 0.1, 0.2, 0.2)):
    """Decode SSD box regressions + pick per-image top-k scored boxes.

    The fused-graph stand-in for the reference's NMS_TRT plugin output
    (final NMS happens with the detector's cross-tile merge). Returns
    [batch, topk, 7] rows ``[image_id, label, conf, x1, y1, x2, y2]``.
    """
    vx, vy, vw, vh = variances
    cx = locs[..., 0] * vx * anchors[None, :, 2] + anchors[None, :, 0]
    cy = locs[..., 1] * vy * anchors[None, :, 3] + anchors[None, :, 1]
    w = jnp.exp(locs[..., 2] * vw) * anchors[None, :, 2]
    h = jnp.exp(locs[..., 3] * vh) * anchors[None, :, 3]
    x1, y1 = cx - w / 2, cy - h / 2
    x2, y2 = cx + w / 2, cy + h / 2

    probs = jax.nn.softmax(confs, axis=-1)
    # class 0 is background in the TF SSD convention
    cls_prob = probs[..., 1:]
    best_prob = jnp.max(cls_prob, axis=-1)
    best_cls = jnp.argmax(cls_prob, axis=-1) + 1

    top_prob, top_idx = jax.lax.top_k(best_prob, topk)
    b = locs.shape[0]
    batch_ids = jnp.broadcast_to(jnp.arange(b)[:, None], (b, topk))
    take = lambda arr: jnp.take_along_axis(arr, top_idx, axis=1)
    out = jnp.stack([
        batch_ids.astype(jnp.float32),
        take(best_cls.astype(jnp.float32)),
        top_prob,
        take(x1), take(y1), take(x2), take(y2),
    ], axis=-1)
    return out


class _SSDBase(SSDModel):
    INPUT_SHAPE = (3, 300, 300)
    NUM_CLASSES = 91
    TOPK = 100
    BACKBONE = 'mobilenet_v1'
    PREDICTOR_KERNEL = 3

    @classmethod
    def build(cls):
        return SSDNet(backbone=cls.BACKBONE, num_classes=cls.NUM_CLASSES,
                      predictor_kernel=cls.PREDICTOR_KERNEL)


@register_ssd
class SSDInceptionV2(_SSDBase):
    BACKBONE = 'inception_v2'


@register_ssd
class SSDMobileNetV1(_SSDBase):
    BACKBONE = 'mobilenet_v1'
    PREDICTOR_KERNEL = 1


@register_ssd
class SSDMobileNetV2(_SSDBase):
    BACKBONE = 'mobilenet_v2'
