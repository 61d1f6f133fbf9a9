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

Weights are random unless a converted .npz exists (registry.py); all
three backbones are layer-exact to the TF OD API graphs the reference
ships, so the released ssd_*_coco.pb files convert via ssd_convert.
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
    # the TF OD API configs these checkpoints were trained from set
    # batch_norm epsilon 0.001 in conv_hyperparams
    bn_eps: float = 1e-3

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
        x = nn.BatchNorm(use_running_average=True, epsilon=self.bn_eps,
                         dtype=jnp.float32)(x)
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


# TF-slim inception_v2 block table (slim/nets/inception_v2.py, the trunk
# inside the reference's ssd_inception_v2_coco.pb). Each row: block name,
# branch depths. Normal blocks: Branch_0 1x1, Branch_1 1x1->3x3,
# Branch_2 1x1->3x3->3x3 (both 3x3 at the same depth), Branch_3
# pool->1x1. Reduction blocks ('red'): Branch_0 1x1->3x3(s2), Branch_1
# 1x1->3x3->3x3(s2), Branch_2 max-pool(s2), no pool-projection branch.
# Module names are the TF layer paths with '/' -> '__' so the converter
# maps 1:1 (ssd_convert.convert_frozen_graph).
INCEPTION_V2_BLOCKS = (
    ('Mixed_3b', {'b0': 64, 'b1': (64, 64), 'b2': (64, 96),
                  'pool': ('avg', 32)}),
    ('Mixed_3c', {'b0': 64, 'b1': (64, 96), 'b2': (64, 96),
                  'pool': ('avg', 64)}),
    ('Mixed_4a', {'red': True, 'b0': (128, 160), 'b1': (64, 96)}),
    ('Mixed_4b', {'b0': 224, 'b1': (64, 96), 'b2': (96, 128),
                  'pool': ('avg', 128)}),
    ('Mixed_4c', {'b0': 192, 'b1': (96, 128), 'b2': (96, 128),
                  'pool': ('avg', 128)}),
    ('Mixed_4d', {'b0': 160, 'b1': (128, 160), 'b2': (128, 160),
                  'pool': ('avg', 96)}),
    ('Mixed_4e', {'b0': 96, 'b1': (128, 192), 'b2': (160, 192),
                  'pool': ('avg', 96)}),
    ('Mixed_5a', {'red': True, 'b0': (128, 192), 'b1': (192, 256)}),
    ('Mixed_5b', {'b0': 352, 'b1': (192, 320), 'b2': (160, 224),
                  'pool': ('avg', 128)}),
    ('Mixed_5c', {'b0': 352, 'b1': (192, 320), 'b2': (192, 224),
                  'pool': ('max', 128)}),
)


class InceptionV2Backbone(nn.Module):
    """Layer-exact TF-slim inception_v2 trunk; the SSD source scales are
    Mixed_4c (19x19, 576ch) and Mixed_5c (10x10, 1024ch) as in the OD
    API's ssd_inception_v2_feature_extractor."""

    @nn.compact
    def __call__(self, x):
        def cbr(x, feats, k, name, stride=1):
            return ConvBNReLU6(feats, k, stride, name=name)(x)

        def block(x, name, spec):
            if spec.get('red'):
                a0, a1 = spec['b0']
                br0 = cbr(x, a0, 1, f'{name}__Branch_0__Conv2d_0a_1x1')
                br0 = cbr(br0, a1, 3, f'{name}__Branch_0__Conv2d_1a_3x3', 2)
                c0, c1 = spec['b1']
                br1 = cbr(x, c0, 1, f'{name}__Branch_1__Conv2d_0a_1x1')
                br1 = cbr(br1, c1, 3, f'{name}__Branch_1__Conv2d_0b_3x3')
                br1 = cbr(br1, c1, 3, f'{name}__Branch_1__Conv2d_1a_3x3', 2)
                br2 = nn.max_pool(x, (3, 3), (2, 2), padding='SAME')
                return jnp.concatenate([br0, br1, br2], axis=-1)
            br0 = cbr(x, spec['b0'], 1, f'{name}__Branch_0__Conv2d_0a_1x1')
            c0, c1 = spec['b1']
            br1 = cbr(x, c0, 1, f'{name}__Branch_1__Conv2d_0a_1x1')
            br1 = cbr(br1, c1, 3, f'{name}__Branch_1__Conv2d_0b_3x3')
            d0, d1 = spec['b2']
            br2 = cbr(x, d0, 1, f'{name}__Branch_2__Conv2d_0a_1x1')
            br2 = cbr(br2, d1, 3, f'{name}__Branch_2__Conv2d_0b_3x3')
            br2 = cbr(br2, d1, 3, f'{name}__Branch_2__Conv2d_0c_3x3')
            kind, depth = spec['pool']
            pool = nn.avg_pool if kind == 'avg' else nn.max_pool
            br3 = pool(x, (3, 3), (1, 1), padding='SAME')
            br3 = cbr(br3, depth, 1, f'{name}__Branch_3__Conv2d_0b_1x1')
            return jnp.concatenate([br0, br1, br2, br3], axis=-1)

        # stem: slim separable_conv2d(64, 7x7, depth_multiplier=8, s2) —
        # the depthwise half ([7,7,3,8]) is run as a dense [7,7,3,24]
        # conv with the off-diagonal taps zero (exact, MXU-friendly; the
        # converter embeds the released depthwise_weights accordingly),
        # BN+activation apply after the pointwise only (slim semantics)
        x = nn.Conv(24, (7, 7), (2, 2), padding='SAME', use_bias=False,
                    dtype=jnp.bfloat16,
                    name='Conv2d_1a_7x7_depthwise')(x)
        x = cbr(x, 64, 1, 'Conv2d_1a_7x7_pointwise')
        x = nn.max_pool(x, (3, 3), (2, 2), padding='SAME')
        x = cbr(x, 64, 1, 'Conv2d_2b_1x1')
        x = cbr(x, 192, 3, 'Conv2d_2c_3x3')
        x = nn.max_pool(x, (3, 3), (2, 2), padding='SAME')

        c_mid = None
        for name, spec in INCEPTION_V2_BLOCKS:
            x = block(x, name, spec)
            if name == 'Mixed_4c':
                c_mid = x                    # 19x19, 576
        return c_mid, x                      # 10x10, 1024


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
