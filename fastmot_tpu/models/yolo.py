"""YOLO detector family in Flax with fused on-device head decode.

Behavioral reference: fastmot/models/yolo.py (registry + per-model
constants: NUM_CLASSES, LETTERBOX, NEW_COORDS, INPUT_SHAPE, LAYER_FACTORS,
SCALES, ANCHORS) and plugins/yolo_layer.cu (the TensorRT head-decode
kernel). The CUDA plugin becomes ``decode_heads`` — pure elementwise math
+ argmax fused into the detector graph by XLA, no plugin mechanism needed
(SURVEY.md section 2.2).

Decode math (yolo_layer.cu:127-173 standard, :185-230 new_coords):
  standard:  bx = (col + s*sigmoid(tx) - (s-1)/2) / W
             bw = exp(tw) * anchor_w / input_w
             obj = sigmoid(to);  cls = sigmoid(max logit)
  new_coords (Scaled-YOLOv4; activations already applied in the head):
             bx = (col + s*tx - (s-1)/2) / W
             bw = (tw)^2 * 4 * anchor_w / input_w
             obj = to;  cls = max prob

Architectures are idiomatic NHWC/bfloat16 Flax: CSPDarknet53+SPP+PANet for
YOLOv4, the CSP-ified Scaled-YOLOv4 family (csp / x-mish / csp-swish /
csp-x-swish / p5 / p6), Darknet53 for YOLOv3 (+SPP), and the tiny variants
— the same 10-model zoo the reference registers (yolo.py:154-299).
Weights are random unless a converted .npz exists (see registry.py).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .registry import YOLOModel, register_yolo


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


_ACTS = {
    'mish': mish,
    'leaky': lambda x: jax.nn.leaky_relu(x, 0.1),
    'swish': jax.nn.silu,
    'linear': lambda x: x,
    'logistic': jax.nn.sigmoid,
}


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    act: str = 'mish'

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    (self.stride, self.stride), padding='SAME',
                    use_bias=False, dtype=jnp.bfloat16)(x)
        x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32)(x)
        return _ACTS[self.act](x)


class ResBlock(nn.Module):
    features: int
    hidden: int
    act: str = 'mish'

    @nn.compact
    def __call__(self, x):
        y = ConvBN(self.hidden, 1, act=self.act)(x)
        y = ConvBN(self.features, 3, act=self.act)(y)
        return x + y


class CSPStage(nn.Module):
    """CSPDarknet stage: strided downsample then a cross-stage-partial
    residual group."""
    features: int
    blocks: int
    act: str = 'mish'
    first: bool = False  # stage 1 keeps full width in both branches

    @nn.compact
    def __call__(self, x):
        x = ConvBN(self.features, 3, 2, act=self.act)(x)
        split = self.features if self.first else self.features // 2
        left = ConvBN(split, 1, act=self.act)(x)
        right = ConvBN(split, 1, act=self.act)(x)
        hidden = self.features // 2
        for _ in range(self.blocks):
            right = ResBlock(split, hidden, act=self.act)(right)
        right = ConvBN(split, 1, act=self.act)(right)
        x = jnp.concatenate([right, left], axis=-1)
        return ConvBN(self.features, 1, act=self.act)(x)


class SPP(nn.Module):
    """Spatial pyramid pooling (5/9/13 max-pool concat)."""
    act: str = 'leaky'

    @nn.compact
    def __call__(self, x):
        pools = [x]
        for k in (5, 9, 13):
            pools.append(nn.max_pool(x, (k, k), (1, 1), padding='SAME'))
        return jnp.concatenate(pools[::-1], axis=-1)


def _upsample2(x):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * 2, w * 2, c), method='nearest')


class ConvSet(nn.Module):
    """5-conv neck block (1-3-1-3-1)."""
    features: int
    act: str = 'leaky'

    @nn.compact
    def __call__(self, x):
        x = ConvBN(self.features, 1, act=self.act)(x)
        x = ConvBN(self.features * 2, 3, act=self.act)(x)
        x = ConvBN(self.features, 1, act=self.act)(x)
        x = ConvBN(self.features * 2, 3, act=self.act)(x)
        return ConvBN(self.features, 1, act=self.act)(x)


class YOLOv4Net(nn.Module):
    """Classic YOLOv4: CSPDarknet53 (mish) + SPP + PANet (leaky), three
    heads at strides 8/16/32."""
    num_classes: int
    anchors_per_head: int = 3
    width: int = 32
    depths: Sequence[int] = (1, 2, 8, 8, 4)

    @nn.compact
    def __call__(self, x):
        w = self.width
        d = self.depths
        x = ConvBN(w, 3, act='mish')(x)
        x = CSPStage(w * 2, d[0], act='mish', first=True)(x)
        x = CSPStage(w * 4, d[1], act='mish')(x)
        p3 = CSPStage(w * 8, d[2], act='mish')(x)       # stride 8
        p4 = CSPStage(w * 16, d[3], act='mish')(p3)     # stride 16
        p5 = CSPStage(w * 32, d[4], act='mish')(p4)     # stride 32

        # SPP on the deepest level
        y5 = ConvBN(w * 16, 1, act='leaky')(p5)
        y5 = ConvBN(w * 32, 3, act='leaky')(y5)
        y5 = ConvBN(w * 16, 1, act='leaky')(y5)
        y5 = SPP()(y5)
        y5 = ConvBN(w * 16, 1, act='leaky')(y5)
        y5 = ConvBN(w * 32, 3, act='leaky')(y5)
        y5 = ConvBN(w * 16, 1, act='leaky')(y5)

        # top-down path
        u4 = _upsample2(ConvBN(w * 8, 1, act='leaky')(y5))
        l4 = ConvBN(w * 8, 1, act='leaky')(p4)
        y4 = ConvSet(w * 8, 'leaky')(jnp.concatenate([l4, u4], axis=-1))

        u3 = _upsample2(ConvBN(w * 4, 1, act='leaky')(y4))
        l3 = ConvBN(w * 4, 1, act='leaky')(p3)
        y3 = ConvSet(w * 4, 'leaky')(jnp.concatenate([l3, u3], axis=-1))

        # bottom-up path
        d4 = ConvBN(w * 8, 3, 2, act='leaky')(y3)
        y4 = ConvSet(w * 8, 'leaky')(jnp.concatenate([d4, y4], axis=-1))
        d5 = ConvBN(w * 16, 3, 2, act='leaky')(y4)
        y5 = ConvSet(w * 16, 'leaky')(jnp.concatenate([d5, y5], axis=-1))

        no = self.anchors_per_head * (5 + self.num_classes)
        h3 = nn.Conv(no, (1, 1), dtype=jnp.float32)(
            ConvBN(w * 8, 3, act='leaky')(y3))
        h4 = nn.Conv(no, (1, 1), dtype=jnp.float32)(
            ConvBN(w * 16, 3, act='leaky')(y4))
        h5 = nn.Conv(no, (1, 1), dtype=jnp.float32)(
            ConvBN(w * 32, 3, act='leaky')(y5))
        return [h3, h4, h5]  # strides 8, 16, 32 (LAYER_FACTORS order)


class ScaledYOLOv4Net(nn.Module):
    """Scaled-YOLOv4 (CSP / P5 / P6 family): fully CSP-ified backbone and
    PAN neck, single activation throughout, optional 4th head."""
    num_classes: int
    anchors_per_head: int
    act: str = 'mish'
    width: int = 32
    depths: Sequence[int] = (1, 3, 15, 15, 7)
    num_heads: int = 3

    @nn.compact
    def __call__(self, x):
        w = self.width
        d = self.depths
        acts = self.act
        x = ConvBN(w, 3, act=acts)(x)
        feats = []
        widths = [w * 2, w * 4, w * 8, w * 16, w * 32, w * 32]
        n_stages = 4 + (1 if self.num_heads >= 4 else 0)
        for i in range(n_stages + 1):
            blocks = d[i] if i < len(d) else d[-1]
            x = CSPStage(min(widths[i], w * 32), blocks, act=acts,
                         first=(i == 0))(x)
            feats.append(x)

        # use the last num_heads levels (strides 8..)
        pyramid = feats[-self.num_heads:]
        top = pyramid[-1]
        top = SPP()(ConvBN(top.shape[-1] // 2, 1, act=acts)(top))
        top = ConvBN(pyramid[-1].shape[-1] // 2, 1, act=acts)(top)

        # top-down
        laterals = [top]
        for lvl in range(self.num_heads - 2, -1, -1):
            prev = laterals[-1]
            up = _upsample2(ConvBN(prev.shape[-1] // 2, 1, act=acts)(prev))
            lat = ConvBN(up.shape[-1], 1, act=acts)(pyramid[lvl])
            y = ConvSet(up.shape[-1], acts)(jnp.concatenate([lat, up], axis=-1))
            laterals.append(y)
        laterals = laterals[::-1]   # fine-to-coarse

        # bottom-up
        outs = [laterals[0]]
        for lvl in range(1, self.num_heads):
            down = ConvBN(laterals[lvl].shape[-1], 3, 2, act=acts)(outs[-1])
            y = ConvSet(laterals[lvl].shape[-1], acts)(
                jnp.concatenate([down, laterals[lvl]], axis=-1))
            outs.append(y)

        no = self.anchors_per_head * (5 + self.num_classes)
        heads = []
        for y in outs:
            h = ConvBN(y.shape[-1] * 2, 3, act=acts)(y)
            h = nn.Conv(no, (1, 1), dtype=jnp.float32)(h)
            heads.append(jax.nn.sigmoid(h))  # new_coords: logistic applied
        return heads


class YOLOv3Net(nn.Module):
    """YOLOv3: Darknet53 backbone (leaky) + FPN-style neck, 3 heads
    ordered stride 32, 16, 8 (matching the reference's LAYER_FACTORS)."""
    num_classes: int
    anchors_per_head: int = 3
    spp: bool = False
    width: int = 32

    @nn.compact
    def __call__(self, x):
        w = self.width

        def dn_stage(x, feats, blocks):
            x = ConvBN(feats, 3, 2, act='leaky')(x)
            for _ in range(blocks):
                x = ResBlock(feats, feats // 2, act='leaky')(x)
            return x

        x = ConvBN(w, 3, act='leaky')(x)
        x = dn_stage(x, w * 2, 1)
        x = dn_stage(x, w * 4, 2)
        p3 = dn_stage(x, w * 8, 8)
        p4 = dn_stage(p3, w * 16, 8)
        p5 = dn_stage(p4, w * 32, 4)

        y5 = ConvBN(w * 16, 1, act='leaky')(p5)
        y5 = ConvBN(w * 32, 3, act='leaky')(y5)
        y5 = ConvBN(w * 16, 1, act='leaky')(y5)
        if self.spp:
            y5 = SPP()(y5)
            y5 = ConvBN(w * 16, 1, act='leaky')(y5)
        y5 = ConvBN(w * 32, 3, act='leaky')(y5)
        y5 = ConvBN(w * 16, 1, act='leaky')(y5)

        u4 = _upsample2(ConvBN(w * 8, 1, act='leaky')(y5))
        y4 = ConvSet(w * 8, 'leaky')(jnp.concatenate([u4, p4], axis=-1))
        u3 = _upsample2(ConvBN(w * 4, 1, act='leaky')(y4))
        y3 = ConvSet(w * 4, 'leaky')(jnp.concatenate([u3, p3], axis=-1))

        no = self.anchors_per_head * (5 + self.num_classes)
        h5 = nn.Conv(no, (1, 1), dtype=jnp.float32)(
            ConvBN(w * 32, 3, act='leaky')(y5))
        h4 = nn.Conv(no, (1, 1), dtype=jnp.float32)(
            ConvBN(w * 16, 3, act='leaky')(y4))
        h3 = nn.Conv(no, (1, 1), dtype=jnp.float32)(
            ConvBN(w * 8, 3, act='leaky')(y3))
        return [h5, h4, h3]  # strides 32, 16, 8


class TinyNet(nn.Module):
    """YOLOv3/v4-tiny: small backbone, two heads (strides per spec)."""
    num_classes: int
    anchors_per_head: int = 3
    csp: bool = True  # v4-tiny uses CSP blocks

    @nn.compact
    def __call__(self, x):
        act = 'leaky'

        def tiny_csp(x, feats):
            x = ConvBN(feats, 3, act=act)(x)
            half = feats // 2
            grp = x[..., half:]
            y = ConvBN(half, 3, act=act)(grp)
            y2 = ConvBN(half, 3, act=act)(y)
            y3 = ConvBN(feats, 1, act=act)(jnp.concatenate([y2, y], axis=-1))
            out = jnp.concatenate([x, y3], axis=-1)
            return nn.max_pool(out, (2, 2), (2, 2)), y3

        if self.csp:
            x = ConvBN(32, 3, 2, act=act)(x)
            x = ConvBN(64, 3, 2, act=act)(x)
            x, _ = tiny_csp(x, 64)
            x, _ = tiny_csp(x, 128)
            x, route = tiny_csp(x, 256)
            x = ConvBN(512, 3, act=act)(x)
        else:
            feats = 16
            for i in range(5):
                x = ConvBN(feats * (2 ** i), 3, act=act)(x)
                x = nn.max_pool(x, (2, 2), (2, 2))
            route = x
            x = ConvBN(256, 3, act=act)(x)
            x = nn.max_pool(x, (2, 2), (2, 2), padding='SAME')
            x = ConvBN(512, 3, act=act)(x)

        y1 = ConvBN(256, 1, act=act)(x)
        no = self.anchors_per_head * (5 + self.num_classes)
        h1 = nn.Conv(no, (1, 1), dtype=jnp.float32)(
            ConvBN(512, 3, act=act)(y1))
        u = _upsample2(ConvBN(128, 1, act=act)(y1))
        y2 = jnp.concatenate([u, route], axis=-1)
        h2 = nn.Conv(no, (1, 1), dtype=jnp.float32)(
            ConvBN(256, 3, act=act)(y2))
        return [h1, h2]  # strides 32, 16 (LAYER_FACTORS order)


# ---------------------------------------------------------------------------
# Head decode: the XLA-fused replacement for plugins/yolo_layer.cu
# ---------------------------------------------------------------------------

def decode_heads(heads, anchors, scales, input_hw, new_coords):
    """Decode raw head maps to normalized detections.

    Returns [N, 7] rows ``[x, y, w, h, obj, class_id, class_prob]`` with
    (x, y) the top-left corner normalized to [0, 1] — identical layout to
    the reference plugin output consumed by detector.py:324-365.
    """
    in_h, in_w = input_hw
    outs = []
    for head, head_anchors, s in zip(heads, anchors, scales):
        b, gh, gw, _ = head.shape
        a = len(head_anchors) // 2
        anc = jnp.asarray(head_anchors, jnp.float32).reshape(a, 2)
        x = head.reshape(b, gh, gw, a, -1)
        col = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 1)
        row = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 0)
        if new_coords:
            tx, ty = x[..., 0], x[..., 1]
            tw, th = x[..., 2], x[..., 3]
            obj = x[..., 4]
            cls_prob = jnp.max(x[..., 5:], axis=-1)
            cls_id = jnp.argmax(x[..., 5:], axis=-1)
            bx = (col[..., None] + s * tx - (s - 1.0) * 0.5) / gw
            by = (row[..., None] + s * ty - (s - 1.0) * 0.5) / gh
            bw = (tw * tw) * 4.0 * anc[None, None, None, :, 0] / in_w
            bh = (th * th) * 4.0 * anc[None, None, None, :, 1] / in_h
        else:
            tx = jax.nn.sigmoid(x[..., 0])
            ty = jax.nn.sigmoid(x[..., 1])
            obj = jax.nn.sigmoid(x[..., 4])
            logits = x[..., 5:]
            cls_prob = jax.nn.sigmoid(jnp.max(logits, axis=-1))
            cls_id = jnp.argmax(logits, axis=-1)
            bx = (col[..., None] + s * tx - (s - 1.0) * 0.5) / gw
            by = (row[..., None] + s * ty - (s - 1.0) * 0.5) / gh
            bw = jnp.exp(x[..., 2]) * anc[None, None, None, :, 0] / in_w
            bh = jnp.exp(x[..., 3]) * anc[None, None, None, :, 1] / in_h
        bx = bx - bw * 0.5  # center -> top-left (yolo_layer.cu:168-169)
        by = by - bh * 0.5
        det = jnp.stack([bx, by, bw, bh, obj,
                         cls_id.astype(jnp.float32), cls_prob], axis=-1)
        outs.append(det.reshape(b, -1, 7))
    return jnp.concatenate(outs, axis=1)


# ---------------------------------------------------------------------------
# Registered models (constants mirror yolo.py:154-299)
# ---------------------------------------------------------------------------

@register_yolo
class YOLOv4(YOLOModel):
    NUM_CLASSES = 2
    LETTERBOX = False
    NEW_COORDS = False
    INPUT_SHAPE = (3, 512, 512)
    LAYER_FACTORS = [8, 16, 32]
    SCALES = [1.2, 1.1, 1.05]
    ANCHORS = [[11, 22, 24, 60, 37, 116],
               [54, 186, 69, 268, 89, 369],
               [126, 491, 194, 314, 278, 520]]

    @classmethod
    def build(cls):
        return YOLOv4Net(num_classes=cls.NUM_CLASSES)


class _ScaledBase(YOLOModel):
    LETTERBOX = True
    NEW_COORDS = True
    ACT = 'mish'
    WIDTH = 32
    DEPTHS = (1, 3, 15, 15, 7)

    @classmethod
    def build(cls):
        return ScaledYOLOv4Net(num_classes=cls.NUM_CLASSES,
                               anchors_per_head=len(cls.ANCHORS[0]) // 2,
                               act=cls.ACT, width=cls.WIDTH,
                               depths=cls.DEPTHS,
                               num_heads=len(cls.LAYER_FACTORS))


_CSP_ANCHORS = [[12, 16, 19, 36, 40, 28],
                [36, 75, 76, 55, 72, 146],
                [142, 110, 192, 243, 459, 401]]


@register_yolo
class YOLOv4CSP(_ScaledBase):
    NUM_CLASSES = 1
    INPUT_SHAPE = (3, 640, 640)
    LAYER_FACTORS = [8, 16, 32]
    SCALES = [2.0, 2.0, 2.0]
    ANCHORS = _CSP_ANCHORS


@register_yolo
class YOLOv4xMish(_ScaledBase):
    NUM_CLASSES = 1
    INPUT_SHAPE = (3, 640, 640)
    LAYER_FACTORS = [8, 16, 32]
    SCALES = [2.0, 2.0, 2.0]
    ANCHORS = _CSP_ANCHORS
    WIDTH = 40
    DEPTHS = (1, 3, 11, 11, 5)


@register_yolo
class YOLOv4CSPSwish(_ScaledBase):
    NUM_CLASSES = 1
    INPUT_SHAPE = (3, 640, 640)
    LAYER_FACTORS = [8, 16, 32]
    SCALES = [2.0, 2.0, 2.0]
    ANCHORS = _CSP_ANCHORS
    ACT = 'swish'


@register_yolo
class YOLOv4CSPxSwish(_ScaledBase):
    NUM_CLASSES = 1
    INPUT_SHAPE = (3, 640, 640)
    LAYER_FACTORS = [8, 16, 32]
    SCALES = [2.0, 2.0, 2.0]
    ANCHORS = _CSP_ANCHORS
    ACT = 'swish'
    WIDTH = 40
    DEPTHS = (1, 3, 11, 11, 5)


@register_yolo
class YOLOv4P5(_ScaledBase):
    NUM_CLASSES = 1
    INPUT_SHAPE = (3, 896, 896)
    LAYER_FACTORS = [8, 16, 32]
    SCALES = [2.0, 2.0, 2.0]
    ANCHORS = [[13, 17, 31, 25, 24, 51, 61, 45],
               [48, 102, 119, 96, 97, 189, 217, 184],
               [171, 384, 324, 451, 616, 618, 800, 800]]


@register_yolo
class YOLOv4P6(_ScaledBase):
    NUM_CLASSES = 1
    INPUT_SHAPE = (3, 1280, 1280)
    LAYER_FACTORS = [8, 16, 32, 64]
    SCALES = [2.0, 2.0, 2.0, 2.0]
    ANCHORS = [[13, 17, 31, 25, 24, 51, 61, 45],
               [61, 45, 48, 102, 119, 96, 97, 189],
               [97, 189, 217, 184, 171, 384, 324, 451],
               [324, 451, 545, 357, 616, 618, 1024, 1024]]


@register_yolo
class YOLOv4Tiny(YOLOModel):
    NUM_CLASSES = 1
    LETTERBOX = False
    NEW_COORDS = False
    INPUT_SHAPE = (3, 416, 416)
    LAYER_FACTORS = [32, 16]
    SCALES = [1.05, 1.05]
    ANCHORS = [[81, 82, 135, 169, 344, 319],
               [23, 27, 37, 58, 81, 82]]

    @classmethod
    def build(cls):
        return TinyNet(num_classes=cls.NUM_CLASSES, csp=True)


@register_yolo
class YOLOv3(YOLOModel):
    NUM_CLASSES = 1
    LETTERBOX = False
    NEW_COORDS = False
    INPUT_SHAPE = (3, 416, 416)
    LAYER_FACTORS = [32, 16, 8]
    SCALES = [1.0, 1.0, 1.0]
    ANCHORS = [[116, 90, 156, 198, 373, 326],
               [30, 61, 62, 45, 59, 119],
               [10, 13, 16, 30, 33, 23]]

    @classmethod
    def build(cls):
        return YOLOv3Net(num_classes=cls.NUM_CLASSES)


@register_yolo
class YOLOv3SPP(YOLOModel):
    NUM_CLASSES = 1
    LETTERBOX = False
    NEW_COORDS = False
    INPUT_SHAPE = (3, 608, 608)
    LAYER_FACTORS = [32, 16, 8]
    SCALES = [1.0, 1.0, 1.0]
    ANCHORS = [[116, 90, 156, 198, 373, 326],
               [30, 61, 62, 45, 59, 119],
               [10, 13, 16, 30, 33, 23]]

    @classmethod
    def build(cls):
        return YOLOv3Net(num_classes=cls.NUM_CLASSES, spp=True)


@register_yolo
class YOLOv3Tiny(YOLOModel):
    NUM_CLASSES = 1
    LETTERBOX = False
    NEW_COORDS = False
    INPUT_SHAPE = (3, 416, 416)
    LAYER_FACTORS = [32, 16]
    SCALES = [1.0, 1.0]
    ANCHORS = [[81, 82, 135, 169, 344, 319],
               [10, 14, 23, 27, 37, 58]]

    @classmethod
    def build(cls):
        return TinyNet(num_classes=cls.NUM_CLASSES, csp=False)
