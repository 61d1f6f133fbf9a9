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

All 10 registered models are darknet-cfg-backed (models/cfgs.py generates
the upstream layer sequences; models/darknet.py interprets them in
bf16/NHWC Flax), so every model — YOLOv4, the Scaled family (csp / x-mish
/ csp-swish / csp-x-swish / p5 / p6), YOLOv3 (+SPP) and the tinies —
loads released `.weights` through the strict traversal-order loader.
Weights are random unless a converted .npz exists (see registry.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .registry import YOLOModel, register_yolo


def _darknet_build(cfg_text: str):
    """Build a DarknetModule from generated cfg text (bf16 conv compute)."""
    from .darknet import DarknetModule, _hashable, parse_cfg
    sections = parse_cfg(cfg_text)
    return DarknetModule(sections=tuple(_hashable(s) for s in sections),
                         dtype=jnp.bfloat16)


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
        """Darknet-backed: the generated yolov4.cfg layer sequence, so
        CrowdHuman yolov4.weights load natively (scripts/convert_weights.py,
        reference scripts/yolo2onnx.py:865-919 documents the same layout)."""
        from .cfgs import yolov4_cfg
        c, h, w = cls.INPUT_SHAPE
        return _darknet_build(yolov4_cfg(
            cls.NUM_CLASSES, h, w,
            [a for head in cls.ANCHORS for a in head], cls.SCALES))


class _ScaledBase(YOLOModel):
    """Scaled-YOLOv4 family base: darknet-cfg-backed like YOLOv4.build,
    so released `.weights` load through the strict traversal-order
    loader (reference registrations yolo.py:171-299; generator notes in
    models/cfgs.py)."""
    LETTERBOX = True
    NEW_COORDS = True
    ACT = 'mish'
    STEM = 32
    WIDTHS = (64, 128, 256, 512, 1024)
    DEPTHS = (1, 2, 8, 8, 4)
    FIRST_PLAIN = True
    NECK_PAIRS = 2

    @classmethod
    def build(cls):
        from .cfgs import scaled_yolov4_cfg
        c, h, w = cls.INPUT_SHAPE
        flat = [a for head in cls.ANCHORS for a in head]
        return _darknet_build(scaled_yolov4_cfg(
            cls.NUM_CLASSES, h, w, flat, len(cls.LAYER_FACTORS),
            cls.WIDTHS, cls.DEPTHS, act=cls.ACT, stem=cls.STEM,
            first_plain=cls.FIRST_PLAIN, neck_pairs=cls.NECK_PAIRS))


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
    STEM = 40
    WIDTHS = (80, 160, 320, 640, 1280)
    DEPTHS = (1, 3, 11, 11, 5)
    NECK_PAIRS = 3


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
    STEM = 40
    WIDTHS = (80, 160, 320, 640, 1280)
    DEPTHS = (1, 3, 11, 11, 5)
    NECK_PAIRS = 3


@register_yolo
class YOLOv4P5(_ScaledBase):
    NUM_CLASSES = 1
    INPUT_SHAPE = (3, 896, 896)
    LAYER_FACTORS = [8, 16, 32]
    SCALES = [2.0, 2.0, 2.0]
    ANCHORS = [[13, 17, 31, 25, 24, 51, 61, 45],
               [48, 102, 119, 96, 97, 189, 217, 184],
               [171, 384, 324, 451, 616, 618, 800, 800]]
    DEPTHS = (1, 3, 15, 15, 7)
    FIRST_PLAIN = False
    NECK_PAIRS = 3


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
    WIDTHS = (64, 128, 256, 512, 1024, 1024)
    DEPTHS = (1, 3, 15, 15, 7, 7)
    FIRST_PLAIN = False
    NECK_PAIRS = 3


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

    # upstream yolov4-tiny.cfg anchor table; masks (3,4,5) and (1,2,3)
    # reproduce the per-head ANCHORS above, (81, 82) shared by both heads
    FULL_ANCHORS = [10, 14, 23, 27, 37, 58, 81, 82, 135, 169, 344, 319]

    @classmethod
    def build(cls):
        from .cfgs import yolov4_tiny_cfg
        c, h, w = cls.INPUT_SHAPE
        return _darknet_build(yolov4_tiny_cfg(
            cls.NUM_CLASSES, h, w, cls.FULL_ANCHORS, cls.SCALES))


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
        from .cfgs import yolov3_cfg
        c, h, w = cls.INPUT_SHAPE
        # heads come stride 32, 16, 8 (LAYER_FACTORS order), so the flat
        # anchor table is the per-head lists reversed
        flat = [a for head in reversed(cls.ANCHORS) for a in head]
        return _darknet_build(yolov3_cfg(cls.NUM_CLASSES, h, w, flat))


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
        from .cfgs import yolov3_cfg
        c, h, w = cls.INPUT_SHAPE
        flat = [a for head in reversed(cls.ANCHORS) for a in head]
        return _darknet_build(yolov3_cfg(cls.NUM_CLASSES, h, w, flat,
                                         spp=True))


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
        from .cfgs import yolov3_tiny_cfg
        c, h, w = cls.INPUT_SHAPE
        flat = [a for head in reversed(cls.ANCHORS) for a in head]
        return _darknet_build(yolov3_tiny_cfg(cls.NUM_CLASSES, h, w, flat))
