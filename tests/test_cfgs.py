"""Generated Darknet cfgs: structural fidelity to the upstream models.

The strongest available offline check: the exact float count a released
``.weights`` file must contain is a function of the full layer sequence
(every conv's in/out channels through every route/shortcut), so matching
the known upstream file sizes pins the generated structure to the real
cfgs. Known sizes: yolov4.weights 257,717,640 B; yolov3.weights
248,007,048 B; yolov4-tiny.weights and yolov3-tiny.weights as below
(size = 20-byte header + 4 bytes/float).
"""
import numpy as np
import pytest

from fastmot_tpu.models import cfgs
from fastmot_tpu.models.darknet import count_weight_floats, parse_cfg

A18 = list(range(1, 19))
A12 = list(range(1, 13))


@pytest.mark.parametrize('name,text,floats', [
    ('yolov4', cfgs.yolov4_cfg(80, 608, 608, A18, [1.2, 1.1, 1.05]),
     64_429_405),
    ('yolov3', cfgs.yolov3_cfg(80, 416, 416, A18), 62_001_757),
    ('yolov4-tiny', cfgs.yolov4_tiny_cfg(80, 416, 416, A12, [1.05, 1.05]),
     6_062_814),
    ('yolov3-tiny', cfgs.yolov3_tiny_cfg(80, 416, 416, A12), 8_858_734),
])
def test_upstream_weight_counts(name, text, floats):
    assert count_weight_floats(parse_cfg(text)) == floats


def test_spp_adds_one_fuse_conv():
    """yolov3-spp = yolov3 + maxpool pyramid + one 2048->512 1x1 conv."""
    base = count_weight_floats(parse_cfg(cfgs.yolov3_cfg(80, 608, 608, A18)))
    spp = count_weight_floats(
        parse_cfg(cfgs.yolov3_cfg(80, 608, 608, A18, spp=True)))
    assert spp - base == 2048 * 512 + 4 * 512


def test_zoo_metadata_matches_cfg():
    """Every darknet-backed zoo model's cfg decodes to its constants."""
    from fastmot_tpu.models import yolo as Y
    from fastmot_tpu.models.darknet import yolo_meta_from_cfg

    for name in ['YOLOv4', 'YOLOv4Tiny', 'YOLOv3', 'YOLOv3SPP',
                 'YOLOv3Tiny']:
        cls = Y.YOLOModel.get_model(name)
        module = cls.build()
        meta = yolo_meta_from_cfg(module.sections)
        per_head = [[int(a) for a in head] for head in meta['anchors']]
        assert per_head == [list(a) for a in cls.ANCHORS], name
        assert meta['scales'] == [float(s) for s in cls.SCALES], name
        assert meta['num_classes'] == cls.NUM_CLASSES, name
        assert meta['new_coords'] == cls.NEW_COORDS, name
        c, h, w = meta['input_shape']
        assert (c, h, w) == tuple(cls.INPUT_SHAPE), name


def test_zoo_head_strides():
    """Built modules produce heads at the registered LAYER_FACTORS."""
    import jax
    import jax.numpy as jnp
    from fastmot_tpu.models import yolo as Y

    for name in ['YOLOv4Tiny', 'YOLOv3Tiny']:   # cheap representatives
        cls = Y.YOLOModel.get_model(name)
        module = cls.build()
        h = w = 64
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        params = module.init(jax.random.PRNGKey(0), x)
        heads = module.apply(params, x)
        strides = [h // hd.shape[1] for hd in heads]
        assert strides == list(cls.LAYER_FACTORS), (name, strides)
        no = 3 * (5 + cls.NUM_CLASSES)
        assert all(hd.shape[-1] == no for hd in heads), name
        assert all(hd.dtype == jnp.float32 for hd in heads), name
