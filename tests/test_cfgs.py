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


SCALED = ['YOLOv4CSP', 'YOLOv4xMish', 'YOLOv4CSPSwish', 'YOLOv4CSPxSwish',
          'YOLOv4P5', 'YOLOv4P6']


def test_scaled_weight_counts_match_paper():
    """Parameter totals of the generated Scaled-YOLOv4 cfgs at COCO width
    reproduce the Scaled-YOLOv4 paper (CVPR 2021) table: CSP 52.9M,
    P5 70.8M, P6 127.6M (exact values pinned as regressions)."""
    A3 = list(range(1, 19))
    A4 = list(range(1, 25))
    A4x4 = list(range(1, 33))
    csp = cfgs.scaled_yolov4_cfg(80, 640, 640, A3, 3,
                                 (64, 128, 256, 512, 1024), (1, 2, 8, 8, 4))
    p5 = cfgs.scaled_yolov4_cfg(80, 896, 896, A4, 3,
                                (64, 128, 256, 512, 1024), (1, 3, 15, 15, 7),
                                first_plain=False, neck_pairs=3)
    p6 = cfgs.scaled_yolov4_cfg(80, 1280, 1280, A4x4, 4,
                                (64, 128, 256, 512, 1024, 1024),
                                (1, 3, 15, 15, 7, 7),
                                first_plain=False, neck_pairs=3)
    assert count_weight_floats(parse_cfg(csp)) == 52_981_597   # ~52.9M
    assert count_weight_floats(parse_cfg(p5)) == 70_912_860    # ~70.8M
    assert count_weight_floats(parse_cfg(p6)) == 127_708_336   # ~127.6M


def test_scaled_zoo_metadata_matches_cfg():
    from fastmot_tpu.models import yolo as Y
    from fastmot_tpu.models.darknet import yolo_meta_from_cfg

    for name in SCALED:
        cls = Y.YOLOModel.get_model(name)
        module = cls.build()
        meta = yolo_meta_from_cfg(module.sections)
        per_head = [[int(a) for a in head] for head in meta['anchors']]
        assert per_head == [list(a) for a in cls.ANCHORS], name
        assert meta['scales'] == [float(s) for s in cls.SCALES], name
        assert meta['num_classes'] == cls.NUM_CLASSES, name
        assert meta['new_coords'] is True, name
        c, h, w = meta['input_shape']
        assert (c, h, w) == tuple(cls.INPUT_SHAPE), name


@pytest.mark.parametrize('name', [
    'YOLOv4CSP',
    pytest.param('YOLOv4P6', marks=pytest.mark.slow),
])
def test_scaled_weights_roundtrip(name, tmp_path):
    """Strict .weights round trip for the Scaled family: a file with the
    cfg's exact float layout loads fully (the loader asserts complete
    consumption), and the loaded net runs with heads at the registered
    strides in [0, 1] (logistic head convs, new_coords)."""
    import jax
    import jax.numpy as jnp
    from fastmot_tpu.models import yolo as Y
    from fastmot_tpu.models.darknet import load_darknet_weights

    cls = Y.YOLOModel.get_model(name)
    module = cls.build()
    h = w = 128
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    params = module.init(jax.random.PRNGKey(0), x)

    n = count_weight_floats(module.sections)
    rng = np.random.default_rng(1)
    path = tmp_path / f'{name}.weights'
    with open(path, 'wb') as f:
        f.write(np.array([0, 2, 5, 0, 0], np.int32).tobytes())
        # small positive variances keep BN finite
        f.write((rng.uniform(0.01, 1.0, n).astype(np.float32)).tobytes())
    loaded, header = load_darknet_weights(module.sections, params, path)
    assert header[1] == 2

    heads = module.apply(loaded, x)
    strides = [h // hd.shape[1] for hd in heads]
    assert strides == list(cls.LAYER_FACTORS), (name, strides)
    pairs = len(cls.ANCHORS[0]) // 2
    no = pairs * (5 + cls.NUM_CLASSES)
    for hd in heads:
        assert hd.shape[-1] == no, name
        vals = np.asarray(hd)
        assert np.all(vals >= 0) and np.all(vals <= 1), \
            'logistic head output expected in [0, 1]'
