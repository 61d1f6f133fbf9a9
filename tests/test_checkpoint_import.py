"""ONNX / TF-frozen-graph checkpoint import round trips.

Fixture files are synthesized with the wire-format encoders from
test_protoparse (the bytes onnx/tensorflow would write), named exactly
the way the reference's released checkpoints name their tensors
(yolo2onnx.py ordinal scheme; TF Object Detection API variable names),
so the full path protobuf -> mapping -> npz -> strict load is exercised
without the real (undownloadable) files.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastmot_tpu.models import registry
from fastmot_tpu.models.registry import load_npz
from tests.test_protoparse import (f_bytes, f_str, f_varint, graphdef,
                                   onnx_model, onnx_tensor, tf_node,
                                   tf_tensor)


def _flat_paths(params):
    out = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        out['/'.join(str(getattr(k, 'key', k)) for k in kp)] = \
            np.asarray(leaf)
    return out


# --- YOLO from yolo2onnx-style ONNX ---------------------------------------

def _yolo_onnx_bytes(sections, params, rng, drop=None, extra=None):
    """Encode params as the ONNX initializer set yolo2onnx would emit."""
    layers = [s for s in sections if s['type'] != 'net']
    p = jax.device_get(params)['params']
    bs = jax.device_get(params).get('batch_stats', {})
    tensors = []
    for i, sec in enumerate(layers):
        if sec['type'] != 'convolutional':
            continue
        base = f'{i + 1:03d}_convolutional'
        hwio = np.asarray(p[f'conv{i}']['kernel'], np.float32)
        oihw = np.transpose(hwio, (3, 2, 0, 1)).copy()
        tensors.append((f'{base}_conv_weights', oihw))
        if int(sec.get('batch_normalize', 0)):
            tensors.append((f'{base}_bn_scale',
                            np.asarray(p[f'bn{i}']['scale'], np.float32)))
            tensors.append((f'{base}_bn_bias',
                            np.asarray(p[f'bn{i}']['bias'], np.float32)))
            tensors.append((f'{base}_bn_mean',
                            np.asarray(bs[f'bn{i}']['mean'], np.float32)))
            tensors.append((f'{base}_bn_var',
                            np.asarray(bs[f'bn{i}']['var'], np.float32)))
        else:
            tensors.append((f'{base}_conv_bias',
                            np.asarray(p[f'conv{i}']['bias'], np.float32)))
    if drop:
        tensors = [(n, a) for n, a in tensors if n != drop]
    if extra:
        tensors.append(extra)
    return onnx_model([onnx_tensor(n, a) for n, a in tensors])


@pytest.fixture(scope='module')
def tiny_zoo():
    cls = registry.YOLOModel.get_model('YOLOv4Tiny')
    module = cls.build()
    params = module.init(jax.random.PRNGKey(3),
                         jnp.zeros((1, 64, 64, 3), jnp.float32))
    return module, params


def test_yolo_onnx_roundtrip(tiny_zoo, tmp_path):
    from fastmot_tpu.models.onnx_import import yolo_params_from_onnx

    module, params = tiny_zoo
    rng = np.random.default_rng(0)
    f = tmp_path / 'yolo.onnx'
    f.write_bytes(_yolo_onnx_bytes(module.sections, params, rng))
    out = yolo_params_from_onnx(module.sections, params, f)
    want = _flat_paths(params)
    got = _flat_paths(out)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_yolo_onnx_missing_tensor_raises(tiny_zoo, tmp_path):
    from fastmot_tpu.models.onnx_import import yolo_params_from_onnx

    module, params = tiny_zoo
    rng = np.random.default_rng(0)
    f = tmp_path / 'bad.onnx'
    f.write_bytes(_yolo_onnx_bytes(module.sections, params, rng,
                                   drop='001_convolutional_conv_weights'))
    with pytest.raises(KeyError, match='001_convolutional_conv_weights'):
        yolo_params_from_onnx(module.sections, params, f)


def test_yolo_onnx_leftover_tensor_raises(tiny_zoo, tmp_path):
    from fastmot_tpu.models.onnx_import import yolo_params_from_onnx

    module, params = tiny_zoo
    rng = np.random.default_rng(0)
    extra = ('999_convolutional_conv_weights',
             np.zeros((4, 4, 1, 1), np.float32))
    f = tmp_path / 'extra.onnx'
    f.write_bytes(_yolo_onnx_bytes(module.sections, params, rng,
                                   extra=extra))
    with pytest.raises(ValueError, match='not consumed'):
        yolo_params_from_onnx(module.sections, params, f)


# --- OSNet from torch-exported ONNX ---------------------------------------

def test_osnet_onnx_state_dict_extraction(tmp_path):
    """torch.onnx keeps state_dict keys; numeric aux initializers are
    filtered out."""
    from fastmot_tpu.models.onnx_import import torch_state_dict_from_onnx

    w = np.ones((8, 3, 1, 1), np.float32)
    data = onnx_model([
        onnx_tensor('conv1.conv.weight', w),
        onnx_tensor('fc.0.weight', np.ones((512, 64), np.float32)),
        onnx_tensor('123', np.zeros(2, np.float32)),   # folded constant
    ])
    f = tmp_path / 'osnet.onnx'
    f.write_bytes(data)
    state = torch_state_dict_from_onnx(f)
    assert set(state) == {'conv1.conv.weight', 'fc.0.weight'}
    np.testing.assert_array_equal(state['conv1.conv.weight'], w)


# --- SSD from TF frozen graph ---------------------------------------------

def _tf_names_mobilenet_v1():
    pre = 'FeatureExtractor/MobilenetV1'
    layers = [(f'{pre}/Conv2d_0', 'conv')]
    for i in range(1, 14):
        layers.append((f'{pre}/Conv2d_{i}_depthwise', 'depthwise'))
        layers.append((f'{pre}/Conv2d_{i}_pointwise', 'conv'))
    return pre, layers


def _tf_names_mobilenet_v2():
    pre = 'FeatureExtractor/MobilenetV2'
    layers = [(f'{pre}/Conv', 'conv')]
    for i in range(17):
        blk = f'{pre}/expanded_conv' + (f'_{i}' if i else '')
        if i:
            layers.append((f'{blk}/expand', 'conv'))
        layers.append((f'{blk}/depthwise', 'depthwise'))
        layers.append((f'{blk}/project', 'conv'))
    layers.append((f'{pre}/Conv_1', 'conv'))
    return pre, layers


def _ssd_consts(model_name, params):
    """Synthesize the frozen graph's Const dict from a live param tree by
    inverting the converter's transforms — names follow the TF OD API
    scheme the real .pb files use."""
    from fastmot_tpu.models.ssd_convert import convert_frozen_graph  # noqa

    flat = _flat_paths(params)
    cls = registry.SSDModel.get_model(model_name)
    pre, layers = (_tf_names_mobilenet_v1() if 'V1' in model_name
                   else _tf_names_mobilenet_v2())
    bb = ('MobileNetV1Backbone_0' if 'V1' in model_name
          else 'MobileNetV2Backbone_0')

    # walk the flax tree's conv/bn leaves in the same structural order
    consts = {}

    def put_conv(tf_layer, kind, kpath, bn_base):
        k = flat[kpath]
        if kind == 'depthwise':
            consts[f'{tf_layer}/depthwise_weights'] = \
                np.transpose(k, (0, 1, 3, 2)).copy()
        else:
            consts[f'{tf_layer}/weights'] = k
        for tf, ours, top in (('gamma', 'scale', 'params'),
                              ('beta', 'bias', 'params'),
                              ('moving_mean', 'mean', 'batch_stats'),
                              ('moving_variance', 'var', 'batch_stats')):
            consts[f'{tf_layer}/BatchNorm/{tf}'] = \
                flat[f'{top}/{bn_base}/BatchNorm_0/{ours}']

    if 'V1' in model_name:
        for j, (tf_layer, kind) in enumerate(layers):
            mod = f'{bb}/ConvBNReLU6_{j}'
            kp = (f'params/{mod}/DepthwiseConv3x3_0/kernel'
                  if kind == 'depthwise' else f'params/{mod}/Conv_0/kernel')
            put_conv(tf_layer, kind, kp, mod)
    else:
        li = iter(layers)
        put_conv(*next(li), f'params/{bb}/ConvBNReLU6_0/Conv_0/kernel',
                 f'{bb}/ConvBNReLU6_0')
        for i in range(17):
            blk = f'{bb}/InvertedResidual_{i}'
            if i:
                put_conv(*next(li),
                         f'params/{blk}/ConvBNReLU6_0/Conv_0/kernel',
                         f'{blk}/ConvBNReLU6_0')
                dw = f'{blk}/ConvBNReLU6_1'
            else:
                dw = f'{blk}/ConvBNReLU6_0'
            put_conv(*next(li),
                     f'params/{dw}/DepthwiseConv3x3_0/kernel', dw)
            put_conv(*next(li), f'params/{blk}/Conv_0/kernel', blk)
        put_conv(*next(li), f'params/{bb}/ConvBNReLU6_1/Conv_0/kernel',
                 f'{bb}/ConvBNReLU6_1')

    # extras (feature_map_generators naming) + box predictors
    base = ('Conv2d_13_pointwise' if 'V1' in model_name else 'layer_19')
    depths = [(256, 512), (128, 256), (128, 256), (64, 128)]
    for j, (d1, d3) in enumerate(depths):
        n = j + 2
        one = f'{pre}/{base}_1_Conv2d_{n}_1x1_{d1}'
        three = f'{pre}/{base}_2_Conv2d_{n}_3x3_s2_{d3}'
        m1 = f'SSDHead_0/ConvBNReLU6_{2 * j}'
        m3 = f'SSDHead_0/ConvBNReLU6_{2 * j + 1}'
        put_conv(one, 'conv', f'params/{m1}/Conv_0/kernel', m1)
        put_conv(three, 'conv', f'params/{m3}/Conv_0/kernel', m3)
    for i in range(6):
        for tf_name, ci in (('BoxEncodingPredictor', 2 * i),
                            ('ClassPredictor', 2 * i + 1)):
            consts[f'BoxPredictor_{i}/{tf_name}/weights'] = \
                flat[f'params/SSDHead_0/Conv_{ci}/kernel']
            consts[f'BoxPredictor_{i}/{tf_name}/biases'] = \
                flat[f'params/SSDHead_0/Conv_{ci}/bias']
    return consts


@pytest.mark.parametrize('name', [
    'SSDMobileNetV1',
    pytest.param('SSDMobileNetV2', marks=pytest.mark.slow),
])
def test_ssd_frozen_graph_roundtrip(name, tmp_path):
    from fastmot_tpu.models.ssd_convert import convert_frozen_graph

    cls = registry.SSDModel.get_model(name)
    module = cls.build()
    params = module.init(jax.random.PRNGKey(1),
                         jnp.zeros((1, 300, 300, 3), jnp.float32))
    consts = _ssd_consts(name, params)
    flat = convert_frozen_graph(consts, params, cls.BACKBONE)
    # complete coverage of the model tree
    want = _flat_paths(params)
    assert set(flat) == set(want), (
        sorted(set(want) - set(flat))[:5], sorted(set(flat) - set(want))[:5])
    path = tmp_path / f'{name}.npz'
    np.savez(path, **flat)
    loaded = load_npz(params, path, strict=True)
    got = _flat_paths(loaded)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_ssd_frozen_graph_missing_raises():
    from fastmot_tpu.models.ssd_convert import convert_frozen_graph

    cls = registry.SSDModel.get_model('SSDMobileNetV1')
    module = cls.build()
    params = module.init(jax.random.PRNGKey(1),
                         jnp.zeros((1, 300, 300, 3), jnp.float32))
    consts = _ssd_consts('SSDMobileNetV1', params)
    consts.pop('FeatureExtractor/MobilenetV1/Conv2d_3_pointwise/weights')
    with pytest.raises(KeyError, match='Conv2d_3_pointwise'):
        convert_frozen_graph(consts, params, cls.BACKBONE)


def _inception_consts(params, with_gamma=True):
    """Synthesize ssd_inception_v2_coco.pb's Const dict from a live param
    tree by inverting the converter (TF slim layer names)."""
    from fastmot_tpu.models.ssd import INCEPTION_V2_BLOCKS

    flat = _flat_paths(params)
    bb = 'InceptionV2Backbone_0'
    pre = 'FeatureExtractor/InceptionV2'
    consts = {}

    def put(tf_layer, mod):
        consts[f'{tf_layer}/weights'] = flat[f'params/{mod}/Conv_0/kernel']
        for tf, ours, top in (('gamma', 'scale', 'params'),
                              ('beta', 'bias', 'params'),
                              ('moving_mean', 'mean', 'batch_stats'),
                              ('moving_variance', 'var', 'batch_stats')):
            if tf == 'gamma' and not with_gamma:
                continue
            consts[f'{tf_layer}/BatchNorm/{tf}'] = \
                flat[f'{top}/{mod}/BatchNorm_0/{ours}']

    # stem: extract the depthwise taps out of the dense [7,7,3,24] kernel
    dense = flat[f'params/{bb}/Conv2d_1a_7x7_depthwise/kernel']
    h, w, cin, cout = dense.shape
    mult = cout // cin
    dw = np.stack([dense[:, :, i, i * mult:(i + 1) * mult]
                   for i in range(cin)], axis=2)
    consts[f'{pre}/Conv2d_1a_7x7/depthwise_weights'] = dw
    pw = f'{bb}/Conv2d_1a_7x7_pointwise'
    consts[f'{pre}/Conv2d_1a_7x7/pointwise_weights'] = \
        flat[f'params/{pw}/Conv_0/kernel']
    for tf, ours, top in (('gamma', 'scale', 'params'),
                          ('beta', 'bias', 'params'),
                          ('moving_mean', 'mean', 'batch_stats'),
                          ('moving_variance', 'var', 'batch_stats')):
        if tf == 'gamma' and not with_gamma:
            continue
        consts[f'{pre}/Conv2d_1a_7x7/BatchNorm/{tf}'] = \
            flat[f'{top}/{pw}/BatchNorm_0/{ours}']
    put(f'{pre}/Conv2d_2b_1x1', f'{bb}/Conv2d_2b_1x1')
    put(f'{pre}/Conv2d_2c_3x3', f'{bb}/Conv2d_2c_3x3')
    for name, spec in INCEPTION_V2_BLOCKS:
        if spec.get('red'):
            branches = [('Branch_0', ['Conv2d_0a_1x1', 'Conv2d_1a_3x3']),
                        ('Branch_1', ['Conv2d_0a_1x1', 'Conv2d_0b_3x3',
                                      'Conv2d_1a_3x3'])]
        else:
            branches = [('Branch_0', ['Conv2d_0a_1x1']),
                        ('Branch_1', ['Conv2d_0a_1x1', 'Conv2d_0b_3x3']),
                        ('Branch_2', ['Conv2d_0a_1x1', 'Conv2d_0b_3x3',
                                      'Conv2d_0c_3x3']),
                        ('Branch_3', ['Conv2d_0b_1x1'])]
        for br, convs in branches:
            for cname in convs:
                put(f'{pre}/{name}/{br}/{cname}',
                    f'{bb}/{name}__{br}__{cname}')
    # extras (feature_map_generators) + predictors, Mixed_5c base name
    depths = [(256, 512), (128, 256), (128, 256), (64, 128)]
    for j, (d1, d3) in enumerate(depths):
        n = j + 2
        put(f'{pre}/Mixed_5c_1_Conv2d_{n}_1x1_{d1}',
            f'SSDHead_0/ConvBNReLU6_{2 * j}')
        put(f'{pre}/Mixed_5c_2_Conv2d_{n}_3x3_s2_{d3}',
            f'SSDHead_0/ConvBNReLU6_{2 * j + 1}')
    for i in range(6):
        for tf_name, ci in (('BoxEncodingPredictor', 2 * i),
                            ('ClassPredictor', 2 * i + 1)):
            consts[f'BoxPredictor_{i}/{tf_name}/weights'] = \
                flat[f'params/SSDHead_0/Conv_{ci}/kernel']
            consts[f'BoxPredictor_{i}/{tf_name}/biases'] = \
                flat[f'params/SSDHead_0/Conv_{ci}/bias']
    return consts


@pytest.mark.parametrize('with_gamma', [True, False])
def test_ssd_inception_frozen_graph_roundtrip(with_gamma, tmp_path):
    """Layer-exact InceptionV2 conversion (VERDICT r2 component 18):
    every model leaf covered from TF-slim-named Consts, the separable
    stem zero-embedded exactly, and slim scale=False trunks (no gamma)
    tolerated with identity scale."""
    from fastmot_tpu.models.ssd_convert import convert_frozen_graph

    cls = registry.SSDModel.get_model('SSDInceptionV2')
    module = cls.build()
    params = module.init(jax.random.PRNGKey(1),
                         jnp.zeros((1, 300, 300, 3), jnp.float32))
    consts = _inception_consts(params, with_gamma=with_gamma)
    flat = convert_frozen_graph(consts, params, cls.BACKBONE)
    want = _flat_paths(params)
    assert set(flat) == set(want), (
        sorted(set(want) - set(flat))[:5], sorted(set(flat) - set(want))[:5])
    # the stem depthwise dense embedding keeps cross-channel taps zero
    dense = flat['params/InceptionV2Backbone_0/Conv2d_1a_7x7_depthwise'
                 '/kernel']
    h, w, cin, cout = dense.shape
    mult = cout // cin
    for i in range(cin):
        for j in range(cin):
            if i != j:
                assert (dense[:, :, i, j * mult:(j + 1) * mult] == 0).all()
    if not with_gamma:
        g = flat['params/InceptionV2Backbone_0/Conv2d_2b_1x1/BatchNorm_0'
                 '/scale']
        assert (g == 1.0).all()
    path = tmp_path / 'SSDInceptionV2.npz'
    np.savez(path, **flat)
    loaded = load_npz(params, path, strict=True)
    got = _flat_paths(loaded)
    for k in want:
        np.testing.assert_array_equal(got[k], flat[k], err_msg=k)


def test_ssd_inception_missing_tensor_raises():
    from fastmot_tpu.models.ssd_convert import convert_frozen_graph

    cls = registry.SSDModel.get_model('SSDInceptionV2')
    module = cls.build()
    params = module.init(jax.random.PRNGKey(1),
                         jnp.zeros((1, 300, 300, 3), jnp.float32))
    consts = _inception_consts(params)
    consts.pop(
        'FeatureExtractor/InceptionV2/Mixed_4c/Branch_2/Conv2d_0b_3x3'
        '/weights')
    with pytest.raises(KeyError, match='Conv2d_0b_3x3'):
        convert_frozen_graph(consts, params, cls.BACKBONE)


def test_graphdef_const_roundtrip_through_wire(tmp_path):
    """End-to-end: encode a GraphDef wire file -> graphdef_constants ->
    arrays identical."""
    from fastmot_tpu.models.protoparse import graphdef_constants

    w = np.linspace(0, 1, 54, dtype=np.float32).reshape(3, 3, 2, 3)
    data = graphdef([
        tf_node('FeatureExtractor/MobilenetV1/Conv2d_0/weights', 'Const',
                tf_tensor(w)),
    ])
    f = tmp_path / 'g.pb'
    f.write_bytes(data)
    out = graphdef_constants(f.read_bytes())
    np.testing.assert_array_equal(
        out['FeatureExtractor/MobilenetV1/Conv2d_0/weights'], w)
