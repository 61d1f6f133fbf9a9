"""Darknet cfg parser / interpreter / weight-loader tests.

Exercises the layer set the reference's yolo2onnx.py supports: conv (+bn,
activations), route (+groups), shortcut, upsample, maxpool, yolo.
"""
import numpy as np
import pytest

TINY_CFG = """
[net]
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=mish

[route]
layers=-1
groups=2
group_id=1

[convolutional]
batch_normalize=1
filters=8
size=1
stride=1
pad=1
activation=leaky

[shortcut]
from=-2
activation=linear

[convolutional]
filters=18
size=1
stride=1
pad=1
activation=linear

[yolo]
mask=0,1,2
anchors=10,14, 23,27, 37,58, 81,82, 135,169, 344,319
classes=1
scale_x_y=1.05

[route]
layers=-3

[upsample]
stride=2

[maxpool]
size=2
stride=2

[convolutional]
filters=18
size=1
stride=1
pad=1
activation=linear

[yolo]
mask=3,4,5
anchors=10,14, 23,27, 37,58, 81,82, 135,169, 344,319
classes=1
scale_x_y=1.0
"""


def test_parse_cfg():
    from fastmot_tpu.models.darknet import parse_cfg, yolo_meta_from_cfg
    secs = parse_cfg(TINY_CFG)
    assert secs[0]['type'] == 'net'
    assert secs[1]['filters'] == 8
    meta = yolo_meta_from_cfg(secs)
    assert meta['num_classes'] == 1
    assert meta['input_shape'] == (3, 64, 64)
    assert meta['anchors'][0] == [10, 14, 23, 27, 37, 58]
    assert meta['anchors'][1] == [81, 82, 135, 169, 344, 319]
    assert meta['scales'] == [1.05, 1.0]


def test_module_shapes_and_weight_loading(tmp_path, rng):
    import jax
    import jax.numpy as jnp
    from fastmot_tpu.models.darknet import (
        DarknetModule, _hashable, load_darknet_weights, parse_cfg)

    secs = parse_cfg(TINY_CFG)
    module = DarknetModule(sections=tuple(_hashable(s) for s in secs))
    x = jnp.zeros((1, 64, 64, 3))
    params = module.init(jax.random.PRNGKey(0), x)
    heads = module.apply(params, x)
    assert len(heads) == 2
    assert heads[0].shape == (1, 16, 16, 18)   # stride 4 head
    assert heads[1].shape == (1, 16, 16, 18)   # upsampled then pooled

    # synthesize a darknet weights file with the right float count
    def conv_counts():
        total = 0
        prev_c = 3
        channels = []
        layers = [s for s in secs if s['type'] != 'net']
        for i, s in enumerate(layers):
            if s['type'] == 'convolutional':
                f, k = int(s['filters']), int(s.get('size', 1))
                bn = int(s.get('batch_normalize', 0))
                total += 4 * f if bn else f
                total += f * prev_c * k * k
                prev_c = f
            elif s['type'] == 'route':
                ls = s['layers'] if isinstance(s['layers'], list) else [s['layers']]
                idxs = [i + l if l < 0 else l for l in ls]
                prev_c = sum(channels[j] for j in idxs) // int(s.get('groups', 1))
            channels.append(prev_c)
        return total

    n = conv_counts()
    header = np.zeros(5, np.int32)
    data = rng.normal(size=n).astype(np.float32)
    wfile = tmp_path / 'tiny.weights'
    wfile.write_bytes(header.tobytes() + data.tobytes())

    new_params, hdr = load_darknet_weights(secs, params, wfile)
    # loaded kernel values actually differ from the random init
    k0 = np.asarray(new_params['params']['conv0']['kernel'])
    assert k0.shape == (3, 3, 3, 8)
    assert not np.allclose(k0, np.asarray(params['params']['conv0']['kernel']))
    # the loaded module still runs
    heads2 = module.apply(new_params, x)
    assert heads2[0].shape == heads[0].shape
    # first conv bn beta comes from the first 8 floats of the file
    np.testing.assert_allclose(
        np.asarray(new_params['params']['bn0']['bias']), data[:8])


def test_conv_math_matches_numpy(rng):
    """A single 1x1 linear conv through the interpreter equals numpy."""
    import jax
    import jax.numpy as jnp
    from fastmot_tpu.models.darknet import DarknetModule, _hashable, parse_cfg

    cfg = """
[net]
width=8
height=8
channels=3

[convolutional]
filters=4
size=1
stride=1
pad=1
activation=linear

[yolo]
mask=0
anchors=10,14
classes=-1
"""
    secs = parse_cfg(cfg)
    # 'highest' pins float32 conv passes so the oracle comparison is exact
    # on TPU (default bf16 matmul precision fails the 1e-5 tolerance)
    module = DarknetModule(sections=tuple(_hashable(s) for s in secs),
                           precision='highest')
    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    params = module.init(jax.random.PRNGKey(1), jnp.asarray(x))
    heads = module.apply(params, jnp.asarray(x))
    k = np.asarray(params['params']['conv0']['kernel'])[0, 0]  # [3, 4]
    b = np.asarray(params['params']['conv0']['bias'])
    want = x @ k + b
    np.testing.assert_allclose(np.asarray(heads[0]), want, rtol=1e-5,
                               atol=1e-5)


V4STEM_CFG = """
[net]
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=mish

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=mish

[convolutional]
filters=18
size=1
stride=1
pad=1
activation=linear

[yolo]
mask=0,1,2
anchors=10,14, 23,27, 37,58, 81,82, 135,169, 344,319
classes=1
"""


@pytest.mark.parametrize('cfg_text', [V4STEM_CFG, TINY_CFG],
                         ids=['s1s2_stem', 's2_stem'])
def test_s2d_stem_matches_plain_path(cfg_text, rng):
    """The space-to-depth stem fold is an exact re-expression: identical
    params (same tree, so .weights loading is unaffected), identical
    outputs vs the plain conv path at float32 precision."""
    import jax
    import jax.numpy as jnp
    from fastmot_tpu.models.darknet import DarknetModule, _hashable, \
        parse_cfg

    secs = tuple(_hashable(s) for s in parse_cfg(cfg_text))
    folded = DarknetModule(sections=secs, precision='highest')
    plain = DarknetModule(sections=secs, precision='highest',
                          s2d_stem=False)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    params = plain.init(jax.random.PRNGKey(3), x)
    # same parameter tree: the folded module must accept the plain one's
    chex = jax.tree_util.tree_structure(params)
    assert jax.tree_util.tree_structure(folded.init(
        jax.random.PRNGKey(3), x)) == chex
    out_plain = plain.apply(params, x)
    out_folded = folded.apply(params, x)
    assert len(out_plain) == len(out_folded)
    for a, b in zip(out_plain, out_folded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
