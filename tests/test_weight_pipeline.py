"""End-to-end pretrained-weight pipeline (VERDICT round-1 gap #2).

Covers: (a) npz round trip — init -> save -> strict load -> bit-identical
outputs for the flagship YOLOv4 and OSNet025; (b) loud failure on a
wrong/partial npz; (c) a synthetic Darknet .weights binary flowing
through the converter into the REGISTERED zoo model; (d) the torchreid
OSNet structural key map covering the full Flax tree with correct shapes.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmot_tpu.models import registry
from fastmot_tpu.models.registry import load_npz, save_npz


def _init_small(cls, hw=64):
    """Init a fully-convolutional zoo model at a small spatial size."""
    module = cls.build()
    c = cls.INPUT_SHAPE[0]
    x = jnp.zeros((1, hw, hw, c), jnp.float32)
    return module, module.init(jax.random.PRNGKey(0), x), x


@pytest.mark.parametrize('name', ['YOLOv4', 'YOLOv4Tiny'])
def test_yolo_npz_roundtrip(name, tmp_path):
    cls = registry.YOLOModel.get_model(name)
    module, params, x = _init_small(cls)
    path = tmp_path / f'{name}.npz'
    save_npz(params, path)
    fresh = module.init(jax.random.PRNGKey(7), x)   # different init
    loaded = load_npz(fresh, path, strict=True)
    a = module.apply(params, x)
    b = module.apply(loaded, x)
    for ha, hb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ha), np.asarray(hb))


def test_osnet_npz_roundtrip(tmp_path):
    cls = registry.ReIDModel.get_model('OSNet025')
    module = cls.build()
    x = jnp.ones((2, 64, 32, 3), jnp.float32)
    params = module.init(jax.random.PRNGKey(0), x)
    path = tmp_path / 'OSNet025.npz'
    save_npz(params, path)
    loaded = load_npz(module.init(jax.random.PRNGKey(5), x), path,
                      strict=True)
    np.testing.assert_array_equal(np.asarray(module.apply(params, x)),
                                  np.asarray(module.apply(loaded, x)))


def test_wrong_npz_errors_loudly(tmp_path):
    cls = registry.YOLOModel.get_model('YOLOv4Tiny')
    module, params, x = _init_small(cls)
    # wrong key names (the round-1 failure mode: DarknetModule keys vs a
    # differently-structured zoo) must raise, not silently no-op
    path = tmp_path / 'wrong.npz'
    np.savez(path, **{'params/nonexistent/kernel': np.zeros((3, 3, 3, 4))})
    with pytest.raises(ValueError, match='does not cover'):
        load_npz(params, path, strict=True)
    # shape mismatch on a real key must also raise
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        flat['/'.join(str(getattr(k, 'key', k)) for k in kp)] = \
            np.asarray(leaf)
    some_key = next(k for k in flat if k.endswith('/kernel'))
    flat[some_key] = np.zeros((1, 1, 1, 1), np.float32)
    path2 = tmp_path / 'badshape.npz'
    np.savez(path2, **flat)
    with pytest.raises(ValueError, match='shape mismatch'):
        load_npz(params, path2, strict=True)


def test_darknet_weights_into_registered_zoo(tmp_path):
    """A .weights binary (synthetic, correct layout) converts into an npz
    the REGISTERED model loads strictly — the full production path."""
    from fastmot_tpu.models.darknet import count_weight_floats, \
        load_darknet_weights

    cls = registry.YOLOModel.get_model('YOLOv4Tiny')
    module, params, x = _init_small(cls)
    n = count_weight_floats(module.sections)
    rng = np.random.default_rng(3)
    header = np.array([0, 2, 5, 0, 0], np.int32)
    data = (rng.standard_normal(n) * 0.01).astype(np.float32)
    wfile = tmp_path / 'synth.weights'
    wfile.write_bytes(header.tobytes() + data.tobytes())

    loaded, hdr = load_darknet_weights(module.sections, params, wfile)
    assert hdr[1] == 2
    path = tmp_path / 'YOLOv4Tiny.npz'
    save_npz(loaded, path)
    fresh = load_npz(module.init(jax.random.PRNGKey(9), x), path,
                     strict=True)
    # outputs must differ from random init and match the loaded params
    out_rand = module.apply(params, jnp.ones_like(x))
    out_a = module.apply(loaded, jnp.ones_like(x))
    out_b = module.apply(fresh, jnp.ones_like(x))
    np.testing.assert_array_equal(np.asarray(out_a[0]), np.asarray(out_b[0]))
    assert not np.allclose(np.asarray(out_a[0]), np.asarray(out_rand[0]))


def test_osnet_key_map_is_exhaustive():
    """The structural torchreid map covers EVERY OSNet025 parameter with
    the right post-transform shape — catches architecture drift."""
    from fastmot_tpu.models.osnet_convert import apply_transform, \
        osnet_key_map

    cls = registry.ReIDModel.get_model('OSNet025')
    module = cls.build()
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 32, 3), jnp.float32))
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        flat['/'.join(str(getattr(k, 'key', k)) for k in kp)] = leaf.shape
    pairs = osnet_key_map(cls.CHANNELS)
    mapped = {fp for _, fp, _ in pairs}
    assert mapped == set(flat), (
        sorted(set(flat) - mapped)[:5], sorted(mapped - set(flat))[:5])
    # inverse-transform shape consistency: a torch tensor of the implied
    # shape transforms to exactly the flax leaf shape
    inverse = {'conv': lambda s: (s[3], s[2], s[0], s[1]),
               'dense': lambda s: (s[1], s[0]),
               'gate': lambda s: (s[1], s[0], 1, 1),
               'copy': lambda s: s}
    for tkey, fpath, kind in pairs:
        tshape = inverse[kind](flat[fpath])
        arr = np.zeros(tshape, np.float32)
        assert apply_transform(arr, kind).shape == flat[fpath], (tkey, fpath)


def test_osnet_synthetic_checkpoint_conversion(tmp_path):
    """A synthetic torchreid-layout state_dict converts and strict-loads
    into OSNet025; a truncated checkpoint raises."""
    from fastmot_tpu.models.osnet_convert import convert_state_dict, \
        osnet_key_map

    cls = registry.ReIDModel.get_model('OSNet025')
    module = cls.build()
    x = jnp.ones((1, 64, 32, 3), jnp.float32)
    params = module.init(jax.random.PRNGKey(0), x)
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        flat['/'.join(str(getattr(k, 'key', k)) for k in kp)] = leaf.shape
    inverse = {'conv': lambda s: (s[3], s[2], s[0], s[1]),
               'dense': lambda s: (s[1], s[0]),
               'gate': lambda s: (s[1], s[0], 1, 1),
               'copy': lambda s: s}
    rng = np.random.default_rng(0)
    state = {}
    for tkey, fpath, kind in osnet_key_map(cls.CHANNELS):
        shape = inverse[kind](flat[fpath])
        arr = rng.standard_normal(shape).astype(np.float32) * 0.05
        if tkey.endswith('running_var'):
            arr = np.abs(arr) + 1.0
        state[tkey] = arr
    out = convert_state_dict(state, cls.CHANNELS)
    path = tmp_path / 'osnet.npz'
    np.savez(path, **out)
    loaded = load_npz(params, path, strict=True)
    emb = module.apply(loaded, x)
    assert emb.shape == (1, 512) and np.all(np.isfinite(np.asarray(emb)))

    bad = dict(state)
    bad.pop('conv5.conv.weight')
    with pytest.raises(KeyError, match='missing'):
        convert_state_dict(bad, cls.CHANNELS)
