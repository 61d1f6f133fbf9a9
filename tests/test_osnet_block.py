"""Fused OSBlock Pallas kernel vs the Flax module (ops/osnet_block.py).

Runs the kernel in interpreter mode on CPU; on TPU the same code
compiles via Mosaic (exercised by bench.py / the feature extractor when
FASTMOT_OSNET_PALLAS=1)."""
import numpy as np
import pytest


def _compare(ch_in, features, h, w, b=8, tile_b=4):
    import jax
    import jax.numpy as jnp
    from fastmot_tpu.models.osnet import OSBlock
    from fastmot_tpu.ops.osnet_block import fold_osblock, osblock_fused

    rng = np.random.default_rng(ch_in + features)
    module = OSBlock(features)
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, ch_in)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    variables = module.init(jax.random.PRNGKey(3), x)
    ref = np.asarray(module.apply(variables, x), np.float32)

    flat = fold_osblock(variables, ch_in, features)
    got = np.asarray(osblock_fused(
        x, flat, h=h, w=w, ch_in=ch_in, features=features,
        tile_b=tile_b, interpret=True), np.float32)

    assert got.shape == ref.shape
    # bf16 activations: tolerate last-ulp divergence, demand tight
    # agreement in aggregate
    denom = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / denom < 0.04, \
        np.abs(got - ref).max() / denom
    assert np.abs(got - ref).mean() / denom < 0.004


def test_osblock_fused_stage1_shape():
    _compare(ch_in=16, features=64, h=16, w=8)


def test_osblock_fused_same_channels():
    _compare(ch_in=64, features=64, h=16, w=8)


def test_osblock_fused_stage3_shape():
    _compare(ch_in=96, features=128, h=8, w=8, b=4, tile_b=2)


def test_osnet_apply_fused():
    """Full OSNet forward with Pallas blocks == Flax forward."""
    import jax
    import jax.numpy as jnp
    from fastmot_tpu.models.osnet import OSNet, apply_fused
    from fastmot_tpu.ops import osnet_block

    rng = np.random.default_rng(11)
    module = OSNet(channels=(16, 64, 96, 128), feature_dim=512)
    x = jnp.asarray(rng.uniform(0, 1, (4, 64, 32, 3)).astype(np.float32))
    variables = module.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(module.apply(variables, x), np.float32)

    import unittest.mock as mock
    real = osnet_block.osblock_fused

    def interp(xx, flat, **kw):
        kw['interpret'] = True
        return real(xx, flat, **kw)

    with mock.patch.object(osnet_block, 'osblock_fused', interp):
        got = np.asarray(apply_fused(module, variables, x), np.float32)

    denom = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / denom < 0.05, \
        np.abs(got - ref).max() / denom


def test_osblock_batched_matches_plain():
    """The stream-BATCHED OSBlock forward (default at apply time) must
    match the literal per-stream forward over the same params."""
    import jax
    import jax.numpy as jnp
    from fastmot_tpu.models.osnet import (OSBlock,
                                          force_batched_streams,
                                          force_plain_streams)

    rng = np.random.default_rng(5)
    for ch_in, features in ((16, 64), (64, 64), (96, 128)):
        module = OSBlock(features)
        x = jnp.asarray(rng.normal(0, 1, (4, 16, 8, ch_in))
                        .astype(np.float32)).astype(jnp.bfloat16)
        variables = module.init(jax.random.PRNGKey(7), x)
        with force_plain_streams():
            ref = np.asarray(module.apply(variables, x), np.float32)
        with force_batched_streams():
            got = np.asarray(module.apply(variables, x), np.float32)
        denom = np.abs(ref).max() + 1e-6
        assert np.abs(got - ref).max() / denom < 0.03, \
            (ch_in, features, np.abs(got - ref).max() / denom)


def test_osnet_batched_embedding_matches_plain():
    import jax
    import jax.numpy as jnp
    from fastmot_tpu.models.osnet import (OSNet,
                                          force_batched_streams,
                                          force_plain_streams)

    rng = np.random.default_rng(6)
    module = OSNet(channels=(16, 64, 96, 128), feature_dim=512)
    x = jnp.asarray(rng.uniform(0, 1, (4, 64, 32, 3)).astype(np.float32))
    variables = module.init(jax.random.PRNGKey(2), x)
    with force_plain_streams():
        ref = np.asarray(module.apply(variables, x), np.float32)
    with force_batched_streams():
        got = np.asarray(module.apply(variables, x), np.float32)
    denom = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / denom < 0.05, \
        np.abs(got - ref).max() / denom
