"""OSNet ReID feature extractors in Flax.

Behavioral reference: fastmot/models/reid.py (OSNet025 / OSNet10 ONNX →
TensorRT engines; 256x128 input, 512-d embedding). Here the architecture
itself is implemented as a Flax module (omni-scale residual blocks with
unified aggregation gates, per the OSNet paper "Omni-Scale Feature
Learning for Person Re-Identification", Zhou et al. 2019) so inference is
a single jitted XLA graph on TPU — bfloat16 matmuls on the MXU, fused with
the crop/resize/normalize preprocessing in feature_extractor.py.

Weights: randomly initialized by default (no network egress in this
environment); ``load_npz`` accepts converted pretrained parameters with
matching pytree structure.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .registry import ReIDModel, register_reid


class DepthwiseConv3x3(nn.Module):
    """Depthwise 3x3 as nine fused shifted multiply-adds.

    XLA's TPU lowering of grouped convolutions with
    feature_group_count == channels is pathologically slow (measured
    ~100 ms for OSNet-x0.25 vs <10 ms for the far larger YOLOv4); the
    shifted-FMA formulation is pure VPU elementwise work that XLA fuses
    into roughly one pass over the activation tensor."""
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (3, 3, 1, c), jnp.float32)
        # bf16 taps: the fused 9-tap pass is HBM-bandwidth-bound, so
        # halving the activation dtype roughly halves its cost; the
        # per-tap products accumulate in f32 registers inside the fusion
        x = x.astype(jnp.bfloat16)
        w = w.astype(jnp.bfloat16)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h, wd = x.shape[1], x.shape[2]
        out = None
        for dy in range(3):
            for dx in range(3):
                tap = (xp[:, dy:dy + h, dx:dx + wd, :]
                       * w[dy, dx, 0]).astype(jnp.float32)
                out = tap if out is None else out + tap
        if self.stride > 1:
            out = out[:, ::self.stride, ::self.stride, :]
        return out.astype(jnp.bfloat16)


class ConvBNReLU(nn.Module):
    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    groups: int = 1
    use_relu: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, self.strides, padding='SAME',
                    feature_group_count=self.groups, use_bias=False,
                    dtype=jnp.bfloat16)(x)
        # bf16 BN keeps the whole trunk's activations 2-byte end to end
        # (inference BN is a per-channel scale+shift; params stay f32)
        x = nn.BatchNorm(use_running_average=True, dtype=jnp.bfloat16)(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class LiteConv(nn.Module):
    """Depthwise-separable 3x3 ("Lite" conv of the OSNet paper)."""
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=jnp.bfloat16)(x)
        x = DepthwiseConv3x3()(x)
        x = nn.BatchNorm(use_running_average=True, dtype=jnp.bfloat16)(x)
        return nn.relu(x)


class AggregationGate(nn.Module):
    """Unified aggregation gate: channel attention shared by all streams.

    Hidden width is exactly ``features // reduction`` (torchreid
    ChannelGate) so converted checkpoints map 1:1."""
    features: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        v = jnp.mean(x, axis=(1, 2))
        v = nn.Dense(max(self.features // self.reduction, 1),
                     dtype=jnp.float32)(v)
        v = nn.relu(v)
        v = nn.Dense(self.features, dtype=jnp.float32)(v)
        gate = jax.nn.sigmoid(v)
        return x * gate[:, None, None, :]


import contextlib as _contextlib
import contextvars as _contextvars

# When set, OSBlock.apply uses the literal per-LiteConv module calls
# (one nn.Conv/BatchNorm per LiteConv) — required by QuantizedModule
# (whose interceptor hooks nn.Conv calls) and EntropyCalibrator (which
# captures per-submodule intermediates). The stream-BATCHED forward
# (FASTMOT_OSNET_BATCHED=1) is numerically equivalent with ~2.5x fewer
# XLA fusions but MEASURED SLOWER on v5e (4.03 vs 2.76 ms at B=64,
# scripts/prof_osnet.py r5): the concat/pad/slice relayouts it adds
# cost more than the launches it saves. Kept as the third documented
# negative result on this trunk (with int8 and the Pallas block) —
# plain per-stream is the default.
import os as _os

_PLAIN_STREAMS = _contextvars.ContextVar(
    'osnet_plain_streams',
    default=_os.environ.get('FASTMOT_OSNET_BATCHED') != '1')


@_contextlib.contextmanager
def force_plain_streams():
    tok = _PLAIN_STREAMS.set(True)
    try:
        yield
    finally:
        _PLAIN_STREAMS.reset(tok)


@_contextlib.contextmanager
def force_batched_streams():
    tok = _PLAIN_STREAMS.set(False)
    try:
        yield
    finally:
        _PLAIN_STREAMS.reset(tok)


class OSBlock(nn.Module):
    """Omni-scale residual block: 4 streams of 1..4 stacked LiteConvs,
    fused by a shared aggregation gate, plus identity shortcut.

    Two numerically-equivalent forwards over ONE param tree:

    - the literal per-stream form (used at init so the param tree keeps
      torchreid-convertible LiteConv_0..9 structure, and under
      ``force_plain_streams`` for int8/calibration interception);
    - the stream-BATCHED form (default at apply time): the 10 LiteConvs
      collapse into 4 "rounds" over a channel-concatenated tensor —
      round j applies the j-th LiteConv of every still-active stream as
      ONE block-diagonal 1x1 matmul + ONE shifted-FMA depthwise + ONE
      folded BN — because depthwise convs and per-channel BN are exact
      under channel concatenation, and a block-diagonal dense matmul is
      the same dot rows plus f32-accumulated zeros. MEASURED SLOWER on
      v5e (4.03 vs 2.76 ms at B=64): the relayouts it adds outweigh the
      launches it saves — see docs/PERFORMANCE.md r5 A/Bs. Off by
      default (FASTMOT_OSNET_BATCHED=1 enables)."""
    features: int
    bottleneck_reduction: int = 4

    @nn.compact
    def __call__(self, x):
        mid = max(self.features // self.bottleneck_reduction, 4)
        if not self.is_initializing() and not _PLAIN_STREAMS.get():
            return self._batched(x, mid)
        identity = x
        y = ConvBNReLU(mid, (1, 1))(x)
        gate = AggregationGate(mid)
        out = None
        for t in range(1, 5):
            s = y
            for _ in range(t):
                s = LiteConv(mid)(s)
            s = gate(s)
            out = s if out is None else out + s
        out = ConvBNReLU(self.features, (1, 1), use_relu=False)(out)
        if identity.shape[-1] != self.features:
            identity = ConvBNReLU(self.features, (1, 1), use_relu=False)(identity)
        return nn.relu(out + identity)

    def _batched(self, x, mid):
        """Stream-batched forward (see class docstring). Reads the
        LiteConv params straight from the block's variables; the
        ConvBNReLU/AggregationGate children are called normally (their
        class-indexed names are unaffected by the absent LiteConvs)."""
        p = self.variables['params']
        s = self.variables['batch_stats']

        def fold(i):
            bp = p[f'LiteConv_{i}']['BatchNorm_0']
            bs = s[f'LiteConv_{i}']['BatchNorm_0']
            scale = bp['scale'] / jnp.sqrt(bs['var'] + 1e-5)
            return scale, bp['bias'] - bs['mean'] * scale

        identity = x
        y = ConvBNReLU(mid, (1, 1))(x)
        gate = AggregationGate(mid)

        offs = (0, 1, 3, 6)           # first LiteConv index per stream
        z = jnp.concatenate([y] * 4, axis=-1)       # [B, H, W, 4*mid]
        gated = None
        for rnd in range(4):
            lids = [offs[t] + rnd for t in range(rnd, 4)]
            wblk = jax.scipy.linalg.block_diag(
                *[p[f'LiteConv_{i}']['Conv_0']['kernel']
                  .reshape(mid, mid) for i in lids])
            zb = jnp.einsum(
                'bhwc,cd->bhwd', z.astype(jnp.bfloat16),
                wblk.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            dw = jnp.concatenate(
                [p[f'LiteConv_{i}']['DepthwiseConv3x3_0']['kernel']
                 for i in lids], axis=-1).astype(jnp.bfloat16)
            zp = jnp.pad(zb, ((0, 0), (1, 1), (1, 1), (0, 0)))
            h, w = zb.shape[1], zb.shape[2]
            acc = None
            for dy in range(3):
                for dx in range(3):
                    tap = (zp[:, dy:dy + h, dx:dx + w, :]
                           * dw[dy, dx, 0]).astype(jnp.float32)
                    acc = tap if acc is None else acc + tap
            scs, shs = zip(*[fold(i) for i in lids])
            sc = jnp.concatenate(scs).astype(jnp.bfloat16)
            sh = jnp.concatenate(shs).astype(jnp.bfloat16)
            z = nn.relu(acc.astype(jnp.bfloat16) * sc + sh)
            head = gate(z[..., :mid])       # stream `rnd` is complete
            gated = head if gated is None else gated + head
            z = z[..., mid:]

        out = ConvBNReLU(self.features, (1, 1), use_relu=False)(gated)
        if identity.shape[-1] != self.features:
            identity = ConvBNReLU(self.features, (1, 1), use_relu=False)(identity)
        return nn.relu(out + identity)


class OSNet(nn.Module):
    """OSNet backbone + embedding head.

    Layer sequence mirrors torchreid's ``osnet.py`` exactly (conv1 7x7/2,
    maxpool, three 2-block stages with 1x1+avgpool transitions, conv5 1x1
    at the last stage width, then fc: Linear -> BN -> ReLU to
    ``feature_dim``) so full checkpoints convert via the structural key
    map in ``scripts/convert_weights.py`` (reference reid.py:95-109)."""
    channels: tuple[int, ...] = (16, 64, 96, 128)  # x0.25 multiplier
    feature_dim: int = 512

    @nn.compact
    def __call__(self, x):
        c = self.channels
        x = ConvBNReLU(c[0], (7, 7), (2, 2))(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding='SAME')
        for stage, ch in enumerate(c[1:]):
            x = OSBlock(ch)(x)
            x = OSBlock(ch)(x)
            if stage < len(c) - 2:
                x = ConvBNReLU(ch, (1, 1))(x)
                x = nn.avg_pool(x, (2, 2), (2, 2))
        x = ConvBNReLU(c[-1], (1, 1))(x)      # conv5
        x = jnp.mean(x, axis=(1, 2))          # global average pool
        x = nn.Dense(self.feature_dim, dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32)(x)
        return nn.relu(x).astype(jnp.float32)


def apply_fused(module: OSNet, variables, x):
    """``module.apply(variables, x)`` with every OSBlock routed through
    the fused Pallas kernel (ops/osnet_block.py) — identical params,
    identical numerics up to bf16 rounding (tests/test_osnet_block.py,
    test_osnet_apply_fused). The Flax OSBlock lowers to ~70 small XLA
    fusions whose launch overhead dominates (measured batch-insensitive,
    docs/PERFORMANCE.md); the kernel is one launch per block."""
    import flax.linen as nn

    from ..ops.osnet_block import fold_osblock, osblock_fused

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if isinstance(m, OSBlock) and context.method_name == '__call__':
            xx = args[0]
            b, h, w, ch_in = xx.shape
            flat = fold_osblock(m.variables, ch_in, m.features)
            tile = 8 if b % 8 == 0 else b
            return osblock_fused(xx, flat, h=h, w=w, ch_in=ch_in,
                                 features=m.features, tile_b=tile)
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        return module.apply(variables, x)


@register_reid
class OSNet025(ReIDModel):
    """OSNet x0.25 (reid.py:95-100): 256x128 input, 512-d, euclidean."""
    INPUT_SHAPE = (3, 256, 128)
    OUTPUT_LAYOUT = 512
    METRIC = 'euclidean'
    CHANNELS = (16, 64, 96, 128)

    @classmethod
    def build(cls):
        return OSNet(channels=cls.CHANNELS, feature_dim=cls.OUTPUT_LAYOUT)


@register_reid
class OSNet10(ReIDModel):
    """OSNet x1.0 (reid.py:103-109): cosine metric."""
    INPUT_SHAPE = (3, 256, 128)
    OUTPUT_LAYOUT = 512
    METRIC = 'cosine'
    CHANNELS = (64, 256, 384, 512)

    @classmethod
    def build(cls):
        return OSNet(channels=cls.CHANNELS, feature_dim=cls.OUTPUT_LAYOUT)
