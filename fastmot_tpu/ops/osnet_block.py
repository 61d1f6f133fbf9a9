"""Fused OSNet residual block as ONE Pallas TPU kernel.

Why: the Flax OSBlock lowers to ~70 small XLA fusions over [B, H, W, 16]
tensors; measured batch-INSENSITIVE at ~1.5 ms for the whole OSNet-x0.25
trunk (64 vs 128 crops identical — docs/PERFORMANCE.md), i.e. the cost
is per-fusion launch/latency overhead, not compute or HBM bandwidth.
One VMEM-resident kernel per block removes ~60 of those launches and all
intermediate HBM round-trips.

Layout: activations live as ``[C, N]`` with ``N = B*H*W`` flattened
pixels in LANES (multiples of 128 at every OSNet stage) and channels in
sublanes. In this layout:

- depthwise 3x3  = 9 static lane-rolls (dx -> roll by 1, dy -> roll by
  W) with boundary masks — pure full-lane VPU work;
- 1x1 conv       = ``dot_general`` contracting the C sublane dim (MXU);
- aggregation gate = one [N, B] pooling matmul + two tiny dense layers.

Numerics follow fastmot_tpu/models/osnet.py exactly: bf16 activations,
f32 tap accumulation in the depthwise, f32 gate, folded inference
BatchNorm (scale = gamma/sqrt(var+eps), shift = beta - mean*scale).

Behavioral reference: the OSNet bottleneck of fastmot/models/reid.py's
OSNet engines (built by TensorRT from ONNX; TensorRT performs the same
cross-layer fusion this kernel hand-writes for the TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN_EPS = 1e-5


def _fold_bn(bn_params, bn_stats):
    """Inference-BN fold -> (scale, shift) f32 vectors. jnp throughout:
    folding happens inside the extractor's jitted graph (XLA constant-
    folds it when params are literals)."""
    gamma = jnp.asarray(bn_params['scale'], jnp.float32)
    beta = jnp.asarray(bn_params['bias'], jnp.float32)
    mean = jnp.asarray(bn_stats['mean'], jnp.float32)
    var = jnp.asarray(bn_stats['var'], jnp.float32)
    scale = gamma / jnp.sqrt(var + BN_EPS)
    return scale, beta - mean * scale


def fold_osblock(variables, ch_in: int, features: int):
    """Flatten one OSBlock's Flax variables into the kernel's argument
    list (deterministic order; see _osblock_kernel)."""
    p = variables['params']
    s = variables['batch_stats']
    mid = max(features // 4, 4)

    def convbn(name):
        w = jnp.asarray(p[name]['Conv_0']['kernel'], jnp.float32)
        sc, sh = _fold_bn(p[name]['BatchNorm_0'], s[name]['BatchNorm_0'])
        return w.reshape(w.shape[-2], w.shape[-1]), sc, sh

    args = []
    w1, sc1, sh1 = convbn('ConvBNReLU_0')
    args += [w1.astype(jnp.bfloat16),
             sc1[:, None].astype(jnp.bfloat16),
             sh1[:, None].astype(jnp.bfloat16)]
    for i in range(10):
        lc_p, lc_s = p[f'LiteConv_{i}'], s[f'LiteConv_{i}']
        wp = jnp.asarray(lc_p['Conv_0']['kernel'], jnp.float32)
        dw = jnp.asarray(lc_p['DepthwiseConv3x3_0']['kernel'],
                         jnp.float32)                     # [3, 3, 1, mid]
        sc, sh = _fold_bn(lc_p['BatchNorm_0'], lc_s['BatchNorm_0'])
        # dw stays f32 (values pre-rounded through bf16 so the tap
        # weights match the Flax bf16 cast): Mosaic only supports
        # minor-dim insertion ([mid] -> [mid, 1]) on 32-bit types
        args += [wp.reshape(mid, mid).astype(jnp.bfloat16),
                 dw.reshape(9, mid).astype(jnp.bfloat16)
                 .astype(jnp.float32),
                 sc[:, None].astype(jnp.bfloat16),
                 sh[:, None].astype(jnp.bfloat16)]
    g = p['AggregationGate_0']
    args += [jnp.asarray(g['Dense_0']['kernel'], jnp.float32),
             jnp.asarray(g['Dense_0']['bias'], jnp.float32)[:, None],
             jnp.asarray(g['Dense_1']['kernel'], jnp.float32),
             jnp.asarray(g['Dense_1']['bias'], jnp.float32)[:, None]]
    w3, sc3, sh3 = convbn('ConvBNReLU_1')
    args += [w3.astype(jnp.bfloat16),
             sc3[:, None].astype(jnp.bfloat16),
             sh3[:, None].astype(jnp.bfloat16)]
    if ch_in != features:
        wd, scd, shd = convbn('ConvBNReLU_2')
        args += [wd.astype(jnp.bfloat16),
                 scd[:, None].astype(jnp.bfloat16),
                 shd[:, None].astype(jnp.bfloat16)]
    return args


def _dw_masks(h: int, w: int, n: int):
    """[9, n] bf16 validity masks for the 3x3 taps in [C, N] layout
    (N = b*H*W + y*W + x; a dy/dx tap is a lane roll by dy*W + dx,
    valid where the SOURCE pixel exists — zero-padding semantics)."""
    idx = np.arange(n)
    x = idx % w
    y = (idx // w) % h
    masks = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ok = ((x + dx >= 0) & (x + dx < w)
                  & (y + dy >= 0) & (y + dy < h))
            masks.append(ok)
    return jnp.asarray(np.stack(masks), jnp.bfloat16)


def _osblock_kernel(h, w, mid, ch_in, features, downsample,
                    x_ref, m_ref, dwm_ref, *refs):
    """One OSBlock on a [C_in, TB*H*W] tile (see module docstring)."""
    out_ref = refs[-1]
    args = refs[:-1]
    k = 0

    def take(n):
        nonlocal k
        vals = args[k:k + n]
        k += n
        return vals

    def conv1x1(x, wref, preferred=jnp.float32):
        # [Cin, N] x [Cin, Cout] -> [Cout, N]
        return jax.lax.dot_general(
            wref[:], x, (((0,), (0,)), ((), ())),
            preferred_element_type=preferred)

    def bnrelu(x, sc, sh, relu=True):
        y = x.astype(jnp.bfloat16) * sc[:] + sh[:]
        return jnp.maximum(y, 0) if relu else y

    x = x_ref[:]                                      # [Cin, N] bf16
    n = x.shape[1]

    w1, sc1, sh1 = take(3)
    y = bnrelu(conv1x1(x, w1), sc1, sh1)              # [mid, N]

    def lite(z):
        wp, dw, sc, sh = take(4)
        z = conv1x1(z, wp).astype(jnp.bfloat16)       # 1x1, no bias
        # Mosaic's lane rotate is 32-bit only; roll an f32 view and cast
        # each tap back to bf16 (exact roundtrip — same numerics as the
        # Flax shifted-FMA depthwise)
        z32 = z.astype(jnp.float32)
        acc = jnp.zeros_like(z32)
        t = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                shift = dy * w + dx
                # pltpu.roll wants a non-negative shift; rolling LEFT by
                # s is rolling right by n - s (masks kill the wrap)
                zt = pltpu.roll(z32, (-shift) % n, 1) if shift else z32
                tap = (zt.astype(jnp.bfloat16)
                       * dwm_ref[t]).astype(jnp.float32) * dw[t][:, None]
                acc = acc + tap
                t += 1
        return bnrelu(acc, sc, sh)

    streams = []

    def run_stream(t, z):
        for _ in range(t):
            z = lite(z)
        return z

    # streams t = 1..4 consume LiteConv_0..9 in declaration order
    for t in range(1, 5):
        streams.append(run_stream(t, y))

    gw1, gb1, gw2, gb2 = take(4)
    gated = None
    for z in streams:
        # unified aggregation gate, f32 like the Flax module
        pooled = jax.lax.dot_general(                  # [mid, TB]
            z.astype(jnp.float32), m_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        hid = jnp.maximum(jax.lax.dot_general(
            gw1[:], pooled, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + gb1[:], 0.0)
        gate = jax.nn.sigmoid(jax.lax.dot_general(
            gw2[:], hid, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + gb2[:])  # [mid, TB]
        # expand [mid, TB] -> [mid, N]; m is the 1/(H*W)-normalized pool
        # matrix, so scale back by H*W (a power of two at every OSNet
        # stage — exact)
        gate_n = jax.lax.dot_general(
            gate, m_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * float(h * w)
        g = z.astype(jnp.float32) * gate_n
        gated = g if gated is None else gated + g

    w3, sc3, sh3 = take(3)
    out = bnrelu(conv1x1(gated.astype(jnp.bfloat16), w3), sc3, sh3,
                 relu=False)                           # [Cout, N]
    if downsample:
        wd, scd, shd = take(3)
        identity = bnrelu(conv1x1(x, wd), scd, shd, relu=False)
    else:
        identity = x
    out_ref[:] = jnp.maximum(out + identity, 0).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=(
    'h', 'w', 'ch_in', 'features', 'tile_b', 'interpret'))
def osblock_fused(x_nhwc, flat_params, *, h, w, ch_in, features,
                  tile_b=8, interpret=False):
    """Run one OSBlock via the fused Pallas kernel.

    x_nhwc: [B, H, W, C_in] (any float dtype; computed in bf16).
    flat_params: list from fold_osblock. Returns [B, H, W, features]
    bf16 — same contract as fastmot_tpu.models.osnet.OSBlock.
    """
    b = x_nhwc.shape[0]
    assert x_nhwc.shape[1:] == (h, w, ch_in)
    mid = max(features // 4, 4)
    downsample = ch_in != features
    if b % tile_b:
        tile_b = b  # fallback: one program
    n_tile = tile_b * h * w

    x_cn = x_nhwc.astype(jnp.bfloat16).reshape(b * h * w, ch_in).T
    m = jnp.asarray((np.arange(n_tile) // (h * w))[:, None]
                    == np.arange(tile_b)[None, :],
                    jnp.float32) / float(h * w)       # [n_tile, TB] pool
    dwm = _dw_masks(h, w, n_tile)

    kern = functools.partial(_osblock_kernel, h, w, mid, ch_in,
                             features, downsample)
    grid = (b // tile_b,)
    const = lambda i: (0, 0)
    in_specs = [
        pl.BlockSpec((ch_in, n_tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_tile, tile_b), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((9, n_tile), const, memory_space=pltpu.VMEM),
    ]
    for a in flat_params:
        in_specs.append(pl.BlockSpec(a.shape, const,
                                     memory_space=pltpu.VMEM))
    out_cn = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((features, n_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((features, b * h * w),
                                       jnp.bfloat16),
        # the default 16M scoped-vmem budget is conservative; the
        # unrolled 10-LiteConv body keeps ~2 f32 [mid, n_tile] live per
        # lite (measured 36.5M at TILE_B=8 on stage-1 shapes)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_cn, m, dwm, *flat_params)
    return out_cn.T.reshape(b, h, w, features)
