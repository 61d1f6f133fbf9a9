"""Post-training quantization for the model zoo.

Capability reference: fastmot/models/calibrator.py (TensorRT
IInt8EntropyCalibrator2 over calibration images) and the INT8 builder flag
(ssd.py:76-83). The TPU-native equivalents:

  * ``quantize_params_int8`` — per-channel symmetric int8 weight
    quantization. Weights live in HBM as int8 (4x less bandwidth — the
    usual TPU bottleneck) and are dequantized in VMEM where XLA fuses the
    scale multiply into the consuming conv/matmul.
  * ``EntropyCalibrator`` — activation-range calibration with the same
    KL-divergence threshold search TensorRT's entropy calibrator uses:
    run calibration batches, histogram each activation, pick the clip
    threshold minimizing KL(P || quantized P). Ranges feed fake-quant or
    future int8 activation paths and are cached to disk like the
    reference's calibration cache (calibrator.py:59-67).
"""
from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _is_weight_leaf(path, leaf) -> bool:
    names = [str(getattr(k, 'key', k)) for k in path]
    if not names:
        return False
    return names[-1] == 'kernel' and leaf.ndim >= 2


def quantize_params_int8(params):
    """Per-channel symmetric int8 quantization of conv/dense kernels.

    Returns ``(q_params, scales)`` pytrees: kernels become int8 with a
    float32 scale per output channel; all other leaves pass through.
    """
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    q_leaves, s_leaves = [], []
    for path, leaf in leaves:
        if _is_weight_leaf(path, leaf):
            w = np.asarray(leaf, np.float32)
            # output channel is the last axis for flax Conv/Dense kernels
            absmax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)),
                            keepdims=True)
            scale = np.maximum(absmax, 1e-8) / 127.0
            q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
            q_leaves.append(jnp.asarray(q))
            s_leaves.append(jnp.asarray(scale.astype(np.float32)))
        else:
            q_leaves.append(leaf)
            s_leaves.append(None)
    q_params = jax.tree_util.tree_unflatten(treedef, q_leaves)
    scales = jax.tree_util.tree_unflatten(treedef, s_leaves)
    return q_params, scales


def dequantize_params(q_params, scales):
    """Rebuild float parameters; inside jit the dequant fuses with the
    consumer so int8 weights stream from HBM."""
    def deq(q, s):
        if s is None:
            return q
        return q.astype(jnp.float32) * s

    return jax.tree_util.tree_map(
        deq, q_params, scales,
        is_leaf=lambda x: x is None or isinstance(x, (jnp.ndarray, np.ndarray)))


def make_quantized_apply(module, params):
    """Return (apply_fn, q_state): apply_fn(q_state, x) runs the module
    with int8-stored weights dequantized in-graph."""
    q_params, scales = quantize_params_int8(params)

    def apply_fn(q_state, x):
        qp, sc = q_state
        return module.apply(dequantize_params(qp, sc), x)

    return apply_fn, (q_params, scales)


def fake_quant(x, thresh: float):
    """Symmetric int8 fake-quantization at a calibrated clip threshold:
    clip to [-t, t], quantize to 255 levels, dequantize — in-graph, so
    XLA fuses the clamp/round into neighbouring elementwise work. This
    models what the reference's calibrated INT8 engines did to every
    activation tensor (calibrator.py:8-67 feeding the builder)."""
    s = thresh / 127.0
    return jnp.round(jnp.clip(x, -thresh, thresh) / s) * s


class QuantizedModule:
    """Drop-in ``module`` replacement whose params are int8 + scales.

    ``apply(q_state, x)`` dequantizes in-graph, so XLA streams int8
    weights from HBM (4x less bandwidth) and fuses the scale multiply
    into the consuming conv/matmul. Hashable, so it can replace a Flax
    module as a jit static argument — this is how the pipeline-level
    ``quantize: "int8"`` config knob plugs into the existing fused
    detector/extractor kernels without changing them.

    ``act_ranges`` (from ``EntropyCalibrator.compute_ranges``/``load``,
    keyed by module path, e.g. ``ConvBN_3``) additionally fake-quantizes every calibrated
    submodule output at its KL-optimal threshold via a Flax method
    interceptor — the calibrated-activation half of the reference's
    INT8 engine builds.

    ``in_ranges`` (from ``EntropyCalibrator.compute_input_ranges``)
    upgrades calibrated ``nn.Conv`` layers to NATIVE int8 execution:
    the input tensor is quantized at its KL threshold, the conv runs
    s8 x s8 -> s32 on the MXU (double the bf16 MAC rate, 4x less
    activation traffic), and the int32 result is rescaled by
    ``s_in * s_w`` per output channel. This is the execution half of
    the reference's INT8 TensorRT engines (ssd.py:76-83 + the
    calibrator feeding trtexec-style builder flags): quantization
    points sit at conv INPUTS — i.e. post-BN/post-activation tensors,
    matching a folded-BN engine — so natively-run convs are excluded
    from the output fake-quant above (their pre-BN outputs are never a
    quantized tensor in such an engine).

    The wildcard key ``'*'`` applies to every ``nn.Conv`` without an
    explicit entry; a non-positive wildcard value selects DYNAMIC
    per-tensor quantization (clip threshold = the input's absmax,
    computed in-graph — one fused reduction per conv input). Dynamic
    mode needs no calibration data, like dynamic-range quantization in
    classic inference runtimes, and is what ``bench.py --int8`` uses
    since no pretrained weights ship in this environment.
    """

    def __init__(self, module, act_ranges: dict | None = None,
                 in_ranges: dict | None = None):
        self.module = module
        if act_ranges:
            act_ranges = {k: float(v) for k, v in act_ranges.items()
                          if v > 0}
        self.act_ranges = None if not act_ranges else \
            tuple(sorted(act_ranges.items()))
        if in_ranges:
            in_ranges = {k: float(v) for k, v in in_ranges.items()
                         if v > 0 or k == '*'}
        self.in_ranges = None if not in_ranges else \
            tuple(sorted(in_ranges.items()))

    def quantize(self, params):
        return quantize_params_int8(params)

    def _int8_conv(self, conv, x, t_in, q_kernel, k_scale, bias):
        """Run one nn.Conv natively in int8: quantize the input at its
        calibrated threshold, s8 x s8 -> s32 conv, per-output-channel
        rescale (+ float bias). ``t_in <= 0`` selects dynamic
        quantization: the clip threshold is the tensor's absmax,
        computed in-graph (see class docstring)."""
        x = x.astype(jnp.float32)
        if t_in > 0:
            s_in = jnp.float32(t_in / 127.0)
        else:
            s_in = jnp.maximum(jnp.max(jnp.abs(x)), 1e-6) / 127.0
        xq = jnp.clip(jnp.round(x / s_in),
                      -127, 127).astype(jnp.int8)
        nd = len(conv.kernel_size)

        def tup(v):
            return (v,) * nd if isinstance(v, int) else tuple(v)

        pad = conv.padding.upper() if isinstance(conv.padding, str) \
            else [tuple(p) for p in conv.padding]
        y = jax.lax.conv_general_dilated(
            xq, q_kernel, tup(conv.strides or 1), pad,
            rhs_dilation=tup(conv.kernel_dilation or 1),
            feature_group_count=conv.feature_group_count,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.int32)
        # k_scale is [1, ..., 1, co] from quantize_params_int8
        y = y.astype(jnp.float32) * (s_in * k_scale.reshape(-1))
        if bias is not None:
            y = y + bias
        return y

    def apply(self, q_state, x):
        # quantization hooks intercept the per-LiteConv nn.Conv calls,
        # so OSNet must take its literal per-stream forward here
        from .osnet import force_plain_streams
        qp, sc = q_state
        params = dequantize_params(qp, sc)
        if self.act_ranges is None and self.in_ranges is None:
            with force_plain_streams():
                return self.module.apply(params, x)
        import flax.linen as nn
        ranges = dict(self.act_ranges or ())
        in_ranges = dict(self.in_ranges or ())
        q_tree = qp.get('params', qp) if isinstance(qp, dict) else qp
        s_tree = sc.get('params', sc) if isinstance(sc, dict) else sc
        p_tree = params.get('params', params) \
            if isinstance(params, dict) else params

        def subtree(tree, path):
            node = tree
            for name in path:
                if not isinstance(node, dict) or name not in node:
                    return None
                node = node[name]
            return node

        def interceptor(next_fun, args, kwargs, context):
            path = context.module.path
            if context.method_name != '__call__' or not path:
                return next_fun(*args, **kwargs)
            key = '/'.join(path)
            t_in = in_ranges.get(key)
            if t_in is None and isinstance(context.module, nn.Conv):
                t_in = in_ranges.get('*')
            if t_in is not None and isinstance(context.module, nn.Conv) \
                    and context.module.input_dilation in (None, 1):
                q_leaf = subtree(q_tree, path)
                s_leaf = subtree(s_tree, path)
                if q_leaf is not None and \
                        q_leaf['kernel'].dtype == jnp.int8:
                    bias = None
                    if context.module.use_bias:
                        bias = subtree(p_tree, path)['bias']
                    return self._int8_conv(
                        context.module, args[0], t_in,
                        q_leaf['kernel'], s_leaf['kernel'], bias)
            out = next_fun(*args, **kwargs)
            # quantize submodule activations only; the root output stays
            # float, like a TRT engine's network outputs. Convs already
            # run natively in int8 are excluded (see class docstring).
            if key in in_ranges:
                return out
            # EntropyCalibrator keys ranges by the module path
            # ('Block_0/Conv_1'), matching capture_intermediates' tree
            t = ranges.get(key)
            if t is not None and isinstance(out, jax.Array):
                out = fake_quant(out, t)
            return out

        with force_plain_streams(), nn.intercept_methods(interceptor):
            return self.module.apply(params, x)

    def __hash__(self):
        return hash(('int8', self.module, self.act_ranges, self.in_ranges))

    def __eq__(self, other):
        return isinstance(other, QuantizedModule) and \
            self.module == other.module and \
            self.act_ranges == other.act_ranges and \
            self.in_ranges == other.in_ranges


# ---------------------------------------------------------------------------
# Entropy calibration (KL threshold search, TensorRT-style)
# ---------------------------------------------------------------------------

def kl_threshold(hist: np.ndarray, bin_edges: np.ndarray,
                 num_quant_bins: int = 128) -> float:
    """Find the |x| clip threshold minimizing KL(P || Q) where Q is P
    re-binned to ``num_quant_bins`` levels — the algorithm behind
    IInt8EntropyCalibrator2."""
    total = hist.sum()
    if total == 0:
        return float(bin_edges[-1])
    best_kl = np.inf
    best_t = bin_edges[-1]
    n = len(hist)
    hist = hist.astype(np.float64)
    tail = np.concatenate([np.cumsum(hist[::-1])[::-1], [0.0]])
    for i in range(num_quant_bins, n + 1):
        ref = hist[:i].copy()
        ref[i - 1] += tail[i]            # fold the tail into the last bin
        p = ref / ref.sum()
        # re-bin the first i bins to num_quant_bins levels: each level j
        # covers ref[floor(j*i/K) : floor((j+1)*i/K)] and spreads its mass
        # evenly over that chunk's NONZERO bins (TensorRT semantics)
        bounds = (np.arange(num_quant_bins + 1) * i) // num_quant_bins
        sums = np.add.reduceat(ref, bounds[:-1])
        nz = np.add.reduceat((ref > 0).astype(np.float64), bounds[:-1])
        avg = np.divide(sums, nz, out=np.zeros_like(sums), where=nz > 0)
        q = np.repeat(avg, np.diff(bounds))
        q = np.where(ref > 0, q, 0.0)
        qs = q.sum()
        if qs == 0:
            continue
        q /= qs
        mask = p > 0
        kl = np.sum(p[mask] * np.log(p[mask] / np.maximum(q[mask], 1e-12)))
        if kl < best_kl:
            best_kl = kl
            best_t = bin_edges[i]
    return float(best_t)


class EntropyCalibrator:
    """Collects per-layer activation histograms over calibration batches
    and derives KL-optimal clip ranges (calibrator.py:8-67 role).

    Usage::

        cal = EntropyCalibrator(module, params)
        for batch in batches:
            cal.observe(batch)
        ranges = cal.compute_ranges()        # {layer_name: threshold}
        cal.save('calib_cache.json')
    """

    def __init__(self, module, params, num_bins: int = 2048):
        self.module = module
        self.params = params
        self.num_bins = num_bins
        self._absmax: dict[str, float] = {}
        self._hists: dict[str, np.ndarray] = {}
        self._batches: list[np.ndarray] = []
        self._ranges: dict[str, float] | None = None
        self._in_ranges: dict[str, float] | None = None
        def _cap(p, x):
            # per-submodule intermediates require the literal forward
            from .osnet import force_plain_streams
            with force_plain_streams():
                return self.module.apply(
                    p, x, capture_intermediates=True,
                    mutable=['intermediates'])

        self._apply = jax.jit(_cap)
        self._apply_in = None

    def _intermediates(self, x):
        _, state = self._apply(self.params, x)
        flat = {}

        def walk(d, prefix):
            for k, v in d.items():
                if isinstance(v, dict):
                    walk(v, f'{prefix}/{k}' if prefix else k)
                else:
                    # float32 copy: bf16 trunks yield ml_dtypes.bfloat16
                    # arrays, which np.histogram cannot bin (segfaults);
                    # and np.asarray of a CPU jax.Array is a zero-copy
                    # view whose buffer dies with the pytree
                    a = v[0] if isinstance(v, tuple) else v
                    flat[prefix or k] = np.array(a, dtype=np.float32)

        walk(state['intermediates'], '')
        return flat

    def _conv_inputs(self, x):
        """{conv_path: input tensor} for every nn.Conv call — the
        tensors whose ranges drive NATIVE int8 conv execution
        (quantization points of a folded-BN INT8 engine)."""
        import flax.linen as nn
        if self._apply_in is None:
            cap = {}

            def interceptor(next_fun, args, kwargs, context):
                if context.method_name == '__call__' \
                        and isinstance(context.module, nn.Conv) \
                        and context.module.path:
                    cap['/'.join(context.module.path)] = args[0]
                return next_fun(*args, **kwargs)

            from .osnet import force_plain_streams

            def run(p, xx):
                cap.clear()
                with force_plain_streams(), \
                        nn.intercept_methods(interceptor):
                    self.module.apply(p, xx)
                return dict(cap)

            self._apply_in = jax.jit(run)
        out = self._apply_in(self.params, x)
        return {k: np.array(v, dtype=np.float32) for k, v in out.items()}

    def observe(self, batch):
        """Accumulate a calibration batch (two-pass: ranges then hists)."""
        self._batches.append(np.asarray(batch))
        self._ranges = None
        self._in_ranges = None

    def compute_ranges(self) -> dict[str, float]:
        if self._ranges is not None:
            return self._ranges
        # pass 1: absolute ranges
        for b in self._batches:
            for name, act in self._intermediates(jnp.asarray(b)).items():
                m = float(np.max(np.abs(act)))
                self._absmax[name] = max(self._absmax.get(name, 0.0), m)
        # pass 2: histograms + KL search
        ranges = {}
        for b in self._batches:
            for name, act in self._intermediates(jnp.asarray(b)).items():
                amax = self._absmax[name]
                if amax == 0:
                    continue
                h, _ = np.histogram(np.abs(act), bins=self.num_bins,
                                    range=(0, amax))
                if name in self._hists:
                    self._hists[name] += h
                else:
                    self._hists[name] = h.astype(np.int64)
        for name, h in self._hists.items():
            edges = np.linspace(0, self._absmax[name], self.num_bins + 1)
            ranges[name] = kl_threshold(h, edges[1:])
        self._ranges = ranges
        return ranges

    def compute_input_ranges(self) -> dict[str, float]:
        """KL-optimal clip thresholds for every nn.Conv INPUT tensor —
        same two-pass histogram/KL search as ``compute_ranges`` but over
        the tensors feeding convolutions, enabling
        ``QuantizedModule(in_ranges=...)``'s native s8 x s8 -> s32 path."""
        if self._in_ranges is not None:
            return self._in_ranges
        absmax: dict[str, float] = {}
        hists: dict[str, np.ndarray] = {}
        for b in self._batches:
            for name, act in self._conv_inputs(jnp.asarray(b)).items():
                m = float(np.max(np.abs(act)))
                absmax[name] = max(absmax.get(name, 0.0), m)
        for b in self._batches:
            for name, act in self._conv_inputs(jnp.asarray(b)).items():
                amax = absmax[name]
                if amax == 0:
                    continue
                h, _ = np.histogram(np.abs(act), bins=self.num_bins,
                                    range=(0, amax))
                if name in hists:
                    hists[name] += h
                else:
                    hists[name] = h.astype(np.int64)
        ranges = {}
        for name, h in hists.items():
            edges = np.linspace(0, absmax[name], self.num_bins + 1)
            ranges[name] = kl_threshold(h, edges[1:])
        self._in_ranges = ranges
        return ranges

    def save(self, path):
        """Write both range families: ``outputs`` (submodule output
        fake-quant) and ``inputs`` (native int8 conv execution). Older
        flat caches (outputs only) still load — see load_calib_ranges."""
        Path(path).write_text(json.dumps(
            {'outputs': self.compute_ranges(),
             'inputs': self.compute_input_ranges()}, indent=1))

    @staticmethod
    def load(path) -> dict[str, float]:
        """Output-range view of a cache (back-compat: flat caches ARE
        the output ranges)."""
        data = json.loads(Path(path).read_text())
        return data.get('outputs', data) if isinstance(data, dict) else data


def load_act_ranges(calib_cache) -> dict[str, float] | None:
    """Load a calibration cache written by ``EntropyCalibrator.save``;
    None (no activation quantization) when no path was configured or the
    file does not exist yet — mirroring how the reference's calibrator
    fell back to running calibration when its cache was absent
    (calibrator.py:59-67)."""
    return load_calib_ranges(calib_cache)[0]


def load_calib_ranges(calib_cache):
    """(act_ranges, in_ranges) from a calibration cache — the two
    QuantizedModule knobs. Flat legacy caches yield (ranges, None);
    missing/unconfigured caches yield (None, None)."""
    if calib_cache is None:
        return None, None
    p = Path(calib_cache)
    if not p.exists():
        return None, None
    data = json.loads(p.read_text())
    if isinstance(data, dict) and 'outputs' in data:
        return data['outputs'] or None, data.get('inputs') or None
    return data or None, None
