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
    """

    def __init__(self, module, act_ranges: dict | None = None):
        self.module = module
        if act_ranges:
            act_ranges = {k: float(v) for k, v in act_ranges.items()
                          if v > 0}
        self.act_ranges = None if not act_ranges else \
            tuple(sorted(act_ranges.items()))

    def quantize(self, params):
        return quantize_params_int8(params)

    def apply(self, q_state, x):
        qp, sc = q_state
        params = dequantize_params(qp, sc)
        if self.act_ranges is None:
            return self.module.apply(params, x)
        import flax.linen as nn
        ranges = dict(self.act_ranges)

        def interceptor(next_fun, args, kwargs, context):
            out = next_fun(*args, **kwargs)
            # quantize submodule activations only; the root output stays
            # float, like a TRT engine's network outputs
            if context.method_name != '__call__' or not context.module.path:
                return out
            # EntropyCalibrator keys ranges by the module path
            # ('Block_0/Conv_1'), matching capture_intermediates' tree
            t = ranges.get('/'.join(context.module.path))
            if t is not None and isinstance(out, jax.Array):
                out = fake_quant(out, t)
            return out

        with nn.intercept_methods(interceptor):
            return self.module.apply(params, x)

    def __hash__(self):
        return hash(('int8', self.module, self.act_ranges))

    def __eq__(self, other):
        return isinstance(other, QuantizedModule) and \
            self.module == other.module and \
            self.act_ranges == other.act_ranges


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
        self._apply = jax.jit(lambda p, x: self.module.apply(
            p, x, capture_intermediates=True, mutable=['intermediates']))

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

    def observe(self, batch):
        """Accumulate a calibration batch (two-pass: ranges then hists)."""
        self._batches.append(np.asarray(batch))
        self._ranges = None

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

    def save(self, path):
        Path(path).write_text(json.dumps(self.compute_ranges(), indent=1))

    @staticmethod
    def load(path) -> dict[str, float]:
        return json.loads(Path(path).read_text())


def load_act_ranges(calib_cache) -> dict[str, float] | None:
    """Load a calibration cache written by ``EntropyCalibrator.save``;
    None (no activation quantization) when no path was configured or the
    file does not exist yet — mirroring how the reference's calibrator
    fell back to running calibration when its cache was absent
    (calibrator.py:59-67)."""
    if calib_cache is None:
        return None
    p = Path(calib_cache)
    if not p.exists():
        return None
    return EntropyCalibrator.load(p)
