"""ReID feature extractor.

Behavioral reference: fastmot/feature_extractor.py. The reference crops
boxes on host, preprocesses them in a thread pool, and pipelines 16-image
TRT batches. The TPU formulation fuses everything into one jitted graph:
the frame is uploaded once, all crops are extracted in-graph by batched
bilinear crop-resize (a gather, replacing host ``multi_crop`` + cv2.resize),
ImageNet-normalized, run through the Flax OSNet in a single padded batch,
and L2-normalized (feature_extractor.py:48-74). ``extract_async``
dispatches the graph (XLA async dispatch = the reference's CUDA stream
overlap); ``postprocess`` blocks and returns the [N, D] matrix.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .models import registry

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def crop_resize_batch(frame: jax.Array, tlbrs: jax.Array,
                      out_hw: tuple[int, int],
                      chunk: int = 128) -> jax.Array:
    """Crop each box (inclusive corners, clamped to >= 0 like multi_crop,
    rect.py:92-97) and bilinearly resize to ``out_hw``. [N, H, W, 3].

    Gather-free formulation: per box the bilinear resample is two small
    interpolation-weight matmuls, ``out = Wy @ frame @ Wx^T``, which land
    on the MXU. The naive per-pixel gather version measured ~150 ms for
    128 boxes on TPU (scattered HBM gathers); this runs in ~1 ms. Boxes
    are processed in ``chunk``-size groups to bound the
    [chunk, oh, W, 3] intermediate; the default (one chunk for the
    padded 128-det batch, ~250 MB bf16 intermediate in HBM) avoids
    lax.map entirely — the mapped version serialized 16 loop steps and
    measured ~2.3 ms vs one big einsum pair the MXU streams through.
    """
    fh, fw = frame.shape[0], frame.shape[1]
    oh, ow = out_hw
    n = tlbrs.shape[0]
    boxes = jnp.maximum(jnp.floor(tlbrs), 0.0)
    x0, y0 = boxes[:, 0], boxes[:, 1]
    w = boxes[:, 2] - boxes[:, 0] + 1.0
    h = boxes[:, 3] - boxes[:, 1] + 1.0

    # OpenCV-resize half-pixel-center source positions inside each crop
    us = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow
    vs = (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh
    xs = jnp.clip(x0[:, None] + us[None, :] * w[:, None] - 0.5, 0.0, fw - 1.0)
    ys = jnp.clip(y0[:, None] + vs[None, :] * h[:, None] - 0.5, 0.0, fh - 1.0)

    # linear-interpolation hat weights: W[i, s] = max(0, 1 - |pos_i - s|)
    src_y = jnp.arange(fh, dtype=jnp.float32)
    src_x = jnp.arange(fw, dtype=jnp.float32)

    assert n % chunk == 0 or n < chunk, (n, chunk)
    n_chunks = max(n // chunk, 1)
    cs = min(chunk, n)

    def do_chunk(idx):
        ysc = jax.lax.dynamic_slice(ys, (idx * cs, 0), (cs, oh))
        xsc = jax.lax.dynamic_slice(xs, (idx * cs, 0), (cs, ow))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(
            ysc[:, :, None] - src_y[None, None, :]))       # [c, oh, fh]
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(
            xsc[:, :, None] - src_x[None, None, :]))       # [c, ow, fw]
        # columns first: ow (128) < oh (256), so contracting the frame
        # width down to ow before the row contraction halves the MACs
        # vs rows-first (45+8.5 vs 90+15 GMAC for 128 crops at 720p)
        tmp = jnp.einsum('njw,hwc->nhjc', wx.astype(jnp.bfloat16),
                         frame.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        out = jnp.einsum('nif,nfjc->nijc', wy.astype(jnp.bfloat16),
                         tmp.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return out

    if n_chunks == 1:
        return do_chunk(0)[:n]
    chunks = jax.lax.map(do_chunk, jnp.arange(n_chunks))
    return chunks.reshape(n_chunks * cs, oh, ow, 3)[:n]


def _extract_core(module, out_hw, params, frame, tlbrs, valid):
    """Fused crop -> resize -> normalize -> OSNet -> L2 normalize."""
    f = frame.astype(jnp.float32)
    crops = crop_resize_batch(f, tlbrs, out_hw)
    rgb = crops[..., ::-1]  # BGR -> RGB (feature_extractor.py:92)
    mean = jnp.asarray(_IMAGENET_MEAN)
    std = jnp.asarray(_IMAGENET_STD)
    x = (rgb / 255.0 - mean) / std
    emb = module.apply(params, x)
    norm = jnp.linalg.norm(emb, axis=1, keepdims=True)
    emb = emb / jnp.where(norm > 0, norm, 1.0)
    return jnp.where(valid[:, None], emb, 0.0)


_extract_kernel = partial(jax.jit, static_argnames=('module', 'out_hw'))(
    _extract_core)


@partial(jax.jit, static_argnames=('module', 'out_hw'))
def _extract_batch_kernel(module, out_hw, params, frames, tlbrs, valid):
    """Stream-batched variant: all S streams' crops share one OSNet batch
    (vmap lifts the network to an [S*D] effective batch). [S, D, F]."""
    f = partial(_extract_core, module, out_hw, params)
    return jax.vmap(f)(frames, tlbrs, valid)


class FeatureExtractor:
    """Extracts ReID embeddings for detected boxes
    (feature_extractor.py:11-98)."""

    def __init__(self, model='OSNet025', batch_size=16, quantize=None,
                 calib_cache=None):
        self.model = registry.ReIDModel.get_model(model)
        assert batch_size >= 1
        self.batch_size = batch_size  # kept for config parity; batching is
        # a single padded device batch rather than 16-image chunks
        self.feature_dim = self.model.OUTPUT_LAYOUT
        self.module, self.params = self.model.init_params()
        assert quantize in (None, 'int8'), quantize
        self.quantize = quantize
        if quantize == 'int8':
            # int8 weight path (role of the reference's INT8 engines,
            # ssd.py:76-83): wrap the module so the existing fused
            # kernels run with int8-stored weights dequantized in-graph.
            # calib_cache (reference calibrator.py:59-67's calibration
            # cache) additionally fake-quantizes activations at their
            # KL-calibrated clip thresholds.
            from .models.quantize import QuantizedModule, load_calib_ranges
            act_ranges, in_ranges = load_calib_ranges(calib_cache)
            self.module = QuantizedModule(
                self.module, act_ranges=act_ranges, in_ranges=in_ranges)
            self.params = self.module.quantize(self.params)
        c, h, w = self.model.INPUT_SHAPE
        self._out_hw = (h, w)

        self._pending = None
        self._n = 0

    @property
    def metric(self):
        return self.model.METRIC

    def __call__(self, frame, tlbrs):
        self.extract_async(frame, tlbrs)
        return self.postprocess()

    def extract_async(self, frame, tlbrs):
        """Dispatch embedding extraction; does not block."""
        n = len(tlbrs)
        self._n = n
        if n == 0:
            self._pending = None
            return
        b = _bucket(n)
        boxes = np.zeros((b, 4), np.float32)
        boxes[:n] = tlbrs
        valid = np.zeros(b, bool)
        valid[:n] = True
        self._pending = _extract_kernel(
            self.module, self._out_hw, self.params,
            jnp.asarray(frame), jnp.asarray(boxes), jnp.asarray(valid))

    def extract_async_device(self, frame_dev, tlbrs_dev, valid_dev):
        """Device-array variant: crop boxes come straight from the
        detector graph — no host round trip."""
        self._n = int(tlbrs_dev.shape[0])
        self._pending = _extract_kernel(
            self.module, self._out_hw, self.params,
            frame_dev, tlbrs_dev, valid_dev)

    def extract_async_batch(self, frames_dev, tlbrs_dev, valid_dev):
        """Stream-batched device variant: frames [S, H, W, 3], boxes
        [S, D, 4], valid [S, D] -> pending [S, D, F] embeddings."""
        self._n = int(tlbrs_dev.shape[0]) * int(tlbrs_dev.shape[1])
        self._pending = _extract_batch_kernel(
            self.module, self._out_hw, self.params,
            frames_dev, tlbrs_dev, valid_dev)

    def postprocess(self):
        """Block on the dispatched extraction; [N, D] float32."""
        if self._n == 0:
            return np.empty((0, self.feature_dim), np.float32)
        emb = np.asarray(self._pending)[:self._n]
        self._pending = None
        return emb

    def postprocess_device(self):
        """The padded [B, D] embeddings as a DEVICE array (row i aligns
        with detection i); no synchronization."""
        out = self._pending
        self._pending = None
        return out

    def null_embeddings(self, detections):
        """Identical embeddings — disables appearance
        (feature_extractor.py:76-82)."""
        emb = np.ones((len(detections), self.feature_dim), np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        return emb
