"""Multi-stream MOT: several video streams tracked on one chip (or mesh).

BASELINE config 5 ("8x 1080p streams batched per TPU chip"): the reference
is strictly single-stream; here EVERY stage runs once per frame for all S
streams:

  * the detector is ONE batched graph over all streams' frames (a leading
    stream axis feeds the MXU far more efficiently than batch-1 convs),
  * ReID crops from every stream share one OSNet batch
    (``FeatureExtractor.extract_async_batch``),
  * the tracker state itself carries a stream axis (``StreamTracker``):
    the chained gap-frame kernel and the fused association kernel are
    vmapped over [S, ...] state and dispatched ONCE — no per-stream host
    Python in the frame loop (the round-1 per-stream-tracker design
    flattened at ~1.4x going 1 -> 8 streams because of exactly that).

All streams share the detector-skip schedule, mirroring the reference's
frame loop semantics per stream. Pass ``mesh`` (a jax Mesh with a
'streams' axis) to shard the stream axis across chips — the streams are
independent, so the frame loop needs zero cross-chip collectives.
"""
from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from ..detector import MAX_RAW, MAX_DETS, _nms_and_gate, _resize_bilinear_rgb, \
    make_detections
from ..feature_extractor import FeatureExtractor
from ..utils import Profiler
from .stream_tracker import StreamTracker


def _vars(cfg):
    if cfg is None:
        return {}
    return vars(cfg) if isinstance(cfg, SimpleNamespace) else dict(cfg)


class BatchedYOLODetector:
    """YOLO detector over a stream axis: one fused graph for S frames."""

    def __init__(self, size, class_ids, n_streams, model='YOLOv4',
                 conf_thresh=0.25, nms_thresh=0.5, max_area=800000,
                 min_aspect_ratio=1.2):
        from ..detector import YOLODetector
        # reuse the single-stream detector's geometry + params
        self._single = YOLODetector(size, class_ids, model, conf_thresh,
                                    nms_thresh, max_area, min_aspect_ratio)
        self.n_streams = n_streams
        self._pending = None
        self._kernel = self._build_kernel()

    def _build_kernel(self):
        from ..models.yolo import decode_heads
        d = self._single
        module = d.module
        c, ih, iw = d.model.INPUT_SHAPE
        oy, ox, rh, rw = d._roi
        anchors = tuple(tuple(a) for a in d.model.ANCHORS)
        scales = tuple(d.model.SCALES)
        new_coords = d.model.NEW_COORDS
        label_mask = jnp.asarray(d.label_mask)
        scale_wh = jnp.asarray(
            np.concatenate([d.upscaled_sz, d.upscaled_sz]), jnp.float32)
        offset = jnp.asarray(d.bbox_offset, jnp.float32)
        conf, nmsr = d.conf_thresh, d.nms_thresh
        max_area, min_ar = d.max_area, d.min_aspect_ratio

        # same phase-packed (fused s2d) letterbox as the single-stream
        # kernel (detector.py): skip the in-graph layout shuffle when the
        # stem folds and the geometry is 2-aligned
        from ..detector import PACKED_STEM, _resize_phase_packed
        pack = (PACKED_STEM and getattr(d, 'quantize', None) is None
                and hasattr(module, 'stem_packs') and module.stem_packs(ih, iw)
                and ih % 2 == 0 and iw % 2 == 0 and rh % 2 == 0
                and rw % 2 == 0 and oy % 2 == 0 and ox % 2 == 0)

        def one_frame_canvas(frame):
            f = frame.astype(jnp.float32)
            rgb = f[..., ::-1] / 255.0
            if pack:
                packed = _resize_phase_packed(rgb, (rh, rw))
                canvas = jnp.full((ih // 2, iw // 2, 4 * c), 0.5, jnp.float32)
                return jax.lax.dynamic_update_slice(
                    canvas, packed, (oy // 2, ox // 2, 0))
            resized = _resize_bilinear_rgb(rgb, (rh, rw))
            canvas = jnp.full((ih, iw, 3), 0.5, jnp.float32)
            return jax.lax.dynamic_update_slice(canvas, resized, (oy, ox, 0))

        @jax.jit
        def kernel(params, frames):
            canvases = jax.vmap(one_frame_canvas)(frames)   # [S, ih, iw, 3]
            heads = module.apply(params, canvases,
                                 prepacked=pack)            # batched MXU work
            det_out = decode_heads(heads, anchors, scales, (ih, iw),
                                   new_coords)              # [S, N, 7]
            return jax.vmap(
                lambda rows: _nms_and_gate(rows, label_mask, conf, nmsr,
                                           max_area, min_ar, scale_wh,
                                           offset))(det_out)

        return kernel

    def detect_async(self, frames):
        self._pending = self._kernel(self._single.params, jnp.asarray(frames))

    def postprocess(self):
        tlbr, label, conf, valid = jax.device_get(self._pending)
        self._pending = None
        out = []
        for s in range(tlbr.shape[0]):
            keep = valid[s]
            out.append(make_detections(tlbr[s][keep].astype(float),
                                       label[s][keep].astype(int),
                                       conf[s][keep].astype(float)))
        return out

    def postprocess_device_batch(self):
        """Padded per-stream DEVICE arrays, no host sync."""
        out = self._pending
        self._pending = None
        return out


class MultiStreamMOT:
    """S independent streams, every stage batched over the stream axis.

    API: ``step(frames)`` where ``frames`` is a length-S list of BGR
    frames (or an [S, H, W, 3] array); ``visible_tracks(s)`` per stream;
    ``reset(cap_dt)``; ``sync()`` flushes deferred host bookkeeping.
    """

    def __init__(self, size, n_streams,
                 detector_frame_skip=5,
                 class_ids=(1,),
                 yolo_detector_cfg=None,
                 feature_extractor_cfgs=None,
                 tracker_cfg=None,
                 mesh=None):
        self.size = size
        self.n_streams = n_streams
        assert detector_frame_skip >= 1
        self.detector_frame_skip = detector_frame_skip
        self.class_ids = tuple(np.unique(class_ids))

        self.detector = BatchedYOLODetector(size, self.class_ids, n_streams,
                                            **_vars(yolo_detector_cfg))
        if feature_extractor_cfgs is None:
            feature_extractor_cfgs = ({'model': 'OSNet025'},)
        self.extractor = FeatureExtractor(**_vars(feature_extractor_cfgs[0]))
        self.stream_tracker = StreamTracker(
            size, self.extractor.metric, n_streams, mesh=mesh,
            **_vars(tracker_cfg))
        self._frame_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._frame_sharding = NamedSharding(mesh, P('streams'))
        self.frame_count = 0

    @property
    def trackers(self):
        """Per-stream host mirrors (presentation shells)."""
        return self.stream_tracker.trackers

    def visible_tracks(self, stream: int):
        return self.stream_tracker.visible_tracks(stream)

    def sync(self):
        self.stream_tracker.sync()

    def reset(self, cap_dt):
        self.frame_count = 0
        self.stream_tracker.reset(cap_dt)

    def _stage_frames(self, frames):
        if isinstance(frames, (list, tuple)):
            assert len(frames) == self.n_streams
            if all(isinstance(f, jax.Array) for f in frames):
                stacked = jnp.stack(frames)
            else:
                stacked = jnp.asarray(np.stack(frames))
        else:
            stacked = jnp.asarray(frames)
        if self._frame_sharding is not None:
            stacked = jax.device_put(stacked, self._frame_sharding)
        return stacked

    def step(self, frames):
        frames_dev = self._stage_frames(frames)
        if self.frame_count == 0:
            self.detector.detect_async(frames_dev)
            all_dets = self.detector.postprocess()
            self.stream_tracker.init(frames_dev, all_dets)
        elif self.frame_count % self.detector_frame_skip == 0:
            with Profiler('preproc'):
                self.detector.detect_async(frames_dev)
            with Profiler('detect'):
                # chained flow+KF for every stream (one dispatch) while
                # the batched detector graph runs — all async
                self.stream_tracker.track(frames_dev)
                det_b = self.detector.postprocess_device_batch()
            with Profiler('extract'):
                self.extractor.extract_async_batch(
                    frames_dev, det_b[0], det_b[3])
                emb_b = self.extractor.postprocess_device()
            with Profiler('assoc'):
                # one dispatch for ALL streams' associations; decisions
                # are replayed into the host mirrors at the next sync()
                self.stream_tracker.update_device(self.frame_count, det_b,
                                                  emb_b)
        else:
            with Profiler('track'):
                self.stream_tracker.track(frames_dev)
        self.frame_count += 1
