"""Multi-stream MOT: several video streams tracked on one chip (or mesh).

BASELINE config 5 ("8x 1080p streams batched per TPU chip"): the reference
is strictly single-stream; here the detector runs as ONE batched graph
over all streams' frames (a leading stream axis feeds the MXU far more
efficiently than batch-1 convs), ReID crops from every stream share one
OSNet batch, and the per-stream trackers' fused track-frame kernels are
dispatched back-to-back — XLA's async dispatch pipelines them on device.

All streams share the detector-skip schedule, mirroring the reference's
frame loop semantics per stream.
"""
from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from ..detector import MAX_RAW, MAX_DETS, _nms_and_gate, _resize_bilinear_rgb, \
    make_detections
from ..feature_extractor import FeatureExtractor
from ..tracker import MultiTracker
from ..utils import Profiler


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

        def one_frame_canvas(frame):
            f = frame.astype(jnp.float32)
            rgb = f[..., ::-1] / 255.0
            resized = _resize_bilinear_rgb(rgb, (rh, rw))
            canvas = jnp.full((ih, iw, 3), 0.5, jnp.float32)
            return jax.lax.dynamic_update_slice(canvas, resized, (oy, ox, 0))

        @jax.jit
        def kernel(params, frames):
            canvases = jax.vmap(one_frame_canvas)(frames)   # [S, ih, iw, 3]
            heads = module.apply(params, canvases)          # batched MXU work
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
    """S independent streams, batched perception, per-stream association.

    API: ``step(frames)`` where ``frames`` is a length-S list of BGR
    frames; ``visible_tracks(s)`` per stream; ``reset(cap_dt)``.
    """

    def __init__(self, size, n_streams,
                 detector_frame_skip=5,
                 class_ids=(1,),
                 yolo_detector_cfg=None,
                 feature_extractor_cfgs=None,
                 tracker_cfg=None):
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
        self.trackers = [MultiTracker(size, self.extractor.metric,
                                      **_vars(tracker_cfg))
                         for _ in range(n_streams)]
        self.frame_count = 0

    def visible_tracks(self, stream: int):
        self.trackers[stream].sync()
        return (t for t in self.trackers[stream].tracks.values()
                if t.confirmed and t.active)

    def reset(self, cap_dt):
        self.frame_count = 0
        for trk in self.trackers:
            trk.reset(cap_dt)

    def step(self, frames):
        assert len(frames) == self.n_streams
        if self.frame_count == 0:
            self.detector.detect_async(np.stack(frames))
            all_dets = self.detector.postprocess()
            for s, trk in enumerate(self.trackers):
                trk.init(frames[s], all_dets[s])
        elif self.frame_count % self.detector_frame_skip == 0:
            import jax
            with Profiler('preproc'):
                self.detector.detect_async(jnp.stack(
                    [jnp.asarray(f) for f in frames]))
            with Profiler('detect'):
                # chained flow+KF for every stream while the batched
                # detector graph runs (all async dispatches)
                for s, trk in enumerate(self.trackers):
                    trk.track(frames[s])
                tlbr_b, label_b, conf_b, valid_b = \
                    self.detector.postprocess_device_batch()
            with Profiler('extract'):
                emb_dev = []
                for s in range(self.n_streams):
                    self.extractor.extract_async_device(
                        jnp.asarray(frames[s]), tlbr_b[s], valid_b[s])
                    emb_dev.append(self.extractor.postprocess_device())
            with Profiler('assoc'):
                # all-device association: one dispatch per stream, ZERO
                # blocking readbacks — decisions are made on device and
                # replayed into the host mirrors at the next sync()
                for s, trk in enumerate(self.trackers):
                    det_dev = (tlbr_b[s], label_b[s], conf_b[s], valid_b[s])
                    trk.update_device(self.frame_count, det_dev, emb_dev[s])
        else:
            with Profiler('track'):
                # async dispatch: the chained kernels for all streams
                # overlap on device
                for s, trk in enumerate(self.trackers):
                    trk.track(frames[s])
        self.frame_count += 1
