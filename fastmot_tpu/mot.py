"""Top-level MOT orchestrator.

Behavioral reference: fastmot/mot.py. Preserves the public API
(``MOT(size, **cfg)``, ``step``, ``reset``, ``visible_tracks``,
``frame_count``) and the N-frame detector-skip schedule (mot.py:125-168):
the detector + ReID extractor run every ``detector_frame_skip`` frames
while KLT flow + Kalman fill the gap frames.

CPU/GPU overlap in the reference (async TRT streams vs host Numba) maps to
XLA's asynchronous dispatch: ``detect_async`` launches the jitted detector
graph, the flow kernel is dispatched next, and ``postprocess`` blocks on
the detector result — both computations are in flight on the chip
concurrently, no explicit streams needed.
"""
from __future__ import annotations

import enum
import logging
from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np

from .detector import PublicDetector
from .feature_extractor import FeatureExtractor
from .tracker import MultiTracker
from .utils import Profiler
from .utils.visualization import Visualizer

LOGGER = logging.getLogger(__name__)


class DetectorType(enum.Enum):
    SSD = 0
    YOLO = 1
    PUBLIC = 2


def _vars(cfg):
    if cfg is None:
        return {}
    return vars(cfg) if isinstance(cfg, SimpleNamespace) else dict(cfg)


class MOT:
    """Integrates detection, feature extraction, and tracking
    (mot.py:25-101)."""

    def __init__(self, size,
                 detector_type='YOLO',
                 detector_frame_skip=5,
                 class_ids=(1,),
                 ssd_detector_cfg=None,
                 yolo_detector_cfg=None,
                 public_detector_cfg=None,
                 feature_extractor_cfgs=None,
                 tracker_cfg=None,
                 visualizer_cfg=None,
                 draw=False):
        self.size = size
        self.detector_type = DetectorType[detector_type.upper()]
        assert detector_frame_skip >= 1
        self.detector_frame_skip = detector_frame_skip
        self.class_ids = tuple(np.unique(class_ids))
        self.draw = draw

        if feature_extractor_cfgs is None:
            feature_extractor_cfgs = (SimpleNamespace(),)
        if len(feature_extractor_cfgs) != len(self.class_ids):
            raise ValueError(
                'Number of feature extractors must match length of class IDs')

        LOGGER.info('Loading detector model...')
        if self.detector_type == DetectorType.SSD:
            from .detector import SSDDetector
            self.detector = SSDDetector(self.size, self.class_ids,
                                        **_vars(ssd_detector_cfg))
        elif self.detector_type == DetectorType.YOLO:
            from .detector import YOLODetector
            self.detector = YOLODetector(self.size, self.class_ids,
                                         **_vars(yolo_detector_cfg))
        elif self.detector_type == DetectorType.PUBLIC:
            self.detector = PublicDetector(self.size, self.class_ids,
                                           self.detector_frame_skip,
                                           **_vars(public_detector_cfg))

        LOGGER.info('Loading feature extractor models...')
        self.extractors = [FeatureExtractor(**_vars(cfg))
                           for cfg in feature_extractor_cfgs]
        self.tracker = MultiTracker(self.size, self.extractors[0].metric,
                                    **_vars(tracker_cfg))
        self.visualizer = Visualizer(**_vars(visualizer_cfg))
        self.frame_count = 0
        # cross-call gap-frame buffer for step_batch: chains survive
        # arbitrary caller chunk sizes, so a detection frame is chained
        # with its preceding gap frames even when the caller batches
        # exactly one skip cycle per call (the app.py file loop does) —
        # without this, every detection frame's flow ran as its own
        # per-frame dispatch pair (~0.8 ms/cycle of extra kernel time
        # plus two enqueues, r5 trace)
        self._gap_buf = []

    def visible_tracks(self):
        """Confirmed and active tracks from the tracker (mot.py:103-112).

        Forces processing of any buffered gap frames and consumption of
        in-flight chained-frame results so the host mirrors are
        current."""
        self._flush_gaps()
        self.tracker.sync()
        return (track for track in self.tracker.tracks.values()
                if track.confirmed and track.active)

    def flush_tracks(self):
        """Buffered consumption for the txt writer: apply ALL deferred
        device results in one batched fetch and return
        ``{frame_id: [(trk_id, tlbr), ...]}`` snapshots of the
        confirmed+active tracks after each processed frame — identical
        rows to calling visible_tracks() every frame, without forcing a
        device sync per frame (the reference's writer is synchronous,
        app.py:92-97; here a per-frame sync would re-serialize the
        deferred pipeline)."""
        self._flush_gaps()
        return self.tracker.sync(snapshots=True)

    def reset(self, cap_dt):
        """Reset the tracker; must be called before ``step`` (mot.py:114-123).

        Buffered gap frames are processed first so replay equality with
        per-frame stepping holds across a reset."""
        if self._gap_buf and self.frame_count:
            self._flush_gaps()
        self._gap_buf.clear()
        self.frame_count = 0
        self.tracker.reset(cap_dt)

    def _flush_gaps(self):
        """Dispatch any gap frames buffered by step_batch (chained:
        tracker.track_chain — TWO device dispatches per run)."""
        if not self._gap_buf:
            return
        buf, self._gap_buf = self._gap_buf, []
        with Profiler('track'):
            self.tracker.track_chain([f for f, _ in buf],
                                     [i for _, i in buf])

    def step(self, frame):
        """Run the tracker on the next frame (mot.py:125-168)."""
        self._flush_gaps()
        detections = []
        # one host->device transfer per frame, shared by the detector,
        # optical flow, and the ReID extractor (the reference's pinned
        # buffers play this role, inference.py:7-36)
        frame_dev = jnp.asarray(frame)
        if self.frame_count == 0:
            detections = self.detector(frame_dev)
            self.tracker.init(frame_dev, detections)
        elif self.frame_count % self.detector_frame_skip == 0:
            # all-device detection frame: detector output and embeddings
            # stay on device end-to-end; the association consumes them
            # with a single batched readback (two total for the frame)
            device_path = (not self.draw and len(self.extractors) == 1
                           and hasattr(self.detector, 'postprocess_device'))
            with Profiler('preproc'):
                self.detector.detect_async(frame_dev)

            with Profiler('detect'):
                with Profiler('track'):
                    # flow + Kalman for the whole frame, dispatched while
                    # the detector graph runs (XLA schedules both)
                    self.tracker.track(frame_dev, self.frame_count)
                if device_path:
                    det_dev = self.detector.postprocess_device()
                else:
                    detections = self.detector.postprocess()

            with Profiler('extract'):
                if not device_path:
                    cls_bboxes = self._split_bboxes_by_cls(
                        detections.tlbr, detections.label, self.class_ids)
                    for extractor, bboxes in zip(self.extractors, cls_bboxes):
                        extractor.extract_async(frame_dev, bboxes)
                    embeddings = [ex.postprocess() for ex in self.extractors]
                    embeddings = np.concatenate(embeddings) \
                        if len(embeddings) > 1 else embeddings[0]

            with Profiler('assoc'):
                if device_path:
                    # ReID extraction is FUSED into the association's
                    # cost kernel (one dispatch fewer per frame; see
                    # tracker.update_device_fused)
                    self.tracker.update_device_fused(
                        self.frame_count, frame_dev, det_dev,
                        self.extractors[0])
                else:
                    self.tracker.update(self.frame_count, detections,
                                        embeddings)
        else:
            with Profiler('track'):
                self.tracker.track(frame_dev, self.frame_count)

        if self.draw:
            self._draw(frame, detections)
        self.frame_count += 1

    def step_batch(self, frames):
        """Process several frames at once — the offline/file-mode fast
        path. Semantically identical to ``for f in frames: step(f)``
        (same schedule, same outputs, byte-identical txt), but runs of
        consecutive tracking-only frames go through
        ``tracker.track_chain`` — TWO device dispatches per run instead
        of two per frame, and (on the all-device association path) the
        DETECTION frame's flow is folded into the same chain: the
        detector graph is dispatched first so it overlaps the chained
        flow on device, and the whole skip cycle costs six enqueues
        instead of ten. Worth using whenever the source is a file or
        image sequence (those block rather than drop, so batching adds
        no correctness divergence — reference videoio.py:240-254
        semantics); live sources should keep per-frame ``step`` for
        latency. Falls back to per-frame stepping when drawing (draw
        reads per-frame track state)."""
        if self.draw:
            for frame in frames:
                self.step(frame)
            return
        device_path = (len(self.extractors) == 1
                       and hasattr(self.detector, 'postprocess_device'))

        # gap frames accumulate in self._gap_buf ACROSS step_batch calls
        # (flushed lazily by the next detection frame, a per-frame
        # step(), visible_tracks/flush_tracks, or reset): the chain is
        # independent of the caller's chunk size, so a detection frame
        # is always chained with its preceding gap frames even when the
        # caller batches exactly one skip cycle per call.
        for frame in frames:
            if self.frame_count == 0:
                self.step(frame)
            elif self.frame_count % self.detector_frame_skip == 0:
                if not device_path:
                    self.step(frame)
                    continue
                frame_dev = jnp.asarray(frame)
                with Profiler('preproc'):
                    self.detector.detect_async(frame_dev)
                self._gap_buf.append((frame_dev, self.frame_count))
                with Profiler('detect'):
                    self._flush_gaps()
                    det_dev = self.detector.postprocess_device()
                with Profiler('assoc'):
                    self.tracker.update_device_fused(
                        self.frame_count, frame_dev, det_dev,
                        self.extractors[0])
                self.frame_count += 1
            else:
                # upload NOW: the buffer outlives this call, so holding
                # the caller's (possibly recycled) host array would
                # alias stale data — and the early H2D overlaps the
                # in-flight chain anyway
                self._gap_buf.append((jnp.asarray(frame),
                                      self.frame_count))
                self.frame_count += 1

    @staticmethod
    def print_timing_info():
        LOGGER.debug('=================Timing Stats=================')
        LOGGER.debug(f"{'track time:':<37}"
                     f"{Profiler.get_avg_millis('track'):>6.3f} ms")
        LOGGER.debug(f"{'preprocess time:':<37}"
                     f"{Profiler.get_avg_millis('preproc'):>6.3f} ms")
        LOGGER.debug(f"{'detect/flow time:':<37}"
                     f"{Profiler.get_avg_millis('detect'):>6.3f} ms")
        LOGGER.debug(f"{'feature extract/kalman filter time:':<37}"
                     f"{Profiler.get_avg_millis('extract'):>6.3f} ms")
        LOGGER.debug(f"{'association time:':<37}"
                     f"{Profiler.get_avg_millis('assoc'):>6.3f} ms")

    @staticmethod
    def _split_bboxes_by_cls(bboxes, labels, class_ids):
        """Split class-sorted detections into per-class box groups.

        Uses a correct ascending searchsorted split — the reference's
        ``bisect_right`` only behaves for single-class configs (the
        descending-comparison quirk noted in SURVEY.md; utils/numba.py:42-52
        vs detector.py:344).
        """
        cls_bboxes = []
        begin = 0
        for cls_id in class_ids:
            end = int(np.searchsorted(labels, cls_id, side='right',
                                      sorter=None)) if len(labels) else 0
            cls_bboxes.append(bboxes[begin:end])
            begin = end
        return cls_bboxes

    def _draw(self, frame, detections):
        import cv2
        visible_tracks = list(self.visible_tracks())
        self.visualizer.render(frame, visible_tracks, detections,
                               self.tracker.klt_bboxes.values(),
                               self.tracker.flow.prev_bg_keypoints,
                               self.tracker.flow.bg_keypoints)
        cv2.putText(frame, f'visible: {len(visible_tracks)}', (30, 30),
                    cv2.FONT_HERSHEY_SIMPLEX, 1, 0, 2, cv2.LINE_AA)
