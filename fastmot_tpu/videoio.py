"""Video I/O with a background capture thread.

Behavioral reference: fastmot/videoio.py. Same URI -> protocol dispatch
(IMAGE / VIDEO / CSI / V4L2 / RTSP / HTTP, videoio.py:15-21, 256-272),
background capture thread with a bounded condvar-protected deque where
live sources drop the oldest frame and file sources block
(videoio.py:240-254), and ``cap_dt`` clamped to the processing rate for
live sources (videoio.py:105-108).

GStreamer pipelines are used when OpenCV has GStreamer support; otherwise
capture falls back to plain cv2.VideoCapture (this environment's OpenCV
builds without GStreamer — the hardware-codec pipeline strings of the
reference are Jetson-specific).
"""
from __future__ import annotations

import enum
import logging
import threading
from collections import deque
from pathlib import Path
from urllib.parse import urlparse

import cv2
import numpy as np

LOGGER = logging.getLogger(__name__)


class Protocol(enum.Enum):
    IMAGE = 0
    VIDEO = 1
    CSI = 2
    V4L2 = 3
    RTSP = 4
    HTTP = 5


IMG_FORMATS = ('bmp', 'dng', 'jpg', 'jpeg', 'mpo', 'png', 'tif', 'tiff',
               'webp')
VID_FORMATS = ('asf', 'avi', 'gif', 'm4v', 'mkv', 'mov', 'mp4', 'mpeg',
               'mpg', 'ts', 'wmv')


def _has_gstreamer() -> bool:
    """True when this OpenCV build has GStreamer support."""
    try:
        info = cv2.getBuildInformation()
    except Exception:
        return False
    for line in info.splitlines():
        if 'GStreamer' in line:
            return 'YES' in line
    return False


def _gst_write_pipeline(output_uri: str, fps: float) -> str:
    """GStreamer H.264 write pipeline (reference videoio.py:214-238).

    The reference emits a hardware-encode (omxh264enc/nvv4l2h264enc)
    pipeline on Jetson; a TPU VM has no NVENC, so the capability analog
    is software x264 (zerolatency, matching the reference's realtime
    intent). Container is chosen by extension like the reference's
    mp4mux/matroskamux split.
    """
    suffix = Path(urlparse(output_uri).path).suffix.lower()
    mux = 'matroskamux' if suffix == '.mkv' else 'mp4mux'
    return (
        'appsrc ! autovideoconvert ! '
        'x264enc tune=zerolatency speed-preset=superfast bitrate=8000 ! '
        f'h264parse ! {mux} ! '
        f'filesink location={output_uri}'
    )


def _parse_uri(uri: str) -> Protocol:
    """URI -> protocol (videoio.py:256-272)."""
    result = urlparse(uri)
    if result.scheme == 'csi':
        return Protocol.CSI
    if result.scheme == 'rtsp':
        return Protocol.RTSP
    if result.scheme in ('http', 'https'):
        return Protocol.HTTP
    if '/dev/video' in uri:
        return Protocol.V4L2
    if '%' in uri or Path(uri).suffix[1:].lower() in IMG_FORMATS:
        return Protocol.IMAGE
    return Protocol.VIDEO


class VideoIO:
    """Video capture and output with frame buffering (videoio.py:24-154)."""

    def __init__(self, size, input_uri,
                 output_uri=None,
                 resolution=(1920, 1080),
                 frame_rate=30,
                 buffer_size=10,
                 proc_fps=30):
        self.size = tuple(int(s) for s in size)
        self.input_uri = input_uri
        self.output_uri = output_uri
        self.resolution = tuple(int(r) for r in resolution)
        assert frame_rate > 0
        self.frame_rate = frame_rate
        assert buffer_size >= 1
        self.buffer_size = buffer_size
        assert proc_fps > 0
        self.proc_fps = proc_fps

        self.protocol = _parse_uri(input_uri)
        self.is_live = self.protocol not in (Protocol.IMAGE, Protocol.VIDEO)

        # native multithreaded JPEG decode for image sequences when built
        # (native/framepipe.cpp — the role of the reference's hardware
        # GStreamer decode pipeline, videoio.py:156-238)
        self._pipe = None
        if self.protocol == Protocol.IMAGE and '%' in input_uri and \
                input_uri.lower().endswith(('.jpg', '.jpeg')):
            from .utils.framepipe import FramePipe
            if FramePipe.available():
                try:
                    self._pipe = FramePipe(input_uri, self.size)
                except Exception:
                    self._pipe = None

        if self._pipe is None:
            if self.protocol == Protocol.IMAGE:
                self.source = cv2.VideoCapture(input_uri, cv2.CAP_IMAGES)
            else:
                self.source = cv2.VideoCapture(input_uri)
            if not self.source.isOpened():
                raise RuntimeError(f'Unable to open video stream: {input_uri}')
        else:
            self.source = None

        self.frame_queue: deque = deque([], maxlen=buffer_size)
        self.cond = threading.Condition()
        self.exit_event = threading.Event()
        self.cap_thread = threading.Thread(target=self._capture_frames,
                                           daemon=True)

        # validate the stream with the first frame (videoio.py:82-85)
        ret, frame = self._source_read()
        if not ret:
            raise RuntimeError(f'Unable to read video stream: {input_uri}')
        if frame.shape[1::-1] != self.size:
            frame = cv2.resize(frame, self.size)
        self.frame_queue.append(frame)

        src_fps = self.source.get(cv2.CAP_PROP_FPS) \
            if self.source is not None else 0
        self.cap_fps = src_fps if src_fps > 0 else self.frame_rate
        # for live sources, processing cannot outpace proc_fps
        # (videoio.py:105-108)
        self.cap_dt = 1.0 / min(self.cap_fps, self.proc_fps) if self.is_live \
            else 1.0 / self.cap_fps

        self.writer = None
        if output_uri is not None:
            if _has_gstreamer():
                # software-H.264 GStreamer pipeline (the reference's
                # hardware-encode path, videoio.py:214-238 — see
                # docs/COMPONENTS.md for the NVENC->x264 divergence)
                self.writer = cv2.VideoWriter(
                    _gst_write_pipeline(output_uri, self.cap_fps),
                    cv2.CAP_GSTREAMER, 0, self.cap_fps, self.size)
            if self.writer is None or not self.writer.isOpened():
                fourcc = cv2.VideoWriter_fourcc(*'mp4v')
                self.writer = cv2.VideoWriter(output_uri, fourcc,
                                              self.cap_fps, self.size)

    def _source_read(self):
        if self._pipe is not None:
            frame = self._pipe.read()
            return frame is not None, frame
        return self.source.read()

    def start_capture(self):
        """Start the capture thread (videoio.py:110-115)."""
        if self.source is not None and not self.source.isOpened():
            self.source.open(self.input_uri)
        if not self.cap_thread.is_alive():
            self.cap_thread.start()

    def stop_capture(self):
        with self.cond:
            self.exit_event.set()
            self.cond.notify()
        self.frame_queue.clear()
        if self.cap_thread.is_alive():
            self.cap_thread.join()

    def read(self):
        """Return the next frame, or None at end of stream
        (videoio.py:119-139)."""
        with self.cond:
            while len(self.frame_queue) == 0 and not self.exit_event.is_set():
                self.cond.wait()
            if len(self.frame_queue) == 0 and self.exit_event.is_set():
                return None
            frame = self.frame_queue.popleft()
            self.cond.notify()
        return frame

    def write(self, frame):
        assert self.writer is not None
        self.writer.write(frame)

    def release(self):
        self.stop_capture()
        if self.writer is not None:
            self.writer.release()
        if self._pipe is not None:
            self._pipe.close()
        if self.source is not None:
            self.source.release()

    def _capture_frames(self):
        """Capture loop: live sources drop frames, files block
        (videoio.py:240-254)."""
        while not self.exit_event.is_set():
            ret, frame = self._source_read()
            with self.cond:
                if not ret:
                    self.exit_event.set()
                    self.cond.notify()
                    break
                if frame.shape[1::-1] != self.size:
                    frame = cv2.resize(frame, self.size)
                if self.is_live:
                    if len(self.frame_queue) == self.frame_queue.maxlen:
                        self.frame_queue.popleft()  # drop the oldest
                    self.frame_queue.append(frame)
                else:
                    while (len(self.frame_queue) == self.frame_queue.maxlen
                           and not self.exit_event.is_set()):
                        self.cond.wait()
                    self.frame_queue.append(frame)
                self.cond.notify()
