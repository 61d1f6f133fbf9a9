"""ctypes binding for the native frame-decode pipeline (native/framepipe.cpp).

The native component's role mirrors the reference's GStreamer decode
pipelines (videoio.py:156-238): frames are decoded off the consumer thread
and delivered in order from a bounded ring. Build with ``make -C native``;
``FramePipe.available()`` is False (and VideoIO falls back to OpenCV) when
the .so is missing.
"""
from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB_PATHS = [
    Path(__file__).parents[2] / 'native' / 'libframepipe.so',
    Path(__file__).parents[1] / 'libframepipe.so',
]

_lib = None
for _p in _LIB_PATHS:
    if _p.exists():
        _lib = ctypes.CDLL(str(_p))
        break

if _lib is not None:
    _lib.fp_open.restype = ctypes.c_void_p
    _lib.fp_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_long,
                             ctypes.c_int, ctypes.c_int, ctypes.c_int,
                             ctypes.c_int]
    _lib.fp_frame_size.restype = ctypes.c_long
    _lib.fp_frame_size.argtypes = [ctypes.c_void_p]
    _lib.fp_read.restype = ctypes.c_int
    _lib.fp_read.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    _lib.fp_close.restype = None
    _lib.fp_close.argtypes = [ctypes.c_void_p]


class FramePipe:
    """Ordered multithreaded JPEG sequence reader emitting BGR frames."""

    @staticmethod
    def available() -> bool:
        return _lib is not None

    def __init__(self, pattern: str, size: tuple[int, int],
                 start_idx: int = 1, end_idx: int = -1,
                 n_threads: int = 4, ring_cap: int = 16):
        assert _lib is not None, 'libframepipe.so not built (make -C native)'
        self.size = size
        self._handle = _lib.fp_open(pattern.encode(), start_idx, end_idx,
                                    n_threads, ring_cap, size[0], size[1])
        self._frame_bytes = _lib.fp_frame_size(self._handle)
        self._buf = np.empty((size[1], size[0], 3), np.uint8)

    def read(self):
        """Next frame as [H, W, 3] BGR uint8, or None at end of sequence."""
        ok = _lib.fp_read(self._handle,
                          self._buf.ctypes.data_as(ctypes.c_char_p))
        if not ok:
            return None
        return self._buf.copy()

    def close(self):
        if self._handle:
            _lib.fp_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
