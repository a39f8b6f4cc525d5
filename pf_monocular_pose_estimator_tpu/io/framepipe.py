"""ctypes wrapper for the native frame-ingestion ring buffer.

See native/framepipe.cpp for the design (the reference's ROS image
transport / nodelet zero-copy equivalent).  The library is built lazily
with `make -C native` on first use; environments without a toolchain can
fall back to the pure-Python `PyFramePipe` with the same interface.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import time
from collections import deque
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libframepipe.so")

_lib = None


def _load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fp_create.restype = ctypes.c_void_p
    lib.fp_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.fp_destroy.argtypes = [ctypes.c_void_p]
    lib.fp_push.restype = ctypes.c_longlong
    lib.fp_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_double]
    lib.fp_pop.restype = ctypes.c_longlong
    lib.fp_pop.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
    ]
    lib.fp_pop_latest.restype = ctypes.c_longlong
    lib.fp_pop_latest.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.fp_pushed.restype = ctypes.c_ulonglong
    lib.fp_pushed.argtypes = [ctypes.c_void_p]
    lib.fp_dropped.restype = ctypes.c_ulonglong
    lib.fp_dropped.argtypes = [ctypes.c_void_p]
    lib.fp_pending.restype = ctypes.c_int
    lib.fp_pending.argtypes = [ctypes.c_void_p]
    lib.fp_close.argtypes = [ctypes.c_void_p]
    lib.fp_start_replay.restype = ctypes.c_int
    lib.fp_start_replay.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_double,
        ctypes.c_double,
    ]
    lib.fp_stop_replay.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class FramePipe:
    """Native SPSC frame ring buffer with red-channel extraction."""

    def __init__(self, width: int, height: int, capacity: int = 8):
        self._lib = _load_library()
        self._handle = self._lib.fp_create(width, height, capacity)
        if not self._handle:
            raise RuntimeError("fp_create failed")
        self.width = width
        self.height = height
        self._out = np.empty((height, width), np.uint8)
        self._replay_buffer = None  # keep replay frames alive

    def push(self, frame: np.ndarray, timestamp: float) -> int:
        """frame: (H, W) uint8 grayscale or (H, W, 3) uint8 BGR."""
        frame = np.ascontiguousarray(frame, np.uint8)
        channels = 1 if frame.ndim == 2 else frame.shape[2]
        seq = self._lib.fp_push(
            self._handle, frame.ctypes.data_as(ctypes.c_char_p), channels, timestamp
        )
        if seq < 0:
            raise RuntimeError("fp_push failed (closed pipe or bad channels)")
        return int(seq)

    def pop(self, timeout_ms: int = 1000) -> Optional[Tuple[np.ndarray, float, int]]:
        ts = ctypes.c_double()
        seq = self._lib.fp_pop(
            self._handle, self._out.ctypes.data_as(ctypes.c_char_p), ctypes.byref(ts), timeout_ms
        )
        if seq < 0:
            return None
        return self._out.copy(), ts.value, int(seq)

    def pop_latest(self, timeout_ms: int = 1000):
        """Newest frame, skipping stale ones; returns (frame, ts, seq, skipped)."""
        ts = ctypes.c_double()
        skipped = ctypes.c_int()
        seq = self._lib.fp_pop_latest(
            self._handle,
            self._out.ctypes.data_as(ctypes.c_char_p),
            ctypes.byref(ts),
            timeout_ms,
            ctypes.byref(skipped),
        )
        if seq < 0:
            return None
        return self._out.copy(), ts.value, int(seq), int(skipped.value)

    def start_replay(self, frames: np.ndarray, fps: float, t0: float = 0.0):
        """Replay (T, H, W) uint8 frames from a native thread at `fps`."""
        frames = np.ascontiguousarray(frames, np.uint8)
        self._replay_buffer = frames
        rc = self._lib.fp_start_replay(
            self._handle,
            frames.ctypes.data_as(ctypes.c_char_p),
            frames.shape[0],
            fps,
            t0,
        )
        if rc != 0:
            raise RuntimeError("fp_start_replay failed")

    def stop_replay(self):
        self._lib.fp_stop_replay(self._handle)

    @property
    def stats(self):
        return {
            "pushed": int(self._lib.fp_pushed(self._handle)),
            "dropped": int(self._lib.fp_dropped(self._handle)),
            "pending": int(self._lib.fp_pending(self._handle)),
        }

    def close(self):
        if self._handle:
            self._lib.fp_close(self._handle)

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.fp_destroy(self._handle)
            self._handle = None


class PyFramePipe:
    """Pure-Python fallback with the same interface (for toolchain-less
    environments); thread-safe bounded deque."""

    def __init__(self, width: int, height: int, capacity: int = 8):
        self.width = width
        self.height = height
        self._q = deque(maxlen=capacity)
        self._lock = threading.Lock()
        self._event = threading.Event()
        self._pushed = 0
        self._dropped = 0
        self._seq = 0

    def push(self, frame: np.ndarray, timestamp: float) -> int:
        if frame.ndim == 3:
            frame = frame[..., 2]  # red of BGR
        with self._lock:
            if len(self._q) == self._q.maxlen:
                self._dropped += 1
            seq = self._seq
            self._q.append((np.array(frame, np.uint8), timestamp, seq))
            self._seq += 1
            self._pushed += 1
        self._event.set()
        return seq

    def pop(self, timeout_ms: int = 1000):
        deadline = time.monotonic() + timeout_ms / 1000.0
        while True:
            with self._lock:
                if self._q:
                    return self._q.popleft()
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                return None
            self._event.wait(remaining)
            self._event.clear()

    @property
    def stats(self):
        with self._lock:
            return {"pushed": self._pushed, "dropped": self._dropped, "pending": len(self._q)}
