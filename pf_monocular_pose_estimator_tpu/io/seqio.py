"""Recorded-sequence container IO — the rosbag-replay analogue.

The reference's integration harness replays recorded LED sequences
(`rosbag play` of UAVvsVicon*.bag, pf_mpe/launch/UAV_Target.launch:63-64);
this engine records and replays sequences through a single mmap-able
binary container (format PFSQv1, see native/seqio.cpp).  The native
reader is zero-copy — a frame access is a pointer offset into the
mapping — so replay never allocates or copies on the host side.

`SequenceWriter` / `SequenceReader` prefer the C++ library
(native/libseqio.so, built lazily with `make -C native`); when no
toolchain is available they fall back to a pure-numpy implementation of
the same format (`np.memmap` reader), bit-compatible with the native
one (pinned by tests/test_seqio.py).
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libseqio.so")

_MAGIC = b"PFSQv1\x00\x00"
_HEADER_BYTES = 64

_lib = None


def _load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR, "libseqio.so"], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sq_create.restype = ctypes.c_void_p
    lib.sq_create.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.sq_append.restype = ctypes.c_longlong
    lib.sq_append.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_double]
    lib.sq_close_writer.restype = ctypes.c_int
    lib.sq_close_writer.argtypes = [ctypes.c_void_p]
    lib.sq_open.restype = ctypes.c_void_p
    lib.sq_open.argtypes = [ctypes.c_char_p]
    lib.sq_frames.restype = ctypes.c_longlong
    lib.sq_frames.argtypes = [ctypes.c_void_p]
    lib.sq_height.restype = ctypes.c_int
    lib.sq_height.argtypes = [ctypes.c_void_p]
    lib.sq_width.restype = ctypes.c_int
    lib.sq_width.argtypes = [ctypes.c_void_p]
    lib.sq_frame.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.sq_frame.argtypes = [ctypes.c_void_p, ctypes.c_longlong,
                             ctypes.POINTER(ctypes.c_double)]
    lib.sq_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _native_available() -> bool:
    try:
        _load_library()
        return True
    except Exception:
        return False


class SequenceWriter:
    """Streams uint8 frames + timestamps into a PFSQv1 container."""

    def __init__(self, path: str, height: int, width: int, native: Optional[bool] = None):
        self.height, self.width = int(height), int(width)
        self._n = 0
        self._native = _native_available() if native is None else native
        if self._native:
            self._lib = _load_library()
            self._h = self._lib.sq_create(path.encode(), self.height, self.width)
            if not self._h:
                raise OSError(f"seqio: cannot create {path}")
            self._f = None
        else:
            self._f = open(path, "wb")
            hdr = _MAGIC + struct.pack("<IIII", self.height, self.width, 0, 0)
            hdr += struct.pack("<Q", 0) + b"\x00" * 32
            assert len(hdr) == _HEADER_BYTES
            self._f.write(hdr)
            self._h = None

    def append(self, frame: np.ndarray, t: float) -> int:
        px = np.ascontiguousarray(frame, dtype=np.uint8)
        if px.shape != (self.height, self.width):
            raise ValueError(f"frame shape {px.shape} != {(self.height, self.width)}")
        if self._native:
            n = self._lib.sq_append(self._h, px.tobytes(), float(t))
            if n < 0:
                raise OSError("seqio: append failed")
            self._n = n
        else:
            self._f.write(struct.pack("<d", float(t)))
            self._f.write(px.tobytes())
            self._n += 1
        return self._n

    def close(self):
        if self._native:
            if self._h:
                self._lib.sq_close_writer(self._h)
                self._h = None
        elif self._f:
            self._f.seek(24)
            self._f.write(struct.pack("<Q", self._n))
            self._f.close()
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class SequenceReader:
    """Zero-copy PFSQv1 reader (native mmap, or np.memmap fallback)."""

    def __init__(self, path: str, native: Optional[bool] = None):
        self._native = _native_available() if native is None else native
        if self._native:
            self._lib = _load_library()
            self._h = self._lib.sq_open(path.encode())
            if not self._h:
                raise OSError(f"seqio: cannot open {path}")
            self.n_frames = int(self._lib.sq_frames(self._h))
            self.height = int(self._lib.sq_height(self._h))
            self.width = int(self._lib.sq_width(self._h))
        else:
            with open(path, "rb") as f:
                hdr = f.read(_HEADER_BYTES)
            if hdr[:8] != _MAGIC:
                raise OSError(f"seqio: bad magic in {path}")
            self.height, self.width, dtype, _ = struct.unpack("<IIII", hdr[8:24])
            if dtype != 0:
                raise OSError("seqio: unsupported dtype")
            (self.n_frames,) = struct.unpack("<Q", hdr[24:32])
            frame_bytes = 8 + self.height * self.width
            self._mm = np.memmap(path, dtype=np.uint8, mode="r",
                                 offset=_HEADER_BYTES)
            fit = self._mm.shape[0] // frame_bytes
            self.n_frames = min(self.n_frames, fit)
            self._frame_bytes = frame_bytes
            self._h = None

    def frame(self, i: int) -> Tuple[np.ndarray, float]:
        """Returns (pixels (H, W) uint8, timestamp).  Zero-copy views."""
        if not (0 <= i < self.n_frames):
            raise IndexError(i)
        if self._native:
            t = ctypes.c_double()
            ptr = self._lib.sq_frame(self._h, i, ctypes.byref(t))
            if not ptr:
                raise IndexError(i)
            px = np.ctypeslib.as_array(ptr, shape=(self.height, self.width))
            return px, float(t.value)
        off = i * self._frame_bytes
        t = struct.unpack("<d", self._mm[off : off + 8].tobytes())[0]
        px = self._mm[off + 8 : off + self._frame_bytes].reshape(
            self.height, self.width
        )
        return px, float(t)

    def arrays(self) -> Tuple[np.ndarray, np.ndarray]:
        """Materialise the whole sequence as (frames (T,H,W) u8, times (T,))."""
        frames = np.empty((self.n_frames, self.height, self.width), np.uint8)
        times = np.empty((self.n_frames,), np.float64)
        for i in range(self.n_frames):
            px, t = self.frame(i)
            frames[i] = px
            times[i] = t
        return frames, times

    def close(self):
        if self._native and self._h:
            self._lib.sq_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def record_sequence(path: str, frames: np.ndarray, times: np.ndarray,
                    native: Optional[bool] = None) -> int:
    """Writes a (T, H, W) array + times into a PFSQv1 container."""
    frames = np.asarray(frames)
    with SequenceWriter(path, frames.shape[1], frames.shape[2], native=native) as w:
        for i in range(frames.shape[0]):
            w.append(frames[i], float(times[i]))
        return w._n
