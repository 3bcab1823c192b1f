"""ctypes binding for the native host-IO runtime (native/slamio.cpp):
libjpeg/libpng decode + N-worker prefetching sequence reader.

Builds on demand with the repo Makefile (g++ is in the image; pybind11 is
not, hence the C ABI + ctypes).  Falls back silently when a toolchain or the
codec libraries are unavailable — ``media.py`` then uses cv2/imageio."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO = os.path.join(_NATIVE_DIR, "libslamio.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO):
            subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_SO)
        lib.slamio_decode_dims.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.slamio_decode_dims.restype = ctypes.c_int
        lib.slamio_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.slamio_decode.restype = ctypes.c_int
        lib.slamio_open_sequence.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.slamio_open_sequence.restype = ctypes.c_void_p
        lib.slamio_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.slamio_next.restype = ctypes.c_int
        lib.slamio_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def imread_rgb(path: str) -> Optional[np.ndarray]:
    """Decode one image to HxWx3 uint8 RGB via the native library."""
    lib = _load()
    if lib is None:
        return None
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.slamio_decode_dims(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    buf = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.slamio_decode(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.nbytes, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        return None
    return buf


class NativeSequence:
    """Prefetching in-order photo-sequence reader (MediaSource-compatible)."""

    def __init__(self, paths: list[str], capacity: int = 8, threads: int = 2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native slamio unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.slamio_open_sequence(arr, len(self._paths),
                                                capacity, threads)
        if not self._handle:
            raise RuntimeError("slamio_open_sequence failed")
        # assume constant dims across the sequence (reference does too)
        h, w = ctypes.c_int(), ctypes.c_int()
        if paths and lib.slamio_decode_dims(self._paths[0], ctypes.byref(h),
                                            ctypes.byref(w)) == 0:
            self._hw = (h.value, w.value)
        else:
            self._hw = (0, 0)

    def next_frame(self) -> Optional[np.ndarray]:
        if self._handle is None:
            return None
        h, w = ctypes.c_int(), ctypes.c_int()
        cap = max(self._hw[0] * self._hw[1] * 3, 1)
        buf = np.empty(cap, np.uint8)
        while True:
            rc = self._lib.slamio_next(
                self._handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                cap, ctypes.byref(h), ctypes.byref(w))
            if rc == 1:
                return buf[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()
            if rc == -1:
                continue  # undecodable frame skipped
            if rc == -2:
                cap *= 4
                buf = np.empty(cap, np.uint8)
                continue
            return None  # end

    def close(self):
        if self._handle:
            self._lib.slamio_close(self._handle)
            self._handle = None

    def __iter__(self):
        while True:
            f = self.next_frame()
            if f is None:
                return
            yield f

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
