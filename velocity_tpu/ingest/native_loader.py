"""ctypes binding for the native C++ frame staging pipeline (native/frame_loader.cpp).

Builds lazily via ``make`` on first use if the shared object is missing;
falls back cleanly (callers catch ImportError/OSError and use the Python
VideoReader path).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO = _NATIVE_DIR / "libvelocity_host.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(_SO))
    lib.vh_open.restype = ctypes.c_void_p
    lib.vh_open.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.vh_start.restype = ctypes.c_int
    lib.vh_start.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                             ctypes.c_int64, ctypes.c_int]
    lib.vh_next.restype = ctypes.c_int
    lib.vh_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.vh_close.argtypes = [ctypes.c_void_p]
    lib.vh_small_dims.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


class NativeVideoStream:
    """Background-threaded native decode stream yielding (gray, small, t, idx)."""

    def __init__(self, path: str, start: int = 0, count: int = -1,
                 step: int = 1, depth: int = 6):
        lib = _load()
        w = ctypes.c_int(); h = ctypes.c_int()
        fps = ctypes.c_double(); fc = ctypes.c_int64()
        self._h = lib.vh_open(str(path).encode(), ctypes.byref(w),
                              ctypes.byref(h), ctypes.byref(fps), ctypes.byref(fc))
        if not self._h:
            raise OSError(f"native loader cannot open {path}")
        self.width, self.height = w.value, h.value
        self.fps, self.frame_count = fps.value, fc.value
        sw = ctypes.c_int(); sh = ctypes.c_int()
        lib.vh_small_dims(self._h, ctypes.byref(sw), ctypes.byref(sh))
        self.small_size = (sh.value, sw.value)
        self._lib = lib
        rc = lib.vh_start(self._h, start, count, step, depth)
        if rc != 0:
            raise OSError("native loader start failed")

    def __iter__(self):
        lib = self._lib
        H, W = self.height, self.width
        sh, sw = self.small_size
        while True:
            gray = np.empty((H, W), np.uint8)
            small = np.empty((sh, sw), np.uint8)
            t = ctypes.c_double(); idx = ctypes.c_int64()
            rc = lib.vh_next(
                self._h,
                gray.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                small.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.byref(t), ctypes.byref(idx),
            )
            if rc != 1:
                return
            yield gray, small, t.value, idx.value

    def close(self):
        if self._h:
            self._lib.vh_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False
