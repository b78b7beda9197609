"""ctypes bridge to the native TIFF decoder (native/tiff_reader.cc).

Decode runs outside the GIL, so the prefetch thread pool
(pipeline/segment_embed._prefetch_sites) gets true parallel decode — the
role tifffile's C core plays for the reference. Falls back silently to
the imageio path when the shared library isn't built or the file uses an
unsupported TIFF feature.

Build (cached, automatic on first use):
    g++ -O3 -shared -fPIC -std=c++17 native/tiff_reader.cc -o libsgtiff.so
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger("saguaro_tpu.fast_tiff")

__all__ = ["decode", "available"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "tiff_reader.cc")
_LIB_DIR = os.environ.get("SAGUARO_NATIVE_DIR", os.path.join(_REPO_ROOT, "native", "_build"))
_LIB = os.path.join(_LIB_DIR, "libsgtiff.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB) or (
                os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
            ):
                os.makedirs(_LIB_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.sgtiff_probe.restype = ctypes.c_int
            lib.sgtiff_probe.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.sgtiff_decode.restype = ctypes.c_int
            lib.sgtiff_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_size_t,
            ]
            _lib = lib
        except Exception as e:
            logger.info("native TIFF decoder unavailable (%s); using imageio", e)
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def decode(data: bytes) -> np.ndarray | None:
    """Decode TIFF bytes natively; None if unsupported (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    bits = ctypes.c_int()
    if lib.sgtiff_probe(data, len(data), ctypes.byref(h), ctypes.byref(w), ctypes.byref(bits)) != 0:
        return None
    dtype = np.uint16 if bits.value == 16 else np.uint8
    out = np.empty((h.value, w.value), dtype)
    rc = lib.sgtiff_decode(
        data, len(data), out.ctypes.data_as(ctypes.c_void_p), out.nbytes
    )
    if rc != 0:
        return None
    return out
