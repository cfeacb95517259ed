"""ctypes loader for the native runtime library (native/ C++ sources).

Builds on demand with make if the library is missing (dev convenience); all
callers must degrade to their Python fallbacks when the toolchain is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_PKG_DIR, "_lib", "libflutpu.so")
_NATIVE_DIR = os.path.join(os.path.dirname(_PKG_DIR), "native")


def _build() -> bool:
    if not os.path.isdir(_NATIVE_DIR):
        return False
    try:
        res = subprocess.run(
            ["make", "-s", "-j", "-C", _NATIVE_DIR],
            capture_output=True, timeout=300)
        return res.returncode == 0 and os.path.exists(_LIB_PATH)
    except (OSError, subprocess.TimeoutExpired):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        _configure(lib)
        _lib = lib
        return _lib


def _configure(lib: ctypes.CDLL) -> None:
    c = ctypes
    i16p = c.POINTER(c.c_int16)
    u32p = c.POINTER(c.c_uint32)
    u8p = c.POINTER(c.c_uint8)
    lib.flu_jpeg_encode_scan.restype = c.c_long
    lib.flu_jpeg_encode_scan.argtypes = [
        i16p, c.c_int, c.c_int,
        i16p, i16p, c.c_int, c.c_int,
        c.c_int, c.c_int,
        u32p, u8p, u32p, u8p, u32p, u8p, u32p, u8p,
        u8p, c.c_long,
    ]
    lib.flu_fvc_encode_plane.restype = c.c_long
    lib.flu_fvc_encode_plane.argtypes = [
        i16p, c.c_int, c.c_int,
        u32p, u8p, u32p, u8p,
        u8p, c.c_long,
    ]
