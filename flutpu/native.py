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
    """The native library, or None when unavailable (or disabled via
    FLUTPU_NO_NATIVE=1 — exercising the pure-Python fallbacks)."""
    global _lib, _tried
    if os.environ.get("FLUTPU_NO_NATIVE"):
        return None
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # ALWAYS invoke make (a no-op when up to date): loading only when
        # the .so is absent silently tests stale binaries after C++ edits.
        if not _build() and not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        _configure(lib)
        _lib = lib
        return _lib


# Python-side callback ABI for the downloader
DATA_CB = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p, ctypes.c_size_t,
                           ctypes.c_void_p, ctypes.c_void_p)
DONE_CB = ctypes.CFUNCTYPE(None, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
                           ctypes.c_void_p, ctypes.c_void_p,
                           ctypes.POINTER(ctypes.c_int))


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
    # segment-layout host compaction (hasattr-gated: a stale .so degrades
    # to the numpy pair in ops/entropy.py)
    if hasattr(lib, "flu_compact_segments_finalize"):
        lib.flu_compact_segments_finalize.restype = c.c_long
        lib.flu_compact_segments_finalize.argtypes = [
            u32p, c.c_long, u32p, c.c_long, c.c_int, u8p, c.c_long,
        ]
    lib.flu_jpeg_decode_scan.restype = c.c_long
    lib.flu_jpeg_decode_scan.argtypes = [
        u8p, c.c_long, c.c_int,
        i16p, c.c_int, c.c_int,
        i16p, i16p, c.c_int, c.c_int,
        c.c_int, c.c_int,
        u8p, u8p, c.c_int, u8p, u8p, c.c_int,
        u8p, u8p, c.c_int, u8p, u8p, c.c_int,
    ]
    # fluc primitives
    for name in ("flu_mutex_new", "flu_monitor_new"):
        getattr(lib, name).restype = c.c_void_p
    lib.flu_barrier_new.restype = c.c_void_p
    lib.flu_barrier_new.argtypes = [c.c_int]
    for name in ("flu_mutex_lock", "flu_mutex_unlock", "flu_mutex_free",
                 "flu_monitor_lock", "flu_monitor_unlock", "flu_monitor_wait",
                 "flu_monitor_signal", "flu_monitor_broadcast",
                 "flu_monitor_free", "flu_barrier_pass", "flu_barrier_free"):
        getattr(lib, name).argtypes = [c.c_void_p]
    lib.flu_mutex_trylock.argtypes = [c.c_void_p]
    lib.flu_mutex_trylock.restype = c.c_int
    lib.flu_monitor_wait_ms.argtypes = [c.c_void_p, c.c_long]
    lib.flu_monitor_wait_ms.restype = c.c_int
    lib.flu_barrier_set_open.argtypes = [c.c_void_p, c.c_int]
    lib.flu_barrier_is_open.argtypes = [c.c_void_p]
    lib.flu_barrier_is_open.restype = c.c_int
    lib.flu_barrier_trypass_ms.argtypes = [c.c_void_p, c.c_long]
    lib.flu_barrier_trypass_ms.restype = c.c_int
    # bwmeter
    lib.flu_bwmeter_data.argtypes = [c.c_uint64]
    lib.flu_bwmeter_get.argtypes = [c.POINTER(c.c_double),
                                    c.POINTER(c.c_double),
                                    c.POINTER(c.c_uint64)]
    # bwmeter sock variant (per-connection instance meters); hasattr-gated
    # in bwmeter.py so a stale .so degrades to the Python meter
    if hasattr(lib, "flu_bwmeter_sock_new"):
        lib.flu_bwmeter_sock_new.restype = c.c_void_p
        for name in ("flu_bwmeter_sock_free", "flu_bwmeter_sock_start",
                     "flu_bwmeter_sock_end"):
            getattr(lib, name).argtypes = [c.c_void_p]
        lib.flu_bwmeter_sock_data.argtypes = [c.c_void_p, c.c_uint64]
        lib.flu_bwmeter_sock_get.argtypes = [c.c_void_p,
                                             c.POINTER(c.c_double),
                                             c.POINTER(c.c_double),
                                             c.POINTER(c.c_uint64)]
    # downloader
    lib.flu_dl_new.restype = c.c_void_p
    lib.flu_dl_new.argtypes = [DATA_CB, DONE_CB]
    lib.flu_dl_destroy.argtypes = [c.c_void_p]
    lib.flu_dl_new_task.restype = c.c_void_p
    lib.flu_dl_new_task.argtypes = [c.c_void_p, c.c_char_p, c.c_char_p,
                                    c.c_void_p]
    lib.flu_dl_abort_task.argtypes = [c.c_void_p]
    lib.flu_dl_abort_all.argtypes = [c.c_void_p, c.c_int]
    lib.flu_dl_pause.argtypes = [c.c_void_p]
    lib.flu_dl_resume.argtypes = [c.c_void_p]
    lib.flu_dl_task_get_url.restype = c.c_char_p
    lib.flu_dl_task_get_url.argtypes = [c.c_void_p]
    lib.flu_dl_task_get_length.restype = c.c_size_t
    lib.flu_dl_task_get_length.argtypes = [c.c_void_p]
    lib.flu_dl_task_get_http_status.restype = c.c_int
    lib.flu_dl_task_get_http_status.argtypes = [c.c_void_p]
    lib.flu_dl_task_get_date.restype = c.c_char_p
    lib.flu_dl_task_get_date.argtypes = [c.c_void_p]
    lib.flu_dl_task_get_header.restype = c.c_char_p
    lib.flu_dl_task_get_header.argtypes = [c.c_void_p]
    lib.flu_dl_task_get_outcome.restype = c.c_int
    lib.flu_dl_task_get_outcome.argtypes = [c.c_void_p]
    lib.flu_dl_task_set_outcome.argtypes = [c.c_void_p, c.c_int]
    lib.flu_dl_outcome_string.restype = c.c_char_p
    lib.flu_dl_outcome_string.argtypes = [c.c_int]
    lib.flu_dl_set_polling_period.argtypes = [c.c_void_p, c.c_long]
    lib.flu_dl_get_polling_period.restype = c.c_long
    lib.flu_dl_get_polling_period.argtypes = [c.c_void_p]
    lib.flu_dl_set_timeouts.argtypes = [c.c_void_p, c.c_long, c.c_long]
    lib.flu_dl_set_user_agent.argtypes = [c.c_void_p, c.c_char_p]
    lib.flu_dl_set_cookies.argtypes = [c.c_void_p, c.c_char_p]
    lib.flu_dl_set_proxy.argtypes = [c.c_void_p, c.c_char_p]
    lib.flu_dl_set_ssl.argtypes = [c.c_void_p, c.c_int, c.c_char_p]
    lib.flu_dl_ssl_available.restype = c.c_int
    lib.flu_dl_task_get_ssl_status.restype = c.c_int
    lib.flu_dl_task_get_ssl_status.argtypes = [c.c_void_p]
    lib.flu_dl_get_tasks_count.restype = c.c_int
    lib.flu_dl_get_tasks_count.argtypes = [c.c_void_p]
    # reference-parity surface (fludownloader.h:94-185); hasattr-gated:
    # these landed in round 4, and a stale pre-round-4 .so (no make
    # toolchain to rebuild) must degrade per the module contract, not
    # AttributeError out of the first get_lib() caller
    if hasattr(lib, "flu_dl_lock"):
        lib.flu_dl_lock.argtypes = [c.c_void_p]
        lib.flu_dl_unlock.argtypes = [c.c_void_p]
        lib.flu_dl_task_get_abort.restype = c.c_int
        lib.flu_dl_task_get_abort.argtypes = [c.c_void_p]
        lib.flu_dl_ssl_status_string.restype = c.c_char_p
        lib.flu_dl_ssl_status_string.argtypes = [c.c_int]
        lib.flu_dl_getdate.restype = c.c_longlong
        lib.flu_dl_getdate.argtypes = [c.c_char_p]
