"""ctypes loader for the native host library (csrc/).

The native layer owns the host-sequential inner loops: scrappie-style peak
detection and per-read DP backtracks.  If the shared library is absent we
attempt a one-shot `make`; failing that, callers fall back to NumPy/Python
implementations (same semantics, slower).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIB_PATH = os.path.join(_PKG_DIR, "data", "libnanopolish_tpu.so")
_CSRC_DIR = os.path.join(os.path.dirname(_PKG_DIR), "csrc")

_lock = threading.Lock()
_lib_wrapper = None
_load_attempted = False


class NativeLib:
    def __init__(self, cdll: ctypes.CDLL):
        self._lib = cdll
        f = cdll.npt_peak_detect
        f.restype = ctypes.c_int64
        f.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int64),
        ]
        g = cdll.npt_banded_backtrack
        g.restype = ctypes.c_int64
        g.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]

    def peak_detect(self, tstat1: np.ndarray, tstat2: np.ndarray,
                    wl1: int, wl2: int, th1: float, th2: float,
                    peak_height: float) -> np.ndarray:
        t1 = np.ascontiguousarray(tstat1, dtype=np.float32)
        t2 = np.ascontiguousarray(tstat2, dtype=np.float32)
        n = len(t1)
        out = np.empty(n, dtype=np.int64)
        cnt = self._lib.npt_peak_detect(
            t1.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            t2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, wl1, wl2, th1, th2, peak_height,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out[:cnt]

    def banded_backtrack(self, trace: np.ndarray, band_ll_event: np.ndarray,
                         band_ll_kmer: np.ndarray, start_event: int, start_kmer: int):
        trace = np.ascontiguousarray(trace, dtype=np.uint8)
        lle = np.ascontiguousarray(band_ll_event, dtype=np.int32)
        llk = np.ascontiguousarray(band_ll_kmer, dtype=np.int32)
        n_bands, bandwidth = trace.shape
        max_out = 2 * (n_bands + 2)
        out_k = np.empty(max_out, dtype=np.int32)
        out_e = np.empty(max_out, dtype=np.int32)
        cnt = self._lib.npt_banded_backtrack(
            trace.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n_bands, bandwidth,
            lle.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            llk.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            start_event, start_kmer,
            out_k.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_e.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_out)
        if cnt < 0:
            raise RuntimeError("banded_backtrack overflow")
        return out_k[:cnt], out_e[:cnt]


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _CSRC_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_native_lib() -> Optional[NativeLib]:
    global _lib_wrapper, _load_attempted
    if _lib_wrapper is not None or _load_attempted:
        return _lib_wrapper
    with _lock:
        if _lib_wrapper is not None or _load_attempted:
            return _lib_wrapper
        _load_attempted = True
        if not os.path.exists(_LIB_PATH) and os.path.isdir(_CSRC_DIR):
            _try_build()
        if os.path.exists(_LIB_PATH):
            try:
                _lib_wrapper = NativeLib(ctypes.CDLL(_LIB_PATH))
            except OSError:
                _lib_wrapper = None
    return _lib_wrapper
