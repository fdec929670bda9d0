"""ctypes bindings for the native host-side kernels (csrc/).

Builds libsignalalign_native.so on demand with g++ (cached under
build/); every entry point has a pure-Python fallback so the package works
without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "csrc", "signalalign_native.cpp")
_BUILD_DIR = os.path.join(_ROOT, "build")
_SO = os.path.join(_BUILD_DIR, "libsignalalign_native.so")


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.sa_peak_detector.restype = ctypes.c_long
        lib.sa_peak_detector.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_long)]
        lib.sa_adaptive_banded_align.restype = ctypes.c_long
        lib.sa_adaptive_banded_align.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_double)]
        # seeded guide alignment (minimizer index + chain + banded SW);
        # restype of the build MUST be c_void_p (the default c_int
        # truncates 64-bit heap pointers)
        lib.sa_minidx_build.restype = ctypes.c_void_p
        lib.sa_minidx_build.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int]
        lib.sa_minidx_free.restype = None
        lib.sa_minidx_free.argtypes = [ctypes.c_void_p]
        lib.sa_minidx_map.restype = ctypes.c_long
        lib.sa_sw_align_banded.restype = ctypes.c_long
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def peak_detector(t1: np.ndarray, t2: np.ndarray, wl1: int, wl2: int,
                  th1: float, th2: float, peak_height: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise ImportError("native library unavailable")
    n = len(t1)
    t1 = np.ascontiguousarray(t1, dtype=np.float32)
    t2 = np.ascontiguousarray(t2, dtype=np.float32)
    out = np.zeros(n, dtype=np.int64)
    cnt = lib.sa_peak_detector(
        t1.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, wl1, wl2, th1, th2, peak_height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
    return out[:cnt]


def adaptive_banded_align(ev_mean: np.ndarray, m_hat: np.ndarray,
                          inv: np.ndarray, cst: np.ndarray):
    """Returns (kmer_idx, event_idx, qc) with qc =
    (avg_log_emission, spanned, max_gap, events_per_kmer)."""
    lib = _load()
    if lib is None:
        raise ImportError("native library unavailable")
    ev_mean = np.ascontiguousarray(ev_mean, dtype=np.float64)
    m_hat = np.ascontiguousarray(m_hat, dtype=np.float64)
    inv = np.ascontiguousarray(inv, dtype=np.float64)
    cst = np.ascontiguousarray(cst, dtype=np.float64)
    n_events = len(ev_mean)
    n_kmers = len(m_hat)
    cap = n_events + n_kmers + 2
    out_k = np.zeros(cap, dtype=np.int64)
    out_e = np.zeros(cap, dtype=np.int64)
    qc = np.zeros(4, dtype=np.float64)
    cnt = lib.sa_adaptive_banded_align(
        ev_mean.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_events,
        m_hat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        inv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cst.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_kmers,
        out_k.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        out_e.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        qc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out_k[:cnt], out_e[:cnt], qc
