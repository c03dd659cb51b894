"""ctypes bindings for the C++ host data-path kernels (native/avsep_host.cpp).

Auto-builds ``libavsep_host.so`` with ``make`` on first use; every entry
point has a pure-Python fallback in :mod:`avsep_tpu.data.audio_io`, so the
pipeline works without a compiler (``native_available()`` reports which path
is active).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libavsep_host.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.wav_probe.restype = ctypes.c_int
            lib.wav_probe.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64)]
            lib.wav_read_crop.restype = ctypes.c_int
            lib.wav_read_crop.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64)]
            lib.resample_sinc.restype = None
            lib.resample_sinc.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_double, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_double]
            lib.silence_fraction.restype = ctypes.c_double
            lib.silence_fraction.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_double]
            lib.all_zero.restype = ctypes.c_int
            lib.all_zero.argtypes = [ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_int64]
            lib.gain_clamp.restype = None
            lib.gain_clamp.argtypes = [ctypes.POINTER(ctypes.c_float),
                                       ctypes.c_int64, ctypes.c_float]
            lib.mix_sources.restype = None
            lib.mix_sources.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
            _lib = lib
        except Exception as e:  # no compiler / build failure -> fallback
            print(f"[avsep_tpu.native] falling back to Python IO ({e})")
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def wav_probe(path: str) -> Optional[Tuple[int, int]]:
    """(sample_rate, total_frames) from the header alone, or None if the
    native reader is unavailable or rejects the file."""
    lib = _load()
    if lib is None:
        return None
    sr = ctypes.c_int64(0)
    frames = ctypes.c_int64(0)
    rc = lib.wav_probe(path.encode(), ctypes.byref(sr), ctypes.byref(frames))
    if rc != 0:
        return None
    return sr.value, frames.value


def wav_read_crop(path: str, start_frame: int, count: int
                  ) -> Optional[Tuple[np.ndarray, int]]:
    lib = _load()
    if lib is None:
        return None
    out = np.zeros(count, np.float32)
    sr = ctypes.c_int64(0)
    got = ctypes.c_int64(0)
    rc = lib.wav_read_crop(path.encode(), start_frame, count, _fptr(out),
                           ctypes.byref(sr), ctypes.byref(got))
    if rc != 0:
        return None
    return out[: got.value], sr.value


def resample_sinc(x: np.ndarray, sr_in: float, sr_out: float
                  ) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    n_out = int(round(len(x) * sr_out / sr_in))
    out = np.zeros(n_out, np.float32)
    lib.resample_sinc(_fptr(x), len(x), float(sr_in), _fptr(out), n_out,
                      float(sr_out))
    return out


def silence_fraction(x: np.ndarray, thresh: float) -> Optional[float]:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    return float(lib.silence_fraction(_fptr(x), len(x), thresh))


def gain_clamp(x: np.ndarray, gain: float) -> bool:
    lib = _load()
    if lib is None:
        return False
    assert x.dtype == np.float32 and x.flags.c_contiguous
    lib.gain_clamp(_fptr(x), len(x), gain)
    return True


def mix_sources(sources: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    sources = np.ascontiguousarray(sources, np.float32)
    n_src, n = sources.shape
    out = np.zeros(n, np.float32)
    lib.mix_sources(_fptr(sources), n_src, n, _fptr(out))
    return out
