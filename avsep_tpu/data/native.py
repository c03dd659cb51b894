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
_FRAMES_LIB_PATH = os.path.join(_NATIVE_DIR, "libavsep_frames.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False
_flib: Optional[ctypes.CDLL] = None
_ftried = False
_fselfcheck: Optional[bool] = None


def _needs_build(so_path: str) -> bool:
    """True when the .so is missing OR older than any native source —
    a prebuilt binary must never shadow an edited .cpp (ADVICE r4)."""
    if not os.path.exists(so_path):
        return True
    so_mtime = os.path.getmtime(so_path)
    for name in os.listdir(_NATIVE_DIR):
        if name.endswith((".cpp", ".h")) or name == "Makefile":
            if os.path.getmtime(os.path.join(_NATIVE_DIR, name)) > so_mtime:
                return True
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if _needs_build(_LIB_PATH):
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


def _load_frames() -> Optional[ctypes.CDLL]:
    """libavsep_frames.so: libjpeg decode + PIL-exact resample (its own
    shared object so a host without libjpeg keeps the audio fast path)."""
    global _flib, _ftried
    with _lock:
        if _flib is not None or _ftried:
            return _flib
        _ftried = True
        try:
            if _needs_build(_FRAMES_LIB_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            lib = ctypes.CDLL(_FRAMES_LIB_PATH)
            lib.jpeg_probe.restype = ctypes.c_int
            lib.jpeg_probe.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.jpeg_decode_rgb.restype = ctypes.c_int
            lib.jpeg_decode_rgb.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.resize_rgb.restype = ctypes.c_int
            lib.resize_rgb.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int]
            lib.frame_pipeline_batch.restype = ctypes.c_int
            lib.frame_pipeline_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_int, ctypes.c_int,                    # rw, rh
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,                    # fw, fh
                ctypes.c_int, ctypes.c_int, ctypes.c_int,      # flip, filter,
                                                               # fast
                ctypes.c_int, ctypes.c_int,                    # out_h, out_w
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]  # out, threads
            _flib = lib
        except Exception as e:  # no compiler / no libjpeg -> PIL fallback
            print(f"[avsep_tpu.native] frame decode falling back to PIL "
                  f"({e})")
            _flib = None
        return _flib


def frames_available() -> bool:
    return _load_frames() is not None


def frames_selfcheck_ok() -> bool:
    """One-shot decode+resample bit-identity check vs Pillow.

    The .so links the HOST libjpeg, which may differ from Pillow's
    vendored libjpeg-turbo — on such a host the 'bit-identical to PIL'
    guarantee of ``--frame_decode auto`` would silently be void (ADVICE
    r4).  Before auto mode enables the native path, round-trip one
    synthetic JPEG through both decoders (+ the fused bicubic resample)
    and require exact equality; cached after the first call."""
    global _fselfcheck
    if _fselfcheck is not None:
        return _fselfcheck
    if _load_frames() is None:
        _fselfcheck = False
        return False
    try:
        import io
        import tempfile

        from PIL import Image

        rs = np.random.RandomState(0)
        img = Image.fromarray(rs.randint(0, 256, (48, 64, 3), np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=90)
        with tempfile.NamedTemporaryFile(suffix=".jpg") as f:
            f.write(buf.getvalue())
            f.flush()
            want = np.asarray(Image.open(f.name).convert("RGB"))
            got = frame_pipeline_batch([f.name], 48, 64, n_threads=1)
            ok = got is not None and np.array_equal(got[0], want)
            if ok:
                want_r = np.asarray(
                    Image.open(f.name).convert("RGB").resize(
                        (32, 24), Image.BICUBIC))
                got_r = frame_pipeline_batch([f.name], 24, 32,
                                             resize=(32, 24), n_threads=1)
                ok = got_r is not None and np.array_equal(got_r[0], want_r)
        if not ok:
            print("[avsep_tpu.native] frame decode self-check vs PIL "
                  "FAILED (host libjpeg differs?) — auto mode stays on PIL")
        _fselfcheck = bool(ok)
    except Exception as e:
        print(f"[avsep_tpu.native] frame decode self-check errored ({e}) "
              "— auto mode stays on PIL")
        _fselfcheck = False
    return _fselfcheck


def jpeg_probe_dims(path: str) -> Optional[Tuple[int, int]]:
    """(width, height) from the JPEG header, or None on any failure."""
    lib = _load_frames()
    if lib is None:
        return None
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    if lib.jpeg_probe(path.encode(), ctypes.byref(w),
                      ctypes.byref(h)) != 0:
        return None
    return w.value, h.value


def resize_rgb(img: np.ndarray, oh: int, ow: int,
               filt: str = "bicubic") -> Optional[np.ndarray]:
    """PIL-exact uint8 RGB resize (tests compare vs Image.resize)."""
    lib = _load_frames()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    ih, iw = img.shape[:2]
    out = np.empty((oh, ow, 3), np.uint8)
    u8p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    rc = lib.resize_rgb(u8p(img), ih, iw, u8p(out), oh, ow,
                        1 if filt == "bicubic" else 0)
    return out if rc == 0 else None


# default per-call decode threads; the call releases the GIL so threads
# help both the thread loader and single-process eval (override with env)
_FRAME_THREADS = int(os.environ.get("AVSEP_FRAME_THREADS", "4"))


def frame_pipeline_batch(paths, out_h: int, out_w: int, *,
                         resize=None, crop=None, final=None,
                         hflip: bool = False, filt: str = "bicubic",
                         fast: bool = False,
                         n_threads: Optional[int] = None
                         ) -> Optional[np.ndarray]:
    """Fused decode -> resize -> crop -> resize -> flip over a frame list
    sharing ONE parameter draw (temporal consistency).  Bit-identical to
    the PIL path unless ``fast`` (DCT-scaled decode, Image.draft-style
    approximation).  Returns [T, out_h, out_w, 3] uint8, or None on any
    failure (caller falls back to the PIL path with the same
    already-drawn parameters)."""
    lib = _load_frames()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rw, rh = resize if resize else (0, 0)
    cl, ct, cw, ch = crop if crop else (0, 0, 0, 0)
    fw, fh = final if final else (0, 0)
    nt = _FRAME_THREADS if n_threads is None else n_threads
    rc = lib.frame_pipeline_batch(
        arr, n, rw, rh, cl, ct, cw, ch, fw, fh, int(hflip),
        1 if filt == "bicubic" else 0, int(fast), out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nt)
    return out if rc == 0 else None


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
