"""ctypes bindings for the C++ audio runtime (audio_engine.cpp).

Auto-builds `libsosaudio.so` on first use (g++ is in the image); every
entry point has a pure-Python fallback (`sos_tpu.dsp.audio_io`), so the
framework works without a compiler too.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsosaudio.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO,
             os.path.join(_DIR, "audio_engine.cpp"), "-lpthread", "-lm"],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.decode_wav.restype = ctypes.c_int64
    lib.decode_wav.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                               ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
    lib.wav_info.restype = ctypes.c_int64
    lib.wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32)]
    lib.resample_poly.restype = ctypes.c_int64
    lib.resample_poly.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_double, ctypes.POINTER(ctypes.c_float)]
    lib.mix_at_snr.restype = None
    lib.mix_at_snr.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    lib.load_batch.restype = ctypes.c_int32
    lib.load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return lib


def resampled_length(n: int, native_sr: int, target_sr: int) -> int:
    """Output length of the engine's polyphase resampler for an n-sample
    input — the ONE source of truth for the ceil(n*up/down) convention
    shared by `NativeAudioEngine.load`, `_WavCache.prefetch_paths`'s
    buffer sizing and the C++ `load_worker` clamp (audio_engine.cpp)."""
    if native_sr == target_sr:
        return n
    import math

    g = math.gcd(target_sr, native_sr)
    up, down = target_sr // g, native_sr // g
    return (n * up + down - 1) // down


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeAudioEngine:
    """Decode/resample/mix through the C++ library (numpy in/out)."""

    def __init__(self, num_threads: int = 4):
        self.lib = _load()
        if self.lib is None:
            raise RuntimeError("libsosaudio.so unavailable (g++ missing?)")
        self.num_threads = num_threads

    def info(self, path: str) -> Tuple[int, int]:
        sr = ctypes.c_int32(0)
        n = self.lib.wav_info(path.encode(), ctypes.byref(sr))
        if n < 0:
            raise IOError(f"wav_info failed: {path}")
        return int(n), int(sr.value)

    def load(self, path: str, sr: Optional[int] = None) -> Tuple[np.ndarray, int]:
        n, native_sr = self.info(path)
        buf = np.empty(n, dtype=np.float32)
        got_sr = ctypes.c_int32(0)
        got = self.lib.decode_wav(path.encode(), _fptr(buf), n,
                                  ctypes.byref(got_sr))
        if got < 0:
            raise IOError(f"decode failed: {path}")
        buf = buf[:got]
        if sr is None or sr == native_sr:
            return buf, native_sr
        import math

        g = math.gcd(sr, native_sr)
        up, down = sr // g, native_sr // g
        out = np.empty(resampled_length(len(buf), native_sr, sr),
                       dtype=np.float32)
        m = self.lib.resample_poly(_fptr(buf), len(buf), up, down, 12.9846,
                                   _fptr(out))
        return out[:m], sr

    def load_batch(self, paths: List[str], target_sr: int,
                   max_samples: int) -> Tuple[np.ndarray, np.ndarray]:
        """Threaded decode+resample of many files into one (N, max) buffer."""
        n = len(paths)
        out = np.zeros((n, max_samples), dtype=np.float32)
        lengths = np.zeros(n, dtype=np.int64)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        status = self.lib.load_batch(
            arr, n, _fptr(out.reshape(-1)), max_samples, target_sr,
            self.num_threads,
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if status != 0:
            bad = [paths[i] for i in range(n) if lengths[i] < 0]
            raise IOError(f"load_batch failures: {bad}")
        return out, lengths

    def mix_at_snr(self, clean: np.ndarray, noise: np.ndarray, snr_db: float,
                   norm: float = 0.5):
        n = len(clean)
        clean = np.ascontiguousarray(clean, dtype=np.float32)
        noise = np.ascontiguousarray(noise, dtype=np.float32)
        mixed = np.empty(n, np.float32)
        c_out = np.empty(n, np.float32)
        n_out = np.empty(n, np.float32)
        self.lib.mix_at_snr(_fptr(clean), _fptr(noise), n, float(snr_db),
                            float(norm or 0.0), _fptr(mixed), _fptr(c_out),
                            _fptr(n_out))
        return mixed, c_out, n_out
