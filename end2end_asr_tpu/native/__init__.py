"""ctypes loader for the C++ native runtime (libasrnative.so).

Builds the shared library on first use if g++ is available; every entry
point has a pure-Python fallback in its caller, so a missing toolchain
degrades gracefully rather than failing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libasrnative.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
             "-o", _LIB_PATH, os.path.join(_DIR, "audio_native.cc")],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            if os.environ.get("ASR_TPU_NO_NATIVE"):
                return None
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.wav_decode.restype = ctypes.c_int64
        lib.wav_decode.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
        lib.wav_duration.restype = ctypes.c_double
        lib.wav_duration.argtypes = [ctypes.c_char_p]
        lib.wav_num_frames.restype = ctypes.c_int64
        lib.wav_num_frames.argtypes = [ctypes.c_char_p]
        lib.resample_linear.restype = ctypes.c_int64
        lib.resample_linear.argtypes = [ctypes.POINTER(ctypes.c_float),
                                        ctypes.c_int64, ctypes.c_int32,
                                        ctypes.c_int32,
                                        ctypes.POINTER(ctypes.c_float),
                                        ctypes.c_int64]
        lib.tempo_wsola.restype = ctypes.c_int64
        lib.tempo_wsola.argtypes = [ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_int64, ctypes.c_float,
                                    ctypes.c_int32,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_int64]
        lib.edit_distance_u32.restype = ctypes.c_int64
        lib.edit_distance_u32.argtypes = [ctypes.POINTER(ctypes.c_uint32),
                                          ctypes.c_int64,
                                          ctypes.POINTER(ctypes.c_uint32),
                                          ctypes.c_int64]
        _lib = lib
        return _lib


class lib:
    """Namespace of native entry points; each returns None when the
    native library is unavailable so callers fall back to Python."""

    @staticmethod
    def available() -> bool:
        return _load() is not None

    @staticmethod
    def decode_wav_sr(path: str) -> Optional[tuple]:
        """(samples, sample_rate) or None — the header's rate comes back
        through wav_decode's out-param, so callers never need to re-open
        the file with Python's `wave` (which rejects IEEE-float WAVs the
        native decoder handles)."""
        L = _load()
        if L is None:
            return None
        n = L.wav_num_frames(path.encode())
        if n < 0:
            return None
        out = np.empty(max(int(n), 1), np.float32)
        sr = ctypes.c_int32(0)
        got = L.wav_decode(path.encode(),
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                           out.size, ctypes.byref(sr))
        if got < 0 or sr.value <= 0:
            return None
        return out[:got], int(sr.value)

    @staticmethod
    def decode_wav(path: str) -> Optional[np.ndarray]:
        got = lib.decode_wav_sr(path)
        return None if got is None else got[0]

    @staticmethod
    def wav_num_frames(path: str) -> Optional[int]:
        L = _load()
        if L is None:
            return None
        n = L.wav_num_frames(path.encode())
        return None if n < 0 else int(n)

    @staticmethod
    def wav_duration(path: str) -> Optional[float]:
        L = _load()
        if L is None:
            return None
        d = L.wav_duration(path.encode())
        return None if d < 0 else float(d)

    @staticmethod
    def resample(y: np.ndarray, sr_in: int, sr_out: int) -> Optional[np.ndarray]:
        L = _load()
        if L is None:
            return None
        y = np.ascontiguousarray(y, np.float32)
        max_out = int(len(y) * sr_out / sr_in) + 16
        out = np.empty(max_out, np.float32)
        n = L.resample_linear(
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(y),
            sr_in, sr_out,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_out)
        return None if n < 0 else out[:n]

    @staticmethod
    def tempo_wsola(y: np.ndarray, tempo: float, sample_rate: int
                    ) -> Optional[np.ndarray]:
        L = _load()
        if L is None:
            return None
        y = np.ascontiguousarray(y, np.float32)
        max_out = int(len(y) / tempo) + 16
        out = np.empty(max_out, np.float32)
        n = L.tempo_wsola(
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(y),
            ctypes.c_float(tempo), sample_rate,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_out)
        return None if n < 0 else out[:n]

    @staticmethod
    def edit_distance(a: str, b: str) -> Optional[int]:
        L = _load()
        if L is None:
            return None
        aa = np.array([ord(c) for c in a], np.uint32)
        bb = np.array([ord(c) for c in b], np.uint32)
        return int(L.edit_distance_u32(
            aa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(aa),
            bb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(bb)))
