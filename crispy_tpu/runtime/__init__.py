"""Native runtime bindings (C++ host tier).

The reference's real-time engine is native (Rust); this package binds the
C++ equivalent (native/crispy_runtime.cpp): SPSC audio rings, the dual-mono
mixer step, the streaming linear resampler, an incremental WAV writer, and
the RMS meter — built on demand with g++ and loaded via ctypes. Engine
modules use it when available and fall back to the pure-Python versions.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "crispy_runtime.cpp"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False

_F32P = ctypes.POINTER(ctypes.c_float)


def _cache_dir() -> Path:
    d = Path(os.environ.get("CRISPY_NATIVE_CACHE", "/tmp/crispy_native"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def build_library(force: bool = False) -> Optional[Path]:
    """Compile the runtime .so (content-hashed cache); None if unbuildable."""
    if not _SRC.exists():
        return None
    tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    out = _cache_dir() / f"libcrispy_runtime_{tag}.so"
    if out.exists() and not force:
        return out
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           "-o", str(out), str(_SRC)]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"native build failed: {proc.stderr[-800:]}")
    return out


def load() -> Optional[ctypes.CDLL]:
    """The runtime library, building it on first use; None when g++/source
    are unavailable (callers fall back to Python)."""
    global _LIB, _BUILD_FAILED
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        try:
            so = build_library()
            if so is None:
                _BUILD_FAILED = True
                return None
            lib = ctypes.CDLL(str(so))
        except Exception:
            _BUILD_FAILED = True
            return None
        # signatures
        lib.ring_new.restype = ctypes.c_void_p
        lib.ring_new.argtypes = [ctypes.c_size_t]
        lib.ring_free.argtypes = [ctypes.c_void_p]
        lib.ring_len.restype = ctypes.c_size_t
        lib.ring_len.argtypes = [ctypes.c_void_p]
        lib.ring_clear.argtypes = [ctypes.c_void_p]
        lib.ring_push.argtypes = [ctypes.c_void_p, _F32P, ctypes.c_size_t]
        lib.ring_pop.restype = ctypes.c_size_t
        lib.ring_pop.argtypes = [ctypes.c_void_p, _F32P, ctypes.c_size_t]
        lib.ring_trim_front.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
        lib.mixer_step.restype = ctypes.c_int
        lib.mixer_step.argtypes = [ctypes.c_void_p, ctypes.c_void_p, _F32P,
                                   ctypes.c_size_t, ctypes.c_size_t]
        lib.resampler_new.restype = ctypes.c_void_p
        lib.resampler_new.argtypes = [ctypes.c_float, ctypes.c_float]
        lib.resampler_free.argtypes = [ctypes.c_void_p]
        lib.resampler_set_rates.argtypes = [ctypes.c_void_p, ctypes.c_float, ctypes.c_float]
        lib.resampler_process.restype = ctypes.c_size_t
        lib.resampler_process.argtypes = [ctypes.c_void_p, _F32P, ctypes.c_size_t,
                                          _F32P, ctypes.c_size_t]
        lib.wav_open.restype = ctypes.c_void_p
        lib.wav_open.argtypes = [ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint16]
        lib.wav_write_stereo.restype = ctypes.c_int
        lib.wav_write_stereo.argtypes = [ctypes.c_void_p, _F32P, _F32P, ctypes.c_size_t]
        lib.wav_finalize.restype = ctypes.c_int
        lib.wav_finalize.argtypes = [ctypes.c_void_p]
        lib.rms_level.restype = ctypes.c_float
        lib.rms_level.argtypes = [_F32P, ctypes.c_size_t]
        _LIB = lib
        return _LIB


def available() -> bool:
    return load() is not None


def _as_f32p(a: np.ndarray):
    return np.ascontiguousarray(a, np.float32).ctypes.data_as(_F32P)


class NativeRing:
    def __init__(self, capacity: int):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native runtime unavailable")
        self._h = self._lib.ring_new(capacity)

    def push(self, samples: np.ndarray) -> None:
        s = np.ascontiguousarray(samples, np.float32).ravel()
        self._lib.ring_push(self._h, _as_f32p(s), s.size)

    def pop(self, n: int) -> np.ndarray:
        out = np.empty(n, np.float32)
        got = self._lib.ring_pop(self._h, _as_f32p(out), n)
        return out[:got]

    def trim_front(self, n: int) -> None:
        self._lib.ring_trim_front(self._h, n)

    def clear(self) -> None:
        self._lib.ring_clear(self._h)

    def __len__(self) -> int:
        return self._lib.ring_len(self._h)

    def __del__(self):
        try:
            self._lib.ring_free(self._h)
        except Exception:
            pass


class NativeLinearResampler:
    """ctypes twin of dsp.resample.LinearResampler (same emission pattern)."""

    def __init__(self, input_rate: float, output_rate: float):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native runtime unavailable")
        self._h = self._lib.resampler_new(input_rate, output_rate)
        self._ratio = max(output_rate / max(input_rate, 1e-9), 1.0)

    def set_rates(self, input_rate: float, output_rate: float) -> None:
        self._lib.resampler_set_rates(self._h, input_rate, output_rate)
        self._ratio = max(output_rate / max(input_rate, 1e-9), 1.0)

    def process(self, samples: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(samples, np.float32).ravel()
        cap = int(x.size * self._ratio) + 8
        out = np.empty(cap, np.float32)
        got = self._lib.resampler_process(self._h, _as_f32p(x), x.size, _as_f32p(out), cap)
        return out[:got]

    def __del__(self):
        try:
            self._lib.resampler_free(self._h)
        except Exception:
            pass


def mixer_step(mic: NativeRing, app: NativeRing, frame_len: int, max_desync: int):
    lib = load()
    out = np.empty(frame_len, np.float32)
    ok = lib.mixer_step(mic._h, app._h, _as_f32p(out), frame_len, max_desync)
    return out if ok else None


class NativeWavWriter:
    def __init__(self, path, sample_rate: int = 48000, channels: int = 2):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native runtime unavailable")
        self.output_path = Path(path)
        self._h = self._lib.wav_open(str(path).encode(), sample_rate, channels)
        if not self._h:
            raise IOError(f"cannot open {path}")

    def write_samples(self, left: np.ndarray, right: np.ndarray) -> None:
        l = np.ascontiguousarray(left, np.float32).ravel()
        r = np.ascontiguousarray(right, np.float32).ravel()
        if l.size != r.size:
            raise ValueError("Left and right channel length mismatch")
        self._lib.wav_write_stereo(self._h, _as_f32p(l), _as_f32p(r), l.size)

    def finalize(self) -> Path:
        if self._h:
            self._lib.wav_finalize(self._h)
            self._h = None
        return self.output_path


def rms(samples: np.ndarray) -> float:
    lib = load()
    x = np.ascontiguousarray(samples, np.float32).ravel()
    if lib is None:
        return float(np.sqrt(np.mean(x.astype(np.float64) ** 2))) if x.size else 0.0
    return float(lib.rms_level(_as_f32p(x), x.size))
