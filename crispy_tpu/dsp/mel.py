"""Whisper-style log-mel spectrogram frontend, on-TPU.

The reference feeds 16 kHz PCM into whisper.cpp / ONNX models whose first
stage is this exact frontend (n_fft=400, hop=160, Hann window, 80 (or 128)
slaney-scale mel bins, log10 with 8-dB dynamic-range clamp, (x+4)/4
normalization). Re-derived here from the public definition; computed as
windowed DFT matmuls on the MXU (see the RNNoise pipeline for why matmul
DFT wins at these sizes on TPU), with a jnp.fft fallback off-TPU.

30 s of 16 kHz audio → [80, 3000] features (2 frames dropped at the end,
matching the reference frontends' center-padded frame count).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
CHUNK_SECONDS = 30
CHUNK_SAMPLES = CHUNK_SECONDS * SAMPLE_RATE  # 480000
N_FRAMES = CHUNK_SAMPLES // HOP  # 3000


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False), used by Whisper's filterbank."""
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):
        log_branch = min_log_mel + np.log(np.maximum(f, 1e-30) / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_branch, mel)


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(n_mels: int = 80, sr: int = SAMPLE_RATE, n_fft: int = N_FFT) -> np.ndarray:
    """[n_mels, n_fft//2+1] slaney-normalized triangular filterbank."""
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2, n_bins)
    mel_pts = np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=4)
def _tables_np(n_mels: int):
    """Precomputed host tables: windowed DFT matrices + filterbank."""
    window = np.hanning(N_FFT + 1)[:-1]  # periodic Hann
    n = np.arange(N_FFT, dtype=np.float64)[:, None]
    k = np.arange(N_FFT // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / N_FFT
    fwd_re = (window[:, None] * np.cos(ang)).astype(np.float32)
    fwd_im = (-window[:, None] * np.sin(ang)).astype(np.float32)
    return (
        fwd_re,
        fwd_im,
        mel_filterbank(n_mels).T.copy(),  # [201, n_mels]
        window.astype(np.float32),
    )


_DEVICE_TABLES: dict = {}


def _tables(n_mels: int):
    """Device copies of the tables, cached only outside traces.

    Inside a jit trace `jnp.asarray` yields tracers; caching those leaks
    them (UnexpectedTracerError on the next call). Tracing callers get the
    numpy tables directly — they embed as compile-time constants — while
    eager callers reuse one cached device copy (no per-call re-upload over
    a tunneled device link)."""
    if isinstance(jnp.zeros(()), jax.core.Tracer):
        return _tables_np(n_mels)
    if n_mels not in _DEVICE_TABLES:
        _DEVICE_TABLES[n_mels] = tuple(jnp.asarray(t) for t in _tables_np(n_mels))
    return _DEVICE_TABLES[n_mels]


def log_mel_spectrogram(
    audio: jnp.ndarray, n_mels: int = 80, pad_to_chunk: bool = False
) -> jnp.ndarray:
    """[T] or [B, T] 16 kHz audio in [-1, 1] → [.., n_mels, T//HOP] features.

    Matches the public Whisper frontend: reflect-pad N_FFT//2 both sides,
    Hann STFT, magnitude^2, mel projection, log10 clamped at 1e-10, dynamic
    range limited to 8 below the max, then (x + 4) / 4.
    """
    squeeze = audio.ndim == 1
    x = jnp.atleast_2d(audio).astype(jnp.float32)
    if pad_to_chunk:
        pad = CHUNK_SAMPLES - x.shape[-1]
        if pad > 0:
            x = jnp.pad(x, ((0, 0), (0, pad)))
        else:
            x = x[:, :CHUNK_SAMPLES]
    B, T = x.shape
    xp = jnp.pad(x, ((0, 0), (N_FFT // 2, N_FFT // 2)), mode="reflect")
    n_frames = T // HOP  # whisper drops the last frame(s): uses frames [: T//HOP]
    idx = np.arange(n_frames)[:, None] * HOP + np.arange(N_FFT)[None, :]
    frames = xp[:, idx]  # [B, n_frames, 400]

    fwd_re, fwd_im, fb, window = _tables(n_mels)
    if jax.default_backend() == "tpu":
        sr_ = jnp.einsum("bfn,nk->bfk", frames, fwd_re)
        si_ = jnp.einsum("bfn,nk->bfk", frames, fwd_im)
        mag = sr_ * sr_ + si_ * si_
    else:
        spec = jnp.fft.rfft(frames * window, n=N_FFT, axis=-1)
        mag = jnp.abs(spec).astype(jnp.float32) ** 2
    mel = jnp.einsum("bfk,km->bfm", mag, fb)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0)
    out = ((log_spec + 4.0) / 4.0).swapaxes(1, 2)  # [B, n_mels, n_frames]
    return out[0] if squeeze else out
