"""ASR feature frontends for the ONNX engine families, on-TPU.

The reference's transcribe-rs engines compute these in Rust before the ORT
call (managers/transcription.rs:119-172 loads parakeet/gigaam/sensevoice/
canary bundles); here they run as jnp so the whole chunk batch stays on
device. Public definitions:

  * NeMo AudioToMelSpectrogramPreprocessor (parakeet/canary): preemphasis
    0.97, 512-point STFT (400 Hann window, hop 160, center/reflect),
    power spectrum, 80 slaney mel bins, log(x + 2^-24), per-feature
    mean/std normalization over the valid frames.
  * GigaAM featurizer: torchaudio MelSpectrogram(n_fft=400, hop=160,
    64 HTK mel bins, no norm), log(clamp(1e-9)).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .mel import mel_filterbank  # slaney-normalized (librosa htk=False)

SAMPLE_RATE = 16000


def _htk_mel_filterbank(n_mels: int, sr: int, n_fft: int) -> np.ndarray:
    """[n_mels, n_fft//2+1] HTK-scale triangles, no area normalization
    (torchaudio MelScale defaults: mel_scale='htk', norm=None)."""
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2, n_bins)

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2), n_mels + 2))
    fdiff = np.diff(pts)
    ramps = pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    return np.maximum(0.0, np.minimum(lower, upper)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _stft_tables(n_fft: int, win_length: int):
    window = np.hanning(win_length + 1)[:-1]  # periodic Hann
    win = np.zeros(n_fft, np.float64)
    off = (n_fft - win_length) // 2
    win[off: off + win_length] = window  # torch pads the window symmetrically
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return (jnp.asarray((win[:, None] * np.cos(ang)).astype(np.float32)),
            jnp.asarray((-win[:, None] * np.sin(ang)).astype(np.float32)))


def _power_stft(x: jnp.ndarray, n_fft: int, win_length: int, hop: int) -> jnp.ndarray:
    """[B, T] → [B, F, n_fft//2+1] power spectrum, center=True/reflect."""
    B, T = x.shape
    xp = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    n_frames = T // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = xp[:, idx]
    fwd_re, fwd_im = _stft_tables(n_fft, win_length)
    sr_ = jnp.einsum("bfn,nk->bfk", frames, fwd_re)
    si_ = jnp.einsum("bfn,nk->bfk", frames, fwd_im)
    return sr_ * sr_ + si_ * si_


@functools.lru_cache(maxsize=4)
def _nemo_fb(n_mels: int):
    return jnp.asarray(mel_filterbank(n_mels, SAMPLE_RATE, 512).T)


def nemo_log_mel(audio: jnp.ndarray, n_mels: int = 80) -> jnp.ndarray:
    """[B, T] 16 kHz → [B, n_mels, T//160 + 1] normalized NeMo features."""
    x = jnp.atleast_2d(audio).astype(jnp.float32)
    x = jnp.concatenate([x[:, :1], x[:, 1:] - 0.97 * x[:, :-1]], axis=1)
    power = _power_stft(x, 512, 400, 160)
    mel = jnp.einsum("bfk,km->bfm", power, _nemo_fb(n_mels))  # [B, F, M]
    logmel = jnp.log(mel + 2.0 ** -24)
    # Normalize over VALID frames only (NeMo normalizes over seq_len):
    # zero-padded tail frames are all at the log(2^-24) floor and would
    # drag the stats toward silence — a padded 5 s tail chunk would
    # normalize its speech with badly skewed mean/std. A frame is pad iff
    # every mel bin sits at the floor.
    floor = jnp.float32(np.log(2.0 ** -24))
    valid = jnp.any(logmel > floor + 1e-3, axis=-1, keepdims=True)  # [B,F,1]
    # A fully-silent row (digital zero: every frame at the floor) has no
    # valid frames; normalizing against mu=0/var=0 would blow every bin up
    # to ~-1.7e6. Fall back to all-frame statistics for those rows, which
    # reproduces the pre-masking behavior (silence normalizes to ~0).
    valid = valid | ~jnp.any(valid, axis=1, keepdims=True)
    nv = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1)
    mu = jnp.sum(jnp.where(valid, logmel, 0.0), axis=1, keepdims=True) / nv
    # torch.std default: unbiased (N-1)
    var = jnp.sum(jnp.where(valid, (logmel - mu) ** 2, 0.0), axis=1,
                  keepdims=True) / jnp.maximum(nv - 1, 1)
    out = (logmel - mu) / (jnp.sqrt(var) + 1e-5)
    return out.swapaxes(1, 2)  # [B, M, F]


@functools.lru_cache(maxsize=4)
def _gigaam_fb(n_mels: int):
    return jnp.asarray(_htk_mel_filterbank(n_mels, SAMPLE_RATE, 400).T)


def gigaam_log_mel(audio: jnp.ndarray, n_mels: int = 64) -> jnp.ndarray:
    """[B, T] 16 kHz → [B, n_mels, T//160 + 1] GigaAM features."""
    x = jnp.atleast_2d(audio).astype(jnp.float32)
    power = _power_stft(x, 400, 400, 160)
    mel = jnp.einsum("bfk,km->bfm", power, _gigaam_fb(n_mels))
    return jnp.log(jnp.clip(mel, 1e-9, 1e9)).swapaxes(1, 2)


def lfr(feats: jnp.ndarray, m: int = 7, n: int = 6) -> jnp.ndarray:
    """Low-frame-rate stacking (FunASR WavFrontend, SenseVoice): stack m
    frames every n, left-padded with (m-1)//2 copies of the first frame.
    [B, T, F] → [B, ceil(T/n), m*F]."""
    B, T, F = feats.shape
    lpad = (m - 1) // 2
    x = jnp.concatenate([jnp.repeat(feats[:, :1], lpad, axis=1), feats], axis=1)
    T2 = T + lpad
    n_out = -(-T // n)  # ceil
    need = (n_out - 1) * n + m
    if need > T2:
        x = jnp.concatenate(
            [x, jnp.repeat(x[:, -1:], need - T2, axis=1)], axis=1)
    idx = np.arange(n_out)[:, None] * n + np.arange(m)[None, :]
    return x[:, idx].reshape(B, n_out, m * F)
