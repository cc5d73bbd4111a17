"""Fused long-audio diarization frontend (device-resident, one upload).

For long recordings the stand-in pipeline in `engine/diarization.py` pays
for the audio twice: host-numpy energy VAD touches every sample, then the
embedding stage re-uploads the speech regions for the mel statistics. The
reference has the same double-walk shape, just serial and on CPU
(src-tauri/src/managers/diarization.rs:77-272 window loop, then :314-348
per-chunk ONNX calls).

This path is the TPU-first restructuring: the recording is quantized to
int16 once, uploaded ONCE, and both stages run on the SAME device array —

  1. segmentation logits for every 10 s window as one jitted program
     (fetch: one [W, 589] margin row per window, ~1.4 MB/hour);
  2. a single global log-mel over the whole recording with per-chunk
     statistics as `segment_sum`/`segment_max` reductions over the frame
     axis (fetch: [n_chunks, 160] stats, ~0.5 MB/hour).

Decode/merge/chunk semantics stay in `engine/diarization.py` (shared host
code, unchanged). Shapes are bucketed — audio length to one-minute
multiples, chunk count to 64 — so arbitrary recording lengths reuse a
small set of compiled programs.

Numerical note vs the per-chunk host stand-in: frames here live on the
global HOP grid (chunk boundaries fall mid-frame) and reflect-padding
exists only at the recording edges, so per-chunk statistics differ from
the host path by O(boundary frames / chunk frames) ≈ 1%. Cluster
partitions are asserted equal on the test fixtures; the host path stays
the oracle and `CRISPY_DIAR_FUSED=off` opts out.
"""

from __future__ import annotations

import functools
import threading
from typing import List, Tuple

import numpy as np

from ..dsp import mel as meldsp

SAMPLE_RATE = 16000
WINDOW_SAMPLES = SAMPLE_RATE * 10
HOP = meldsp.HOP  # 160
N_FFT = meldsp.N_FFT  # 400
_MINUTE = 60 * SAMPLE_RATE
_CHUNK_BUCKET = 64


def pad_length(n: int) -> int:
    """Window multiple + one extra all-zero window (the reference's
    trailing-speech terminator), bucketed to one-minute multiples so each
    recording length does not force a fresh compile. 60 s is a multiple
    of the 10 s window and of HOP, so no other invariant changes."""
    need = -(-n // WINDOW_SAMPLES) * WINDOW_SAMPLES + WINDOW_SAMPLES
    return -(-need // _MINUTE) * _MINUTE


_QUANT_SCRATCH: dict = {}  # pad_to → (f32 scratch, i16 out); see quantize_i16
# Serializes quantize→device_put so a concurrent diarize can't mutate the
# shared scratch while an upload from it is still in flight.
QUANT_LOCK = threading.Lock()


def quantize_i16(audio: np.ndarray, pad_to: int) -> np.ndarray:
    """float [-1, 1] → int16 (the same x*32768 convention the stand-in
    embedding uses; product audio is s16 WAV so this is lossless there).

    Buffers are cached per bucketed length and all ops run in place:
    fresh ~230 MB/hour allocations fault in slowly on this host once the
    TPU tunnel is live (measured 3–6.5 s first-touch vs ~0.2 s reused),
    and the naive round+clip+astype chain allocates three of them."""
    n = audio.shape[0]
    bufs = _QUANT_SCRATCH.get(pad_to)
    if bufs is None:
        bufs = (np.empty(pad_to, np.float32), np.empty(pad_to, np.int16))
        _QUANT_SCRATCH.clear()  # one recording length in flight at a time
        _QUANT_SCRATCH[pad_to] = bufs
    scratch, q = bufs
    np.multiply(audio, np.float32(32768.0), out=scratch[:n])
    np.rint(scratch[:n], out=scratch[:n])
    np.clip(scratch[:n], -32768, 32767, out=scratch[:n])
    q[:n] = scratch[:n]
    q[n:] = 0
    return q


def _frames_from_flat(xp, F: int):
    """[T] → [F, N_FFT] hop-160 sliding frames, gather-free (shifted
    strided reshapes, the rnnoise `_windows` pattern — an advanced-index
    gather here would embed a [F, 400] index constant and lower slowly)."""
    import jax.numpy as jnp

    k = -(-N_FFT // HOP)  # 3
    need = (F + k - 1) * HOP
    x = xp[:need]
    if x.shape[0] < need:
        x = jnp.pad(x, (0, need - x.shape[0]))
    chunks = x.reshape(F + k - 1, HOP)
    parts = [chunks[i: i + F] for i in range(k)]
    return jnp.concatenate(parts, axis=-1)[:, :N_FFT]


@functools.lru_cache(maxsize=8)
def _seg_margin_fn(W: int, mesh=None):
    """[W*160000] int16 flat audio → [W, 589] energy-VAD margins (the
    class-1 logit; logits = [-m, m]). Mirrors
    `diarization.energy_vad_logits` exactly: 540-sample frame energies as
    sums of two 270-sample blocks, -40 dBFS gate. With a mesh the window
    axis shards over 'data' (each chip scans its own stretch of the
    recording; the flat audio is replicated)."""
    import jax
    import jax.numpy as jnp

    from . import diarization as dz

    start = dz.FRAME_START - dz.FRAME_STEP  # 451; no lo/hi clipping occurs
    n_blocks = dz.N_SEG_FRAMES + 1

    @jax.jit
    def f(x16):
        x = x16.astype(jnp.float32) * (1.0 / 32768.0)
        w = x.reshape(W, WINDOW_SAMPLES)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            w = jax.lax.with_sharding_constraint(
                w, NamedSharding(mesh, PartitionSpec("data", None)))
        sq = jnp.square(w[:, start: start + n_blocks * dz.FRAME_STEP])
        blocks = jnp.sum(sq.reshape(W, n_blocks, dz.FRAME_STEP), axis=2)
        sums = blocks[:, :-1] + blocks[:, 1:]
        rms = jnp.sqrt(sums / (2 * dz.FRAME_STEP) + 1e-12)
        return 8.0 * (jnp.log10(rms + 1e-12) + 3.0)

    return f


@functools.lru_cache(maxsize=8)
def _mel_stats_fn(F_total: int, NP: int, mesh=None):
    """(flat int16 audio, frame→chunk ids) → [NP, 160] mel mean/std stats.

    Per-chunk semantics of `diarization.melstats_embedding` reproduced
    with segmented reductions: log10 floor 1e-10, per-chunk (max − 8)
    dynamic-range clamp via `segment_max`, (x+4)/4, per-bin mean/std via
    `segment_sum`, then mean-centering across the 160 dims."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x16, seg_ids):
        x = x16.astype(jnp.float32) * (1.0 / 32768.0)
        xp = jnp.pad(x, (N_FFT // 2, N_FFT // 2), mode="reflect")
        frames = _frames_from_flat(xp, F_total)  # [F, 400]
        if mesh is not None:
            # frame axis over 'data': the mel DFT matmuls (the stage cost)
            # run on local frame shards; the segment reductions that
            # follow gather across chips (tiny [ns, 160] outputs).
            from jax.sharding import NamedSharding, PartitionSpec

            frames = jax.lax.with_sharding_constraint(
                frames, NamedSharding(mesh, PartitionSpec("data", None)))
        fwd_re, fwd_im, fb, window = meldsp._tables(80)
        if jax.default_backend() == "tpu":
            sr_ = frames @ fwd_re
            si_ = frames @ fwd_im
            mag = sr_ * sr_ + si_ * si_
        else:
            spec = jnp.fft.rfft(frames * window, n=N_FFT, axis=-1)
            mag = jnp.abs(spec).astype(jnp.float32) ** 2
        melv = mag @ fb  # [F, 80]
        lg = jnp.log10(jnp.maximum(melv, 1e-10))

        ns = NP + 1  # slot NP = dustbin for unassigned frames
        row_max = jnp.max(lg, axis=1)
        cmax = jax.ops.segment_max(row_max, seg_ids, num_segments=ns)
        v = (jnp.maximum(lg, (cmax[seg_ids] - 8.0)[:, None]) + 4.0) / 4.0
        ones = jnp.ones((F_total,), jnp.float32)
        cnt = jnp.maximum(
            jax.ops.segment_sum(ones, seg_ids, num_segments=ns), 1.0)[:, None]
        s1 = jax.ops.segment_sum(v, seg_ids, num_segments=ns)
        s2 = jax.ops.segment_sum(v * v, seg_ids, num_segments=ns)
        mean = s1 / cnt
        var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
        stats = jnp.concatenate([mean, jnp.sqrt(var)], axis=1)  # [ns, 160]
        stats = stats - jnp.mean(stats, axis=1, keepdims=True)
        return stats[:NP]

    return f


def segmentation_margins(dev_audio, pad_to: int, mesh=None) -> np.ndarray:
    """Device energy-VAD margins for the padded flat int16 audio."""
    W = pad_to // WINDOW_SAMPLES
    return np.asarray(_seg_margin_fn(W, mesh)(dev_audio))


def chunk_stats(dev_audio, pad_to: int,
                ranges: List[Tuple[int, int]], mesh=None) -> np.ndarray:
    """Per-chunk mel statistics from the SAME device audio array.

    ranges: [(sample_start, sample_end)] per chunk, non-overlapping,
    ascending. Each chunk claims floor(len/HOP) frames from the global
    grid starting at round(start/HOP); a later chunk wins a shared
    boundary frame (≤1 frame difference vs the per-chunk host path)."""
    import jax.numpy as jnp

    n_chunks = len(ranges)
    F_total = pad_to // HOP
    NP = -(-max(n_chunks, 1) // _CHUNK_BUCKET) * _CHUNK_BUCKET
    ids = np.full(F_total, NP, np.int32)
    for i, (a, b) in enumerate(ranges):
        g0 = int(round(a / HOP))
        cnt = max(1, (b - a) // HOP)
        ids[g0: g0 + cnt] = i
    stats = _mel_stats_fn(F_total, NP, mesh)(dev_audio, jnp.asarray(ids))
    return np.asarray(stats)[:n_chunks].astype(np.float32)
