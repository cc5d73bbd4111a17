"""Speaker diarization: powerset VAD segmentation → embeddings → NME-SC.

Rebuild of the reference pipeline (src-tauri/src/managers/diarization.rs):
  * Powerset VAD (diarization.rs:77-272): 10 s windows on the frame grid
    start=721/step=270, softmax index 0 = silence (p>0.5), 11-tap median
    filter, cross-window speech-run tracking with a 100 ms start snap,
    merge gaps ≤ merge_gap, drop segments <1.5 s with a keep-longest
    fallback. TPU-first: all windows run through the segmentation network
    as ONE batch instead of a serial window loop.
  * ≤4 s chunking of long segments (diarization.rs:314-338).
  * NME-SC clustering (diarization.rs:422-611, Park et al. 2019): cosine
    affinity, top-p row pruning + max-symmetrization, symmetric normalized
    Laplacian, p swept to minimize (p/n)/max_eigengap, speaker count from
    the eigengap, row-normalized spectral embedding, deterministic
    farthest-point k-means (50 iterations).
  * Chronological speaker ids, consecutive-merge, word-midpoint speaker
    lookup, `[Speaker N|start]` formatting (diarization.rs:612-724).

Segmentation/embedding networks are pluggable callables; the default
fallbacks are energy VAD and log-mel statistics embeddings (documented
stand-ins until the pyannote/CAM++ JAX ports land — drop the reference's
ONNX weights in and wire loaders here).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

SAMPLE_RATE = 16000
WINDOW_SAMPLES = SAMPLE_RATE * 10  # diarization.rs:103
FRAME_START = 721  # :101-102
FRAME_STEP = 270
MIN_SEGMENT_SECONDS = 1.5  # :227
MAX_CHUNK_SECONDS = 4.0  # :315
N_SEG_FRAMES = 589  # pyannote segmentation-3.0 frames per 10 s window


@dataclass
class SpeakerSegment:
    start: float
    end: float
    speaker: str


@dataclass
class VadSegment:
    start: float
    end: float
    samples: np.ndarray
    offset: int = -1  # sample offset into the source audio (-1 = unknown)


# ---------------------------------------------------------------------------
# Pure helpers (reference: diarization.rs:612-724)
# ---------------------------------------------------------------------------

def cosine_distance(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    na, nb = float(a @ a), float(b @ b)
    if na == 0.0 or nb == 0.0:
        return 1.0
    return max(0.0, 1.0 - float(a @ b) / (np.sqrt(na) * np.sqrt(nb)))


def cosine_similarity(a, b) -> float:
    return float(np.clip(1.0 - cosine_distance(a, b), 0.0, 1.0))


def f32_to_i16(samples: np.ndarray) -> np.ndarray:
    return np.trunc(np.clip(samples, -1.0, 1.0) * 32767.0).astype(np.int16)


def merge_consecutive_segments(
    segments: Sequence[SpeakerSegment], merge_gap: float
) -> List[SpeakerSegment]:
    merged: List[SpeakerSegment] = []
    for seg in segments:
        if merged:
            last = merged[-1]
            gap = max(0.0, seg.start - last.end)
            if last.speaker == seg.speaker and gap <= merge_gap:
                last.end = max(last.end, seg.end)
                continue
        merged.append(SpeakerSegment(seg.start, seg.end, seg.speaker))
    return merged


def find_speaker_at_time(time: float, segments: Sequence[SpeakerSegment]) -> str:
    for seg in segments:
        if seg.start <= time <= seg.end:
            return seg.speaker
    closest, min_dist = "Speaker ?", float("inf")
    for seg in segments:
        dist = seg.start - time if time < seg.start else time - seg.end
        if dist < min_dist:
            min_dist, closest = dist, seg.speaker
    return closest


def format_diarized_text(
    text_segments: Sequence[Tuple[float, float, str]],
    speaker_segments: Sequence[SpeakerSegment],
) -> str:
    if not speaker_segments or not text_segments:
        return " ".join(t for _, _, t in text_segments)
    lines: List[str] = []
    cur_speaker: Optional[str] = None
    cur_words: List[str] = []
    for start, end, text in text_segments:
        t = text.strip()
        if not t:
            continue
        speaker = find_speaker_at_time((start + end) / 2.0, speaker_segments)
        if cur_speaker != speaker:
            if cur_words:
                lines.append(" ".join(cur_words))
                cur_words = []
            cur_speaker = speaker
            lines.append(f"\n[{speaker}|{start:.1f}]")
        cur_words.append(t)
    if cur_words:
        lines.append(" ".join(cur_words))
    return "\n".join(lines).strip()


# ---------------------------------------------------------------------------
# NME-SC (diarization.rs:422-611)
# ---------------------------------------------------------------------------

def pruned_normalized_laplacian(aff: np.ndarray, p: int) -> np.ndarray:
    n = aff.shape[0]
    a = np.zeros_like(aff)
    keep = min(p, n - 1)
    for i in range(n):
        # stable descending sort: equal affinities keep ascending index order
        # (the reference's Rust sort_by is stable; matters for tied values)
        order = np.argsort(-aff[i], kind="stable")
        order = order[order != i][:keep]
        a[i, order] = aff[i, order]
    a = np.maximum(a, a.T)  # symmetrize by max
    dinv = 1.0 / np.sqrt(np.maximum(a.sum(axis=1), 1e-9))
    norm_a = dinv[:, None] * a * dinv[None, :]
    lap = -norm_a
    np.fill_diagonal(lap, 1.0 - np.diag(norm_a))
    return lap


def max_eigengap(evals_sorted_asc: np.ndarray, kmax: int) -> Tuple[int, float]:
    lim = min(kmax + 1, len(evals_sorted_asc))
    best_k, best_gap = 1, -np.inf
    for i in range(1, lim):
        gap = evals_sorted_asc[i] - evals_sorted_asc[i - 1]
        if gap > best_gap:
            best_gap, best_k = gap, i
    return max(best_k, 1), max(float(best_gap), 0.0)


def kmeans(points: np.ndarray, k: int) -> np.ndarray:
    """Deterministic farthest-point-seeded k-means, 50 iterations."""
    n = points.shape[0]
    if k <= 1 or n == 0:
        return np.zeros(n, np.int64)
    if k >= n:
        return np.arange(n, dtype=np.int64)
    centers = [points[0]]
    while len(centers) < k:
        d = np.min(
            [np.sum((points - c) ** 2, axis=1) for c in centers], axis=0
        )
        centers.append(points[int(np.argmax(d))])
    centers = np.stack(centers)
    labels = np.zeros(n, np.int64)
    for _ in range(50):
        d = np.sum((points[:, None, :] - centers[None]) ** 2, axis=-1)
        new = np.argmin(d, axis=1)
        changed = np.any(new != labels)
        labels = new
        for c in range(k):
            m = labels == c
            if m.any():
                centers[c] = points[m].mean(axis=0)
        if not changed:
            break
    return labels


def _connected(lap: np.ndarray) -> bool:
    """Connectivity of the graph underlying a Laplacian (BFS on nonzeros)."""
    n = lap.shape[0]
    adj = lap != 0.0
    np.fill_diagonal(adj, False)
    seen = np.zeros(n, bool)
    stack = [0]
    seen[0] = True
    while stack:
        i = stack.pop()
        for j in np.nonzero(adj[i] & ~seen)[0]:
            seen[j] = True
            stack.append(int(j))
    return bool(seen.all())


def nme_sc(embeddings: np.ndarray, max_speakers: int, mesh=None) -> np.ndarray:
    """Spectral clustering with automatic speaker count (NME criterion).

    Dispatches to the device implementation (`nme_device.nme_sc_device`:
    one jitted program — batched eigvalsh p-sweep, matmul reachability,
    on-device k-means) unless CRISPY_NME=host opts out; the host-numpy
    oracle below is kept for parity tests and as the fallback. With a
    mesh the p-sweep (the O(p·n³) term) shards over the 'data' axis."""
    emb = np.asarray(embeddings, np.float32)
    if emb.shape[0] > 2 and os.environ.get("CRISPY_NME", "device") != "host":
        try:
            from . import nme_device

            return nme_device.nme_sc_device(emb, max_speakers, mesh=mesh)
        except (TypeError, AttributeError, NameError):
            raise  # programming errors must fail loudly, not demote to host
        except Exception as e:  # pragma: no cover - defensive fallback
            import logging

            logging.getLogger(__name__).warning(
                "device NME-SC failed (%s); falling back to host", e)
    return nme_sc_host(emb, max_speakers)


def nme_sc_host(embeddings: np.ndarray, max_speakers: int) -> np.ndarray:
    """Host-numpy NME-SC (the device path's oracle)."""
    emb = np.asarray(embeddings, np.float32)
    n = emb.shape[0]
    if n == 0:
        return np.zeros(0, np.int64)
    if n <= 2:
        return np.zeros(n, np.int64)
    kmax = max(1, min(max_speakers, n - 1))

    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    normed = emb / np.maximum(norms, 1e-12)
    aff = np.clip(normed @ normed.T, 0.0, 1.0)
    aff[norms[:, 0] == 0, :] = 0.0
    aff[:, norms[:, 0] == 0] = 0.0
    np.fill_diagonal(aff, 0.0)

    p_max = min(n - 1, max(int(np.sqrt(n)), 2) * 2)
    best = None  # (ratio, p, k)
    best_connected = None
    for p in range(1, p_max + 1):
        lap = pruned_normalized_laplacian(aff, p)
        ev = np.sort(np.linalg.eigvalsh(lap))
        k, gap = max_eigengap(ev, kmax)
        ratio = (p / n) / max(gap, 1e-6)
        if best is None or ratio < best[0]:
            best = (ratio, p, k)
        # Robustness over the reference's raw sweep: at tiny p the pruned
        # graph fragments into arbitrary islands and the eigengap counts
        # fragments, not speakers (their own single-cluster unit test is
        # sensitive to f32 tie-breaking because of this). Prefer p where the
        # graph is connected; fall back to the raw criterion otherwise.
        if _connected(lap) and (best_connected is None or ratio < best_connected[0]):
            best_connected = (ratio, p, k)
    _, p_star, k = best_connected or best
    k = max(1, min(k, kmax))
    if k <= 1:
        return np.zeros(n, np.int64)

    lap = pruned_normalized_laplacian(aff, p_star)
    evals, evecs = np.linalg.eigh(lap)
    order = np.argsort(evals)
    spectral = evecs[:, order[:k]].astype(np.float32)
    rn = np.linalg.norm(spectral, axis=1, keepdims=True)
    spectral = np.where(rn > 1e-9, spectral / np.maximum(rn, 1e-9), spectral)
    labels = kmeans(spectral, k)

    # Separation validation (robustness beyond the reference): the raw
    # eigengap over-counts on near-uniform affinities (one speaker, tight
    # blob). If the found clusters aren't actually separated in affinity
    # space, collapse to one speaker.
    same = labels[:, None] == labels[None, :]
    triu = np.triu(np.ones((n, n), bool), 1)
    nw = int(np.count_nonzero(same & triu))
    nb = int(np.count_nonzero(~same & triu))
    within = float(aff[same & triu].sum())
    between = float(aff[~same & triu].sum())
    if nw and nb and (between / nb) > 0.9 * (within / nw):
        return np.zeros(n, np.int64)
    return labels


# ---------------------------------------------------------------------------
# Segmentation
# ---------------------------------------------------------------------------

def energy_vad_logits(windows: np.ndarray) -> np.ndarray:
    """Fallback segmentation net: frame-energy VAD shaped like the pyannote
    powerset output [W, N_SEG_FRAMES, 2] (class 0 = silence logit).

    Frame energies come from non-overlapping FRAME_STEP-sample block sums:
    each frame integrates [center-STEP, center+STEP), frames stride by STEP,
    so frame_i = block_i + block_{i+1} exactly — no full-resolution
    per-sample cumsum table (a [W, T] float64 cumsum is ~0.5 GB of
    temporaries for an hour of audio and dominated the whole pipeline)."""
    windows = np.asarray(windows, np.float32)
    W, T = windows.shape
    centers = FRAME_START + FRAME_STEP * np.arange(N_SEG_FRAMES)
    half = FRAME_STEP
    lo = np.clip(centers - half, 0, T)
    hi = np.clip(centers + half, 0, T)
    counts = np.maximum(hi - lo, 1)[None, :]

    start = max(FRAME_START - half, 0)  # first block edge
    n_blocks = N_SEG_FRAMES + 1
    need = start + n_blocks * FRAME_STEP
    blocks = np.empty((W, n_blocks), np.float64)
    for w0 in range(0, W, 64):  # bound temporaries to ~40 MB per slab
        slab = windows[w0:w0 + 64, :]
        sq = slab.astype(np.float64) ** 2
        if need > T:  # zero-pad ≡ the hi-clip (beyond-T contributes nothing)
            sq = np.pad(sq, ((0, 0), (0, need - T)))
        blocks[w0:w0 + 64] = sq[:, start:need].reshape(
            slab.shape[0], n_blocks, FRAME_STEP).sum(axis=2)
    sums = blocks[:, :-1] + blocks[:, 1:]  # [W, F]
    rms = np.sqrt(sums / counts + 1e-12)
    # logit margin ~ distance from a -40 dBFS gate
    margin = (8.0 * (np.log10(rms + 1e-12) + 3.0)).astype(np.float32)
    return np.stack([-margin, margin], axis=-1)


def segment_speech(
    audio: np.ndarray,
    merge_gap: float,
    segmentation_fn: Callable[[np.ndarray], np.ndarray] = energy_vad_logits,
) -> List[VadSegment]:
    """Powerset VAD with the reference's exact decode/smoothing/merging.

    audio: float32 mono 16 kHz in [-1, 1]. The network runs once over the
    whole [W, 160000] window batch.
    """
    n = audio.shape[0]
    if n == 0:
        return []
    # ceil to a window multiple PLUS one all-zero window — the reference
    # pads the same extra window ("to catch trailing speech",
    # managers/diarization.rs:106-112): the silence terminates a trailing
    # speech run at the exact boundary the reference would
    pad_to = -(-n // WINDOW_SAMPLES) * WINDOW_SAMPLES + WINDOW_SAMPLES
    padded = np.zeros(pad_to, np.float32)
    padded[:n] = audio
    windows = padded.reshape(-1, WINDOW_SAMPLES)

    logits = np.asarray(segmentation_fn(windows))  # [W, F, C]
    merged = _runs_from_logits(logits, n, merge_gap)
    return _segments_from_runs(merged, audio)


def _runs_from_logits(
    logits: np.ndarray, n: int, merge_gap: float
) -> List[List[int]]:
    """Powerset logits [W, F, C] → merged speech runs [[s, t], ...] in
    samples (decode, median smoothing, run tracking, gap merging)."""
    # Powerset decode: p(silence) via softmax index 0 (diarization.rs:149-164).
    m = logits.max(axis=-1, keepdims=True)
    e = np.exp(logits - m)
    p_sil = e[..., 0] / e.sum(axis=-1)
    labels = (p_sil <= 0.5).astype(np.uint8)  # 1 = speech

    # 11-tap majority filter per window (:167-187), vectorized via cumsum.
    W, F = labels.shape
    idx = np.arange(F)
    lo = np.maximum(0, idx - 5)
    hi = np.minimum(F, idx + 6)
    cs = np.concatenate([np.zeros((W, 1), np.int32),
                         np.cumsum(labels.astype(np.int32), axis=1)], axis=1)
    smoothed = ((cs[:, hi] - cs[:, lo]) > (hi - lo)[None, :] // 2).astype(np.uint8)

    # Cross-window speech-run tracking (:189-211), vectorized: transitions
    # of the flattened (window, frame) sequence found via diff against a
    # prepended initial silence state; starts and ends then alternate.
    flat = smoothed.reshape(-1)
    edges = np.flatnonzero(np.diff(np.concatenate([[np.uint8(0)], flat])))
    sidx = ((edges // F) * WINDOW_SAMPLES
            + FRAME_START + (edges % F) * FRAME_STEP).astype(np.int64)
    starts = sidx[0::2]
    ends = sidx[1::2]
    if starts.size > ends.size:  # trailing open run → terminate at n
        ends = np.concatenate([ends, [np.int64(n)]])
    starts = np.where(starts < 1600, 0, starts)  # 100 ms start snap
    starts = np.minimum(starts, n)
    ends = np.minimum(ends, n)
    keep = ends > starts
    raw: List[Tuple[int, int]] = [
        (int(s), int(t)) for s, t in zip(starts[keep], ends[keep])]

    # Merge gaps ≤ merge_gap (:216-240).
    raw.sort()
    merged: List[List[int]] = []
    gap_samples = int(SAMPLE_RATE * merge_gap)
    for s, t in raw:
        if merged and s <= merged[-1][1] + gap_samples:
            merged[-1][1] = max(merged[-1][1], t)
        else:
            merged.append([s, t])
    return merged


def _segments_from_runs(
    merged: Sequence[Sequence[int]], audio: np.ndarray
) -> List[VadSegment]:
    """Merged sample runs → VadSegments: min-duration filter with the
    keep-longest fallback (diarization.rs:227,243-252)."""
    min_dur = int(SAMPLE_RATE * MIN_SEGMENT_SECONDS)
    out = [
        VadSegment(s / SAMPLE_RATE, t / SAMPLE_RATE, audio[s:t], offset=int(s))
        for s, t in merged if t - s >= min_dur
    ]
    if not out and merged:  # keep-longest fallback (:243-252)
        s, t = max(merged, key=lambda st: st[1] - st[0])
        out = [VadSegment(s / SAMPLE_RATE, t / SAMPLE_RATE, audio[s:t], offset=int(s))]
    return out


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------

_MELSTATS_JIT: List[Optional[Callable]] = [None]


def _melstats_device(batch: np.ndarray):
    """[b, T] audio → [b, 160] centered mel mean/std stats, fully on device.

    Link-aware on both sides: the input crosses host→device as int16
    (product audio is s16 WAV; re-quantizing float input loses <3e-5,
    far below what separates speakers) and the mean/std reduction lives
    device-side so only [b, 160] stats come back — round-tripping float32
    audio plus the full [b, 80, T//160] mel tensor costs ~27 s/hour over
    a tunneled device link vs ~6 s this way."""
    if _MELSTATS_JIT[0] is None:
        import jax
        import jax.numpy as jnp

        from ..dsp.mel import log_mel_spectrogram

        @jax.jit
        def stats(x_i16):
            x = x_i16.astype(jnp.float32) / 32768.0
            mel = log_mel_spectrogram(x)  # [b, 80, F]
            v = jnp.concatenate([mel.mean(axis=2), mel.std(axis=2)], axis=1)
            # center: the shared log-floor baseline otherwise dominates
            # cosine similarity between segments
            return v - v.mean(axis=1, keepdims=True)

        _MELSTATS_JIT[0] = stats
    q = np.clip(np.round(batch * 32768.0), -32768, 32767).astype(np.int16)
    return _MELSTATS_JIT[0](q)


def melstats_embedding(segments: List[np.ndarray]) -> np.ndarray:
    """Fallback speaker embedding: log-mel mean/std statistics per segment.

    Stand-in for the CAM++ network (same call shape); enough to separate
    synthetic speakers by spectral envelope.
    """
    # bucket by length: each distinct segment length is one batched device
    # call instead of a per-segment loop (and one compilation per shape)
    buckets = {}
    for i, seg in enumerate(segments):
        buckets.setdefault(len(seg), []).append(i)
    out: List[Optional[np.ndarray]] = [None] * len(segments)
    for _n, idxs in buckets.items():
        batch = np.stack([np.asarray(segments[i], np.float32) for i in idxs])
        v = np.asarray(_melstats_device(batch))  # [b, 160]
        for j, i in enumerate(idxs):
            out[i] = v[j]
    return np.stack(out).astype(np.float32)


def chunk_segments(segments: List[VadSegment]) -> List[VadSegment]:
    """Split long segments into ≤4 s chunks (diarization.rs:314-338)."""
    out: List[VadSegment] = []
    for seg in segments:
        dur = seg.end - seg.start
        if dur > MAX_CHUNK_SECONDS:
            n_chunks = int(np.ceil(dur / MAX_CHUNK_SECONDS))
            step = len(seg.samples) // n_chunks
            for i in range(n_chunks):
                s = i * step
                t = len(seg.samples) if i == n_chunks - 1 else (i + 1) * step
                out.append(VadSegment(
                    seg.start + s / SAMPLE_RATE, seg.start + t / SAMPLE_RATE,
                    seg.samples[s:t],
                    offset=seg.offset + s if seg.offset >= 0 else -1,
                ))
        else:
            out.append(seg)
    return out


# ---------------------------------------------------------------------------
# Fused long-audio frontend (see engine/diar_device.py)
# ---------------------------------------------------------------------------

FUSED_MIN_SAMPLES = SAMPLE_RATE * 120  # below this, host latency wins


def _diarize_fused_frontend(
    audio: np.ndarray, merge_gap: float, mesh=None
) -> Tuple[List[VadSegment], List[VadSegment], np.ndarray]:
    """One-upload device frontend for the builtin stand-in nets: energy-VAD
    margins and per-chunk mel statistics both computed from a single
    device-resident int16 copy of the recording (diar_device module).
    Decode/chunk semantics are the exact host helpers above."""
    import jax

    from . import diar_device as dd

    n = audio.shape[0]
    pad_to = dd.pad_length(n)
    with dd.QUANT_LOCK:
        q = dd.quantize_i16(audio, pad_to)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            dev = jax.device_put(q, NamedSharding(mesh, PartitionSpec()))
        else:
            dev = jax.device_put(q)
        # margins force the upload; the shared quantize scratch is free to
        # reuse once the fetch returns
        margin = dd.segmentation_margins(dev, pad_to, mesh)  # [W, 589]
    logits = np.stack([-margin, margin], axis=-1)
    merged = _runs_from_logits(logits, n, merge_gap)
    segments = _segments_from_runs(merged, audio)
    if not segments:
        return [], [], np.zeros((0, 160), np.float32)
    chunks = chunk_segments(segments)
    ranges = [(c.offset, c.offset + len(c.samples)) for c in chunks]
    embeddings = dd.chunk_stats(dev, pad_to, ranges, mesh)
    return segments, chunks, embeddings


# ---------------------------------------------------------------------------
# Orchestration (diarization.rs:274-409)
# ---------------------------------------------------------------------------

def _diarize_device_nets(
    audio: np.ndarray, merge_gap: float,
    segmentation_fn: Callable, embedding_fn: Callable, mesh=None,
) -> Tuple[List[VadSegment], List[VadSegment], np.ndarray]:
    """One-upload frontend for REAL nets (ONNX-executor runners or native
    ports) that advertise `.from_device`: the recording is quantized to
    int16 once (exact for 16-bit product sources — the reference feeds the
    nets i16 PCM, diarization.rs:85-93), uploaded once, and segmentation
    windows + embedding chunks are formed on the device from that array.
    The host path re-uploads the recording twice (~460 MB/hour of f32
    windows + chunks); this path moves ~115 MB/hour. Decode/merge/chunk
    semantics are the shared host helpers, unchanged."""
    import jax

    from . import diar_device as dd

    n = audio.shape[0]
    pad_to = dd.pad_length(n)
    with dd.QUANT_LOCK:
        q = dd.quantize_i16(audio, pad_to)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            dev = jax.device_put(q, NamedSharding(mesh, PartitionSpec()))
        else:
            dev = jax.device_put(q)
        # forces the upload while the quantize scratch is still locked
        logits = np.asarray(segmentation_fn.from_device(dev, mesh=mesh))
    merged = _runs_from_logits(logits, n, merge_gap)
    segments = _segments_from_runs(merged, audio)
    if not segments:
        return [], [], np.zeros((0, 0), np.float32)
    chunks = chunk_segments(segments)
    ranges = [(c.offset, c.offset + len(c.samples)) for c in chunks]
    embeddings = np.asarray(embedding_fn.from_device(dev, ranges, mesh=mesh))
    return segments, chunks, embeddings


def diarize(
    audio: np.ndarray,
    sample_rate: int = SAMPLE_RATE,
    max_speakers: int = 4,
    merge_gap: float = 1.0,
    segmentation_fn: Callable = energy_vad_logits,
    embedding_fn: Callable = melstats_embedding,
    mesh=None,
) -> List[SpeakerSegment]:
    """float32 mono 16 kHz → chronologically-labeled speaker segments."""
    if sample_rate != SAMPLE_RATE:
        raise ValueError("diarization requires 16 kHz mono")
    max_speakers = max(1, max_speakers)
    audio = np.asarray(audio, np.float32)

    fused = None
    device_ok = (audio.shape[0] >= FUSED_MIN_SAMPLES
                 and os.environ.get("CRISPY_DIAR_FUSED", "on") != "off")
    if (
        segmentation_fn is energy_vad_logits
        and embedding_fn is melstats_embedding
        and device_ok
    ):
        try:
            fused = _diarize_fused_frontend(audio, merge_gap, mesh)
        except (TypeError, AttributeError, NameError):
            raise  # programming errors must fail loudly, not demote to host
        except Exception as e:  # pragma: no cover - defensive fallback
            import logging

            logging.getLogger(__name__).warning(
                "fused diarization frontend failed (%s); using host path", e)
    elif (
        device_ok
        and hasattr(segmentation_fn, "from_device")
        and hasattr(embedding_fn, "from_device")
    ):
        try:
            fused = _diarize_device_nets(
                audio, merge_gap, segmentation_fn, embedding_fn, mesh)
        except (TypeError, AttributeError, NameError):
            raise  # programming errors must fail loudly, not demote to host
        except Exception as e:  # pragma: no cover - defensive fallback
            import logging

            logging.getLogger(__name__).warning(
                "device-net diarization frontend failed (%s); using host path",
                e)
    if fused is not None:
        segments, chunks, embeddings = fused
        if not segments:
            return []
    else:
        segments = segment_speech(audio, merge_gap, segmentation_fn)
        if not segments:
            return []
        chunks = chunk_segments(segments)
        embeddings = np.asarray(embedding_fn([c.samples for c in chunks]))
    n = len(chunks)
    labels = (np.zeros(n, np.int64) if n <= 2
              else nme_sc(embeddings, max_speakers, mesh=mesh))

    appearance: List[int] = []
    for lbl in labels:
        if int(lbl) not in appearance:
            appearance.append(int(lbl))
    result = [
        SpeakerSegment(c.start, c.end, f"Speaker {appearance.index(int(l)) + 1}")
        for c, l in zip(chunks, labels)
    ]
    result.sort(key=lambda s: s.start)
    return merge_consecutive_segments(result, merge_gap)


def run_diarization(
    audio_16k: np.ndarray,
    sample_rate: int,
    text_segments: Sequence[Tuple[float, float, str]],
    model_manager=None,
    max_speakers: int = 4,
    merge_gap: float = 1.0,
    bus=None,
    mesh=None,
) -> str:
    """Transcription hand-off: diarize + interleave with word segments.

    Network selection per net, best first:
      1. the downloaded .onnx run directly via the ONNX→JAX executor
         (pyannote segmentation-3.0 + WeSpeaker CAM++, the reference's
         pair — diarization.rs:40-75,133-134);
      2. the shape-mapped native JAX port (models/segmentation, campplus);
      3. the built-in stand-in (energy VAD / log-mel stats) — never chosen
         silently: a 'diarization-fallback' event is emitted with the error.
    """
    def warn(net: str, err: Exception):
        if bus is not None:
            bus.emit("diarization-fallback", {"net": net, "error": str(err)})

    seg_fn = energy_vad_logits
    if model_manager is not None and model_manager.is_downloaded("diarize-segmentation"):
        seg_path = model_manager.model_path("diarize-segmentation")
        try:
            from ..models.onnx_nets import segmentation_runner

            seg_fn = segmentation_runner(seg_path)
        except Exception as e1:
            try:
                from ..models.segmentation import from_onnx

                seg_fn = from_onnx(seg_path)
            except Exception:
                warn("segmentation", e1)
    emb_fn = melstats_embedding
    if model_manager is not None and model_manager.is_downloaded("diarize-embedding"):
        emb_path = model_manager.model_path("diarize-embedding")
        try:
            from ..models.onnx_nets import embedding_runner

            emb_fn = embedding_runner(emb_path)
        except Exception as e1:
            try:
                from ..models.campplus import from_onnx as campplus_from_onnx

                emb_fn = campplus_from_onnx(emb_path)
            except Exception:
                warn("embedding", e1)
    segs = diarize(audio_16k, sample_rate, max_speakers, merge_gap,
                   segmentation_fn=seg_fn, embedding_fn=emb_fn, mesh=mesh)
    return format_diarized_text(text_segments, segs)
