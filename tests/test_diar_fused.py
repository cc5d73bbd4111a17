"""Fused long-audio diarization frontend (engine/diar_device.py).

The fused path uploads a recording once and computes segmentation margins
+ per-chunk mel statistics on device; these tests pin it against the
host stand-ins (`energy_vad_logits` / `melstats_embedding`), which remain
the semantic oracle. Fixtures are int16-representable so both paths see
the identical signal (the fused path quantizes, product audio is s16 WAV).
"""

import os

import numpy as np
import pytest

from crispy_tpu.engine import diarization as dz
from crispy_tpu.engine import diar_device as dd

SR = 16000


def _q16(audio):
    return (np.round(np.clip(audio, -1, 1) * 32768.0).clip(-32768, 32767)
            / 32768.0).astype(np.float32)


def make_audio(minutes=2.6, freqs=(150.0, 500.0, 1400.0), seed=0):
    """Well-separated synthetic speakers: distinct fundamentals, long
    bouts, real pauses."""
    rng = np.random.default_rng(seed)
    gap = np.zeros(int(1.2 * SR), np.float32)
    pieces, total, i = [], 0, 0
    target = int(minutes * 60 * SR)
    while total < target:
        f = freqs[i % len(freqs)]
        t = np.arange(int(5.0 * SR)) / SR
        tone = 0.4 * np.sin(2 * np.pi * f * t)
        tone += 0.005 * rng.standard_normal(t.size)
        pieces += [tone.astype(np.float32), gap]
        total += t.size + gap.size
        i += 1
    return _q16(np.concatenate(pieces)[:target])


@pytest.fixture(scope="module")
def audio():
    return make_audio()


def test_fused_engages_above_threshold(audio, monkeypatch):
    called = {}
    real = dz._diarize_fused_frontend

    def spy(a, g, mesh=None):
        called["yes"] = True
        return real(a, g)

    monkeypatch.setattr(dz, "_diarize_fused_frontend", spy)
    assert audio.shape[0] >= dz.FUSED_MIN_SAMPLES
    dz.diarize(audio, max_speakers=4, merge_gap=1.0)
    assert called.get("yes")
    # short audio stays on the host path
    called.clear()
    dz.diarize(audio[: SR * 30], max_speakers=4, merge_gap=1.0)
    assert not called


def test_fused_matches_host_end_to_end(monkeypatch):
    # bouts < 4 s (homogeneous chunks, no split halves) + broadband noise:
    # the 5 s pure-tone fixture sits on a k=3/k=4 eigengap knife edge in
    # BOTH paths (split chunk halves differ systematically by their
    # trailing-silence frames), so label equality needs realistic
    # within-cluster variance
    rng = np.random.default_rng(7)
    gap = np.zeros(int(1.2 * SR), np.float32)
    pieces, total = [], 0
    i = 0
    while total < int(2.6 * 60 * SR):
        f = (150.0, 500.0, 1400.0)[i % 3]
        t = np.arange(int(3.5 * SR)) / SR
        tone = 0.4 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(t.size)
        pieces += [tone.astype(np.float32), gap]
        total += t.size + gap.size
        i += 1
    audio = _q16(np.concatenate(pieces))

    res_fused = dz.diarize(audio, max_speakers=4, merge_gap=1.0)
    monkeypatch.setenv("CRISPY_DIAR_FUSED", "off")
    res_host = dz.diarize(audio, max_speakers=4, merge_gap=1.0)
    assert [(s.start, s.end, s.speaker) for s in res_fused] == [
        (s.start, s.end, s.speaker) for s in res_host]
    assert len({s.speaker for s in res_fused}) == 3


def test_fused_segments_and_offsets_match_host(audio):
    segs_f, chunks_f, emb = dz._diarize_fused_frontend(audio, 1.0)
    segs_h = dz.segment_speech(audio, 1.0)
    chunks_h = dz.chunk_segments(segs_h)
    assert [(s.start, s.end) for s in segs_f] == [(s.start, s.end) for s in segs_h]
    assert [(c.start, c.end, c.offset) for c in chunks_f] == [
        (c.start, c.end, c.offset) for c in chunks_h]
    # offsets index the source audio exactly
    for c in chunks_f:
        assert c.offset >= 0
        np.testing.assert_array_equal(
            c.samples, audio[c.offset: c.offset + len(c.samples)])
    assert emb.shape == (len(chunks_f), 160)


def test_fused_embeddings_close_to_host(audio):
    _, chunks, emb_f = dz._diarize_fused_frontend(audio, 1.0)
    emb_h = dz.melstats_embedding([c.samples for c in chunks])
    nf = emb_f / np.linalg.norm(emb_f, axis=1, keepdims=True)
    nh = emb_h / np.linalg.norm(emb_h, axis=1, keepdims=True)
    cos = np.sum(nf * nh, axis=1)
    # global-grid frames + recording-edge-only reflect padding vs the
    # host's per-chunk frontend: ~1% of frames differ per chunk
    assert cos.min() > 0.995


def test_fused_margins_match_host_logits(audio):
    import jax

    pad_to = dd.pad_length(audio.shape[0])
    dev = jax.device_put(dd.quantize_i16(audio, pad_to))
    margin = dd.segmentation_margins(dev, pad_to)

    host_pad = -(-audio.shape[0] // dd.WINDOW_SAMPLES) * dd.WINDOW_SAMPLES \
        + dd.WINDOW_SAMPLES
    padded = np.zeros(host_pad, np.float32)
    padded[: audio.shape[0]] = audio
    logits = dz.energy_vad_logits(padded.reshape(-1, dd.WINDOW_SAMPLES))
    W = logits.shape[0]
    # the device batch only adds extra all-silence bucket windows
    np.testing.assert_allclose(margin[:W], logits[..., 1], atol=2e-4)
    assert np.all(margin[W:] < 0)  # padding decodes as silence


def test_fused_env_optout(audio, monkeypatch):
    monkeypatch.setenv("CRISPY_DIAR_FUSED", "off")
    called = {}
    monkeypatch.setattr(
        dz, "_diarize_fused_frontend",
        lambda a, g, mesh=None: called.setdefault("yes", True))
    dz.diarize(audio, max_speakers=4, merge_gap=1.0)
    assert not called


def test_fused_silence_returns_empty():
    silent = np.zeros(dz.FUSED_MIN_SAMPLES + SR, np.float32)
    assert dz.diarize(silent, max_speakers=4, merge_gap=1.0) == []


def test_pad_length_buckets():
    assert dd.pad_length(1) == 60 * SR
    # 59 min 1 s → needs 355 windows + 1 extra → 3560 s → bucket 3600 s
    assert dd.pad_length(3541 * SR) % (60 * SR) == 0
    assert dd.pad_length(3541 * SR) >= 3560 * SR
    # bucketing keeps window alignment
    for n in (SR, 123 * SR, 3600 * SR):
        assert dd.pad_length(n) % dd.WINDOW_SAMPLES == 0
