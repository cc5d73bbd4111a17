"""Diarization: NME-SC, helpers, segmentation, end-to-end — mirrors the
reference's test strategy (managers/diarization.rs:726-974: synthetic
axis-aligned embedding clusters + pure-function tests)."""

import numpy as np
import pytest

from crispy_tpu.engine import diarization as dz


def cluster_emb(centers, per: int, dim: int = 6):
    """The reference's synthetic fixture (diarization.rs:735-746): each
    cluster on a distinct axis with tiny deterministic last-dim jitter."""
    out = []
    for ci, c in enumerate(centers):
        for p in range(per):
            v = np.zeros(dim, np.float32)
            v[c] = 1.0
            v[dim - 1] += 0.01 * (ci + 1) + 0.001 * p
            out.append(v)
    return np.stack(out)


class TestNmeSc:
    @pytest.mark.parametrize("k_true", [2, 3, 4])
    def test_detects_speaker_count(self, k_true):
        emb = cluster_emb(range(k_true), per=5)
        labels = dz.nme_sc(emb, max_speakers=8)
        assert len(set(labels.tolist())) == k_true
        # members of the same synthetic cluster share a label
        for a in range(k_true):
            assert len(set(labels[a * 5: (a + 1) * 5].tolist())) == 1

    def test_single_cluster_collapses_to_one(self):
        # chained-jitter fixture (the reference's) AND an isotropic blob
        emb = cluster_emb([0], per=6)
        assert set(dz.nme_sc(emb, max_speakers=8).tolist()) == {0}
        rng = np.random.default_rng(0)
        blob = np.zeros((8, 16), np.float32)
        blob[:, 0] = 1.0
        blob += 0.05 * rng.standard_normal((8, 16)).astype(np.float32)
        assert set(dz.nme_sc(blob, max_speakers=8).tolist()) == {0}

    def test_max_speakers_bounds_count(self):
        emb = cluster_emb(range(3), per=5)
        labels = dz.nme_sc(emb, max_speakers=2)
        assert len(set(labels.tolist())) <= 2

    def test_small_inputs(self):
        assert dz.nme_sc(np.zeros((0, 4)), 4).tolist() == []
        assert dz.nme_sc(np.ones((1, 4)), 4).tolist() == [0]
        assert dz.nme_sc(np.ones((2, 4)), 4).tolist() == [0, 0]

    def test_eigengap(self):
        ev = np.array([0.0, 0.01, 0.02, 0.9, 1.0])
        k, gap = dz.max_eigengap(ev, kmax=4)
        assert k == 3 and gap == pytest.approx(0.88)

    def test_kmeans_deterministic_and_exact(self):
        pts = np.array([[0, 0], [0.1, 0], [5, 5], [5.1, 5]], np.float32)
        a = dz.kmeans(pts, 2)
        b = dz.kmeans(pts, 2)
        assert np.array_equal(a, b)
        assert a[0] == a[1] and a[2] == a[3] and a[0] != a[2]
        assert dz.kmeans(pts, 1).tolist() == [0, 0, 0, 0]
        assert dz.kmeans(pts, 4).tolist() == [0, 1, 2, 3]


class TestHelpers:
    def test_cosine_distance(self):
        assert dz.cosine_distance([1, 0], [1, 0]) == pytest.approx(0.0)
        assert dz.cosine_distance([1, 0], [0, 1]) == pytest.approx(1.0)
        assert dz.cosine_distance([0, 0], [1, 0]) == 1.0  # zero-norm guard
        assert dz.cosine_distance([1, 0], [-1, 0]) == pytest.approx(2.0)

    def test_f32_to_i16_truncates_like_rust_cast(self):
        out = dz.f32_to_i16(np.array([0.0, 1.0, -1.0, 2.0, 0.5, -0.49999], np.float32))
        assert out.tolist() == [0, 32767, -32767, 32767, 16383, -16383]

    def test_merge_consecutive(self):
        segs = [
            dz.SpeakerSegment(0.0, 1.0, "Speaker 1"),
            dz.SpeakerSegment(1.2, 2.0, "Speaker 1"),  # gap 0.2 <= 0.5
            dz.SpeakerSegment(3.5, 4.0, "Speaker 1"),  # gap 1.5 > 0.5
            dz.SpeakerSegment(4.0, 5.0, "Speaker 2"),
        ]
        m = dz.merge_consecutive_segments(segs, merge_gap=0.5)
        assert [(s.start, s.end, s.speaker) for s in m] == [
            (0.0, 2.0, "Speaker 1"), (3.5, 4.0, "Speaker 1"), (4.0, 5.0, "Speaker 2"),
        ]

    def test_merge_overlapping_boundaries(self):
        segs = [dz.SpeakerSegment(0.0, 2.0, "Speaker 1"),
                dz.SpeakerSegment(1.5, 3.0, "Speaker 1")]
        m = dz.merge_consecutive_segments(segs, merge_gap=0.0)
        assert len(m) == 1 and m[0].end == 3.0

    def test_find_speaker_at_time(self):
        segs = [dz.SpeakerSegment(0.0, 1.0, "Speaker 1"),
                dz.SpeakerSegment(2.0, 3.0, "Speaker 2")]
        assert dz.find_speaker_at_time(0.5, segs) == "Speaker 1"
        assert dz.find_speaker_at_time(1.4, segs) == "Speaker 1"  # closest
        assert dz.find_speaker_at_time(1.9, segs) == "Speaker 2"
        assert dz.find_speaker_at_time(9.0, segs) == "Speaker 2"

    def test_format_diarized_text(self):
        speakers = [dz.SpeakerSegment(0.0, 2.0, "Speaker 1"),
                    dz.SpeakerSegment(2.0, 4.0, "Speaker 2")]
        words = [(0.1, 0.5, "hello"), (0.6, 1.0, "there"), (2.5, 3.0, "hi"),
                 (3.1, 3.5, "  "), (3.6, 3.9, "back")]
        out = dz.format_diarized_text(words, speakers)
        assert out == "[Speaker 1|0.1]\nhello there\n\n[Speaker 2|2.5]\nhi back"

    def test_format_without_speakers_joins(self):
        words = [(0.0, 1.0, "a"), (1.0, 2.0, "b")]
        assert dz.format_diarized_text(words, []) == "a b"


class TestSegmentation:
    def test_speech_and_silence_split(self):
        sr = dz.SAMPLE_RATE
        t = np.arange(3 * sr) / sr
        tone = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        audio = np.concatenate([tone, np.zeros(3 * sr, np.float32), tone])
        segs = dz.segment_speech(audio, merge_gap=1.0)
        assert len(segs) == 2
        assert segs[0].start == 0.0  # 100 ms start snap
        assert abs(segs[0].end - 3.0) < 0.3
        assert abs(segs[1].start - 6.0) < 0.3

    def test_short_blips_dropped_keep_longest_fallback(self):
        sr = dz.SAMPLE_RATE
        t = np.arange(int(0.8 * sr)) / sr
        blip = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        audio = np.concatenate([np.zeros(2 * sr, np.float32), blip,
                                np.zeros(4 * sr, np.float32)])
        segs = dz.segment_speech(audio, merge_gap=0.2)
        assert len(segs) == 1  # <1.5s but kept as the longest fallback

    def test_empty_and_silence(self):
        assert dz.segment_speech(np.zeros(0, np.float32), 1.0) == []
        assert dz.segment_speech(np.zeros(dz.SAMPLE_RATE, np.float32), 1.0) == []

    def test_chunking_long_segments(self):
        sr = dz.SAMPLE_RATE
        seg = dz.VadSegment(0.0, 10.0, np.zeros(10 * sr, np.float32))
        chunks = dz.chunk_segments([seg])
        assert len(chunks) == 3
        assert chunks[0].start == 0.0 and abs(chunks[-1].end - 10.0) < 1e-6
        durations = [c.end - c.start for c in chunks]
        assert all(d <= dz.MAX_CHUNK_SECONDS + 0.5 for d in durations)


class TestEndToEnd:
    def test_two_synthetic_speakers(self):
        """Low tone vs high tone with a pause: two chronological speakers."""
        sr = dz.SAMPLE_RATE
        t = np.arange(5 * sr) / sr
        low = (0.4 * np.sin(2 * np.pi * 150 * t) * (1 + 0.2 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
        high = (0.4 * np.sin(2 * np.pi * 1200 * t) * (1 + 0.2 * np.sin(2 * np.pi * 5 * t))).astype(np.float32)
        audio = np.concatenate([low, np.zeros(2 * sr, np.float32), high])
        segs = dz.diarize(audio, max_speakers=4, merge_gap=0.5)
        assert len(segs) >= 2
        assert segs[0].speaker == "Speaker 1"  # first to speak is Speaker 1
        speakers = {s.speaker for s in segs}
        assert "Speaker 2" in speakers

    def test_run_diarization_formats(self):
        sr = dz.SAMPLE_RATE
        t = np.arange(2 * sr) / sr
        tone = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        text = dz.run_diarization(tone, sr, [(0.2, 0.8, "hello world")])
        assert "[Speaker 1|0.2]" in text and "hello world" in text

    def test_rejects_wrong_rate(self):
        with pytest.raises(ValueError):
            dz.diarize(np.zeros(100, np.float32), sample_rate=48000)
