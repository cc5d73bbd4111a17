"""WAV codec tests — modeled on the reference's WavWriter and
get_wav_duration unit tests (recording.rs:406-558,
commands/recording.rs:604-777): real temp-dir files, hand-built byte
fixtures with extra LIST chunks and truncated headers."""

import struct

import numpy as np
import pytest

from crispy_tpu.io import wav


def _write_fixture(path, sample_rate=48000, channels=2, bits=16, data_size=None,
                   extra_chunk=True, truncate=False):
    """Hand-built WAV bytes (commands/recording.rs:610-647)."""
    n_data = data_size if data_size is not None else sample_rate * channels * (bits // 8)
    body = b"WAVE"
    body += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate,
        sample_rate * channels * bits // 8, channels * bits // 8, bits)
    if extra_chunk:
        body += b"LIST" + struct.pack("<I", 10) + b"INFOxxxxxx"
    if not truncate:
        body += b"data" + struct.pack("<I", n_data) + b"\x00" * n_data
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + body
    path.write_bytes(blob)
    return path


class TestDuration:
    def test_one_second(self, tmp_path):
        p = _write_fixture(tmp_path / "a.wav")
        assert wav.get_wav_duration(p) == pytest.approx(1.0)

    def test_extra_chunks_skipped(self, tmp_path):
        p = _write_fixture(tmp_path / "b.wav", sample_rate=44100, extra_chunk=True)
        assert wav.get_wav_duration(p) == pytest.approx(1.0)

    def test_truncated_header(self, tmp_path):
        p = _write_fixture(tmp_path / "c.wav", truncate=True)
        assert wav.get_wav_duration(p) is None

    def test_not_riff(self, tmp_path):
        p = tmp_path / "d.wav"
        p.write_bytes(b"JUNKJUNKJUNKJUNK")
        assert wav.get_wav_duration(p) is None

    def test_missing_file(self, tmp_path):
        assert wav.get_wav_duration(tmp_path / "nope.wav") is None

    def test_zero_data(self, tmp_path):
        p = _write_fixture(tmp_path / "e.wav", data_size=0)
        assert wav.get_wav_duration(p) is None


class TestRoundTrip:
    def test_i16_roundtrip(self, tmp_path, rng):
        data = rng.uniform(-1, 1, size=(4800, 2)).astype(np.float32)
        p = wav.write_wav(tmp_path / "rt.wav", data, 48000)
        back, rate = wav.read_wav(p)
        assert rate == 48000
        assert back.shape == (4800, 2)
        # quantization (trunc, 1 LSB) + 32767/32768 scale mismatch (1 LSB)
        np.testing.assert_allclose(back, data, atol=2.1 / 32768)

    def test_f32_roundtrip_exact(self, tmp_path, rng):
        data = rng.uniform(-1, 1, size=(1000, 1)).astype(np.float32)
        p = wav.write_wav(tmp_path / "rt32.wav", data, 16000, dtype="f32")
        back, rate = wav.read_wav(p)
        assert rate == 16000
        np.testing.assert_array_equal(back, data)

    def test_mono_channel0(self, tmp_path):
        data = np.stack([np.ones(100), -np.ones(100)], axis=1).astype(np.float32)
        p = wav.write_wav(tmp_path / "st.wav", data, 48000, dtype="f32")
        mono, _ = wav.read_wav_mono(p)
        np.testing.assert_array_equal(mono, np.ones(100, np.float32))

    def test_streaming_blocks_match_full_read(self, tmp_path, rng):
        data = rng.uniform(-1, 1, size=(10_000, 2)).astype(np.float32)
        p = wav.write_wav(tmp_path / "blk.wav", data, 48000, dtype="f32")
        blocks = [b for b, r in wav.iter_wav_blocks(p, block_frames=777)]
        joined = np.concatenate(blocks, axis=0)
        full, _ = wav.read_wav(p)
        np.testing.assert_array_equal(joined, full)


class TestWavWriter:
    def test_silence(self, tmp_path):
        w = wav.WavWriter(tmp_path / "s.wav")
        w.write_samples(np.zeros(480, np.float32), np.zeros(480, np.float32))
        out = w.finalize()
        data, rate = wav.read_wav(out)
        assert rate == 48000
        assert data.shape == (480, 2)
        np.testing.assert_array_equal(data, 0)

    def test_clamping_and_interleave(self, tmp_path):
        w = wav.WavWriter(tmp_path / "c.wav")
        left = np.array([2.0, -2.0, 0.5], np.float32)
        right = np.array([-0.25, 1.0, 0.0], np.float32)
        w.write_samples(left, right)
        p = w.finalize()
        data, _ = wav.read_wav(p)
        # clamp(±2)*32767 → ±32767; reference converts with `as i16` truncation
        assert data[0, 0] == pytest.approx(32767 / 32768)
        assert data[1, 0] == pytest.approx(-32767 / 32768)
        assert data[0, 1] == pytest.approx(-0.25, abs=1e-3)
        assert data[2, 1] == 0.0

    def test_mismatched_lengths_rejected(self, tmp_path):
        w = wav.WavWriter(tmp_path / "m.wav")
        with pytest.raises(ValueError):
            w.write_samples(np.zeros(3, np.float32), np.zeros(4, np.float32))
        w.finalize()

    def test_duration_of_written_file(self, tmp_path):
        w = wav.WavWriter(tmp_path / "d.wav")
        for _ in range(100):
            w.write_samples(np.zeros(480, np.float32), np.zeros(480, np.float32))
        p = w.finalize()
        assert wav.get_wav_duration(p) == pytest.approx(1.0)


def test_odd_sized_list_chunk_with_pad_byte(tmp_path):
    """RIFF word alignment: an odd-sized LIST chunk is followed by a pad
    byte not counted in chunk_size — the walker must skip it (review
    fix; the reference's parser would misparse such spec-valid files)."""
    import struct

    data = (np.sin(np.arange(480) / 10) * 0.5).astype(np.float32)
    pcm = (data * 32767).astype("<i2").tobytes()
    odd_payload = b"INFOx"  # 5 bytes: odd → pad byte follows
    chunks = b"LIST" + struct.pack("<I", len(odd_payload)) + odd_payload + b"\x00"
    fmt = struct.pack("<HHIIHH", 1, 1, 48000, 96000, 2, 16)
    body = (b"WAVE" + chunks
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    p = tmp_path / "odd.wav"
    p.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)
    audio, sr = wav.read_wav(p)
    assert sr == 48000 and audio.shape[0] == 480
    assert abs(wav.get_wav_duration(p) - 480 / 48000) < 1e-9


def test_truncated_mid_sample_decodes_complete_frames(tmp_path):
    data = (np.sin(np.arange(480) / 7) * 0.5).astype(np.float32)
    p = wav.write_wav(tmp_path / "t.wav", data, 48000)
    raw = p.read_bytes()
    p.write_bytes(raw[:-3])  # cut mid-sample (odd byte count)
    audio, sr = wav.read_wav(p)  # complete frames decode, no ValueError
    assert sr == 48000 and audio.shape[0] >= 470
