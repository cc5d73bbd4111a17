"""Transcription pipeline: chunking, events, progress/ETA, cancel,
persistence (reference: commands/transcription.rs, managers/transcription.rs)."""

import threading
import time

import numpy as np
import pytest

from crispy_tpu.api.events import EventBus
from crispy_tpu.engine import transcription as tr
from crispy_tpu.io import wav as wavio
from crispy_tpu.models.registry import ModelManager


class FakeEngine(tr.EngineProtocol):
    """Deterministic engine: text encodes chunk index + RMS presence."""

    name = "fake"

    def __init__(self, delay=0.0, texts=None):
        self.delay = delay
        self.calls = []
        self.texts = texts

    def transcribe_batch(self, chunks, language="en"):
        self.calls.append(np.asarray(chunks).shape)
        if self.delay:
            time.sleep(self.delay)
        out = []
        for i, c in enumerate(np.atleast_2d(chunks)):
            if self.texts is not None:
                out.append(self.texts.pop(0) if self.texts else "")
            else:
                out.append(f"chunk{len(self.calls)}-{i}" if np.abs(c).max() > 0 else "")
        return out


@pytest.fixture
def setup(tmp_path, data_root):
    bus = EventBus()
    bus.keep_history = True
    mm = ModelManager(models_dir=tmp_path / "Models", bus=bus)
    engine = FakeEngine()
    tm = tr.TranscriptionManager(mm, bus=bus, engine_loader=lambda mid, m: engine)
    return tm, bus, engine, tmp_path


def make_wav(path, seconds, sr=48000, channels=1):
    t = np.arange(int(seconds * sr)) / sr
    sig = (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    data = np.tile(sig[:, None], (1, channels))
    return wavio.write_wav(path, data, sr)


class TestPersistence:
    def test_stems_stable_and_distinct(self):
        a = tr.transcription_file_stem("/a/b.wav")
        assert a == tr.transcription_file_stem("/a/b.wav")
        assert len(a) == 16
        assert a != tr.transcription_file_stem("/a/c.wav")

    def test_sidecar_roundtrip(self, data_root):
        tr.save_transcription_result("/r/x.wav", "hello")
        tr.save_transcription_metadata("/r/x.wav", "small")
        tr.save_transcription_chat_history("/r/x.wav", [{"role": "user", "content": "hi"}])
        assert tr.load_transcription_result("/r/x.wav") == "hello"
        assert tr.load_transcription_metadata("/r/x.wav") == "small"
        assert tr.load_transcription_chat_history("/r/x.wav")[0]["content"] == "hi"
        assert tr.load_transcription_result("/r/other.wav") is None
        assert tr.load_transcription_chat_history("/r/other.wav") == []


class TestPipeline:
    def test_short_file_single_chunk(self, setup):
        tm, bus, engine, tmp = setup
        wav = make_wav(tmp / "rec.wav", seconds=2.0)
        text = tr.run_transcription(str(wav), tm, "fake-model")
        assert text.startswith("chunk1-0")
        assert engine.calls == [(1, tr.CHUNK_SAMPLES)]
        statuses = [p["status"] for e, p in bus.history if e == "transcription-status"]
        assert statuses == ["started", "completed"]
        phases = [p["phase"] for e, p in bus.history if e == "transcription-phase"]
        assert phases == ["preparing-audio", "loading-model", "transcribing"]
        assert tr.load_transcription_result(str(wav)) == text
        assert tr.load_transcription_metadata(str(wav)) == "fake-model"

    def test_long_file_batched_chunks_and_progress(self, setup):
        tm, bus, engine, tmp = setup
        wav = make_wav(tmp / "long.wav", seconds=95.0, sr=16000)  # 4 chunks
        tr.run_transcription(str(wav), tm, "fake-model", batch_chunks=2)
        assert engine.calls == [(2, tr.CHUNK_SAMPLES), (2, tr.CHUNK_SAMPLES)]
        progs = [p["progress"] for e, p in bus.history if e == "transcription-progress"]
        assert progs == sorted(progs) and progs[-1] == 1.0
        st = tm.get_state(str(wav))
        assert st.status == "completed" and st.progress == 1.0

    def test_tail_batch_padded_to_fixed_shape(self, setup):
        """A partial final batch pads to batch_chunks so the engine sees ONE
        shape (no fresh XLA compile for the tail); pad rows are discarded."""
        tm, bus, engine, tmp = setup
        wav = make_wav(tmp / "tail.wav", seconds=65.0, sr=16000)  # 3 chunks
        text = tr.run_transcription(str(wav), tm, "fake-model", batch_chunks=2)
        assert engine.calls == [(2, tr.CHUNK_SAMPLES), (2, tr.CHUNK_SAMPLES)]
        # exactly 3 chunk texts survive (the 4th padded row is dropped)
        assert len([w for w in text.split() if w.startswith("chunk")]) == 3

    def test_large_bucket_schedule(self, setup):
        """An engine advertising decode_batch_bucket gets big batches while
        more than batch_chunks chunks remain (whisper's measured 16-chunk
        amortization of the sequential decode scan), the batch_chunks
        bucket for the tail — at most two compiled batch shapes."""
        tm, bus, engine, tmp = setup
        engine.decode_batch_bucket = 4
        wav = make_wav(tmp / "big.wav", seconds=10 * 30.0 - 5, sr=16000)  # 10 chunks
        text = tr.run_transcription(str(wav), tm, "fake-model", batch_chunks=2)
        # 10 chunks: 4, 4 (rem 2 > batch_chunks is False -> tail bucket), 2
        assert engine.calls == [(4, tr.CHUNK_SAMPLES), (4, tr.CHUNK_SAMPLES),
                                (2, tr.CHUNK_SAMPLES)]
        assert len([w for w in text.split() if w.startswith("chunk")]) == 10
        # remainder >batch_chunks pads into ONE big bucket (321 ms beats
        # two 8-batches on chip), pad rows dropped
        engine.calls.clear()
        engine.texts = None
        wav2 = make_wav(tmp / "big2.wav", seconds=7 * 30.0 - 5, sr=16000)  # 7 chunks
        text2 = tr.run_transcription(str(wav2), tm, "fake-model", batch_chunks=2)
        assert engine.calls == [(4, tr.CHUNK_SAMPLES), (4, tr.CHUNK_SAMPLES)]
        assert len([w for w in text2.split() if w.startswith("chunk")]) == 7

    def test_eta_emitted(self, setup):
        tm, bus, engine, tmp = setup
        engine.delay = 0.05
        wav = make_wav(tmp / "eta.wav", seconds=65.0, sr=16000)
        tr.run_transcription(str(wav), tm, "fake-model", batch_chunks=1)
        etas = [p["eta_seconds"] for e, p in bus.history if e == "transcription-progress"]
        assert any(v is not None for v in etas)

    def test_cancel_between_batches(self, setup):
        tm, bus, engine, tmp = setup
        wav = make_wav(tmp / "c.wav", seconds=65.0, sr=16000)

        orig = engine.transcribe_batch

        def canceling(chunks, language="en"):
            tm.cancel(str(wav))
            return orig(chunks, language)

        engine.transcribe_batch = canceling
        out = tr.run_transcription(str(wav), tm, "fake-model", batch_chunks=1)
        assert out is None
        statuses = [p["status"] for e, p in bus.history if e == "transcription-status"]
        assert statuses[-1] == "cancelled"

    def test_error_sets_error_state(self, setup):
        tm, bus, engine, tmp = setup

        def boom(chunks, language="en"):
            raise RuntimeError("engine exploded")

        engine.transcribe_batch = boom
        wav = make_wav(tmp / "e.wav", seconds=2.0)
        with pytest.raises(RuntimeError):
            tr.run_transcription(str(wav), tm, "fake-model")
        assert tm.get_state(str(wav)).status == "error"
        errs = [p["error"] for e, p in bus.history if e == "transcription-status" and p["error"]]
        assert "engine exploded" in errs[0]

    def test_empty_file_completes_with_empty_result(self, setup):
        tm, bus, engine, tmp = setup
        wav = wavio.write_wav(tmp / "empty.wav", np.zeros((0, 1), np.float32), 48000)
        text = tr.run_transcription(str(wav), tm, "fake-model")
        assert text == ""
        assert tm.get_state(str(wav)).status == "completed"

    def test_resampling_48k_input(self, setup):
        """48 kHz input resamples to 16 kHz before chunking (:196-207)."""
        tm, bus, engine, tmp = setup
        wav = make_wav(tmp / "r48.wav", seconds=31.0, sr=48000)
        tr.run_transcription(str(wav), tm, "fake-model")
        # 31 s → 2 chunks at 16 kHz
        assert engine.calls[0][0] == 2

    def test_start_transcription_runs_in_thread(self, setup):
        tm, bus, engine, tmp = setup
        wav = make_wav(tmp / "t.wav", seconds=2.0)
        th = tr.start_transcription(str(wav), tm, "fake-model")
        th.join(timeout=30)
        assert tm.get_state(str(wav)).status == "completed"

    def test_manager_model_caching(self, setup):
        tm, bus, engine, tmp = setup
        loads = []
        tm._loader = lambda mid, m: loads.append(mid) or engine
        tm.load_model("a")
        tm.load_model("a")
        tm.load_model("b")
        assert loads == ["a", "b"]
        assert tm.get_current_model() == "b"


class TestCheckpointResume:
    """Chunk-level checkpoint/resume (the TPU-build improvement SURVEY §5
    flags over the reference's restart-from-zero)."""

    def test_resume_skips_completed_batches(self, setup):
        tm, bus, engine, tmp_path = setup
        wav = tmp_path / "long.wav"
        make_wav(wav, 90)  # 3 chunks

        class FlakyEngine(FakeEngine):
            def transcribe_batch(self, chunks, language="en"):
                if len(self.calls) == 1:  # first batch already committed
                    raise RuntimeError("injected failure on second batch")
                return super().transcribe_batch(chunks, language)

        flaky = FlakyEngine()
        tm._loader = lambda mid, m: flaky
        tm._engine = None
        with pytest.raises(RuntimeError):
            tr.run_transcription(str(wav), tm, "fake-model", batch_chunks=1)
        assert tr.transcription_progress_path(str(wav)).exists()

        good = FakeEngine()
        tm._loader = lambda mid, m: good
        tm._engine = None
        text = tr.run_transcription(str(wav), tm, "fake-model", batch_chunks=1)
        assert text is not None and text.strip()
        # only the remaining 2 chunks were re-transcribed
        assert len(good.calls) == 2
        assert not tr.transcription_progress_path(str(wav)).exists()

    def test_checkpoint_ignored_on_model_change(self, setup):
        tm, bus, engine, tmp_path = setup
        wav = tmp_path / "m.wav"
        make_wav(wav, 60)  # 2 chunks
        tr._save_progress(str(wav), {"model_id": "other-model", "language": "en",
                                     "n_chunks": 2, "done_chunks": 1,
                                     "diarization": False,
                                     "parts": [[0.0, 30.0, "stale"]]})
        text = tr.run_transcription(str(wav), tm, "fake-model", batch_chunks=2)
        assert "stale" not in text
        assert len(engine.calls) == 1  # full re-run in one batch

    def test_corrupt_checkpoint_restarts_clean(self, setup):
        tm, bus, engine, tmp_path = setup
        wav = tmp_path / "c.wav"
        make_wav(wav, 30)
        tr.transcription_progress_path(str(wav)).write_text("{not json")
        text = tr.run_transcription(str(wav), tm, "fake-model")
        assert text and not tr.transcription_progress_path(str(wav)).exists()


class TestDeviceResidentPipeline:
    def test_device_chunks_match_host_path(self, setup, monkeypatch):
        """run_transcription with a device-resident resample output (the
        TPU path's device_out=True) chunks/pads on device and produces the
        same transcript as the host path — no silent fetch regressions."""
        import jax.numpy as jnp

        from crispy_tpu.dsp import resample as rs

        tm, bus, engine, tmp = setup
        wav = make_wav(tmp / "dev.wav", seconds=95.0)  # 4 chunks, ragged tail

        host_text = tr.run_transcription(str(wav), tm, "fake-model",
                                         batch_chunks=3)
        host_calls = list(engine.calls)
        engine.calls.clear()
        tr.clear_transcription_progress(str(wav))

        real = rs.resample_poly

        def device_resample(x, fr, to, **kw):
            kw.pop("device_out", None)
            return jnp.asarray(real(x, fr, to, **kw))  # device-resident

        monkeypatch.setattr(rs, "resample_poly", device_resample)
        # engine must SEE device arrays (proof nothing fetched upstream)
        seen = []
        orig = engine.transcribe_batch
        engine.transcribe_batch = lambda c, language="en": (
            seen.append(type(c).__module__), orig(c, language))[1]
        dev_text = tr.run_transcription(str(wav), tm, "fake-model",
                                        batch_chunks=3)
        assert dev_text == host_text
        assert engine.calls == host_calls  # same batch shapes incl. tail pad
        assert all(m.startswith("jax") for m in seen), seen

    def test_resample_device_out_matches_host_fetch(self):
        import jax

        from crispy_tpu.dsp.resample import resample_poly

        rng = np.random.default_rng(0)
        x = (rng.standard_normal(48000) * 0.3).astype(np.float32)
        host = resample_poly(x, 48000, 16000, use_jax=True)
        dev = resample_poly(x, 48000, 16000, use_jax=True, device_out=True)
        assert isinstance(dev, jax.Array)
        np.testing.assert_array_equal(host, np.asarray(dev))
