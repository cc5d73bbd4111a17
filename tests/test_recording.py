"""Recording engine: mixer semantics, lifecycle, CRUD (reference:
src-tauri/src/recording.rs + commands/recording.rs)."""

import time
import wave

import numpy as np
import pytest

from crispy_tpu.engine import recording as rec
from crispy_tpu.engine import transcription as tr
from crispy_tpu.io import wav as wavio


class TestRingBuffer:
    def test_bounded(self):
        r = rec.RingBuffer(capacity=10)
        r.push(np.arange(15, dtype=np.float32))
        assert len(r) == 10
        assert r.pop(3).tolist() == [5.0, 6.0, 7.0]

    def test_trim_front(self):
        r = rec.RingBuffer(capacity=100)
        r.push(np.arange(10, dtype=np.float32))
        r.trim_front(4)
        assert r.pop(2).tolist() == [4.0, 5.0]


class TestMixer:
    def test_dual_mono_mix_and_zero_fill(self, data_root):
        state = rec.RecordingState()
        path = rec.do_start_recording(state)
        # push exactly 2 mix frames of mic; app has only half a frame
        mic = 0.25 * np.ones(2 * rec.MIX_FRAME, np.float32)
        app = 0.25 * np.ones(rec.MIX_FRAME // 2, np.float32)
        state.mic_ring.push(mic)
        state.app_ring.push(app)
        deadline = time.time() + 5
        while len(state.mic_ring) >= rec.MIX_FRAME and time.time() < deadline:
            time.sleep(0.02)
        out = rec.do_stop_recording(state)
        audio, sr = wavio.read_wav(out)
        assert sr == rec.SAMPLE_RATE and audio.shape[1] == 2
        assert audio.shape[0] == 2 * rec.MIX_FRAME
        np.testing.assert_allclose(audio[:, 0], audio[:, 1])  # dual mono
        # first half-frame mixed (0.5), rest mic-only (0.25)
        np.testing.assert_allclose(audio[: rec.MIX_FRAME // 2, 0], 0.5, atol=1e-3)
        np.testing.assert_allclose(audio[rec.MIX_FRAME:, 0], 0.25, atol=1e-3)

    def test_desync_trim(self, data_root):
        state = rec.RecordingState()
        state.active.set()
        # mic far ahead of app: head of mic must be dropped to <=50ms lead
        state.mic_ring.push(np.arange(rec.MIX_FRAME * 8, dtype=np.float32))
        state.app_ring.push(np.ones(rec.MIX_FRAME, np.float32))
        mic_len, app_len = len(state.mic_ring), len(state.app_ring)
        assert mic_len > app_len + rec.MAX_DESYNC
        w = rec.start_recording_worker(state)
        time.sleep(0.2)
        state.active.clear()
        w.join(timeout=5)
        # after trim, mic lead was bounded: remaining mic is small
        assert len(state.mic_ring) < rec.MIX_FRAME

    def test_file_source_feeds_app_ring(self, data_root, tmp_path):
        tone = 0.1 * np.ones(24000, np.float32)
        src_wav = wavio.write_wav(tmp_path / "app.wav", tone, 48000)
        state = rec.RecordingState()
        rec.do_start_recording(state, app_source=rec.FileSource(src_wav))
        state.mic_ring.push(np.zeros(24000, np.float32))
        deadline = time.time() + 5
        while len(state.mic_ring) >= rec.MIX_FRAME and time.time() < deadline:
            time.sleep(0.02)
        out = rec.do_stop_recording(state)
        audio, _ = wavio.read_wav(out)
        assert np.abs(audio[:, 0] - 0.1).max() < 1e-2  # app audio present


class TestLifecycle:
    def test_start_stop_and_is_recording(self, data_root):
        state = rec.RecordingState()
        assert not rec.is_recording(state)
        p = rec.do_start_recording(state)
        assert rec.is_recording(state)
        assert p.name.startswith("recording_") and p.suffix == ".wav"
        with pytest.raises(RuntimeError):
            rec.do_start_recording(state)
        out = rec.do_stop_recording(state)
        assert not rec.is_recording(state)
        # stdlib wave can open the finalized file
        with wave.open(out, "rb") as w:
            assert w.getnchannels() == 2 and w.getframerate() == 48000
        with pytest.raises(RuntimeError):
            rec.do_stop_recording(state)

    def test_recordable_apps_fallback(self):
        apps = rec.get_recordable_apps()
        assert apps[0].name == "None (Mic only)"


class TestCrud:
    def _make(self, name, seconds=1.0):
        from crispy_tpu.utils import paths

        d = paths.ensure_dir(paths.recordings_dir())
        data = np.zeros((int(48000 * seconds), 2), np.float32)
        return wavio.write_wav(d / name, data, 48000)

    def test_list_sorted_and_metadata(self, data_root):
        a = self._make("a.wav", 1.0)
        time.sleep(0.02)
        b = self._make("b.wav", 2.0)
        (a.parent / "notes.txt").write_text("x")  # non-wav ignored
        recs = rec.get_recordings()
        assert [r["name"] for r in recs] == ["b.wav", "a.wav"]
        assert recs[0]["duration_seconds"] == pytest.approx(2.0)

    def test_active_recording_hidden(self, data_root):
        self._make("done.wav")
        state = rec.RecordingState()
        active = rec.do_start_recording(state)
        names = [r["name"] for r in rec.get_recordings(state)]
        assert "done.wav" in names and active.name not in names
        rec.do_stop_recording(state)

    def test_rename_moves_sidecars(self, data_root):
        p = self._make("orig.wav")
        tr.save_transcription_result(str(p), "transcript")
        tr.save_transcription_metadata(str(p), "small")
        newp = rec.rename_recording(str(p), "renamed")
        assert newp.endswith("renamed.wav")
        assert tr.load_transcription_result(newp) == "transcript"
        assert tr.load_transcription_metadata(newp) == "small"
        assert tr.load_transcription_result(str(p)) is None

    def test_rename_validation(self, data_root):
        p = self._make("v.wav")
        with pytest.raises(ValueError):
            rec.rename_recording(str(p), "   ")
        with pytest.raises(ValueError):
            rec.rename_recording(str(p), "a/b")
        self._make("taken.wav")
        with pytest.raises(FileExistsError):
            rec.rename_recording(str(p), "taken")
        with pytest.raises(FileNotFoundError):
            rec.rename_recording(str(p.parent / "ghost.wav"), "x")

    def test_delete_confinement(self, data_root, tmp_path):
        p = self._make("del.wav")
        rec.delete_recording(str(p))
        assert not p.exists()
        outside = tmp_path / "outside.wav"
        outside.write_bytes(b"RIFF")
        with pytest.raises(PermissionError):
            rec.delete_recording(str(outside))
        with pytest.raises(PermissionError):
            rec.delete_recording(str(p.parent / ".." / "escape.wav"))
