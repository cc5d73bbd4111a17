"""R5/R7 capture semantics: one-shot rate detection from buffer duration
(48 k/44.1 k snap), CMSampleBuffer-style downmix, and the pluggable
recordable-app registry (reference: recording.rs:194-385, 136-192)."""

import numpy as np
import pytest

from crispy_tpu.engine import recording as rec


class TestRateDetection:
    def test_snaps_within_200hz(self):
        assert rec.detect_sample_rate(4800, 0.1) == 48000
        assert rec.detect_sample_rate(4410, 0.1) == 44100
        assert rec.detect_sample_rate(4810, 0.1) == 48000   # 48100 → snap
        assert rec.detect_sample_rate(4429, 0.1) == 44100   # 44290 → snap

    def test_unknown_rates_fall_back_to_44100(self):
        assert rec.detect_sample_rate(3200, 0.1) == 44100   # 32 kHz
        assert rec.detect_sample_rate(9600, 0.1) == 44100   # 96 kHz
        assert rec.detect_sample_rate(4800, 0.0) == 44100
        assert rec.detect_sample_rate(4800, None) == 44100


class TestDownmix:
    def test_lr_pair_averages_common_length(self):
        l = np.ones(10, np.float32)
        r = np.zeros(12, np.float32)
        out = rec.downmix_mono((l, r))
        np.testing.assert_allclose(out, np.full(10, 0.5))

    def test_interleaved_channels_average(self):
        x = np.stack([np.ones(8), 3 * np.ones(8)], axis=1).astype(np.float32)
        np.testing.assert_allclose(rec.downmix_mono(x), np.full(8, 2.0))

    def test_mono_passthrough(self):
        x = np.arange(5, dtype=np.float32)
        np.testing.assert_array_equal(rec.downmix_mono(x), x)


class TestAppCaptureHandler:
    def test_441_detection_and_resample(self):
        got = []
        h = rec.AppCaptureHandler(got.append)
        block = np.sin(np.arange(4410) / 10).astype(np.float32)
        h.deliver(block, duration_secs=0.1)
        assert h.detected_sample_rate == 44100
        # 44.1k → 48k: 0.1 s becomes ~4800 samples
        assert abs(got[0].size - 4800) <= 2
        # detection is one-shot: later durations don't change it
        h.deliver(block, duration_secs=0.05)
        assert h.detected_sample_rate == 44100

    def test_48k_passthrough(self):
        got = []
        h = rec.AppCaptureHandler(got.append)
        h.deliver(np.zeros(4800, np.float32), duration_secs=0.1)
        assert h.detected_sample_rate == 48000
        assert got[0].size == 4800

    def test_silent_packet_zero_fill(self):
        """WASAPI silent packets advance the timeline with zeros (R6)."""
        got = []
        h = rec.AppCaptureHandler(got.append)
        h.deliver_silence(0.024)
        assert got[0].size == round(0.024 * 48000)
        np.testing.assert_array_equal(got[0], 0.0)


class TestRecordableRegistry:
    def test_register_enumerate_resolve(self, tmp_path):
        class Src(rec.AudioSource):
            def start(self, sink):
                sink(np.zeros(480, np.float32))

            def stop(self):
                pass

        rec.register_recordable_app("com.test.app_123", "Test App", Src)
        try:
            apps = rec.get_recordable_apps()
            assert apps[0].name == "Test App"
            assert apps[-1].name == "None (Mic only)"  # fallback always last
            src = rec.resolve_app_source("com.test.app_123")
            assert isinstance(src, Src)
            assert rec.resolve_app_source("") is None
            assert rec.resolve_app_source("nope") is None
        finally:
            rec.unregister_recordable_app("com.test.app_123")
        assert [a.name for a in rec.get_recordable_apps()] == ["None (Mic only)"]

    def test_registered_app_records_dual_source(self, data_root, tmp_path):
        """End to end: a registered app source mixes into the recording
        (dual-mono sum, commands/recording.rs:188-291 semantics)."""
        from crispy_tpu.api.commands import CrispyApp
        from crispy_tpu.api.events import EventBus
        from crispy_tpu.io import wav as wavio

        class Tone(rec.AudioSource):
            def start(self, sink):
                h = rec.AppCaptureHandler(sink)
                h.deliver(np.full(44100, 0.25, np.float32), duration_secs=1.0)

            def stop(self):
                pass

        rec.register_recordable_app("tone_1", "Tone", Tone)
        try:
            app = CrispyApp(bus=EventBus())
            assert {"id": "tone_1", "name": "Tone", "bundle_id": "tone_1"} in app.get_recordable_apps()
            path = app.start_recording("tone_1")  # start clears the rings
            app.recording_state.mic_ring.push(np.full(48000, 0.25, np.float32))
            import time

            deadline = time.monotonic() + 10
            while time.monotonic() < deadline and len(app.recording_state.mic_ring) >= 1152:
                time.sleep(0.05)
            out = app.stop_recording()
            audio, sr = wavio.read_wav(out)
            assert sr == 48000 and audio.shape[1] == 2
            # mic 0.25 + app 0.25 (rate-detected 44.1k → 48k) ≈ 0.5 dual-mono
            mid = audio[1000:40000]
            assert np.median(mid[:, 0]) == pytest.approx(0.5, abs=0.02)
            np.testing.assert_allclose(mid[:, 0], mid[:, 1])
        finally:
            rec.unregister_recordable_app("tone_1")
