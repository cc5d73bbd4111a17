"""The command surface: all 53 reference commands exist and behave
(reference: main.rs:372-425 invoke_handler)."""

import json
from pathlib import Path
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from crispy_tpu.api.commands import CrispyApp
from crispy_tpu.api.events import EventBus
from crispy_tpu.engine import transcription as tr
from crispy_tpu.io import wav as wavio
from crispy_tpu.utils import settings as settings_mod

REFERENCE_COMMANDS = [
    "get_platform", "get_input_devices", "get_output_devices", "get_default_devices",
    "start_monitoring", "stop_monitoring", "set_monitoring_volume", "set_monitoring_model",
    "get_system_input_volume", "set_system_input_volume", "get_blackhole_status",
    "get_recordable_apps", "start_recording", "stop_recording", "is_recording",
    "get_recordings_dir_path", "open_recordings_dir", "open_url",
    "show_main_window_cmd", "quit_app",
    "get_recordings", "rename_recording", "delete_recording",
    "get_available_models", "get_available_ns_models", "get_model_info",
    "download_model", "delete_model", "set_active_model", "get_current_model",
    "cancel_download", "get_recommended_first_model",
    "start_transcription", "get_transcription_result", "get_transcription_model",
    "get_transcription_state", "open_transcription_window", "has_transcription_result",
    "get_llm_settings", "set_llm_settings",
    "stream_transcription_chat", "get_transcription_chat_history",
    "set_transcription_chat_history", "cancel_transcription",
    "get_all_transcription_states",
    "get_app_settings", "set_app_setting", "set_autostart",
    "convert_to_wav", "check_ffmpeg",
    "check_permissions", "request_permission",
]


@pytest.fixture
def app(data_root):
    bus = EventBus()
    bus.keep_history = True
    return CrispyApp(bus=bus)


def test_full_command_surface_exists(app):
    missing = [c for c in REFERENCE_COMMANDS if not callable(getattr(app, c, None))]
    assert missing == [], f"missing commands: {missing}"


class TestAudioCommands:
    def test_devices(self, app):
        ins = app.get_input_devices()
        assert len(ins) >= 1
        assert app.get_default_devices()["default_input"] == ins[0]
        assert app.get_output_devices() == ["Default"]
        assert app.get_platform() in ("macos", "windows", "linux")
        assert app.get_blackhole_status() == {"installed": False, "paths": []}

    def test_monitoring_lifecycle_and_level_events(self, app):
        app.monitoring.realtime = False
        app.start_monitoring(model_name="dummy", volume=0.5)
        assert app.monitoring.active
        app.start_monitoring(model_name="dummy", volume=0.7)  # idempotent restart
        time.sleep(0.1)
        app.set_monitoring_model("noisy")
        app.set_monitoring_volume(0.9)
        app.stop_monitoring()
        assert not app.monitoring.active
        levels = [p for e, p in app.bus.history if e == "microphone-level"]
        # bare RMS floats, the reference's payload shape (audio.rs:784)
        assert levels and all(isinstance(p, float) and 0 <= p <= 1.0
                              for p in levels)

    def test_monitoring_feeds_recording_mic(self, app):
        # push_mono_to_buffers parity (audio.rs:682-730): while monitoring
        # runs, the denoised mic lands in the recording ring, so the
        # product flow "monitor, then record" captures real mic audio.
        app.monitoring.realtime = False
        app.start_monitoring(model_name="dummy", volume=1.0)
        path = app.start_recording("")
        time.sleep(0.4)
        out = app.stop_recording()
        app.stop_monitoring()
        assert out == path
        from crispy_tpu.io import wav as wavio

        audio, sr = wavio.read_wav(path)
        assert sr == 48000 and audio.shape[0] > 0 and audio.shape[1] == 2
        rms = float(np.sqrt(np.mean(audio[:, 0] ** 2)))
        assert rms > 0.05  # the synthetic 440 Hz mic, not silence
        assert wavio.get_wav_duration(path) > 0

    def test_system_input_volume(self, app):
        app.set_system_input_volume(0.4)
        assert app.get_system_input_volume() == pytest.approx(0.4)
        app.set_system_input_volume(3.0)
        assert app.get_system_input_volume() == 1.0


class TestModelCommands:
    def test_catalog_and_selection(self, app):
        assert len(app.get_available_models()) == 14
        assert [m["id"] for m in app.get_available_ns_models()] == ["dummy", "noisy", "rnnoise"]
        assert app.get_recommended_first_model() == "parakeet-tdt-0.6b-v3"
        assert app.get_current_model() is None
        app.set_active_model("small")
        assert app.get_current_model() == "small"
        # persisted: a new app instance restores it
        app2 = CrispyApp(bus=EventBus())
        assert app2.get_current_model() == "small"

    def test_delete_clears_selection(self, app):
        app.set_active_model("small")
        app.model_manager.models_dir.mkdir(parents=True, exist_ok=True)
        (app.model_manager.models_dir / "ggml-small.bin").write_bytes(b"x")
        assert app.delete_model("small")
        assert app.get_current_model() is None

    def test_download_error_event(self, app):
        t = app.download_model("diarize-segmentation")  # s3 URL: unreachable here
        t.join(timeout=30)
        states = [p for e, p in app.bus.history if e == "model-state-changed"]
        assert any(p.get("event_type") == "error" for p in states)


class TestTranscriptionCommands:
    def test_requires_selected_model(self, app):
        with pytest.raises(ValueError, match="No transcription model"):
            app.start_transcription("/tmp/x.wav")

    def test_end_to_end_with_fake_engine(self, app, tmp_path):
        app.set_active_model("small")
        eng = type("E", (tr.EngineProtocol,), {
            "transcribe_batch": lambda self, c, language="en": ["hello"] * len(c)})()
        app.transcription_manager._loader = lambda mid, mm: eng
        wav = wavio.write_wav(tmp_path / "r.wav",
                              0.2 * np.ones((48000, 1), np.float32), 48000)
        th = app.start_transcription(str(wav))
        th.join(timeout=60)
        assert app.has_transcription_result(str(wav))
        assert app.get_transcription_result(str(wav)) == "hello"
        assert app.get_transcription_model(str(wav)) == "small"
        assert app.get_transcription_state(str(wav))["status"] == "completed"
        assert str(wav) in app.get_all_transcription_states()
        app.open_transcription_window(str(wav))
        assert ("transcription-open", {"recording_path": str(wav)}) in app.bus.history

    def test_chat_history_roundtrip_filters_roles(self, app):
        app.set_transcription_chat_history("/r/x.wav", [
            {"role": "user", "content": "q"},
            {"role": "system", "content": "drop me"},
            {"role": "assistant", "content": "a"},
        ])
        hist = app.get_transcription_chat_history("/r/x.wav")
        assert [m["role"] for m in hist] == ["user", "assistant"]


class TestSettingsCommands:
    def test_llm_settings_api_key_omitted(self, app):
        app.set_llm_settings("http://localhost:9/v1", "secret", "gpt-x")
        pub = app.get_llm_settings()
        assert pub["endpoint"] == "http://localhost:9/v1" and pub["model"] == "gpt-x"
        assert "api_key" not in pub

    def test_app_settings_roundtrip(self, app):
        app.set_app_setting("diarization_enabled", "true")
        assert app.get_app_settings()["diarization_enabled"] == "true"
        with pytest.raises(Exception):
            app.set_app_setting("not_a_key", "x")


class TestChatStreaming:
    def test_sse_deltas_and_done(self, app, tmp_path):
        """Full SSE round trip against a loopback OpenAI-compatible server."""

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers["Content-Length"])
                body = json.loads(self.rfile.read(n))
                assert body["stream"] is True
                assert body["messages"][0]["role"] == "system"
                assert "the transcript text" in body["messages"][0]["content"]
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.end_headers()
                for delta in ("Hel", "lo"):
                    chunk = json.dumps({"choices": [{"delta": {"content": delta}}]})
                    self.wfile.write(f"data: {chunk}\n\n".encode())
                self.wfile.write(b"data: [DONE]\n\n")

        srv = HTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            app.set_llm_settings(f"http://127.0.0.1:{srv.server_port}/v1", "key", "gpt")
            tr.save_transcription_result("/r/chat.wav", "the transcript text")
            th = app.stream_transcription_chat("/r/chat.wav",
                                               [{"role": "user", "content": "hi"}], "c1")
            th.join(timeout=30)
            deltas = [p["delta"] for e, p in app.bus.history
                      if e == "transcription-chat-stream"]
            assert "".join(deltas) == "Hello"
            assert any(e == "transcription-chat-done" for e, _ in app.bus.history)
        finally:
            srv.shutdown()

    def test_missing_api_key_errors(self, app):
        th = app.stream_transcription_chat("/r/none.wav", [], "c2")
        th.join(timeout=10)
        errs = [p for e, p in app.bus.history if e == "transcription-chat-error"]
        assert errs and "API key" in errs[0]["delta"]


class TestConvert:
    def test_convert_with_fake_ffmpeg(self, app, tmp_path, monkeypatch):
        """A stand-in ffmpeg script writes a valid WAV (convert.rs contract)."""
        from crispy_tpu.engine import convert as cv

        helper = tmp_path / "fake_ffmpeg.py"
        helper.write_text(
            "import sys\n"
            "import numpy as np\n"
            "from crispy_tpu.io import wav\n"
            "wav.write_wav(sys.argv[-1], np.zeros((48, 2), np.float32), 48000)\n"
        )
        repo_root = Path(__file__).resolve().parent.parent
        fake = tmp_path / "ffmpeg"
        fake.write_text(
            f'#!/bin/sh\nexec env PYTHONPATH="{repo_root}" python3 "{helper}" "$@"\n'
        )
        fake.chmod(0o755)
        src = tmp_path / "video.mp4"
        src.write_bytes(b"fake media")
        out = cv.convert_to_wav(src, ffmpeg=str(fake))
        assert out.exists() and out.suffix == ".wav"
        fmt = wavio.read_format(out)
        assert fmt.sample_rate == 48000
        # name collision avoidance
        out2 = cv.convert_to_wav(src, ffmpeg=str(fake))
        assert out2 != out

    def test_permissions_always_granted(self, app):
        # reference shape (permissions.rs:7-10,33): microphone status
        # string, screen_recording bool; request returns bool
        perms = app.check_permissions()
        assert perms["microphone"] == "granted"
        assert perms["screen_recording"] is True
        assert app.request_permission("microphone") is True


def test_set_autostart_persists_setting(app):
    """Reference parity: set_autostart writes autostart_enabled to app
    settings before applying it (commands/settings.rs:16-29)."""
    app.set_autostart(True)
    assert app.get_app_settings()["autostart_enabled"] == "true"
    app.set_autostart(False)
    assert app.get_app_settings()["autostart_enabled"] == "false"
