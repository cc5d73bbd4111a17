"""F4/F6/F7 consumer state machines (SURVEY §2.7 frontend rows)."""

import random

import numpy as np
import pytest

from crispy_tpu.api.events import EventBus
from crispy_tpu.api.ui_state import (
    TranscriptionProgressTracker, level_meter, parse_transcript_segments,
    speaker_color_index,
)


class TestLevelMeter:
    def test_noise_floor_ignored(self):
        assert level_meter(0.0) == 0.0
        assert level_meter(0.009) == 0.0

    def test_curve_monotone_and_clamped(self):
        levels = [level_meter(x) for x in (0.02, 0.05, 0.1, 0.3, 0.5, 1.0)]
        assert levels == sorted(levels)
        assert levels[-1] == 1.0
        # exact curve point: ((0.1-0.01)/0.99*5.2)^0.3
        want = min((0.09 / 0.99) * 5.2, 1.0) ** 0.3
        assert level_meter(0.1) == pytest.approx(want)

    def test_noisy_model_adds_jitter(self):
        rng = random.Random(0)
        v = level_meter(0.0, model_name="noisy", rng=rng)
        assert 0.05 <= v <= 0.11  # 0.08 base ± 0.03


class TestProgressTracker:
    def test_full_lifecycle(self):
        bus = EventBus()
        tr = TranscriptionProgressTracker(bus=bus)
        bus.emit("transcription-status",
                 {"recording_path": "/r/a.wav", "status": "started", "error": None})
        assert tr.get("/r/a.wav")["phase"] == "preparing-audio"
        bus.emit("transcription-phase",
                 {"recording_path": "/r/a.wav", "phase": "transcribing"})
        bus.emit("transcription-progress",
                 {"recording_path": "/r/a.wav", "progress": 0.5, "eta_seconds": 12})
        st = tr.get("/r/a.wav")
        assert st["progress"] == 0.5 and st["eta_seconds"] == 12
        assert st["phase"] == "transcribing"
        bus.emit("transcription-status",
                 {"recording_path": "/r/a.wav", "status": "completed", "error": None})
        st = tr.get("/r/a.wav")
        assert st["status"] == "completed" and st["progress"] == 1.0
        assert st["has_result"] is True

    def test_restore_only_inflight(self):
        bus = EventBus()
        tr = TranscriptionProgressTracker(bus=bus)
        tr.restore({
            "/r/live.wav": {"status": "transcribing", "progress": 0.3,
                            "eta_seconds": 5, "phase": "transcribing"},
            "/r/done.wav": {"status": "completed", "progress": 1.0},
        })
        assert tr.get("/r/live.wav")["progress"] == 0.3
        assert tr.get("/r/done.wav") is None

    def test_error_and_cancel(self):
        bus = EventBus()
        tr = TranscriptionProgressTracker(bus=bus)
        bus.emit("transcription-status",
                 {"recording_path": "/r/x.wav", "status": "error", "error": "boom"})
        assert tr.get("/r/x.wav")["error"] == "boom"
        bus.emit("transcription-status",
                 {"recording_path": "/r/x.wav", "status": "cancelled", "error": None})
        st = tr.get("/r/x.wav")
        assert st["status"] == "cancelled" and st["error"] is None

    def test_end_to_end_with_real_pipeline(self, data_root, tmp_path):
        from crispy_tpu.api.commands import CrispyApp
        from crispy_tpu.engine import transcription as trm
        from crispy_tpu.io import wav as wavio

        app = CrispyApp(bus=EventBus())
        tracker = TranscriptionProgressTracker(bus=app.bus, app=app)
        app.set_active_model("small")
        eng = type("E", (trm.EngineProtocol,), {
            "transcribe_batch": lambda self, c, language="en": ["ok"] * len(c)})()
        app.transcription_manager._loader = lambda mid, mm: eng
        wav = wavio.write_wav(tmp_path / "r.wav",
                              0.2 * np.ones((32000, 1), np.float32), 16000)
        th = app.start_transcription(str(wav))
        th.join(timeout=60)
        st = tracker.get(str(wav))
        assert st["status"] == "completed" and st["progress"] == 1.0


class TestTranscriptParser:
    def test_diarized_blocks(self):
        content = ("[Speaker 1|0.0]\nhello there\n[Speaker 2|4.5]\nhi\nagain\n"
                   "[Speaker 1|9.2]\nback")
        segs = parse_transcript_segments(content)
        assert segs == [
            {"speaker": "Speaker 1", "timestamp": 0.0, "text": "hello there"},
            {"speaker": "Speaker 2", "timestamp": 4.5, "text": "hi again"},
            {"speaker": "Speaker 1", "timestamp": 9.2, "text": "back"},
        ]

    def test_header_without_timestamp_and_plain_text(self):
        segs = parse_transcript_segments("intro text\n[Speaker 3]\nwords")
        assert segs[0] == {"speaker": "", "timestamp": None, "text": "intro text"}
        assert segs[1]["speaker"] == "Speaker 3" and segs[1]["timestamp"] is None

    def test_plain_transcript_has_no_speakers(self):
        segs = parse_transcript_segments("just a plain transcript line")
        assert segs == [{"speaker": "", "timestamp": None,
                         "text": "just a plain transcript line"}]

    def test_round_trip_with_formatter(self):
        """format_diarized_text output parses back losslessly."""
        from crispy_tpu.engine.diarization import SpeakerSegment, format_diarized_text

        text = format_diarized_text(
            [(0.0, 2.0, "one"), (2.0, 4.0, "two"), (5.0, 7.0, "three")],
            [SpeakerSegment(0.0, 4.0, "Speaker 1"), SpeakerSegment(4.0, 8.0, "Speaker 2")],
        )
        segs = parse_transcript_segments(text)
        assert [s["speaker"] for s in segs] == ["Speaker 1", "Speaker 2"]
        assert segs[0]["text"] == "one two" and segs[1]["text"] == "three"

    def test_speaker_colors_stable(self):
        assert speaker_color_index("Speaker 1") == 0
        assert speaker_color_index("Speaker 9") == 0  # palette of 8 cycles
        assert speaker_color_index("Speaker 2") == 1
