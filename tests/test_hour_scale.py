"""Hour-scale end-to-end stress test (VERDICT r3 next #7).

The product's headline use case: a 60-minute two-speaker meeting WAV
through the REAL pipeline — resample, 30 s chunk batching through an
actual ONNX-executor engine (synthetic canary bundle), word timestamps,
a mid-run cancel that must leave a resumable chunk checkpoint, resume to
completion, diarization over the full hour (device NME-SC), and
persistence — with bounded wall time and memory. This is the at-scale
proof of the batched replacement for the reference's serial loop
(commands/transcription.rs:249-302).

Marked `slow` and deselected by default; run with `pytest -m slow`.
"""

import resource
import threading
import time

import numpy as np
import pytest

from crispy_tpu.api.events import EventBus
from crispy_tpu.engine import transcription as tr
from crispy_tpu.io import wav as wavio
from crispy_tpu.models.registry import ModelManager

pytestmark = pytest.mark.slow

MINUTES = 60
SR = 16000


def synth_hour_wav(path):
    """Two alternating 'speakers' (AM tones at distinct envelopes) with
    0.8 s pauses, one hour total, 16 kHz mono — the shared fixture
    generator with this test's own speaker/noise parameters."""
    from crispy_tpu.utils.synth import synth_speaker_hour

    audio = synth_speaker_hour(
        MINUTES, SR, durs=(3.0, 5.0, 4.0, 8.0), freqs=(160.0, 1100.0),
        level=0.35, noise=0.01)
    wavio.write_wav(path, audio[:, None], SR)
    return path


def test_hour_scale_transcribe_diarize_cancel_resume(tmp_path, data_root):
    from test_onnx_engines import make_canary_bundle
    from crispy_tpu.engine.onnx_engines import OnnxEncDecEngine

    t_start = time.monotonic()
    wav = synth_hour_wav(tmp_path / "meeting.wav")

    bus = EventBus()
    bus.keep_history = True
    mm = ModelManager(models_dir=tmp_path / "Models", bus=bus)
    bundle_dir = tmp_path / "bundle"
    bundle_dir.mkdir()
    bundle = make_canary_bundle(bundle_dir)
    tm = tr.TranscriptionManager(
        mm, bus=bus,
        engine_loader=lambda mid, m: OnnxEncDecEngine(bundle, "c", max_new=8))
    diar = {"enabled": True, "max_speakers": 4, "merge_gap": 1.0}

    # -- run, cancel mid-flight ---------------------------------------------
    th = threading.Thread(
        target=tr._guarded, args=(tr.run_transcription, str(wav), tm, "canary"),
        kwargs={"diarization": diar}, daemon=True)
    th.start()
    deadline = time.monotonic() + 900
    while time.monotonic() < deadline:
        st = tm.get_state(str(wav))
        if st and st.status == "transcribing" and st.progress > 0.1:
            break
        time.sleep(0.5)
    else:
        pytest.fail("never reached 10% progress within 15 min")
    tm.cancel(str(wav))
    th.join(timeout=300)
    assert not th.is_alive()
    assert tm.get_state(str(wav)).status == "cancelled"

    ckpt = tr._load_progress(str(wav))
    assert ckpt is not None and ckpt["done_chunks"] > 0, "no resumable checkpoint"
    done_before = ckpt["done_chunks"]
    assert ckpt["n_chunks"] == MINUTES * 2  # 30 s chunks

    # -- resume to completion ------------------------------------------------
    events_before = len(bus.history)
    text = tr.run_transcription(str(wav), tm, "canary", diarization=diar)
    assert tm.get_state(str(wav)).status == "completed"
    assert text is not None and text.strip()
    # resumed: the second run's first progress event starts past the
    # checkpoint, proving the finished chunks were not redecoded
    progress_events = [p for e, p in bus.history[events_before:]
                       if e == "transcription-progress"]
    assert progress_events
    assert progress_events[0]["progress"] >= done_before / (MINUTES * 2) - 1e-6
    # checkpoint consumed on completion
    assert tr._load_progress(str(wav)) is None

    # persistence + diarized formatting over the full hour
    assert tr.load_transcription_result(str(wav)) == text
    assert "[Speaker 1|" in text

    # -- bounds --------------------------------------------------------------
    wall = time.monotonic() - t_start
    assert wall < 1800, f"hour-scale run took {wall:.0f}s"
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    assert rss_gb < 12.0, f"peak RSS {rss_gb:.1f} GB"
