"""ModelStateTracker: the F5 state machine (useTranscriptionModels.ts)
as a bus consumer — six event streams, EMA speed smoothing, transient
clearing on every exit path (no model ever wedges in 'extracting')."""

import numpy as np

from crispy_tpu.api.events import EventBus
from crispy_tpu.api.model_state import ModelStateTracker


class Clock:
    def __init__(self):
        self.t = 100.0

    def __call__(self):
        return self.t


def test_download_speed_ema_smoothing():
    bus = EventBus()
    clock = Clock()
    tr = ModelStateTracker(bus=bus, clock=clock)
    # first sample establishes the baseline, no speed yet
    bus.emit("model-download-progress",
             {"model_id": "m", "downloaded": 0, "total": 100 << 20, "percentage": 0.0})
    assert tr.snapshot()["models"]["m"]["speed_mbps"] == 0.0
    # samples closer than 0.5 s are gated (frontend :159-161)
    clock.t += 0.3
    bus.emit("model-download-progress",
             {"model_id": "m", "downloaded": 10 << 20, "total": 100 << 20, "percentage": 10.0})
    assert tr.snapshot()["models"]["m"]["speed_mbps"] == 0.0
    # 1 s later: 10 MB in 1.3 s ≈ 7.69 MB/s (first valid → unsmoothed)
    clock.t += 1.0
    bus.emit("model-download-progress",
             {"model_id": "m", "downloaded": 10 << 20, "total": 100 << 20, "percentage": 10.0})
    s1 = tr.snapshot()["models"]["m"]["speed_mbps"]
    assert abs(s1 - 10 / 1.3) < 0.01
    # next second: 20 MB/s instantaneous → EMA 0.8*s1 + 0.2*20
    clock.t += 1.0
    bus.emit("model-download-progress",
             {"model_id": "m", "downloaded": 30 << 20, "total": 100 << 20, "percentage": 30.0})
    s2 = tr.snapshot()["models"]["m"]["speed_mbps"]
    assert abs(s2 - (0.8 * s1 + 0.2 * 20.0)) < 0.01
    assert tr.snapshot()["status"] == "downloading"
    assert tr.snapshot()["total_speed_mbps"] == s2


def test_extraction_lifecycle_clears_download_state():
    bus = EventBus()
    tr = ModelStateTracker(bus=bus, clock=Clock())
    bus.emit("model-download-progress",
             {"model_id": "m", "downloaded": 5, "total": 10, "percentage": 50.0})
    bus.emit("model-extraction-started", {"model_id": "m"})
    snap = tr.snapshot()
    assert snap["status"] == "extracting"
    assert snap["models"]["m"] == {"extracting": True}  # download state cleared
    bus.emit("model-extraction-completed", {"model_id": "m"})
    assert tr.snapshot()["status"] == "unloaded"  # no current model selected
    assert tr.snapshot()["models"] == {}


def test_extraction_failure_sets_error():
    bus = EventBus()
    tr = ModelStateTracker(bus=bus, clock=Clock())
    bus.emit("model-extraction-started", {"model_id": "m"})
    bus.emit("model-extraction-failed", {"model_id": "m", "error": "corrupt tar"})
    snap = tr.snapshot()
    assert snap["status"] == "error"
    assert "corrupt tar" in snap["error"]
    assert snap["models"] == {}


def test_error_event_clears_all_transient_state():
    """The frontend's hard-won rule: an error clears ALL transient state,
    otherwise a model wedges in 'extracting' with no way out."""
    bus = EventBus()
    tr = ModelStateTracker(bus=bus, clock=Clock())
    bus.emit("model-download-progress",
             {"model_id": "m", "downloaded": 1, "total": 10, "percentage": 10.0})
    bus.emit("model-state-changed", {"event_type": "error", "model_id": "m",
                                     "error": "network gone"})
    snap = tr.snapshot()
    assert snap["status"] == "error" and snap["models"] == {}


def test_selection_and_delete_flow():
    bus = EventBus()
    tr = ModelStateTracker(bus=bus, clock=Clock())
    bus.emit("model-state-changed", {"event_type": "loading_completed", "model_id": "small", "model_name": None, "error": None})
    assert tr.snapshot()["current_model_id"] == "small"
    assert tr.snapshot()["status"] == "ready"
    bus.emit("model-state-changed", {"event_type": "deleted", "model_id": "small", "model_name": None, "error": None})
    assert tr.snapshot()["current_model_id"] == "none"


def test_real_downloader_drives_tracker(data_root):
    """Against the real ModelManager event stream (loopback HTTP)."""
    import http.server
    import threading

    from crispy_tpu.models.registry import CATALOG, ModelManager

    payload = np.random.default_rng(0).bytes(1 << 16)

    class H(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        bus = EventBus()
        tr = ModelStateTracker(bus=bus)
        mm = ModelManager(bus=bus)
        info = mm.find("small")
        old_url, old_size = info.url, info.size_mb
        info.url = f"http://127.0.0.1:{srv.server_address[1]}/f.bin"
        info.size_mb = 0
        try:
            mm.download_model("small")
        finally:
            info.url, info.size_mb = old_url, old_size
        snap = tr.snapshot()
        assert mm.is_downloaded("small")
        assert snap["status"] in ("unloaded", "ready")  # transient state drained
        assert snap["models"] == {}
    finally:
        srv.shutdown()


def test_complete_clears_only_that_model():
    """One model finishing must not wipe a concurrent download's progress
    or speed EMA, and status stays 'downloading' while others run."""
    from crispy_tpu.api.events import EventBus
    from crispy_tpu.api.model_state import ModelStateTracker

    bus = EventBus()
    t = ModelStateTracker(bus=bus)
    for mid in ("a", "b"):
        bus.emit("model-download-progress",
                 {"model_id": mid, "downloaded": 1 << 20, "total": 4 << 20,
                  "percentage": 25.0})
    bus.emit("model-download-complete", {"model_id": "a"})
    snap = t.snapshot()
    assert "b" in snap["models"] and snap["models"]["b"]["percentage"] == 25.0
    assert "a" not in snap["models"]
    assert snap["status"] == "downloading"
    bus.emit("model-download-complete", {"model_id": "b"})
    assert t.snapshot()["status"] in ("ready", "unloaded")
    t.close()
