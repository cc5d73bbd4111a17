"""Model registry: catalog parity, download/resume/cancel/extract via a
loopback HTTP server (reference: managers/model.rs)."""

import io
import tarfile
import threading
from functools import partial
from http.server import HTTPServer, SimpleHTTPRequestHandler

import pytest

from crispy_tpu.api.events import EventBus
from crispy_tpu.models import registry as reg


@pytest.fixture
def served_dir(tmp_path):
    """Local HTTP server with Range support over a temp dir."""
    docroot = tmp_path / "srv"
    docroot.mkdir()

    class Handler(SimpleHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def send_head(self):  # add Range support (SimpleHTTP lacks it)
            path = self.translate_path(self.path)
            try:
                f = open(path, "rb")
            except OSError:
                self.send_error(404)
                return None
            size = f.seek(0, 2)
            f.seek(0)
            rng = self.headers.get("Range")
            if rng and rng.startswith("bytes=") and not path.endswith("norange"):
                start = int(rng[6:].split("-")[0])
                f.seek(start)
                self.send_response(206)
                self.send_header("Content-Length", str(size - start))
                self.send_header("Content-Range", f"bytes {start}-{size-1}/{size}")
            else:
                self.send_response(200)
                self.send_header("Content-Length", str(size))
            self.end_headers()
            return f

    srv = HTTPServer(("127.0.0.1", 0), partial(Handler, directory=str(docroot)))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield docroot, f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


@pytest.fixture
def manager(tmp_path):
    bus = EventBus()
    bus.keep_history = True
    return reg.ModelManager(models_dir=tmp_path / "Models", bus=bus)


def _patch_url(monkeypatch, model_id, url):
    m = reg.ModelManager.find(model_id)
    monkeypatch.setattr(m, "url", url)
    return m


class TestCatalog:
    def test_thirteen_models_with_reference_ids(self, manager):
        models = manager.get_available_models()
        ids = {m["id"] for m in models}
        assert len(models) == 14  # 11 ASR + 1 bundled-small... (13 + small)
        for want in ("small", "medium", "turbo", "large", "parakeet-tdt-0.6b-v2",
                     "parakeet-tdt-0.6b-v3", "moonshine-base", "gigaam-v3-e2e-ctc",
                     "sense-voice-int8", "canary-180m-flash", "canary-1b-v2",
                     "cohere-int8", "diarize-segmentation", "diarize-embedding"):
            assert want in ids

    def test_metadata_scores(self, manager):
        info = manager.get_model_info("parakeet-tdt-0.6b-v2")
        assert info["accuracy_score"] == 0.85 and info["speed_score"] == 0.85
        assert not info["is_downloaded"]

    def test_ns_catalog(self):
        assert [m["id"] for m in reg.NS_MODEL_CATALOG] == ["dummy", "noisy", "rnnoise"]
        assert reg.RECOMMENDED_FIRST_MODEL == "parakeet-tdt-0.6b-v3"


class TestDownload:
    def test_plain_download_with_progress(self, served_dir, manager, monkeypatch):
        docroot, base = served_dir
        payload = bytes(range(256)) * 1000
        (docroot / "ggml-small.bin").write_bytes(payload)
        _patch_url(monkeypatch, "small", f"{base}/ggml-small.bin")
        out = manager.download_model("small", chunk_size=65536, progress_every=0.0)
        assert out.read_bytes() == payload
        assert manager.is_downloaded("small")
        events = [e for e, _ in manager.bus.history]
        assert "model-download-progress" in events
        assert ("model-state-changed",
                {"event_type": "downloaded", "model_id": "small", "model_name": None, "error": None}) in manager.bus.history

    def test_resume_from_partial(self, served_dir, manager, monkeypatch):
        docroot, base = served_dir
        payload = b"A" * 50000 + b"B" * 50000
        (docroot / "ggml-small.bin").write_bytes(payload)
        _patch_url(monkeypatch, "small", f"{base}/ggml-small.bin")
        manager.models_dir.mkdir(parents=True, exist_ok=True)
        (manager.models_dir / "ggml-small.bin.partial").write_bytes(payload[:50000])
        out = manager.download_model("small")
        assert out.read_bytes() == payload

    def test_resume_restart_on_200(self, served_dir, manager, monkeypatch):
        """Server ignoring Range (200) must restart from zero, not corrupt."""
        docroot, base = served_dir
        payload = b"C" * 30000
        (docroot / "norange").write_bytes(payload)
        m = _patch_url(monkeypatch, "small", f"{base}/norange")
        monkeypatch.setattr(m, "filename", "norange-model.bin")
        manager.models_dir.mkdir(parents=True, exist_ok=True)
        (manager.models_dir / "norange.partial").write_bytes(b"GARBAGE")
        out = manager.download_model("small")
        assert out.read_bytes() == payload

    def test_cancel_mid_download(self, served_dir, manager, monkeypatch):
        docroot, base = served_dir
        (docroot / "ggml-small.bin").write_bytes(b"D" * 500000)
        _patch_url(monkeypatch, "small", f"{base}/ggml-small.bin")
        # cancel ISSUED DURING the download (via the first progress event)
        unlisten = manager.bus.listen(
            "model-download-progress",
            lambda p: manager.cancel_download(p["model_id"]))
        try:
            with pytest.raises(reg.DownloadCancelled):
                manager.download_model("small", chunk_size=1024,
                                       progress_every=0.0)
        finally:
            unlisten()
        assert not manager.is_downloaded("small")
        assert ("model-state-changed",
                {"event_type": "cancelled", "model_id": "small", "model_name": None, "error": None}) in manager.bus.history

    def test_stale_cancel_does_not_kill_next_download(self, served_dir, manager,
                                                      monkeypatch):
        """A cancel with nothing in flight is a no-op (the reference's
        cancel map only holds active downloads, model.rs:468-482) — it must
        not abort the NEXT download at its first chunk."""
        docroot, base = served_dir
        payload = b"W" * 4096
        (docroot / "ggml-small.bin").write_bytes(payload)
        _patch_url(monkeypatch, "small", f"{base}/ggml-small.bin")
        manager.cancel_download("small")  # stale: nothing in flight
        out = manager.download_model("small")
        assert out.read_bytes() == payload

    def test_archive_extraction(self, served_dir, manager, monkeypatch):
        docroot, base = served_dir
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as tar:
            data = b"model-weights"
            info = tarfile.TarInfo("moonshine-base/encoder.onnx")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
        (docroot / "moonshine-base.tar.gz").write_bytes(buf.getvalue())
        _patch_url(monkeypatch, "moonshine-base", f"{base}/moonshine-base.tar.gz")
        out = manager.download_model("moonshine-base")
        assert (out / "encoder.onnx").read_bytes() == b"model-weights"
        assert manager.is_downloaded("moonshine-base")
        events = dict((e, p) for e, p in manager.bus.history)
        # reference payload shapes: bare ids for started/completed/complete
        # (model.rs:620,674,688), {model_id, error} only for -failed
        assert events["model-extraction-started"] == "moonshine-base"
        assert events["model-extraction-completed"] == "moonshine-base"
        assert events["model-download-complete"] == "moonshine-base"
        prog = [p for e, p in manager.bus.history
                if e == "model-download-progress"]
        assert prog and set(prog[-1]) == {"model_id", "downloaded", "total",
                                          "percentage"}
        assert not list(manager.models_dir.glob("*.partial"))
        assert not list(manager.models_dir.glob("*.extracting"))

    def test_corrupt_archive_fails_with_event(self, served_dir, manager, monkeypatch):
        docroot, base = served_dir
        (docroot / "moonshine-base.tar.gz").write_bytes(b"not a tar.gz")
        _patch_url(monkeypatch, "moonshine-base", f"{base}/moonshine-base.tar.gz")
        with pytest.raises(Exception):
            manager.download_model("moonshine-base")
        events = [e for e, _ in manager.bus.history]
        assert "model-extraction-failed" in events
        assert not list(manager.models_dir.glob("*.extracting"))

    def test_delete_model(self, manager):
        manager.models_dir.mkdir(parents=True, exist_ok=True)
        (manager.models_dir / "ggml-small.bin").write_bytes(b"x")
        assert manager.is_downloaded("small")
        assert manager.delete_model("small")
        assert not manager.is_downloaded("small")

    def test_stale_extracting_cleanup(self, tmp_path):
        d = tmp_path / "Models"
        (d / "foo.extracting").mkdir(parents=True)
        reg.ModelManager(models_dir=d, bus=EventBus())
        assert not (d / "foo.extracting").exists()


class TestSelection:
    def test_selected_model_state(self):
        bus = EventBus()
        bus.keep_history = True
        st = reg.SelectedModelState(bus=bus)
        assert st.get() is None
        st.set("small", model_name="Whisper Small")
        assert st.get() == "small"
        # reference flow (commands/models.rs:96-117): loading_started then
        # loading_completed, ModelStateEvent field shape
        assert ("model-state-changed",
                {"event_type": "loading_started", "model_id": "small",
                 "model_name": "Whisper Small", "error": None}) in bus.history
        assert ("model-state-changed",
                {"event_type": "loading_completed", "model_id": "small",
                 "model_name": "Whisper Small", "error": None}) in bus.history
        st.set("none")
        assert st.get() is None
        assert ("model-state-changed",
                {"event_type": "unloaded", "model_id": None,
                 "model_name": None, "error": None}) in bus.history
