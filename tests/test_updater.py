"""Updater analog (X9: tauri-plugin-updater, main.rs:221): package-index
version check with honest offline behavior, surfaced as a command, a web
About card, and `crispy update`."""

import http.server
import json
import threading

import pytest

from crispy_tpu.utils import updater


def test_version_key_ordering():
    k = updater._version_key
    assert k("0.2.0") > k("0.1.0")
    assert k("0.10.0") > k("0.9.9")
    assert k("1.0.0") > k("0.99.1")
    assert k("0.1.0") == k("0.1.0")
    # unparseable tags order after numerics of the same position, stably
    assert k("0.1.0rc1") != k("0.1.0")


def test_offline_reports_offline():
    out = updater.check_for_updates(
        timeout=0.5, index_url="http://127.0.0.1:1/nope")
    assert out["status"] == "offline"
    assert out["current_version"] == updater.current_version()
    assert "pip install --upgrade crispy-tpu" == out["update_command"]


@pytest.fixture
def index_server():
    """Local stand-in for the package index JSON endpoint."""
    state = {"version": "0.1.0"}

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = json.dumps({"info": {"version": state["version"]}}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield state, f"http://127.0.0.1:{srv.server_address[1]}/json"
    srv.shutdown()


def test_up_to_date_and_update_available(index_server):
    state, url = index_server
    state["version"] = updater.current_version()
    out = updater.check_for_updates(index_url=url)
    assert out["status"] == "up-to-date"
    assert out["latest_version"] == updater.current_version()

    state["version"] = "99.0.0"
    out = updater.check_for_updates(index_url=url)
    assert out["status"] == "update-available"
    assert out["latest_version"] == "99.0.0"


def test_command_and_cli_surface(data_root, capsys):
    from crispy_tpu.api.commands import CrispyApp
    from crispy_tpu.api.events import EventBus
    from crispy_tpu.cli import main

    app = CrispyApp(bus=EventBus())
    assert app.get_app_version() == updater.current_version()
    out = app.check_for_updates()  # no egress here: must degrade, not raise
    assert out["status"] in ("offline", "up-to-date", "update-available")

    assert main(["update"]) == 0
    parsed = json.loads(capsys.readouterr().out.strip())
    assert parsed["current_version"] == updater.current_version()


def test_about_card_in_webui():
    from crispy_tpu.api.web_server import WEBUI_DIR

    page = (WEBUI_DIR / "index.html").read_text(encoding="utf-8")
    assert 'api("get_app_version")' in page
    assert 'api("check_for_updates")' in page
