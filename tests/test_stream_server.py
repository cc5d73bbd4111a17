"""stream:// analog: Range grammar (the reference's 10 parser tests,
main.rs:430-486) + the serving endpoint."""

import urllib.error
import urllib.request

import numpy as np
import pytest

from crispy_tpu.api.stream_server import StreamServer, parse_range
from crispy_tpu.io import wav as wavio


class TestParseRange:
    def test_standard(self):
        assert parse_range("bytes=0-1023", 10000) == (0, 1023)

    def test_from_start_to_end(self):
        assert parse_range("bytes=0-9999", 10000) == (0, 9999)

    def test_open_ended(self):
        assert parse_range("bytes=500-", 10000) == (500, 9999)

    def test_suffix(self):
        assert parse_range("bytes=-500", 10000) == (9500, 9999)

    def test_suffix_larger_than_file(self):
        assert parse_range("bytes=-99999", 100) == (0, 99)

    def test_clamps_end_to_file_size(self):
        assert parse_range("bytes=0-99999", 100) == (0, 99)

    def test_empty_file(self):
        assert parse_range("bytes=0-10", 0) is None

    def test_start_beyond_file(self):
        assert parse_range("bytes=10000-20000", 100) is None

    def test_invalid_prefix(self):
        assert parse_range("chars=0-100", 10000) is None

    def test_whitespace_trimmed(self):
        assert parse_range("  bytes=0-1023  ", 10000) == (0, 1023)

    def test_garbage(self):
        assert parse_range("bytes=a-b", 100) is None
        assert parse_range("bytes=", 100) is None


@pytest.fixture
def server(data_root, tmp_path):
    from crispy_tpu.utils import paths

    d = paths.ensure_dir(paths.recordings_dir())
    wavio.write_wav(d / "clip.wav", 0.1 * np.ones((480, 2), np.float32), 48000)
    srv = StreamServer().start()
    yield srv, d
    srv.stop()


class TestServing:
    def test_full_get(self, server):
        srv, d = server
        url = srv.url_for(d / "clip.wav")
        with urllib.request.urlopen(url) as r:
            body = r.read()
            assert r.headers["Content-Type"] == "audio/wav"
            assert r.headers["Accept-Ranges"] == "bytes"
        assert body[:4] == b"RIFF"
        assert len(body) == (d / "clip.wav").stat().st_size

    def test_range_request_206(self, server):
        srv, d = server
        req = urllib.request.Request(srv.url_for(d / "clip.wav"),
                                     headers={"Range": "bytes=4-7"})
        with urllib.request.urlopen(req) as r:
            assert r.status == 206
            assert r.read() == (d / "clip.wav").read_bytes()[4:8]
            assert r.headers["Content-Range"].startswith("bytes 4-7/")

    def test_suffix_range(self, server):
        srv, d = server
        size = (d / "clip.wav").stat().st_size
        req = urllib.request.Request(srv.url_for(d / "clip.wav"),
                                     headers={"Range": "bytes=-10"})
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Range"] == f"bytes {size-10}-{size-1}/{size}"

    def test_unsatisfiable_range_416(self, server):
        srv, d = server
        req = urllib.request.Request(srv.url_for(d / "clip.wav"),
                                     headers={"Range": "bytes=999999-"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 416

    def test_missing_404_and_escape_403(self, server):
        srv, d = server
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/nope.wav")
        assert e.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/%2e%2e/%2e%2e/etc/passwd")
        assert e.value.code in (403, 404)
