"""Native C++ runtime: builds with g++ and matches the Python implementations
exactly (rings, mixer, resampler, WAV writer, RMS)."""

import numpy as np
import pytest

from crispy_tpu import runtime as rt
from crispy_tpu.dsp.resample import LinearResampler
from crispy_tpu.engine import recording as rec
from crispy_tpu.io import wav as wavio

pytestmark = pytest.mark.skipif(not rt.available(), reason="g++/native build unavailable")


class TestRing:
    def test_push_pop_overflow(self):
        r = rt.NativeRing(10)
        r.push(np.arange(15, dtype=np.float32))
        assert len(r) == 10
        assert r.pop(3).tolist() == [5.0, 6.0, 7.0]
        r.trim_front(2)
        assert r.pop(1).tolist() == [10.0]
        r.clear()
        assert len(r) == 0

    def test_pop_underflow(self):
        r = rt.NativeRing(8)
        r.push(np.array([1.0, 2.0], np.float32))
        assert r.pop(5).tolist() == [1.0, 2.0]


class TestMixer:
    def test_matches_python_mixer_semantics(self):
        mic = rt.NativeRing(480000)
        app = rt.NativeRing(480000)
        mic.push(0.25 * np.ones(rec.MIX_FRAME, np.float32))
        app.push(0.25 * np.ones(rec.MIX_FRAME // 2, np.float32))
        out = rt.mixer_step(mic, app, rec.MIX_FRAME, rec.MAX_DESYNC)
        assert out is not None
        np.testing.assert_allclose(out[: rec.MIX_FRAME // 2], 0.5)
        np.testing.assert_allclose(out[rec.MIX_FRAME // 2:], 0.25)
        assert rt.mixer_step(mic, app, rec.MIX_FRAME, rec.MAX_DESYNC) is None

    def test_desync_trim(self):
        mic = rt.NativeRing(480000)
        app = rt.NativeRing(480000)
        mic.push(np.zeros(rec.MIX_FRAME * 8, np.float32))
        app.push(np.ones(rec.MIX_FRAME, np.float32))
        out = rt.mixer_step(mic, app, rec.MIX_FRAME, rec.MAX_DESYNC)
        assert out is not None
        # after trimming, mixed frame contains the app audio (mic lead bounded)
        assert out.max() == pytest.approx(1.0)


class TestResampler:
    @pytest.mark.parametrize("rates", [(44100, 48000), (48000, 16000)])
    def test_exactly_matches_python(self, rates, rng):
        x = rng.standard_normal(3000).astype(np.float32)
        py = LinearResampler(*rates)
        nat = rt.NativeLinearResampler(*rates)
        a = np.concatenate([py.process(x[:1000]), py.process(x[1000:])])
        b = np.concatenate([nat.process(x[:1000]), nat.process(x[1000:])])
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_bypass_and_rate_swap(self, rng):
        x = rng.standard_normal(100).astype(np.float32)
        nat = rt.NativeLinearResampler(48000, 48000.5)
        np.testing.assert_array_equal(nat.process(x), x)
        nat.set_rates(48000, 16000)
        out = nat.process(x)
        py = LinearResampler(48000, 16000)
        np.testing.assert_allclose(out, py.process(x), atol=1e-6)


class TestWav:
    def test_matches_python_writer_bytes(self, tmp_path, rng):
        l = rng.uniform(-1.2, 1.2, 1000).astype(np.float32)
        r = rng.uniform(-1.2, 1.2, 1000).astype(np.float32)
        pyw = wavio.WavWriter(tmp_path / "py.wav")
        pyw.write_samples(l, r)
        pyw.finalize()
        natw = rt.NativeWavWriter(tmp_path / "nat.wav")
        natw.write_samples(l, r)
        natw.finalize()
        assert (tmp_path / "py.wav").read_bytes() == (tmp_path / "nat.wav").read_bytes()


def test_rms():
    x = np.array([3.0, 4.0], np.float32)
    assert rt.rms(x) == pytest.approx(np.sqrt(12.5), rel=1e-6)
    assert rt.rms(np.zeros(0, np.float32)) == 0.0
