"""Kaldi-style fbank: framing, mel geometry, spectral behavior."""

import numpy as np
import pytest

from crispy_tpu.dsp import fbank as fb


class TestGeometry:
    def test_snip_edges_frame_count(self):
        # kaldi snip_edges: 1 + (T - 400) // 160
        for T, want in ((400, 1), (399, 0), (560, 2), (16000, 98)):
            out = fb.fbank(np.zeros(T, np.float32))
            assert out.shape[0] == want, T
        assert fb.fbank(np.zeros((3, 16000), np.float32)).shape == (3, 98, 80)

    def test_mel_scale_roundtrip(self):
        f = np.array([20.0, 300.0, 1000.0, 7999.0])
        np.testing.assert_allclose(fb.kaldi_mel_inv(fb.kaldi_mel(f)), f, rtol=1e-9)

    def test_banks_cover_spectrum(self):
        banks = fb.mel_banks()
        # every bin between ~30 Hz and Nyquist-ish contributes to some bank
        bins = np.arange(banks.shape[1]) * fb.SAMPLE_RATE / fb.N_FFT
        active = banks.sum(axis=0) > 0
        assert active[(bins > 60) & (bins < 7900)].all()
        assert not active[0]  # DC excluded (low_freq = 20)


class TestSpectral:
    def test_tone_peaks_in_matching_band(self):
        t = np.arange(16000) / 16000
        for freq in (300.0, 1000.0, 3000.0):
            x = 0.5 * np.sin(2 * np.pi * freq * t).astype(np.float32)
            out = np.asarray(fb.fbank(x))
            peak_band = out[10:-10].mean(axis=0).argmax()
            centers = fb.kaldi_mel_inv(
                np.linspace(fb.kaldi_mel(20.0), fb.kaldi_mel(8000.0), 82))[1:-1]
            assert abs(centers[peak_band] - freq) / freq < 0.25

    def test_dc_removed(self):
        x = np.full(16000, 0.3, np.float32)  # pure DC
        out = np.asarray(fb.fbank(x))
        tone = np.asarray(fb.fbank(
            (0.3 * np.sin(2 * np.pi * 300 * np.arange(16000) / 16000)).astype(np.float32)))
        # DC energy vanishes to fp residue (tens of dB below an equal tone)
        assert out.max() < tone.max() - 10.0

    def test_log_floor(self):
        out = np.asarray(fb.fbank(np.zeros(4000, np.float32)))
        np.testing.assert_allclose(out, np.log(1.1920929e-07), atol=1e-5)
