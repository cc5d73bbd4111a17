"""Invariants of the NumPy RNNoise oracle (the executable spec).

The original trained weights are not redistributable in this environment, so
parity is enforced structurally: window/transform identities that RNNoise's
correctness depends on, plus end-to-end behavior with the deterministic
builtin model (silence gate, passthrough-with-unity-gains, state evolution).
"""

import numpy as np
import pytest

from crispy_tpu.dsp.rnnoise import constants as C
from crispy_tpu.dsp.rnnoise import oracle
from crispy_tpu.dsp.rnnoise.weights import deterministic_test_model, from_c_layout


def speechlike(n, seed=0, f0=110.0, sr=48000):
    """Harmonic-rich signal + noise, good pitch-tracking target."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    sig = sum((0.4 / k) * np.sin(2 * np.pi * f0 * k * t + 0.1 * k) for k in range(1, 8))
    sig = sig * (0.6 + 0.4 * np.sin(2 * np.pi * 1.7 * t))
    sig += 0.02 * rng.standard_normal(n)
    return (0.5 * sig / np.max(np.abs(sig))).astype(np.float32)


class TestTransforms:
    def test_window_power_complementary(self):
        w = C.full_window()
        # Princen-Bradley: w[i]^2 + w[i+FRAME]^2 == 1 for perfect OLA.
        s = w[: C.FRAME_SIZE] ** 2 + w[C.FRAME_SIZE:] ** 2
        np.testing.assert_allclose(s, 1.0, atol=1e-6)

    def test_fft_roundtrip(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(C.WINDOW_SIZE).astype(np.float32)
        X = oracle.forward_transform(x)
        back = oracle.inverse_transform(X)
        np.testing.assert_allclose(back, x, atol=1e-4)

    def test_band_energy_total(self):
        # Each interior bin contributes (1-frac)+frac = 1 across adjacent
        # bands; only bins inside the doubled edge bands exceed that.
        W = C.band_energy_matrix()
        col = W.sum(axis=0)
        np.testing.assert_allclose(col[4:312], 1.0, atol=1e-5)  # bands 1..20
        assert col[0] == 2.0  # band-0 edge doubling
        assert np.all(col[401:] == 0)

    def test_interp_band_gain_constant(self):
        gf = oracle.interp_band_gain(np.ones(C.NB_BANDS, np.float32))
        np.testing.assert_allclose(gf[:400], 1.0, atol=1e-6)
        assert np.all(gf[401:] == 0)

    def test_dct_orthonormal(self):
        D = C.dct_matrix().astype(np.float64)
        np.testing.assert_allclose(D @ D.T, np.eye(C.NB_BANDS), atol=1e-6)

    def test_tansig_matches_tanh(self):
        x = np.linspace(-10, 10, 2001).astype(np.float32)
        np.testing.assert_allclose(C.tansig_approx(x), np.tanh(x), atol=2e-4)
        assert C.tansig_approx(np.array([np.nan], np.float32))[0] == 0.0


class TestPitch:
    def test_pitch_search_finds_period(self):
        # Pure periodic signal at a known lag: downsampled-domain search
        # should land within a couple samples of the true 48 kHz period.
        sr = 48000
        period = 200  # in samples -> 240 Hz
        n = C.PITCH_BUF_SIZE
        t = np.arange(n)
        sig = (np.sin(2 * np.pi * t / period) + 0.3 * np.sin(4 * np.pi * t / period)).astype(np.float32)
        ds = oracle.pitch_downsample(sig)
        raw = oracle.pitch_search(
            ds[C.PITCH_MAX_PERIOD >> 1:], ds, C.PITCH_FRAME_SIZE,
            C.PITCH_MAX_PERIOD - 3 * C.PITCH_MIN_PERIOD,
        )
        idx = C.PITCH_MAX_PERIOD - raw
        idx, gain = oracle.remove_doubling(
            ds, C.PITCH_MAX_PERIOD, C.PITCH_MIN_PERIOD, C.PITCH_FRAME_SIZE, idx, 0, 0.0
        )
        assert idx % period <= 4 or period - (idx % period) <= 4
        assert gain > 0.8

    def test_downsample_shape(self):
        x = np.arange(C.PITCH_BUF_SIZE, dtype=np.float32)
        assert oracle.pitch_downsample(x).shape == (C.PITCH_BUF_SIZE // 2,)


class TestDenoiseState:
    def test_silence_passthrough_structure(self):
        """Silence frames skip the NN and synthesize the unmodified spectrum."""
        st = oracle.DenoiseState(model=deterministic_test_model())
        out1, vad1 = st.process_frame(np.zeros(C.FRAME_SIZE, np.float32))
        out2, vad2 = st.process_frame(np.zeros(C.FRAME_SIZE, np.float32))
        assert vad1 == 0.0 and vad2 == 0.0
        np.testing.assert_allclose(out2, 0.0, atol=1e-3)
        # GRU state untouched on silence.
        assert np.all(st.rnn.vad == 0)

    def test_unity_gains_reconstruct(self):
        """With gains forced to 1 and pitch filter disabled, the chain is a
        pure windowed analysis/synthesis and must reconstruct the (HP-filtered)
        input after one frame of latency."""
        st = oracle.DenoiseState(model=deterministic_test_model())
        x = speechlike(C.FRAME_SIZE * 6) * 32768.0
        hp_mem = np.zeros(2, np.float32)
        expected = oracle.biquad(x.copy(), hp_mem, C.BIQUAD_B_HP, C.BIQUAD_A_HP)
        outs = []
        for f in range(6):
            frame = x[f * C.FRAME_SIZE: (f + 1) * C.FRAME_SIZE]
            xf = oracle.biquad(frame, st.mem_hp_x, C.BIQUAD_B_HP, C.BIQUAD_A_HP)
            silence, X, P, Ex, Ep, Exp, feats = st._compute_frame_features(xf)
            outs.append(st._frame_synthesis(X))
        got = np.concatenate(outs)
        # One frame latency: output[F] ≈ hp(x)[F-1] for bins < 400 (band-limited
        # region is untouched; bins >= 400*?? are NOT zeroed without gains).
        np.testing.assert_allclose(
            got[C.FRAME_SIZE: 5 * C.FRAME_SIZE],
            expected[: 4 * C.FRAME_SIZE],
            atol=32768 * 2e-4,
        )

    def test_stream_deterministic(self):
        x = speechlike(C.FRAME_SIZE * 12, seed=3)
        a = oracle.denoise_stream(x)
        b = oracle.denoise_stream(x)
        np.testing.assert_array_equal(a, b)
        assert a.shape == x.shape
        assert np.all(np.abs(a) <= 1.5)

    def test_gains_bounded_and_vad_valid(self):
        st = oracle.DenoiseState(model=deterministic_test_model())
        x = speechlike(C.FRAME_SIZE * 8, seed=5) * 32768.0
        for f in range(8):
            out, vad = st.process_frame(x[f * C.FRAME_SIZE: (f + 1) * C.FRAME_SIZE])
            assert 0.0 <= vad <= 1.0
            assert np.all(np.isfinite(out))
        assert np.all(st.lastg >= 0) and np.all(st.lastg <= 1.0)

    def test_features_shape_and_pitch_feature_range(self):
        st = oracle.DenoiseState(model=deterministic_test_model())
        x = speechlike(C.FRAME_SIZE * 4, seed=7) * 32768.0
        for f in range(4):
            xf = oracle.biquad(
                x[f * C.FRAME_SIZE: (f + 1) * C.FRAME_SIZE], st.mem_hp_x,
                C.BIQUAD_B_HP, C.BIQUAD_A_HP,
            )
            silence, *_, feats = st._compute_frame_features(xf)
            assert feats.shape == (C.NB_FEATURES,)
            if not silence:
                # pitch feature = .01*(index-300), index in [60, 768]
                assert -2.5 <= feats[C.NB_BANDS + 3 * C.NB_DELTA_CEPS] <= 4.7


class TestWeights:
    def test_c_layout_roundtrip(self, tmp_path):
        m = deterministic_test_model()
        p = m.save(tmp_path / "m.npz")
        m2 = m.load(p)
        np.testing.assert_array_equal(m.vad_gru.u, m2.vad_gru.u)
        np.testing.assert_array_equal(m.denoise_output.w, m2.denoise_output.w)
        assert m2.input_dense.activation == "tanh"

    def test_gru_gate_layout(self):
        """from_c_layout must map C's [gate*N + j*3N + i] to our [in, (z|r|h)*N]."""
        n, m_in = 2, 3
        flat_w = np.arange(m_in * 3 * n, dtype=np.float32)
        flat_u = np.zeros(n * 3 * n, np.float32)
        flat_b = np.zeros(3 * n, np.float32)
        from crispy_tpu.dsp.rnnoise.weights import _gru_from_c

        g = _gru_from_c(flat_w, flat_u, flat_b, m_in, n, "relu")
        # C element for input j=1, gate r (=1), neuron i=0: index 1*3*2(j stride) + 1*2(gate) + 0 = 8
        assert g.w[1, n + 0] == 8 * C.WEIGHTS_SCALE
