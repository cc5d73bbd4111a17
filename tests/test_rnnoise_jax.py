"""Parity: batched JAX RNNoise pipeline vs the sequential NumPy oracle.

The oracle is the executable spec (faithful to the public RNNoise algorithm
the reference consumes via nnnoiseless). The TPU pipeline must reproduce it
to ~1e-4 per sample on [-1, 1] audio, including across block boundaries
(streaming state carry) and through silence gaps (state freezing).
"""

import numpy as np
import pytest

from crispy_tpu.dsp.rnnoise import constants as C
from crispy_tpu.dsp.rnnoise import jax_pipeline as jp
from crispy_tpu.dsp.rnnoise import oracle
from crispy_tpu.dsp.rnnoise.weights import deterministic_test_model

FRAME = C.FRAME_SIZE


def speechlike(n, seed=0, f0=110.0, sr=48000, level=0.4):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    sig = sum((0.5 / k) * np.sin(2 * np.pi * f0 * k * t + 0.13 * k) for k in range(1, 9))
    sig = sig * (0.6 + 0.4 * np.sin(2 * np.pi * 1.3 * t + seed))
    sig += 0.03 * rng.standard_normal(n)
    return (level * sig / np.max(np.abs(sig))).astype(np.float32)


@pytest.fixture(scope="module")
def model():
    return deterministic_test_model()


@pytest.fixture(scope="module")
def params(model):
    return jp.make_params(model)


def run_oracle(audio_2d, model):
    return np.stack([oracle.denoise_stream(a, model) for a in audio_2d])


class TestBlockParity:
    def test_single_block_parity(self, model, params):
        """Two streams, one 12-frame block, vs the oracle."""
        n = 12 * FRAME
        audio = np.stack([speechlike(n, seed=1), speechlike(n, seed=2, f0=180.0)])
        want = run_oracle(audio, model)
        got = jp.denoise_batch(audio, params=params, block_frames=12)
        np.testing.assert_allclose(got, want, atol=1.5e-4)

    def test_multi_block_state_carry(self, model, params):
        """Block-boundary state (analysis/pitch/GRU/synthesis) must carry."""
        n = 30 * FRAME
        audio = np.stack([speechlike(n, seed=3, f0=95.0), speechlike(n, seed=4, f0=240.0)])
        want = run_oracle(audio, model)
        got = jp.denoise_batch(audio, params=params, block_frames=7)  # uneven split
        np.testing.assert_allclose(got, want, atol=1.5e-4)

    def test_silence_gap_state_freeze(self, model, params):
        """Silent stretch inside speech: GRU/ceps state freezes, output passes
        the unmodified spectrum — exactly like the oracle."""
        n = 24 * FRAME
        audio = speechlike(n, seed=5)
        audio[8 * FRAME: 14 * FRAME] = 0.0
        audio = audio[None, :]
        want = run_oracle(audio, model)
        got = jp.denoise_batch(audio, params=params, block_frames=6)
        np.testing.assert_allclose(got, want, atol=1.5e-4)

    def test_leading_silence(self, model, params):
        n = 10 * FRAME
        audio = np.zeros(n, np.float32)
        audio[4 * FRAME:] = speechlike(6 * FRAME, seed=6)
        audio = audio[None, :]
        want = run_oracle(audio, model)
        got = jp.denoise_batch(audio, params=params, block_frames=5)
        np.testing.assert_allclose(got, want, atol=1.5e-4)

    def test_vad_parity(self, model, params):
        n = 10 * FRAME
        audio = speechlike(n, seed=7)[None, :]
        st = oracle.DenoiseState(model=model)
        want_vad = []
        for f in range(10):
            _, v = st.process_frame(audio[0, f * FRAME: (f + 1) * FRAME] * 32768.0)
            want_vad.append(v)
        _, got_vad = jp.denoise_batch(audio, params=params, block_frames=10, return_vad=True)
        np.testing.assert_allclose(got_vad[0], np.array(want_vad), atol=1e-3)

    def test_partial_tail_passthrough(self, model, params):
        n = 5 * FRAME + 123
        audio = speechlike(n, seed=8)[None, :]
        got = jp.denoise_batch(audio, params=params, block_frames=5)
        np.testing.assert_array_equal(got[0, 5 * FRAME:], audio[0, 5 * FRAME:])

    def test_pitch_index_parity(self, model, params):
        """The selected pitch periods must match the oracle exactly."""
        import jax.numpy as jnp

        n = 16 * FRAME
        audio = np.stack([speechlike(n, seed=9, f0=130.0)])
        st = oracle.DenoiseState(model=model)
        want = []
        for f in range(16):
            x = oracle.biquad(audio[0, f * FRAME: (f + 1) * FRAME] * 32768.0,
                              st.mem_hp_x, C.BIQUAD_B_HP, C.BIQUAD_A_HP)
            st._compute_frame_features(x)
            want.append(st.last_period)

        state = jp.init_state(1)
        x = (jnp.asarray(audio) * 32768.0).reshape(1, 16, FRAME)
        state2, hp = jp._hp_biquad(params, state, x)
        ext = jnp.concatenate([state2["hp_tail"], hp.reshape(1, -1)], axis=-1)
        pidx, _, _ = jp._pitch_index(params, state2, ext, 16)
        got = np.asarray(pidx)[0]
        assert np.array_equal(got, np.array(want)), f"{got} vs {want}"


class TestPallasRdScan:
    def test_fused_rd_kernel_matches_xla_scan(self, model, params):
        """rd_scan_pallas (interpret mode) reproduces the rd_step lax.scan
        bit-exactly: same continuation thresholds, candidate selection and
        (period, gain) carry."""
        import jax
        import jax.numpy as jnp
        from jax import lax

        from crispy_tpu.dsp.rnnoise.pallas_rnn import rd_scan_pallas

        rng = np.random.default_rng(3)
        S, F = 3, 11  # not a multiple of the stream block
        T1 = rng.integers(20, 380, (S, F, 14)).astype(np.float32)
        g1 = rng.random((S, F, 14)).astype(np.float32)
        valid = (rng.random((S, F, 14)) > 0.3).astype(np.float32)
        g0 = rng.random((S, F)).astype(np.float32)
        T0 = rng.integers(30, 384, (S, F)).astype(np.float32)
        Tout = rng.integers(60, 768, (S, F, 15)).astype(np.float32)
        pg = rng.random((S, F, 15)).astype(np.float32)
        packed = jnp.asarray(np.concatenate(
            [T1, g1, valid, g0[..., None], T0[..., None], Tout, pg], axis=-1))
        lp0 = jnp.asarray(rng.integers(60, 768, S).astype(np.float32))
        lg0 = jnp.asarray(rng.random(S).astype(np.float32))

        ksf = jnp.arange(2, 16, dtype=jnp.float32)

        def rd_step(carry, inp):  # the exact jax_pipeline step
            prev_T, prev_g = carry
            T1_f, g1_f = inp[:, 0:14], inp[:, 14:28]
            valid_f = inp[:, 28:42] > 0.5
            g0_f, T0_f = inp[:, 42], inp[:, 43]
            Tout_f, pg_f = inp[:, 44:59], inp[:, 59:74]
            pph = jnp.floor(prev_T * 0.5)
            dT = jnp.abs(T1_f - pph[:, None])
            cont = jnp.where(dT <= 1, prev_g[:, None],
                             jnp.where((dT <= 2) & (5.0 * ksf * ksf < T0_f[:, None]),
                                       0.5 * prev_g[:, None], 0.0))
            thresh = jnp.maximum(0.3, 0.7 * g0_f[:, None] - cont)
            thresh = jnp.where(
                T1_f < 90.0, jnp.maximum(0.4, 0.85 * g0_f[:, None] - cont),
                jnp.where(T1_f < 60.0, jnp.maximum(0.5, 0.9 * g0_f[:, None] - cont),
                          thresh))
            choose = valid_f & (g1_f > thresh)
            kidx = jnp.max(jnp.where(choose, jnp.arange(14), -1), axis=-1)
            sel = jax.nn.one_hot(kidx + 1, 15, dtype=jnp.float32)
            T_out = jnp.sum(sel * Tout_f, axis=-1)
            return (T_out, jnp.sum(sel * pg_f, axis=-1)), T_out

        (lp, lg), pitch = lax.scan(rd_step, (lp0, lg0), jnp.moveaxis(packed, 1, 0))
        pitch = jnp.moveaxis(pitch, 0, 1)
        p2, lp2, lg2 = rd_scan_pallas(packed, lp0, lg0, interpret=True)
        np.testing.assert_array_equal(np.asarray(pitch), np.asarray(p2))
        np.testing.assert_array_equal(np.asarray(lp), np.asarray(lp2))
        np.testing.assert_array_equal(np.asarray(lg), np.asarray(lg2))


class TestPallasNnScan:
    def test_fused_kernel_matches_xla_scan(self, model, params):
        """pallas_rnn (interpret mode on CPU) == _nn_scan bit-near-exactly,
        including silence gating, lastg smoothing and state carry."""
        import jax.numpy as jnp

        from crispy_tpu.dsp.rnnoise import pallas_rnn as pr

        rng = np.random.default_rng(11)
        S, F = 3, 9  # not a multiple of the kernel's stream block
        feats = jnp.asarray(rng.standard_normal((S, F, 42)).astype(np.float32))
        sil = jnp.asarray(rng.random((S, F)) < 0.3)
        state = jp.init_state(S)
        (a1, a2, a3), st_a = jp._nn_scan(params, state, feats, sil)
        (b1, b2, b3), st_b = pr.nn_scan_pallas(params, state, feats, sil, interpret=True)
        for x, y in ((a1, b1), (a2, b2), (a3, b3)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
        for k in st_a:
            np.testing.assert_allclose(np.asarray(st_a[k]), np.asarray(st_b[k]), atol=1e-6)


class TestCorrTables:
    def test_matmul_dft_tables_compute_exact_correlation(self):
        """The (re‖im) matmul-DFT tables must reproduce the direct
        correlation sum at BOTH geometries (coarse 448-point, fine
        896-point — sized to the no-wraparound minimum, not powers of
        two). Backend-independent: pure numpy einsum over the tables."""
        from crispy_tpu.dsp.rnnoise.jax_pipeline import (
            _COARSE_LAGS, _RD_MAXP, _corr_tables)

        t = _corr_tables()
        rng = np.random.default_rng(5)
        cases = [
            ("x4", "y4", "c4", 240, 387, _COARSE_LAGS),
            ("x2", "y2", "c2", 480, 864, _RD_MAXP + 1),
        ]
        for tagx, tagy, tagc, nx, ny, nlags in cases:
            x = rng.standard_normal((3, nx)).astype(np.float32)
            y = rng.standard_normal((3, ny)).astype(np.float32)
            xr = x @ t[f"cf_{tagx}_re"]
            xi = x @ t[f"cf_{tagx}_im"]
            yr = y @ t[f"cf_{tagy}_re"]
            yi = y @ t[f"cf_{tagy}_im"]
            cr = xr * yr + xi * yi
            ci = xr * yi - xi * yr
            got = cr @ t[f"ci_{tagc}_re"] + ci @ t[f"ci_{tagc}_im"]
            want = np.stack([
                [np.dot(x[b], y[b, i: i + nx]) if i + nx <= ny else
                 np.dot(x[b, : ny - i], y[b, i:]) for i in range(nlags)]
                for b in range(3)
            ])
            np.testing.assert_allclose(got, want, atol=2e-3 * np.abs(want).max())


class TestPitchPrecisionKnob:
    def test_default_is_highest(self, monkeypatch):
        """Default MUST stay 6-pass: measured on v5e, 3-pass bf16x3 flips a
        near-tie pitch lag ~1/450 frame decisions on periodic speech, and a
        single flip moves denoised samples ~6e-2 — outside the 1e-4 parity
        budget (north star; BASELINE.json)."""
        import jax.lax as lax

        from crispy_tpu.dsp.rnnoise import jax_pipeline as jp

        monkeypatch.delenv("CRISPY_PITCH_PREC", raising=False)
        assert jp._pitch_prec() == lax.Precision.HIGHEST

    def test_opt_in_throughput_mode(self, monkeypatch):
        import jax.lax as lax

        from crispy_tpu.dsp.rnnoise import jax_pipeline as jp

        monkeypatch.setenv("CRISPY_PITCH_PREC", "high")
        assert jp._pitch_prec() == lax.Precision.HIGH
        monkeypatch.setenv("CRISPY_PITCH_PREC", "HIGHEST")
        assert jp._pitch_prec() == lax.Precision.HIGHEST


class TestRadixDFT:
    """The radix-split (Cooley–Tukey) matmul DFTs (radix_dft.py) must be
    numerically interchangeable with the flat single-matmul tables — the
    split is an exact regrouping, so agreement is at f32 rounding level,
    far inside the 1e-4 oracle budget."""

    def test_radix_forward_matches_flat_tables(self):
        from crispy_tpu.dsp.rnnoise import jax_pipeline as jp
        from crispy_tpu.dsp.rnnoise import radix_dft as rdft

        t = {**jp._corr_tables(), **jp._dft_tables()}
        # rebuild the fused (re‖im) flat tables the pipeline uses
        for k in [k for k in list(t) if k.endswith("_re")
                  and (k.startswith("cf_") or k == "dft_fwd_re")]:
            base = k[:-3]
            t[base] = np.concatenate([t[k], t[f"{base}_im"]], axis=1)
        rx = {kk: np.asarray(vv) for kk, vv in jp._radix_tables().items()}
        rng = np.random.default_rng(7)
        cases = [("rx_dft", "dft_fwd", 960, 481), ("rx_x4", "cf_x4", 240, 225),
                 ("rx_y4", "cf_y4", 387, 225), ("rx_x2", "cf_x2", 480, 449),
                 ("rx_y2", "cf_y2", 864, 449)]
        for rtag, ftag, length, nb in cases:
            x = rng.standard_normal((3, length)).astype(np.float32)
            want = x @ t[ftag]
            got = np.asarray(rdft.apply_fwd(rx, rtag, x, nb))
            tol = 3e-5 * max(1.0, np.abs(want).max())
            np.testing.assert_allclose(got, want, atol=tol, err_msg=rtag)

    def test_radix_inverse_matches_flat_tables(self):
        from crispy_tpu.dsp.rnnoise import jax_pipeline as jp
        from crispy_tpu.dsp.rnnoise import radix_dft as rdft

        t = {**jp._corr_tables(), **jp._dft_tables()}
        rx = {kk: np.asarray(vv) for kk, vv in jp._radix_tables().items()}
        rng = np.random.default_rng(8)
        # spectra inverse (window folded, x WIN scaling)
        re = rng.standard_normal((3, 481)).astype(np.float32)
        im = rng.standard_normal((3, 481)).astype(np.float32)
        want = re @ t["dft_inv_re"] + im @ t["dft_inv_im"]
        got = np.asarray(rdft.apply_inv(rx, "rx_inv", re, im, 960))
        np.testing.assert_allclose(got, want, atol=3e-5 * np.abs(want).max())
        # correlation inverses (1/N scaling, no window)
        for rtag, ftag, nb, nl in [("rx_c4", "c4", 225, 147),
                                   ("rx_c2", "c2", 449, 385)]:
            cr = rng.standard_normal((3, nb)).astype(np.float32)
            ci = rng.standard_normal((3, nb)).astype(np.float32)
            want = cr @ t[f"ci_{ftag}_re"] + ci @ t[f"ci_{ftag}_im"]
            got = np.asarray(rdft.apply_inv(rx, rtag, cr, ci, nl))
            tol = 3e-5 * max(1.0, np.abs(want).max())
            np.testing.assert_allclose(got, want, atol=tol, err_msg=rtag)


class TestBlockESW:
    def test_block_sliding_energy_matches_banded_tables(self, params):
        """Hierarchical block sliding energies vs the banded matmul tables
        (coarse 240-window and fine 480-window families, incl. the flipped
        yyl column family)."""
        from crispy_tpu.dsp.rnnoise import jax_pipeline as jp
        import jax.numpy as jnp

        rng = np.random.default_rng(9)
        bds = jnp.asarray(rng.standard_normal((2, 5, 864)).astype(np.float32))
        ws = jp._sliding_energy_blocks(bds * bds, 480, 385)
        got = jnp.concatenate([ws[..., :294], jnp.flip(ws, axis=-1)], axis=-1)
        want = jnp.einsum("...n,ni->...i", bds * bds, params["esw_fine"],
                          precision=jp._HIGH)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4 * float(jnp.abs(want).max()))
        y4 = jnp.asarray(rng.standard_normal((2, 5, 387)).astype(np.float32))
        e4 = jp._sliding_energy_blocks(y4 * y4, 240, 147)
        want4 = jnp.einsum("...n,ni->...i", y4 * y4, params["esw_4"],
                           precision=jp._HIGH)
        np.testing.assert_allclose(np.asarray(e4), np.asarray(want4),
                                   atol=2e-4 * float(jnp.abs(want4).max()))


class TestForcedMatmulPathParity:
    """Full-pipeline oracle parity with the TPU-only matmul branches forced
    on the CPU backend (the real-chip run is tools/tpu_parity_check.py;
    this keeps the radix/block-esw code paths covered in the suite)."""

    @pytest.mark.parametrize("radix,esw", [("on", "on"), ("off", "off")])
    def test_forced_matmul_parity(self, model, params, monkeypatch, radix, esw):
        import jax
        import jax.numpy as jnp

        from crispy_tpu.dsp.rnnoise import jax_pipeline as jp

        monkeypatch.setattr(jp, "_use_matmul_dft", lambda: True)
        monkeypatch.setenv("CRISPY_RADIX_DFT", radix)
        monkeypatch.setenv("CRISPY_BLOCK_ESW", esw)
        n = 18 * FRAME
        audio = np.stack([speechlike(n, seed=11, f0=120.0),
                          speechlike(n, seed=12, f0=200.0)])
        want = run_oracle(audio, model)
        step = jax.jit(jp.denoise_block, donate_argnums=(1,))
        state = jp.init_state(2)
        blk = 6 * FRAME
        out = np.zeros_like(audio)
        for i in range(0, n, blk):
            state, o, _ = step(params, state, jnp.asarray(audio[:, i: i + blk]))
            out[:, i: i + blk] = np.asarray(o)
        np.testing.assert_allclose(out, want, atol=1.5e-4)


class TestInt16Wire:
    def test_i16_wire_matches_f32_wire_quantized(self, model, params):
        """wire='i16' must reproduce the f32 wire + write_wav quantization
        bit for bit on every processed frame; the partial tail passes the
        raw input PCM through exactly (the f32 wire's float round trip
        loses 1 LSB there to the ×32767/÷32768 asymmetry)."""
        rng = np.random.default_rng(21)
        n = 9 * FRAME + 77
        pcm = (np.clip(rng.standard_normal((2, n)) * 0.3, -1, 1) * 32767
               ).astype(np.int16)
        f = pcm.astype(np.float32) / 32768.0
        outf = jp.denoise_batch(f, params=params, block_frames=4)
        hostq = (np.clip(outf, -1, 1) * 32767.0).astype(np.int16)
        out16 = jp.denoise_batch(pcm, params=params, block_frames=4, wire="i16")
        assert out16.dtype == np.int16
        full = 9 * FRAME
        np.testing.assert_array_equal(out16[:, :full], hostq[:, :full])
        np.testing.assert_array_equal(out16[:, full:], pcm[:, full:])

    def test_i16_wire_rejects_float_input(self, params):
        with pytest.raises(TypeError):
            jp.denoise_batch(np.zeros((1, FRAME), np.float32), params=params,
                             wire="i16")

    def test_denoise_file_i16_fast_path_matches_float_path(self, tmp_path, model):
        """denoise_file's 16-bit fast path writes the same PCM the float
        path would for every processed frame."""
        from crispy_tpu.engine import denoiser
        from crispy_tpu.io import wav as wavio

        rng = np.random.default_rng(22)
        n = 6 * FRAME
        audio = (np.clip(rng.standard_normal(n) * 0.2, -1, 1) * 32767
                 ).astype(np.int16).astype(np.float32) / 32768.0
        src = tmp_path / "in.wav"
        wavio.write_wav(src, audio, 48000)
        out_a = tmp_path / "fast.wav"
        denoiser.denoise_file(src, out_a, model=model)
        # force the float path on the SAME samples: decode the 16-bit file
        # and re-write it as float32 (write_wav's i16 quantization means
        # writing `audio` directly would store different values)
        decoded, _ = wavio.read_wav(src)
        src_f = tmp_path / "in_f32.wav"
        wavio.write_wav(src_f, decoded, 48000, dtype="f32")
        out_b = tmp_path / "float.wav"
        denoiser.denoise_file(src_f, out_b, model=model)
        a, _ = wavio.read_wav(out_a)
        b, _ = wavio.read_wav(out_b)
        np.testing.assert_array_equal(a, b)
