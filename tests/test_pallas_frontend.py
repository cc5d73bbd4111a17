"""Fused Pallas frontend kernels vs the XLA matmul formulation (CPU
interpret mode) and the full fused block vs the NumPy oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crispy_tpu.dsp.rnnoise import jax_pipeline as jp
from crispy_tpu.dsp.rnnoise import pallas_frontend as pf
from crispy_tpu.dsp.rnnoise.jax_pipeline import FRAME, HIST, WIN, NFREQ
from crispy_tpu.dsp.rnnoise.weights import deterministic_test_model


@pytest.fixture(scope="module")
def params():
    return jp.make_params(deterministic_test_model())


def ref_fwd(params, ext_a, F):
    """The XLA matmul formulation (windows → DFT → band energy)."""
    awin = jp._windows(ext_a, FRAME, WIN, F)
    ri = jnp.einsum("...n,nk->...k", awin, params["dft_fwd"],
                    precision=jax.lax.Precision.HIGHEST)
    Xr, Xi = ri[..., :NFREQ], ri[..., NFREQ:]
    Ex = jp._band_energy(params, Xr, Xi)
    return Xr, Xi, Ex


class TestFwdSpectrumBands:
    @pytest.mark.parametrize("S,F", [(3, 5), (8, 16), (9, 20)])
    def test_matches_xla_formulation(self, params, S, F):
        rng = np.random.default_rng(0)
        ext_a = jnp.asarray(
            rng.standard_normal((S, (F + 1) * FRAME)).astype(np.float32) * 9000)
        Y, Ex = pf.fwd_spectrum_bands(
            ext_a, params["dft_fwd_a512"], params["dft_fwd_b512"],
            params["band_e_pad"], F, interpret=True)
        Xr, Xi, Ex_ref = ref_fwd(params, ext_a, F)
        # bf16x4 budget: residual ~ input_scale * 2^-16 * sqrt(K) ≈ 4e-3
        # at the 9000-scale fixture (f32-exact XLA is the reference here;
        # end-to-end the same budget is ~1.5e-5 relative to the signal,
        # inside the 1e-4 oracle envelope — see the full-block test)
        np.testing.assert_allclose(np.asarray(Y[..., :NFREQ]), np.asarray(Xr),
                                   rtol=1e-5, atol=1e-2)
        np.testing.assert_allclose(np.asarray(Y[..., 512: 512 + NFREQ]),
                                   np.asarray(Xi), rtol=1e-5, atol=1e-2)
        # pad columns exactly zero (downstream relies on it)
        assert float(jnp.max(jnp.abs(Y[..., NFREQ: 512]))) == 0.0
        assert float(jnp.max(jnp.abs(Y[..., 512 + NFREQ:]))) == 0.0
        np.testing.assert_allclose(np.asarray(Ex), np.asarray(Ex_ref),
                                   rtol=1e-4, atol=30.0)

    def test_win_variant_matches(self, params):
        rng = np.random.default_rng(1)
        S, F = 4, 7
        wins = jnp.asarray(
            rng.standard_normal((S, F, WIN)).astype(np.float32) * 9000)
        Y, Ex = pf.win_spectrum_bands(wins, params["dft_fwd_pad"],
                                      params["band_e_pad"], interpret=True)
        ri = jnp.einsum("...n,nk->...k", wins, params["dft_fwd"],
                        precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(Y[..., :NFREQ]),
                                   np.asarray(ri[..., :NFREQ]),
                                   rtol=1e-5, atol=1e-2)
        Ex_ref = jp._band_energy(params, ri[..., :NFREQ], ri[..., NFREQ:])
        np.testing.assert_allclose(np.asarray(Ex), np.asarray(Ex_ref),
                                   rtol=1e-4, atol=30.0)


class TestInvSpectrumOla:
    @pytest.mark.parametrize("S,F", [(3, 5), (8, 16), (5, 33)])
    def test_matches_inverse_plus_overlap_add(self, params, S, F):
        rng = np.random.default_rng(2)
        Xr = rng.standard_normal((S, F, NFREQ)).astype(np.float32)
        Xi = rng.standard_normal((S, F, NFREQ)).astype(np.float32)
        syn_mem = rng.standard_normal((S, FRAME)).astype(np.float32)
        Y = np.zeros((S, F, 1024), np.float32)
        Y[..., :NFREQ] = Xr
        Y[..., 512: 512 + NFREQ] = Xi
        out, new_mem = pf.inv_spectrum_ola(
            jnp.asarray(Y), params["dft_inv_a"], params["dft_inv_b"],
            jnp.asarray(syn_mem), F, interpret=True)
        # reference: matmul inverse + concat overlap-add
        ri = (jnp.einsum("...k,kn->...n", jnp.asarray(Xr), params["dft_inv_re"],
                         precision=jax.lax.Precision.HIGHEST)
              + jnp.einsum("...k,kn->...n", jnp.asarray(Xi), params["dft_inv_im"],
                           precision=jax.lax.Precision.HIGHEST))
        tails = jnp.concatenate(
            [jnp.asarray(syn_mem)[:, None, :], ri[:, :-1, FRAME:]], axis=1)
        ref = (ri[..., :FRAME] + tails).reshape(S, F * FRAME)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(np.asarray(new_mem),
                                   np.asarray(ri[:, -1, FRAME:]),
                                   rtol=1e-5, atol=1e-3)


class TestFusedBlockOracleParity:
    def test_full_block_matches_oracle(self, params, monkeypatch):
        """Force the fused path (interpret mode on CPU) through the whole
        denoise block and compare against the NumPy oracle."""
        from crispy_tpu.dsp.rnnoise import oracle
        from crispy_tpu.dsp.rnnoise.weights import deterministic_test_model

        monkeypatch.setattr(jp, "_use_fused_spectra", lambda: True)
        monkeypatch.setattr(jp, "_use_matmul_dft", lambda: False)
        model = deterministic_test_model()

        def speechlike(n, seed=0, f0=110.0, sr=48000, level=0.4):
            t = np.arange(n) / sr
            sig = sum((0.5 / k) * np.sin(2 * np.pi * f0 * k * t + 0.13 * k)
                      for k in range(1, 9))
            sig = sig * (0.6 + 0.4 * np.sin(2 * np.pi * 1.3 * t + seed))
            return (level * sig / np.max(np.abs(sig))).astype(np.float32)

        F = 6
        n = F * FRAME
        block = np.stack([speechlike(n, seed=1),
                          speechlike(n, seed=2, f0=180.0)])
        state = jp.init_state(2)
        state, out, _vad = jp.denoise_block(params, state, jnp.asarray(block))
        out = np.asarray(out)
        for s in range(2):
            ref = oracle.denoise_stream(block[s], model)
            # the speechlike-fixture parity envelope of the unfused path
            np.testing.assert_allclose(out[s], ref, atol=1.5e-4)
