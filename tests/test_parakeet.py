"""Parakeet (FastConformer): encoder/CTC parity vs transformers, greedy
decoders (CTC collapse + TDT duration-advancing loop)."""

import numpy as np
import pytest

from crispy_tpu.models import parakeet as pk


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import ParakeetCTCConfig
    from transformers.models.parakeet.modeling_parakeet import ParakeetForCTC

    cfg = ParakeetCTCConfig()
    ec = cfg.encoder_config
    ec.hidden_size = 64
    ec.num_hidden_layers = 2
    ec.num_attention_heads = 2
    ec.num_key_value_heads = 2
    ec.intermediate_size = 128
    ec.subsampling_conv_channels = 32
    cfg.vocab_size = 128
    torch.manual_seed(0)
    hf = ParakeetForCTC(cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params, jcfg = pk.from_hf_ctc_state_dict(sd)
    return hf, params, jcfg


class TestHFParity:
    def test_encoder_matches(self, hf_pair):
        import torch

        hf, params, cfg = hf_pair
        rng = np.random.default_rng(0)
        mel = rng.standard_normal((2, 64, 80)).astype(np.float32)
        with torch.no_grad():
            want = hf.encoder(torch.tensor(mel)).last_hidden_state.numpy()
        got = np.asarray(pk.encode(params, cfg, mel))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=3e-3)

    def test_ctc_logits_match(self, hf_pair):
        import torch

        hf, params, cfg = hf_pair
        rng = np.random.default_rng(1)
        mel = rng.standard_normal((1, 48, 80)).astype(np.float32)
        with torch.no_grad():
            want = hf(input_features=torch.tensor(mel)).logits.numpy()
        got = np.asarray(pk.ctc_logits(params, cfg, mel))
        np.testing.assert_allclose(got, want, atol=1e-2)

    def test_config_inferred(self, hf_pair):
        _, _, cfg = hf_pair
        assert cfg.hidden_size == 64 and cfg.layers == 2
        assert cfg.heads == 2 and cfg.vocab_size == 128


class TestCtcGreedy:
    def test_collapse_and_blank_removal(self):
        V, blank = 5, 4
        # frames: a a blank b b b blank blank a
        ids = [0, 0, blank, 1, 1, 1, blank, blank, 0]
        logits = np.full((len(ids), V), -10.0, np.float32)
        for t, i in enumerate(ids):
            logits[t, i] = 10.0
        out = pk.ctc_greedy(logits[None], blank)
        assert out == [[0, 1, 0]]


class TestTdt:
    def test_greedy_decode_runs_and_terminates(self):
        cfg = pk.CONFIGS["test-random"]
        params = {k: np.asarray(v) for k, v in pk.init_random(cfg, seed=1).items()}
        rng = np.random.default_rng(0)
        mel = rng.standard_normal((2, 64, 80)).astype(np.float32)
        toks, n = pk.tdt_greedy_decode(params, cfg, mel, max_symbols=32)
        toks, n = np.asarray(toks), np.asarray(n)
        assert toks.shape == (2, 32)
        assert np.all(n <= 32)
        # emitted tokens are in-vocab and non-blank
        for b in range(2):
            assert np.all(toks[b, : n[b]] != cfg.blank_id)
            assert np.all(toks[b, : n[b]] < cfg.vocab_size)

    def test_time_always_advances(self):
        """Even with a degenerate joint preferring duration 0 + blank, the
        decode must make progress and terminate."""
        cfg = pk.CONFIGS["test-random"]
        params = pk.init_random(cfg, seed=2)
        # Force duration logits to always pick duration 0 and token = blank.
        params["joint.out.b"] = params["joint.out.b"].copy()
        params["joint.out.b"][cfg.blank_id] = 50.0  # blank wins
        params["joint.out.b"][cfg.vocab_size] = 50.0  # duration 0 wins
        rng = np.random.default_rng(1)
        mel = rng.standard_normal((1, 32, 80)).astype(np.float32)
        toks, n = pk.tdt_greedy_decode(params, cfg, mel, max_symbols=16)
        assert int(np.asarray(n)[0]) == 0  # nothing emitted, but it returned
