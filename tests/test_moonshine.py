"""Moonshine JAX model: parity vs transformers (random weights, offline),
KV-cache consistency, end-to-end decode."""

import numpy as np
import pytest

from crispy_tpu.models import moonshine as ms


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import MoonshineConfig as HFConfig, MoonshineForConditionalGeneration

    hf_cfg = HFConfig(
        vocab_size=207, hidden_size=64, intermediate_size=256,
        encoder_num_hidden_layers=2, decoder_num_hidden_layers=2,
        encoder_num_attention_heads=2, decoder_num_attention_heads=2,
        encoder_num_key_value_heads=2, decoder_num_key_value_heads=2,
        max_position_embeddings=512, decoder_start_token_id=205,
        eos_token_id=206, pad_token_id=206,
    )
    torch.manual_seed(0)
    hf = MoonshineForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params, cfg = ms.from_hf_state_dict(sd)
    cfg = ms.MoonshineConfig(**{**cfg.__dict__, "decoder_start": 205, "eos": 206})
    return hf, params, cfg


class TestHFParity:
    def test_encoder_matches(self, hf_pair):
        import torch

        hf, params, cfg = hf_pair
        rng = np.random.default_rng(0)
        audio = (0.1 * rng.standard_normal((2, 16000))).astype(np.float32)
        with torch.no_grad():
            want = hf.model.encoder(torch.tensor(audio)).last_hidden_state.numpy()
        got = np.asarray(ms.encode(params, cfg, audio))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=3e-3)

    def test_decoder_logits_match(self, hf_pair):
        import torch

        hf, params, cfg = hf_pair
        rng = np.random.default_rng(1)
        audio = (0.1 * rng.standard_normal((2, 16000))).astype(np.float32)
        toks = rng.integers(0, 200, size=(2, 6)).astype(np.int32)
        with torch.no_grad():
            want = hf(
                input_values=torch.tensor(audio),
                decoder_input_ids=torch.tensor(toks.astype(np.int64)),
            ).logits.numpy()
        feats = ms.encode(params, cfg, audio)
        got = np.asarray(ms.decode_logits(params, cfg, toks, feats))
        np.testing.assert_allclose(got, want, atol=3e-2)

    def test_greedy_matches_generate(self, hf_pair):
        import torch

        hf, params, cfg = hf_pair
        rng = np.random.default_rng(2)
        audio = (0.1 * rng.standard_normal((1, 16000))).astype(np.float32)
        with torch.no_grad():
            want = hf.generate(
                input_values=torch.tensor(audio), max_new_tokens=8,
                do_sample=False, num_beams=1,
            ).numpy()[0]
        toks, lengths = ms.greedy_decode(params, cfg, audio, max_new=8)
        got = np.asarray(toks)[0]
        n = min(len(want) - 1, 8)
        np.testing.assert_array_equal(got[:n], want[1: 1 + n])


class TestKVCache:
    def test_cached_greedy_consistent_with_teacher_forcing(self):
        m = ms.MoonshineModel.random(seed=4)
        rng = np.random.default_rng(4)
        audio = (0.1 * rng.standard_normal((2, 8000))).astype(np.float32)
        toks, _ = ms.greedy_decode(m.params, m.cfg, audio, max_new=6)
        toks = np.asarray(toks)
        feats = ms.encode(m.params, m.cfg, audio)
        full = np.concatenate(
            [np.full((2, 1), m.cfg.decoder_start, np.int32), toks], axis=1)
        logits = np.asarray(ms.decode_logits(m.params, m.cfg, full[:, :-1], feats))
        want = logits.argmax(-1)
        for b in range(2):
            for t in range(toks.shape[1] - 1):
                if toks[b, t] == m.cfg.eos:
                    break
                assert toks[b, t + 1] == want[b, t + 1], (b, t)


def test_transcribe_chunks_shapes():
    m = ms.MoonshineModel.random(seed=5)
    rng = np.random.default_rng(5)
    audio = (0.1 * rng.standard_normal((2, 8000))).astype(np.float32)
    texts = m.transcribe_chunks(audio, max_new=4)
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)
