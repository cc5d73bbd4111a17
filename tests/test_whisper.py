"""Whisper JAX model: architecture parity vs transformers (random weights,
fully offline), KV-cache correctness, loaders, tokenizer, end-to-end shape."""

import struct

import numpy as np
import pytest

from crispy_tpu.models.whisper import WhisperModel
from crispy_tpu.models.whisper.model import CONFIGS, decode_logits, encode, greedy_decode
from crispy_tpu.models.whisper.tokenizer import LANGUAGES, WhisperTokenizer
from crispy_tpu.models.whisper.weights import from_hf_state_dict, init_random, load_ggml


@pytest.fixture(scope="module")
def hf_pair():
    """Tiny random transformers Whisper + our mapped params."""
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig as HFConfig, WhisperForConditionalGeneration

    hf_cfg = HFConfig(
        vocab_size=207, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=1500, max_target_positions=448,
        pad_token_id=206, bos_token_id=205, eos_token_id=206,
        decoder_start_token_id=205, suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params, cfg = from_hf_state_dict(sd)
    return hf, params, cfg


class TestHFParity:
    def test_encoder_matches_transformers(self, hf_pair):
        import torch

        hf, params, cfg = hf_pair
        rng = np.random.default_rng(0)
        mel = rng.standard_normal((2, 80, 3000)).astype(np.float32)
        with torch.no_grad():
            want = hf.model.encoder(torch.tensor(mel)).last_hidden_state.numpy()
        got = np.asarray(encode(params, cfg, mel))
        np.testing.assert_allclose(got, want, atol=3e-3)

    def test_decoder_logits_match_transformers(self, hf_pair):
        import torch

        hf, params, cfg = hf_pair
        rng = np.random.default_rng(1)
        mel = rng.standard_normal((2, 80, 3000)).astype(np.float32)
        toks = rng.integers(0, 200, size=(2, 7)).astype(np.int32)
        with torch.no_grad():
            want = hf(
                input_features=torch.tensor(mel),
                decoder_input_ids=torch.tensor(toks.astype(np.int64)),
            ).logits.numpy()
        audio = encode(params, cfg, mel)
        got = np.asarray(decode_logits(params, cfg, toks, audio))
        np.testing.assert_allclose(got, want, atol=3e-2)  # logits scale ~10

    def test_greedy_matches_transformers_generate(self, hf_pair):
        import torch

        hf, params, cfg = hf_pair
        rng = np.random.default_rng(2)
        mel = rng.standard_normal((1, 80, 3000)).astype(np.float32)
        prompt = np.array([[1, 2]], np.int32)
        with torch.no_grad():
            want = hf.generate(
                input_features=torch.tensor(mel),
                decoder_input_ids=torch.tensor(prompt.astype(np.int64)),
                max_new_tokens=10, do_sample=False, num_beams=1,
                eos_token_id=206, pad_token_id=206, use_cache=True,
            ).numpy()[0]
        toks, lengths = greedy_decode(params, cfg, mel, prompt, max_new=10, eot=206)
        got = np.asarray(toks)[0]
        n = min(len(want) - 2, int(np.asarray(lengths)[0]) + 1, 10)
        np.testing.assert_array_equal(got[:n], want[2: 2 + n])


class TestKVCache:
    def test_cached_greedy_consistent_with_teacher_forcing(self):
        """Each greedy token must equal the argmax of full-sequence logits at
        that position — validates the KV cache exactly."""
        m = WhisperModel.random("test-random", seed=3)
        rng = np.random.default_rng(3)
        mel = rng.standard_normal((2, 80, 3000)).astype(np.float32)
        prompt = np.tile(np.array([[998, 997]], np.int32), (2, 1))
        toks, _ = greedy_decode(m.params, m.cfg, mel, prompt, max_new=8, eot=999)
        toks = np.asarray(toks)
        audio = encode(m.params, m.cfg, mel)
        full = np.concatenate([prompt, toks], axis=1)
        logits = np.asarray(decode_logits(m.params, m.cfg, full[:, :-1], audio))
        want = logits[:, 1:, :].argmax(-1)  # predictions for positions 2..
        # compare until first eot per row
        for b in range(2):
            for t in range(toks.shape[1] - 1):
                if toks[b, t] == 999:
                    break
                assert toks[b, t + 1] == want[b, t + 1], (b, t)


class TestGgml:
    def test_roundtrip_synthetic_file(self, tmp_path):
        """Write a minimal ggml container and parse it back."""
        cfg = CONFIGS["test-random"]
        params = init_random(cfg, seed=1)
        vocab = [f"tok{i}".encode() for i in range(cfg.n_vocab)]
        path = tmp_path / "ggml-test.bin"
        # serialize (the inverse of load_ggml, used only for testing)
        import numpy as np

        def ggml_name(ours):
            from crispy_tpu.models.whisper.weights import _GGML_STATIC, _map_ggml_name
            inv = {v: k for k, v in _GGML_STATIC.items()}
            if ours in inv:
                return inv[ours], False
            # brute-force search through block names
            for side, pre in (("encoder", "enc"), ("decoder", "dec")):
                for i in range(2):
                    for g, o in [
                        ("attn.query.weight", f"attn.q.w"), ("attn.query.bias", "attn.q.b"),
                        ("attn.key.weight", "attn.k.w"), ("attn.value.weight", "attn.v.w"),
                        ("attn.value.bias", "attn.v.b"), ("attn.out.weight", "attn.out.w"),
                        ("attn.out.bias", "attn.out.b"), ("attn_ln.weight", "ln1.g"),
                        ("attn_ln.bias", "ln1.b"),
                        ("cross_attn.query.weight", "cross.q.w"), ("cross_attn.query.bias", "cross.q.b"),
                        ("cross_attn.key.weight", "cross.k.w"), ("cross_attn.value.weight", "cross.v.w"),
                        ("cross_attn.value.bias", "cross.v.b"), ("cross_attn.out.weight", "cross.out.w"),
                        ("cross_attn.out.bias", "cross.out.b"), ("cross_attn_ln.weight", "lnx.g"),
                        ("cross_attn_ln.bias", "lnx.b"),
                        ("mlp.0.weight", "mlp.fc1.w"), ("mlp.0.bias", "mlp.fc1.b"),
                        ("mlp.2.weight", "mlp.fc2.w"), ("mlp.2.bias", "mlp.fc2.b"),
                        ("mlp_ln.weight", "ln2.g"), ("mlp_ln.bias", "ln2.b"),
                    ]:
                        if ours == f"{pre}.{i}.{o}":
                            return f"{side}.blocks.{i}.{g}", g.endswith("weight") and ".w" in o
            return None, False

        with open(path, "wb") as f:
            f.write(struct.pack("<I", 0x67676D6C))
            f.write(struct.pack("<11i", cfg.n_vocab, cfg.n_audio_ctx, cfg.n_audio_state,
                                cfg.n_audio_head, cfg.n_audio_layer, cfg.n_text_ctx,
                                cfg.n_text_state, cfg.n_text_head, cfg.n_text_layer,
                                cfg.n_mels, 1))
            filters = np.arange(cfg.n_mels * 201, dtype=np.float32).reshape(cfg.n_mels, 201)
            f.write(struct.pack("<2i", cfg.n_mels, 201))
            f.write(filters.tobytes())
            f.write(struct.pack("<i", len(vocab)))
            for tok in vocab:
                f.write(struct.pack("<i", len(tok)))
                f.write(tok)
            for ours, arr in params.items():
                gname, transposed = ggml_name(ours)
                if gname is None:
                    continue
                data = arr.T if transposed else arr
                if ours.endswith("conv1.w") or ours.endswith("conv2.w"):
                    # real whisper.cpp files store conv weights in torch's
                    # [out, in, k]; ours is [k, in, out]
                    data = arr.transpose(2, 1, 0)
                dims = tuple(reversed(data.shape))
                f.write(struct.pack("<3i", len(dims), len(gname.encode()), 0))
                f.write(struct.pack(f"<{len(dims)}i", *dims))
                f.write(gname.encode())
                f.write(np.ascontiguousarray(data, np.float32).tobytes())

        got, gcfg, gvocab, gfilters = load_ggml(path)
        assert gcfg.n_audio_state == cfg.n_audio_state
        assert gvocab[5] == b"tok5"
        np.testing.assert_array_equal(gfilters, filters)
        for k in got:
            np.testing.assert_allclose(got[k], params[k], atol=1e-6, err_msg=k)
        # every mappable param round-tripped
        assert len(got) == len(params)


class TestTokenizer:
    def test_special_layout_multilingual(self):
        t = WhisperTokenizer(vocab=[b""] * 51865)
        assert (t.eot, t.sot) == (50257, 50258)
        assert t.transcribe == 50359 and t.no_timestamps == 50363
        assert t.timestamp_begin == 50364
        assert t.sot_sequence("de") == [50258, 50259 + LANGUAGES.index("de"), 50359, 50363]

    def test_special_layout_v3(self):
        """large-v3 (n_vocab 51866) adds 'yue', shifting post-language ids +1
        (whisper.cpp v3 layout; ADVICE r1 high)."""
        t = WhisperTokenizer(vocab=[b""] * 51866)
        assert t.num_languages == 100
        assert (t.eot, t.sot) == (50257, 50258)
        assert t.translate == 50359 and t.transcribe == 50360
        assert t.no_speech == 50363 and t.no_timestamps == 50364
        assert t.timestamp_begin == 50365
        assert t.sot_sequence("yue") == [50258, 50259 + 99, 50360, 50364]
        # ggml-hparams path pins the same layout without relying on vocab len
        t2 = WhisperTokenizer.from_ggml_vocab([b""] * 51866, 51866)
        assert t2.transcribe == 50360 and t2.timestamp_begin == 50365
        t3 = WhisperTokenizer.from_ggml_vocab([b""] * 51865, 51865)
        assert t3.transcribe == 50359 and t3.timestamp_begin == 50364

    def test_decode_skips_specials_and_timestamps(self):
        t = WhisperTokenizer(vocab=[b"hel", b"lo", b" wor", b"ld"] + [b""] * (51865 - 4))
        ids = [50258, 0, 1, 2, 3, 50364 + 50, 50257]
        assert t.decode(ids) == "hello world"
        assert "<|1.00|>" in t.decode(ids, with_timestamps=True)

    def test_encode_roundtrip_greedy(self):
        t = WhisperTokenizer(vocab=[b"ab", b"a", b"b", b"c"] + [b""] * 60000)
        assert t.encode("abc") == [0, 3]
        assert t.decode(t.encode("abab")) == "abab"


def test_transcribe_chunks_end_to_end_shapes():
    m = WhisperModel.random("test-random", seed=5)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    texts = m.transcribe_chunks(audio, max_new=6)
    assert len(texts) == 2
    assert all(isinstance(t, str) for t in texts)


class TestTimestamps:
    def test_parse_timestamp_segments(self):
        tok = WhisperTokenizer(vocab=[b"hi", b" there", b" yo"] + [b""] * 60000)
        tb = tok.timestamp_begin
        # <|0.00|> hi there <|1.00|> <|1.50|> yo <|2.00|>
        ids = [50258, tb, 0, 1, tb + 50, tb + 75, 2, tb + 100, 50257]
        from crispy_tpu.models.whisper import parse_timestamp_segments

        segs = parse_timestamp_segments(ids, tok, offset=10.0, chunk_dur=30.0)
        assert segs == [(10.0, 11.0, "hi there"), (11.5, 12.0, "yo")]

    def test_parse_without_timestamps_falls_back_whole_chunk(self):
        tok = WhisperTokenizer(vocab=[b"hello"] + [b""] * 60000)
        from crispy_tpu.models.whisper import parse_timestamp_segments

        segs = parse_timestamp_segments([50258, 0, 50257], tok, 5.0, 30.0)
        assert segs == [(5.0, 35.0, "hello")]

    def test_parse_unclosed_segment_uses_chunk_end(self):
        tok = WhisperTokenizer(vocab=[b"tail"] + [b""] * 60000)
        tb = tok.timestamp_begin
        from crispy_tpu.models.whisper import parse_timestamp_segments

        segs = parse_timestamp_segments([tb + 100, 0], tok, 0.0, 30.0)
        assert segs == [(2.0, 30.0, "tail")]

    def test_end_to_end_timestamped_chunk(self):
        m = WhisperModel.random("test-random", seed=7)
        rng = np.random.default_rng(0)
        audio = (0.1 * rng.standard_normal(16000)).astype(np.float32)
        segs = m.transcribe_chunk_with_timestamps(audio, offset_seconds=30.0, max_new=6)
        for s, e, t in segs:
            assert 30.0 <= s <= e <= 60.5 and isinstance(t, str)


# ---------------------------------------------------------------------------
# Temperature fallback / quality gates
# ---------------------------------------------------------------------------

def test_sample_decode_temp0_matches_greedy():
    import jax
    import jax.numpy as jnp

    from crispy_tpu.models.whisper import WhisperModel
    from crispy_tpu.models.whisper.model import greedy_decode, sample_decode

    m = WhisperModel.random("test-random", seed=0)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    from crispy_tpu.dsp.mel import log_mel_spectrogram

    mel = log_mel_spectrogram(jnp.asarray(audio), n_mels=m.cfg.n_mels,
                              pad_to_chunk=True)
    prompt = jnp.asarray(np.tile(np.array(m.tokenizer.sot_sequence(), np.int32), (2, 1)))
    t_g, l_g = greedy_decode(m.params, m.cfg, mel, prompt, max_new=16,
                             eot=m.tokenizer.eot)
    t_s, l_s, lp, ns = sample_decode(
        m.params, m.cfg, mel, prompt, jnp.float32(0.0), jax.random.PRNGKey(0),
        jnp.int32(0), max_new=16, eot=m.tokenizer.eot)
    np.testing.assert_array_equal(np.asarray(t_g), np.asarray(t_s))
    np.testing.assert_array_equal(np.asarray(l_g), np.asarray(l_s))
    assert np.all(np.asarray(lp) <= 0.0)
    assert np.all((np.asarray(ns) >= 0) & (np.asarray(ns) <= 1))


def test_sample_decode_temperature_deterministic_per_key():
    import jax
    import jax.numpy as jnp

    from crispy_tpu.models.whisper import WhisperModel
    from crispy_tpu.models.whisper.model import sample_decode
    from crispy_tpu.dsp.mel import log_mel_spectrogram

    m = WhisperModel.random("test-random", seed=0)
    audio = (0.1 * np.sin(np.arange(16000) / 20)).astype(np.float32)[None]
    mel = log_mel_spectrogram(jnp.asarray(audio), n_mels=m.cfg.n_mels,
                              pad_to_chunk=True)
    prompt = jnp.asarray(np.array(m.tokenizer.sot_sequence(), np.int32))[None]
    args = (m.params, m.cfg, mel, prompt)
    t1, *_ = sample_decode(*args, jnp.float32(1.0), jax.random.PRNGKey(7),
                           jnp.int32(0), max_new=16, eot=m.tokenizer.eot)
    t2, *_ = sample_decode(*args, jnp.float32(1.0), jax.random.PRNGKey(7),
                           jnp.int32(0), max_new=16, eot=m.tokenizer.eot)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_prefill_matches_teacher_forced_and_clamps_context():
    """Batched prompt prefill (one pass) must agree with decode_logits, the
    first generated token must be argmax of the last prompt position, and a
    near-context-length prompt must clamp max_new instead of silently
    reading out-of-range positional embeddings (ADVICE r1)."""
    import jax.numpy as jnp

    from crispy_tpu.models.whisper import WhisperModel
    from crispy_tpu.models.whisper.model import decode_logits, encode, greedy_decode
    from crispy_tpu.dsp.mel import log_mel_spectrogram

    m = WhisperModel.random("test-random", seed=3)
    rng = np.random.default_rng(1)
    audio_np = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    mel = log_mel_spectrogram(jnp.asarray(audio_np), n_mels=m.cfg.n_mels,
                              pad_to_chunk=True)
    feats = encode(m.params, m.cfg, mel)
    # a long-ish prompt (simulating initial_prompt conditioning)
    prompt_np = rng.integers(0, 900, size=(2, 37)).astype(np.int32)
    prompt = jnp.asarray(prompt_np)
    tf_logits = decode_logits(m.params, m.cfg, prompt, feats)
    want_first = np.argmax(np.asarray(tf_logits)[:, -1], axis=-1)
    toks, _ = greedy_decode(m.params, m.cfg, feats, prompt, max_new=8, eot=999)
    np.testing.assert_array_equal(np.asarray(toks)[:, 0], want_first)

    # prompt of length n_text_ctx-2: max_new clamps to 2, no crash
    long_prompt = jnp.asarray(rng.integers(0, 900, size=(1, m.cfg.n_text_ctx - 2)).astype(np.int32))
    toks2, lens2 = greedy_decode(m.params, m.cfg, feats[:1], long_prompt, max_new=224, eot=999)
    assert np.asarray(toks2).shape[1] == 2


def test_compression_ratio_flags_repetition():
    from crispy_tpu.models.whisper import compression_ratio

    assert compression_ratio("") == 0.0
    assert compression_ratio("the quick brown fox jumps over the lazy dog") < 2.0
    assert compression_ratio("again again again " * 40) > 2.4


def test_transcribe_chunks_robust_passes_greedy_when_confident():
    from crispy_tpu.models.whisper import WhisperModel

    m = WhisperModel.random("test-random", seed=0)
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    greedy = m.transcribe_chunks(audio, max_new=16)
    robust = m.transcribe_chunks_robust(
        audio, max_new=16, temperatures=(0.0, 1.0),
        compression_ratio_threshold=1e9, logprob_threshold=-1e9)
    assert robust == greedy  # gates disabled → first (greedy) pass accepted


def test_transcribe_chunks_robust_falls_back_on_low_confidence():
    from crispy_tpu.models.whisper import WhisperModel

    m = WhisperModel.random("test-random", seed=0)
    rng = np.random.default_rng(2)
    audio = rng.standard_normal((1, 16000)).astype(np.float32) * 0.1
    # impossible logprob bar → every temperature fails → last one is kept
    out = m.transcribe_chunks_robust(
        audio, max_new=16, temperatures=(0.0, 0.5),
        logprob_threshold=float("inf"), no_speech_threshold=2.0)
    assert len(out) == 1 and isinstance(out[0], str)


def test_transcribe_chunks_robust_no_speech_gate():
    from crispy_tpu.models.whisper import WhisperModel

    m = WhisperModel.random("test-random", seed=0)
    rng = np.random.default_rng(3)
    audio = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    # ns threshold below any prob + unreachable logprob bar → silence
    out = m.transcribe_chunks_robust(
        audio, max_new=16, temperatures=(0.0,),
        logprob_threshold=float("inf"), no_speech_threshold=-1.0)
    assert out == ["", ""]


def test_initial_prompt_conditioning():
    """<|startofprev|> + prompt tokens precede the SOT sequence and change
    the decode; the window caps at n_text_ctx//2 - 1 prompt tokens."""
    from crispy_tpu.models.whisper import WhisperModel

    m = WhisperModel.random("test-random", seed=0)
    tok = m.tokenizer
    ids = m._prompt_ids("en", "hello there")
    assert ids[0] == tok.sot_prev
    assert ids[-len(tok.sot_sequence()):] == tok.sot_sequence()
    assert len(ids) <= 1 + (m.cfg.n_text_ctx // 2 - 1) + len(tok.sot_sequence())
    assert m._prompt_ids("en", None) == tok.sot_sequence()

    rng = np.random.default_rng(4)
    audio = rng.standard_normal((1, 16000)).astype(np.float32) * 0.1
    primed = m.transcribe_chunks(audio, max_new=12, initial_prompt="hello there")
    assert len(primed) == 1 and isinstance(primed[0], str)


def test_beam1_matches_greedy():
    import jax.numpy as jnp

    from crispy_tpu.models.whisper import WhisperModel
    from crispy_tpu.models.whisper.model import beam_decode, greedy_decode
    from crispy_tpu.dsp.mel import log_mel_spectrogram

    m = WhisperModel.random("test-random", seed=0)
    rng = np.random.default_rng(5)
    audio = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    mel = log_mel_spectrogram(jnp.asarray(audio), n_mels=m.cfg.n_mels,
                              pad_to_chunk=True)
    prompt = jnp.asarray(np.tile(np.array(m.tokenizer.sot_sequence(), np.int32), (2, 1)))
    tg, lg = greedy_decode(m.params, m.cfg, mel, prompt, max_new=16, eot=m.tokenizer.eot)
    tb, lb, _ = beam_decode(m.params, m.cfg, mel, prompt, beam=1, max_new=16,
                            eot=m.tokenizer.eot)
    np.testing.assert_array_equal(np.asarray(tg), np.asarray(tb))
    np.testing.assert_array_equal(np.asarray(lg), np.asarray(lb))


def test_beam_search_finds_no_worse_sequences():
    """With eot freezing, the beam set always contains the greedy path, so
    the best beam's raw cumulative logprob is >= greedy's."""
    import jax
    import jax.numpy as jnp

    from crispy_tpu.models.whisper import WhisperModel
    from crispy_tpu.models.whisper.model import beam_decode, sample_decode
    from crispy_tpu.dsp.mel import log_mel_spectrogram

    m = WhisperModel.random("test-random", seed=0)
    rng = np.random.default_rng(6)
    audio = rng.standard_normal((1, 16000)).astype(np.float32) * 0.1
    mel = log_mel_spectrogram(jnp.asarray(audio), n_mels=m.cfg.n_mels,
                              pad_to_chunk=True)
    prompt = jnp.asarray(np.array(m.tokenizer.sot_sequence(), np.int32))[None]
    _, lg, lp_g, _ = sample_decode(m.params, m.cfg, mel, prompt, jnp.float32(0.0),
                                   jax.random.PRNGKey(0), jnp.int32(0),
                                   max_new=12, eot=m.tokenizer.eot)
    tb, lb, lp_b = beam_decode(m.params, m.cfg, mel, prompt, beam=3, max_new=12,
                               eot=m.tokenizer.eot)
    # compare length-normalized scores (the ranking beam search optimizes)
    g = float(np.asarray(lp_g)[0]) / (int(np.asarray(lg)[0]) + 1)
    b = float(np.asarray(lp_b)[0]) / (int(np.asarray(lb)[0]) + 1)
    assert b >= g - 1e-4
    assert np.asarray(tb).shape == (1, 12)


def test_transcribe_chunks_beam_option():
    from crispy_tpu.models.whisper import WhisperModel

    m = WhisperModel.random("test-random", seed=0)
    rng = np.random.default_rng(7)
    audio = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    out = m.transcribe_chunks(audio, max_new=10, beam=3)
    assert len(out) == 2 and all(isinstance(s, str) for s in out)
