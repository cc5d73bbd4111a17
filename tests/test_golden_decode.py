"""Golden decode fixtures: pinned token sequences under deterministic
weights + deterministic audio (BASELINE config 4's offline analog — real
checkpoints are not downloadable in this environment, so the decode math
itself is pinned; any change to the mel frontend, encoder, KV cache,
prefill, greedy/beam policy, or tokenizer layout shifts these tokens)."""

import numpy as np
import pytest


def _fixture():
    import jax.numpy as jnp

    from crispy_tpu.dsp.mel import log_mel_spectrogram
    from crispy_tpu.models.whisper import WhisperModel

    m = WhisperModel.random("test-random", seed=42)
    t = np.arange(32000) / 16000.0
    audio = np.stack([
        (0.3 * np.sin(2 * np.pi * 220 * t) + 0.05 * np.sin(2 * np.pi * 3 * t)).astype(np.float32),
        (0.2 * np.sin(2 * np.pi * 440 * t) * np.exp(-t / 1.5)).astype(np.float32),
    ])
    mel = log_mel_spectrogram(jnp.asarray(audio), n_mels=m.cfg.n_mels, pad_to_chunk=True)
    prompt = jnp.asarray(np.tile(np.array([m.cfg.sot], np.int32), (2, 1)))
    return m, mel, prompt


GOLDEN_GREEDY = [
    [451, 26, 937, 583, 583, 937, 429, 429, 429, 429, 429, 429],
    [451, 26, 937, 583, 583, 583, 583, 706, 429, 429, 429, 429],
]
GOLDEN_BEAM3 = [
    [59, 97, 522, 97, 429, 166, 429, 429, 429, 429, 429, 429],
    [59, 97, 522, 97, 429, 429, 429, 429, 429, 429, 429, 429],
]


def test_greedy_decode_golden_tokens():
    from crispy_tpu.models.whisper.model import greedy_decode

    m, mel, prompt = _fixture()
    toks, _ = greedy_decode(m.params, m.cfg, mel, prompt, max_new=24, eot=m.cfg.eot)
    np.testing.assert_array_equal(np.asarray(toks)[:, :12], GOLDEN_GREEDY)


def test_beam_decode_golden_tokens():
    from crispy_tpu.models.whisper.model import beam_decode

    m, mel, prompt = _fixture()
    toks, _, _ = beam_decode(m.params, m.cfg, mel, prompt, beam=3, max_new=24,
                             eot=m.cfg.eot)
    np.testing.assert_array_equal(np.asarray(toks)[:, :12], GOLDEN_BEAM3)


def test_sample_decode_temp0_golden_matches_greedy():
    import jax

    from crispy_tpu.models.whisper.model import sample_decode

    m, mel, prompt = _fixture()
    toks, _, _, _ = sample_decode(m.params, m.cfg, mel, prompt,
                                  np.float32(0.0), jax.random.PRNGKey(0),
                                  np.int32(0), max_new=24, eot=m.cfg.eot)
    np.testing.assert_array_equal(np.asarray(toks)[:, :12], GOLDEN_GREEDY)


def test_kv_cache_default_dtype_bf16(monkeypatch):
    """The KV cache stores bf16 by default (the decode step is HBM-bound on
    cache reads; measured 1.55x on chip) with CRISPY_WHISPER_KV=f32 as the
    opt-out. Guard both, so an accidental upcast anywhere in the cache
    plumbing shows up as a dtype flip here rather than a silent 1.5x
    regression on the chip."""
    import jax
    import jax.numpy as jnp

    from crispy_tpu.models.whisper import WhisperModel
    from crispy_tpu.models.whisper.model import _init_cache

    m = WhisperModel.random("test-random", seed=0)
    audio = jnp.zeros((1, 8, m.cfg.n_audio_state), jnp.float32)

    monkeypatch.delenv("CRISPY_WHISPER_KV", raising=False)
    shapes = jax.eval_shape(lambda a: _init_cache(m.params, m.cfg, a, 16), audio)
    assert all(s.dtype == jnp.bfloat16 for s in shapes)

    monkeypatch.setenv("CRISPY_WHISPER_KV", "f32")
    shapes = jax.eval_shape(lambda a: _init_cache(m.params, m.cfg, a, 16), audio)
    assert all(s.dtype == jnp.float32 for s in shapes)
