"""SenseVoice SAN-M encoder + CTC: structure, LFR, and the engine bundle."""

import json

import numpy as np
import pytest

from crispy_tpu.models.sensevoice import (
    CONFIGS, SenseVoiceConfig, ctc_greedy, ctc_logits, init_random, lfr,
)

CFG = CONFIGS["test-random"]


def _feats(B=2, T=97, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, T, CFG.feat_dim)).astype(np.float32))


def test_lfr_shapes_and_content():
    import jax.numpy as jnp

    x = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 12, 2))
    y = np.asarray(lfr(x, m=3, n=2))
    assert y.shape == (1, 6, 6)
    # FunASR left pad (m-1)//2 = 1 copy of frame 0: step 0 stacks
    # frames [0(pad), 0, 1]
    np.testing.assert_array_equal(y[0, 0], [0, 1, 0, 1, 2, 3])
    # step i covers source frames i*n-1 .. i*n+1: step 5 → frames 9,10,11
    np.testing.assert_array_equal(y[0, 5], [18, 19, 20, 21, 22, 23])


def test_ctc_logits_shape_and_prompt_positions():
    import jax.numpy as jnp

    p = {k: jnp.asarray(v) for k, v in init_random(CFG, seed=0).items()}
    feats = _feats()
    prompt = jnp.asarray([1, 2, 3, 4], jnp.int32)
    logits = ctc_logits(p, CFG, feats, prompt)
    T_out = -(-feats.shape[1] // CFG.lfr_n)
    assert logits.shape == (2, CFG.n_prompt + T_out, CFG.vocab_size)
    seqs = ctc_greedy(np.asarray(logits), CFG)
    assert len(seqs) == 2
    assert all(CFG.blank_id not in s for s in seqs)


def test_prompt_ids_change_output():
    import jax.numpy as jnp

    p = {k: jnp.asarray(v) for k, v in init_random(CFG, seed=0).items()}
    feats = _feats(B=1)
    l1 = np.asarray(ctc_logits(p, CFG, feats, jnp.asarray([1, 2, 3, 4], jnp.int32)))
    l2 = np.asarray(ctc_logits(p, CFG, feats, jnp.asarray([5, 6, 7, 8], jnp.int32)))
    assert np.abs(l1 - l2).max() > 1e-6  # prompts condition the encoder


def test_batch_row_independence():
    import jax.numpy as jnp

    p = {k: jnp.asarray(v) for k, v in init_random(CFG, seed=0).items()}
    feats = _feats(B=2, seed=3)
    prompt = jnp.asarray([0, 1, 2, 3], jnp.int32)
    both = np.asarray(ctc_logits(p, CFG, feats, prompt))
    solo = np.asarray(ctc_logits(p, CFG, feats[:1], prompt))
    np.testing.assert_allclose(both[0], solo[0], rtol=0, atol=1e-5)


def test_sensevoice_engine_from_prepared_bundle(tmp_path):
    from crispy_tpu.engine.transcription import load_engine
    from crispy_tpu.models.registry import ModelManager
    from crispy_tpu.models.spm import CONTROL, NORMAL, UNKNOWN, build_model_bytes

    mm = ModelManager(models_dir=tmp_path / "Models")
    bundle = mm.model_path("sense-voice-int8")
    bundle.mkdir(parents=True)
    np.savez(bundle / "params.npz", **init_random(CFG, seed=0))
    (bundle / "config.json").write_text(
        json.dumps({"config": "test-random", "prompt_ids": [1, 2, 3, 4]}))
    pieces = ["<unk>"] + [f"▁s{i}" for i in range(CFG.vocab_size - 3)] + ["<s>", "</s>"]
    types = [UNKNOWN] + [NORMAL] * (CFG.vocab_size - 3) + [CONTROL, CONTROL]
    (bundle / "tokenizer.model").write_bytes(build_model_bytes(pieces, types))

    eng = load_engine("sense-voice-int8", mm)
    sr = 16000
    t = np.arange(sr) / sr
    out = eng.transcribe_batch([(0.2 * np.sin(2 * np.pi * 500 * t)).astype(np.float32)])
    assert len(out) == 1 and isinstance(out[0], str)


def test_sensevoice_engine_requires_prepared_bundle(tmp_path):
    from crispy_tpu.engine.transcription import load_engine
    from crispy_tpu.models.registry import ModelManager

    mm = ModelManager(models_dir=tmp_path / "Models")
    mm.model_path("sense-voice-int8").mkdir(parents=True)
    # an empty bundle (no params.npz AND no .onnx) now fails as "missing
    # files", not NotImplementedError — the ONNX executor path handles the
    # catalog's real artifacts
    with pytest.raises(FileNotFoundError):
        load_engine("sense-voice-int8", mm)
