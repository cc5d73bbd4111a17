"""Canary AED: KV-cache consistency + decode shapes (weight mapping pending
real NeMo exports; the FastConformer encoder is transformers-verified via
test_parakeet)."""

import numpy as np

from crispy_tpu.models import canary as cn


def test_cached_greedy_matches_teacher_forcing():
    cfg = cn.CONFIGS["test-random"]
    p = {k: np.asarray(v) for k, v in cn.init_random(cfg, seed=0).items()}
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 64, 80)).astype(np.float32)
    toks, _ = cn.greedy_decode(p, cfg, mel, max_new=6)
    toks = np.asarray(toks)
    feats = cn.encode(p, cfg, mel)
    full = np.concatenate([np.full((2, 1), cfg.bos, np.int32), toks], axis=1)
    logits = np.asarray(cn.decode_logits(p, cfg, full[:, :-1], feats))
    want = logits.argmax(-1)
    for b in range(2):
        for t in range(toks.shape[1] - 1):
            if toks[b, t] == cfg.eos:
                break
            assert toks[b, t + 1] == want[b, t + 1], (b, t)


def test_decode_shapes_and_eos_freeze():
    cfg = cn.CONFIGS["test-random"]
    p = cn.init_random(cfg, seed=1)
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((3, 48, 80)).astype(np.float32)
    toks, lengths = cn.greedy_decode(p, cfg, mel, max_new=5)
    toks, lengths = np.asarray(toks), np.asarray(lengths)
    assert toks.shape == (3, 5) and np.all(lengths <= 5)
    for b in range(3):
        after = toks[b, lengths[b]:]
        assert np.all(after == cfg.eos) or lengths[b] == 5


def test_greedy_decode_with_task_prompt():
    """Multi-token prompts prefill the KV cache; [bos] matches no-prompt."""
    import jax.numpy as jnp

    from crispy_tpu.models import canary as cn

    cfg = cn.CONFIGS["test-random"]
    p = {k: jnp.asarray(v) for k, v in cn.init_random(cfg, seed=0).items()}
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 64, cfg.encoder.n_mels)).astype(np.float32))
    t0, l0 = cn.greedy_decode(p, cfg, mel, max_new=12)
    bos = jnp.full((1, 1), cfg.bos, jnp.int32)
    t1, l1 = cn.greedy_decode(p, cfg, mel, max_new=12, prompt=bos)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    task = jnp.asarray([[cfg.bos, 5, 9, 11, 3]], jnp.int32)
    t2, l2 = cn.greedy_decode(p, cfg, mel, max_new=12, prompt=task)
    assert np.asarray(t2).shape == (1, 12)
    assert 0 <= int(np.asarray(l2)[0]) <= 12
