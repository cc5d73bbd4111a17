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
