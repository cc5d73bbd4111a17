"""Denoiser training path: corpus-mode (device-resident) vs host data-gen.

The reference consumes pre-trained RNNoise weights it cannot produce
(nnnoiseless, src-tauri/Cargo.toml:41); this build owns training natively.
These tests pin the long-retrain machinery (training.build_corpus + the
fori_loop mega-step) added for single-CPU hosts driving a tunneled chip.
"""

import numpy as np

from crispy_tpu.dsp.rnnoise import training


def test_build_corpus_matches_synth_distribution():
    # the corpus stores int16; decoding must land within 1 LSB of the
    # float generators it wraps (same rng stream order as synth_batch)
    F, S = 10, 3
    c = training.build_corpus(seed=5, streams=S, F=F)
    assert c["clean"].shape == (S, F * training.FRAME)
    assert c["clean"].dtype == np.int16
    assert c["noise"].dtype == np.int16
    assert c["voiced"].shape == (S, F)
    rng = np.random.default_rng(5)
    clean_f, voiced = training._synth_clean(rng, S, F)
    assert np.allclose(c["clean"] / 32768.0, clean_f, atol=1.0 / 32768.0)
    assert np.array_equal(c["voiced"], voiced)
    # noise streams are max-normalized: every stream peaks near full scale
    peaks = np.abs(c["noise"]).max(axis=1)
    assert (peaks > 32767 * 0.9).all()


def test_corpus_mode_training_steps():
    model, losses = training.train_model(
        steps=4, batch_streams=2, frames=10,
        corpus_streams=4, steps_per_call=2, log_every=2)
    assert losses and all(np.isfinite(l) for l in losses)
    # quantized onto the reference grid: every weight is int8/256
    w = np.asarray(model.denoise_gru.w) * 256.0
    assert np.allclose(w, np.round(w), atol=1e-4)
    assert np.abs(w).max() <= 128
    g = training.snr_improvement(model, F=20)
    assert np.isfinite(g)


def test_corpus_mode_rounds_steps_up_to_whole_calls():
    # steps=3 with steps_per_call=2 must train 4 steps (no ragged tail
    # recompile); the model name records the rounded step count
    model, losses = training.train_model(
        steps=3, batch_streams=2, frames=10,
        corpus_streams=4, steps_per_call=2, log_every=1)
    assert model.name == "synthetic-4steps-corpus"
    assert len(losses) >= 1
