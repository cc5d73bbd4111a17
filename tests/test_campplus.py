"""CAM++ speaker-embedding network: structure, masking, and import walker."""

import numpy as np
import pytest

from crispy_tpu.models.campplus import (
    CONFIGS, CamPPlusConfig, CamPPlusModel, forward, from_initializers,
    init_random, param_spec,
)

CFG = CONFIGS["test-random"]


@pytest.fixture(scope="module")
def model():
    return CamPPlusModel(init_random(CFG, seed=0), CFG)


def _tone(freqs, secs, seed=0, sr=16000):
    t = np.arange(int(secs * sr)) / sr
    rng = np.random.default_rng(seed)
    x = sum(0.2 * np.sin(2 * np.pi * f * t + rng.uniform(0, 6)) for f in freqs)
    return (x + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)


def test_embedding_shape_and_determinism(model):
    segs = [_tone([220, 440], 2.0), _tone([300, 900], 1.3, seed=1)]
    e1 = model(segs)
    e2 = model(segs)
    assert e1.shape == (2, CFG.embedding_size)
    assert np.all(np.isfinite(e1))
    np.testing.assert_array_equal(e1, e2)


def test_batching_matches_single(model):
    """Padding+masking: a chunk embeds the same alone and in a batch."""
    a, b = _tone([220], 1.0), _tone([500, 1500], 3.5, seed=2)
    together = model([a, b])
    np.testing.assert_allclose(model([a])[0], together[0], rtol=0, atol=2e-5)
    np.testing.assert_allclose(model([b])[0], together[1], rtol=0, atol=2e-5)


def test_padding_invariance(model):
    """Extra frames beyond n_valid must not change the embedding (masking)."""
    import jax.numpy as jnp

    from crispy_tpu.dsp.fbank import fbank

    a = _tone([330, 660], 1.5)
    feats = fbank(jnp.asarray(a[None, :]), CFG.feat_dim)
    n = jnp.asarray([feats.shape[1]], dtype=jnp.int32)
    short = forward(model.params, CFG, feats, n)
    longer = forward(
        model.params, CFG, jnp.pad(feats, ((0, 0), (0, 64), (0, 0))), n)
    np.testing.assert_allclose(np.asarray(short), np.asarray(longer),
                               rtol=0, atol=2e-5)


def test_distinct_inputs_distinct_embeddings(model):
    e = model([_tone([220], 2.0), _tone([1200, 2400], 2.0, seed=3)])
    assert np.linalg.norm(e[0] - e[1]) > 1e-3


def test_long_chunk_truncates(model):
    out = model([_tone([440], 6.0)])  # > MAX_CHUNK_SECONDS
    assert out.shape == (1, CFG.embedding_size) and np.all(np.isfinite(out))


def test_param_spec_channel_math():
    """Dense growth / transit halving must land on consistent widths."""
    cfg = CamPPlusConfig()  # voxceleb-size
    spec = {name: (kind, shape) for name, kind, shape in param_spec(cfg)}
    assert spec["tdnn.conv"][1] == (5, 32 * 10, 128)
    assert spec["block0.0.bn1"][1] == (128,)
    assert spec["transit0.fc"][1] == (1, 128 + 12 * 32, (128 + 12 * 32) // 2)
    assert spec["emb.fc"][1][1] == 2 * ((((128 + 384) // 2 + 768) // 2 + 512) // 2)
    assert spec["emb.fc"][1][2] == 512


def _simulated_export(cfg, seed=7):
    """Initializer list as a torch ONNX export would order it."""
    rng = np.random.default_rng(seed)
    inits, expected = [], {}
    for name, kind, shape in param_spec(cfg):
        if kind == "bn":
            c = shape[0]
            gamma = rng.uniform(0.5, 1.5, c).astype(np.float32)
            beta = rng.standard_normal(c).astype(np.float32)
            mean = rng.standard_normal(c).astype(np.float32)
            var = rng.uniform(0.2, 2.0, c).astype(np.float32)
            inits += [gamma, beta, mean, var]
            scale = gamma / np.sqrt(var + 1e-5)
            expected[f"{name}.g"] = scale
            expected[f"{name}.b"] = beta - mean * scale
        elif kind == "conv2d":
            kh, kw, cin, cout = shape
            w = rng.standard_normal((cout, cin, kh, kw)).astype(np.float32)
            inits.append(w)
            expected[f"{name}.w"] = w.transpose(2, 3, 1, 0)
        else:
            k, cin, cout = shape
            w = rng.standard_normal((cout, cin, k)).astype(np.float32)
            inits.append(w)
            expected[f"{name}.w"] = w.transpose(2, 1, 0)
            if kind == "conv1d_b":
                b = rng.standard_normal(cout).astype(np.float32)
                inits.append(b)
                expected[f"{name}.b"] = b
    return inits, expected


def test_import_walker_round_trip():
    inits, expected = _simulated_export(CFG)
    params = from_initializers(inits, CFG)
    assert set(params) == set(expected)
    for k in expected:
        np.testing.assert_allclose(params[k], expected[k], rtol=1e-6, atol=1e-6)
    # imported params run end-to-end
    out = CamPPlusModel(params, CFG)([_tone([440], 1.0)])
    assert out.shape == (1, CFG.embedding_size) and np.all(np.isfinite(out))


def test_import_walker_rejects_mismatch():
    inits, _ = _simulated_export(CFG)
    with pytest.raises(ValueError, match="expected shape"):
        from_initializers([inits[0][:, :, :1, :]] + inits[1:], CFG)
    with pytest.raises(ValueError, match="trailing"):
        from_initializers(inits + [np.zeros(3, np.float32)], CFG)
    with pytest.raises(ValueError, match="exhausted"):
        from_initializers(inits[:-1], CFG)


def test_diarization_with_campplus_embeddings():
    """The model plugs into diarize() as embedding_fn (call-shape contract)."""
    from crispy_tpu.engine.diarization import diarize

    m = CamPPlusModel(init_random(CFG, seed=1), CFG)
    sr = 16000
    a = _tone([200, 400], 3.0, seed=4)
    gap = np.zeros(sr // 2, np.float32)
    b = _tone([900, 1800], 3.0, seed=5)
    audio = np.concatenate([a, gap, b, gap, a[: 2 * sr]])
    segs = diarize(audio, sr, max_speakers=3, embedding_fn=m)
    assert segs and all(s.speaker.startswith("Speaker") for s in segs)


def test_from_device_matches_host_batch(model):
    """One-upload path: chunks sliced on-device from a flat i16 recording
    match the host path fed the identical dequantized samples."""
    import jax
    import jax.numpy as jnp

    sr = 16000
    audio = np.concatenate([_tone([220, 1200], 3.0, seed=1),
                            _tone([500, 2400], 2.5, seed=2),
                            _tone([300, 900], 4.0, seed=3)])
    pad_to = len(audio) + sr  # trailing slack so a 4 s slice never clips
    q = np.zeros(pad_to, np.int16)
    q[:len(audio)] = np.clip(np.round(audio * 32768.0), -32768, 32767)
    deq = q.astype(np.float32) / 32768.0
    ranges = [(0, 3 * sr), (3 * sr, int(5.5 * sr)), (int(5.5 * sr), len(audio))]

    host = model([deq[a:b] for a, b in ranges])
    dev = model.from_device(jax.device_put(jnp.asarray(q)), ranges)
    assert dev.shape == host.shape
    np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-5)
