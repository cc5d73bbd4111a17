"""NS engine semantics: legacy models, streaming RNNoise, dispatch, file API
(reference: src-tauri/src/audio.rs:47-358)."""

import numpy as np
import pytest

from crispy_tpu.dsp.rnnoise import constants as C
from crispy_tpu.dsp.rnnoise import oracle
from crispy_tpu.dsp.rnnoise.weights import deterministic_test_model
from crispy_tpu.engine import denoiser as dn
from crispy_tpu.io import wav as wavio

FRAME = C.FRAME_SIZE


def speechlike(n, seed=0, f0=120.0, sr=48000):
    """Harmonic signal — pitch decisions are stable (pure noise hits pitch
    near-ties where equally-correct implementations diverge from the oracle)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    sig = sum((0.5 / k) * np.sin(2 * np.pi * f0 * k * t + 0.1 * k) for k in range(1, 8))
    sig += 0.03 * rng.standard_normal(n)
    return (0.4 * sig / np.max(np.abs(sig))).astype(np.float32)


def test_lcg_sequence_matches_reference_constants():
    rng = dn._Lcg()
    # First step from seed 0x1234abcd: s*1664525 + 1013904223 (mod 2^32).
    first = (0x1234ABCD * 1_664_525 + 1_013_904_223) % (1 << 32)
    n = rng.next_noise()
    assert rng.state == first
    assert -1.0 <= n <= 1.0


def test_dummy_passthrough_with_volume():
    p = dn.LegacyProcessor(48000, 48000, "dummy", volume=0.5)
    out = p.push_sample(0.8)
    assert out == [pytest.approx(0.4)]


def test_noisy_adds_bounded_noise():
    p = dn.LegacyProcessor(48000, 48000, "noisy", volume=1.0)
    outs = [p.push_sample(0.0)[0] for _ in range(100)]
    assert all(abs(o) <= 0.05 + 1e-6 for o in outs)
    assert np.std(outs) > 0.01  # actually noisy


def test_rnnoise_first_frame_dropped(monkeypatch):
    model = deterministic_test_model()
    p = dn.RnnNoiseProcessor(48000, 48000, volume=1.0, model=model)
    rng = np.random.default_rng(0)
    x = (0.3 * rng.standard_normal(FRAME)).astype(np.float32)
    out = p.push_block(x)
    assert out is None or out.size == 0  # first frame swallowed
    out2 = p.push_block(x)
    assert out2 is not None and out2.size == FRAME


def test_rnnoise_streaming_matches_batch():
    """Streaming push_block over many frames == oracle stream (minus frame 1)."""
    model = deterministic_test_model()
    x = speechlike(6 * FRAME, seed=1)
    p = dn.RnnNoiseProcessor(48000, 48000, volume=1.0, model=model)
    outs = []
    for i in range(6):
        o = p.push_block(x[i * FRAME: (i + 1) * FRAME])
        if o is not None:
            outs.append(o)
    got = np.concatenate(outs)
    want = np.clip(oracle.denoise_stream(x, model), -1, 1)[FRAME:]
    np.testing.assert_allclose(got, want, atol=1.5e-4)


def test_rnnoise_input_resampling_44k():
    model = deterministic_test_model()
    p = dn.RnnNoiseProcessor(44100, 48000, volume=1.0, model=model)
    assert p.produced_rate_hz == 48000.0
    x = speechlike(4410, seed=2, sr=44100)  # 100 ms @44.1k
    total = 0
    for i in range(0, 4410, 441):
        o = p.push_block(x[i: i + 441])
        total += 0 if o is None else o.size
    # 100 ms → ~4800 samples at 48k → ~10 frames, minus the dropped first.
    assert total in (8 * FRAME, 9 * FRAME)


def test_ns_state_hot_swap_and_volume():
    st = dn.NsState("dummy", 48000, 48000, volume=0.8,
                    rnn_model=deterministic_test_model())
    assert st.push_sample(1.0) == [pytest.approx(0.8)]
    st.volume = 2.0  # clamped to 1.0 (audio.rs:344)
    assert st.volume == 1.0
    st.set_model("noisy")
    assert st.model_name == "noisy"
    st.set_model("rnnoise")
    assert st.produced_rate_hz == 48000.0


def test_ns_state_accepts_reference_rnnnoise_id():
    # the desktop app's shipped id is "rnnnoise" (triple n —
    # commands/ns_models.rs:28, audio.rs:548); it must select the real
    # denoiser, not silently degrade to the dummy passthrough
    st = dn.NsState("rnnnoise", 48000, 48000, volume=1.0,
                    rnn_model=deterministic_test_model())
    assert isinstance(st._proc, dn.RnnNoiseProcessor)


def test_denoise_file_roundtrip(tmp_path):
    model = deterministic_test_model()
    audio = np.stack([speechlike(4 * FRAME, seed=3), speechlike(4 * FRAME, seed=4, f0=200.0)], axis=1)
    src = wavio.write_wav(tmp_path / "in.wav", audio, 48000)
    info = dn.denoise_file(src, tmp_path / "out.wav", model=model)
    assert info["channels"] == 2
    out, sr = wavio.read_wav(tmp_path / "out.wav")
    assert sr == 48000
    assert out.shape[0] == 4 * FRAME
    want = np.clip(oracle.denoise_stream(audio[:, 0], model), -1, 1)
    np.testing.assert_allclose(out[:, 0], want, atol=2e-4)  # i16 quantization


def test_cli_denoise(tmp_path):
    from crispy_tpu.cli import main

    rng = np.random.default_rng(4)
    audio = (0.3 * rng.standard_normal((3 * FRAME, 1))).astype(np.float32)
    src = wavio.write_wav(tmp_path / "in.wav", audio, 48000)
    rc = main(["denoise", str(src), str(tmp_path / "out.wav")])
    assert rc == 0
    assert (tmp_path / "out.wav").exists()
    rc = main(["resample", str(src), str(tmp_path / "r16.wav"), "--rate", "16000"])
    assert rc == 0
    fmt = wavio.read_format(tmp_path / "r16.wav")
    assert fmt.sample_rate == 16000
