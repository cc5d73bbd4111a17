"""Resampler semantics (reference: audio.rs LinearResampler, recording.rs
resample_audio, rubato offline path) + polyphase quality checks."""

import numpy as np
import pytest

from crispy_tpu.dsp.resample import (
    LinearResampler,
    PullResampler,
    resample_block,
    resample_poly,
)


def oracle_linear(samples, in_rate, out_rate):
    """Direct port of the reference's per-sample state machine
    (audio.rs:107-133) used as the spec for the vectorized class."""
    out = []
    last, has_last, input_pos, next_out = 0.0, False, 0.0, 0.0
    step = float(np.float32(in_rate) / np.float32(out_rate))  # f32 div (audio.rs:124)
    if abs(in_rate - out_rate) < 1.0:
        return list(samples)
    for s in samples:
        if not has_last:
            last, has_last = s, True
            input_pos = next_out = 0.0
            continue
        input_pos += 1.0
        while next_out <= input_pos:
            t = min(max(next_out - (input_pos - 1.0), 0.0), 1.0)
            out.append(np.float32(last + (s - last) * np.float32(t)))
            next_out += step
        last = s
    return out


class TestLinearResampler:
    @pytest.mark.parametrize("rates", [(44100, 48000), (48000, 16000), (22050, 48000)])
    def test_matches_per_sample_oracle(self, rates, rng):
        x = rng.standard_normal(2000).astype(np.float32)
        r = LinearResampler(*rates)
        got = np.concatenate([r.process(x[:700]), r.process(x[700:1200]), r.process(x[1200:])])
        want = np.array(oracle_linear(x, *rates), np.float32)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_same_rate_bypass(self, rng):
        x = rng.standard_normal(100).astype(np.float32)
        r = LinearResampler(48000, 48000.5)  # <1 Hz delta
        np.testing.assert_array_equal(r.process(x), x)

    def test_rate_hot_swap_resets(self, rng):
        x = rng.standard_normal(500).astype(np.float32)
        r = LinearResampler(44100, 48000)
        r.process(x)
        r.set_rates(48000, 16000)
        got = r.process(x)
        want = np.array(oracle_linear(x, 48000, 16000), np.float32)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_ratio_lengths(self, rng):
        x = rng.standard_normal(48000).astype(np.float32)
        r = LinearResampler(48000, 16000)
        out = r.process(x)
        assert abs(out.size - 16000) <= 2


class TestPullResampler:
    def test_underflow_returns_zero(self):
        p = PullResampler(48000, 48000, max_len=100)
        assert p.next_sample() == 0.0
        p.push([0.5])
        assert p.next_sample() == 0.0  # still <2 samples

    def test_interpolated_pull(self):
        p = PullResampler(48000, 96000, max_len=100)  # half-speed read
        p.push([0.0, 1.0, 2.0, 3.0])
        got = [p.next_sample() for _ in range(5)]
        np.testing.assert_allclose(got, [0.0, 0.5, 1.0, 1.5, 2.0], atol=1e-6)


class TestBlockResample:
    def test_passthrough(self, rng):
        x = rng.standard_normal(100).astype(np.float32)
        np.testing.assert_array_equal(resample_block(x, 48000, 48000), x)

    def test_ratio_and_endpoints(self):
        x = np.arange(100, dtype=np.float32)
        out = resample_block(x, 48000, 24000)
        assert out.size == 50
        np.testing.assert_allclose(out, np.arange(0, 100, 2, dtype=np.float32))


class TestPolyphase:
    @pytest.mark.parametrize("pair", [(48000, 16000), (44100, 48000)])
    def test_tone_preserved(self, pair):
        fr, to = pair
        t = np.arange(int(fr * 0.5)) / fr
        x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        y = resample_poly(x, fr, to, use_jax=False)
        assert abs(y.size - int(x.size * to / fr)) <= 2
        t2 = np.arange(y.size) / to
        want = np.sin(2 * np.pi * 440.0 * t2)
        # ignore filter edges
        m = slice(500, y.size - 500)
        assert np.max(np.abs(y[m] - want[m])) < 1e-3

    def test_aliasing_rejected(self):
        # 20 kHz tone must vanish after 48k→16k (Nyquist 8k).
        fr, to = 48000, 16000
        t = np.arange(fr) / fr
        x = np.sin(2 * np.pi * 20000.0 * t).astype(np.float32)
        y = resample_poly(x, fr, to, use_jax=False)
        assert np.max(np.abs(y[200:-200])) < 1e-3

    @pytest.mark.parametrize("pair", [(48000, 16000), (44100, 48000)])
    def test_conv_path_matches_scipy_path(self, pair):
        fr, to = pair
        rng = np.random.default_rng(1)
        x = rng.standard_normal(4800).astype(np.float32)
        a = resample_poly(x, fr, to, use_jax=False)
        b = resample_poly(x, fr, to, use_jax=True)  # conv path on CPU backend
        n = min(a.size, b.size)
        assert abs(a.size - b.size) <= 1
        np.testing.assert_allclose(a[:n], b[:n], atol=2e-4)


def test_downsample_antialias_stopband():
    """48k→16k (the capture→ASR path) must actually attenuate out-of-band
    content: a 10 kHz tone may not fold into the 16 kHz output (review
    fix: the prototype filter length must scale with max(up, down) — the
    up-scaled version collapsed to ~25 taps and let aliases through at
    −16.6 dB)."""
    from crispy_tpu.dsp.resample import resample_poly

    sr = 48000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 10000 * t).astype(np.float32)
    y = resample_poly(x, 48000, 16000, use_jax=False)
    supp_db = 20 * np.log10(
        np.sqrt((y[200:-200] ** 2).mean()) / np.sqrt((x ** 2).mean()) + 1e-12)
    assert supp_db < -60, f"alias suppression only {supp_db:.1f} dB"
    # and the passband is flat
    x6 = np.sin(2 * np.pi * 6000 * t).astype(np.float32)
    y6 = resample_poly(x6, 48000, 16000, use_jax=False)
    droop = 20 * np.log10(
        np.sqrt((y6[200:-200] ** 2).mean()) / np.sqrt((x6 ** 2).mean()))
    assert droop > -0.5, f"passband droop {droop:.2f} dB"


def test_resample_poly_bucketed_lengths_exact():
    """The jax path pads input lengths to bucketed compiled shapes;
    trailing zero-pad must be exact: outputs equal the host (scipy) path
    at bucket boundaries and just past them."""
    import numpy as np

    from crispy_tpu.dsp.resample import resample_poly

    rng = np.random.default_rng(2)
    for n in [(1 << 14) - 3, (1 << 14), (1 << 14) + 1, 50_001]:
        x = (rng.standard_normal(n) * 0.3).astype(np.float32)
        a = resample_poly(x, 48000, 16000, use_jax=True)
        b = resample_poly(x, 48000, 16000, use_jax=False)
        assert a.size == b.size, n
        np.testing.assert_allclose(a, b, atol=5e-6, err_msg=str(n))
