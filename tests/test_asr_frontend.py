"""ASR frontend regression tests (NeMo/GigaAM featurizers)."""

import numpy as np

from crispy_tpu.dsp import asr_frontend as af


class TestNemoLogMel:
    def test_silent_chunk_normalizes_to_bounded_values(self):
        """A digital-zero chunk has no valid frames; the normalizer must
        fall back to all-frame stats instead of dividing 0-mean/0-var
        (which produced ~-1.7e6 activations — advisor finding r3)."""
        out = np.asarray(af.nemo_log_mel(np.zeros((1, 16000), np.float32)))
        assert np.all(np.isfinite(out))
        assert np.max(np.abs(out)) < 10.0

    def test_mixed_batch_silent_row_does_not_affect_speech_row(self):
        rng = np.random.default_rng(0)
        speech = rng.standard_normal(16000).astype(np.float32) * 0.1
        batch = np.stack([speech, np.zeros(16000, np.float32)])
        out = np.asarray(af.nemo_log_mel(batch))
        solo = np.asarray(af.nemo_log_mel(speech[None]))
        np.testing.assert_allclose(out[0], solo[0], rtol=1e-5, atol=1e-5)
        assert np.max(np.abs(out[1])) < 10.0

    def test_padded_tail_stats_bounded_skew(self):
        """Valid-frame masking keeps a padded tail from dragging the stats:
        speech-region features of a half-padded chunk stay close to the
        unpadded normalization (boundary frames straddle the cut, so this
        is a bounded-skew check, not exact parity)."""
        rng = np.random.default_rng(1)
        speech = rng.standard_normal(16000).astype(np.float32) * 0.1
        padded = np.concatenate([speech, np.zeros(16000, np.float32)])
        out = np.asarray(af.nemo_log_mel(padded[None]))
        solo = np.asarray(af.nemo_log_mel(speech[None]))
        d = np.abs(out[0, :, 2:95] - solo[0, :, 2:95])
        assert d.mean() < 0.5  # unmasked floor frames give mean skew >> 1
