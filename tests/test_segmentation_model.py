"""PyanNet segmentation network: geometry, filterbank, integration."""

import numpy as np
import pytest

from crispy_tpu.engine import diarization as dz
from crispy_tpu.models import segmentation as seg


def test_frame_geometry_matches_reference_grid():
    """10 s @ 16 kHz must produce exactly 589 frames (the reference's
    721/270 sample grid — diarization.rs:101-103)."""
    m = seg.SegmentationModel(seg.init_random(seed=0))
    out = m(np.zeros((1, 160000), np.float32))
    assert out.shape == (1, dz.N_SEG_FRAMES, 7)


def test_sinc_filterbank_is_bandpass():
    fb = seg.sinc_filterbank(np.array([300.0]), np.array([700.0]), 251, 16000)
    spec = np.abs(np.fft.rfft(fb[0], 4096))
    freqs = np.fft.rfftfreq(4096, 1 / 16000)
    band = spec[(freqs > 450) & (freqs < 950)].mean()
    stop = spec[(freqs < 100) | (freqs > 3000)].mean()
    assert band > 5 * stop  # passband dominates


def test_batched_windows_finite():
    m = seg.SegmentationModel(seg.init_random(seed=1))
    rng = np.random.default_rng(0)
    out = m(rng.standard_normal((3, 160000)).astype(np.float32) * 0.1)
    assert out.shape[0] == 3 and np.isfinite(out).all()


def test_plugs_into_segment_speech():
    """The network slots into the powerset VAD as segmentation_fn."""
    m = seg.SegmentationModel(seg.init_random(seed=2))
    sr = dz.SAMPLE_RATE
    t = np.arange(3 * sr) / sr
    audio = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    segs = dz.segment_speech(audio, merge_gap=1.0, segmentation_fn=m)
    # random weights give arbitrary (but valid) segmentations
    for s in segs:
        assert 0.0 <= s.start <= s.end <= 3.0 + 1e-6


def test_from_device_matches_host_windows():
    """One-upload path: window logits from a flat i16 device recording match
    the host window batch fed identical dequantized samples."""
    import jax
    import jax.numpy as jnp

    from crispy_tpu.models.segmentation import SegmentationModel, init_random

    model = SegmentationModel(init_random(seed=3))
    rng = np.random.default_rng(11)
    q = (rng.standard_normal(3 * 160000) * 3000).astype(np.int16)
    deq = q.astype(np.float32) / 32768.0

    host = model(deq.reshape(3, 160000))
    dev = model.from_device(jax.device_put(jnp.asarray(q)))
    assert dev.shape == host.shape
    np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-5)
