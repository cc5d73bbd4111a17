"""Live-monitoring latency: the 10 ms frame budget is demonstrated, not
asserted (reference constraint: audio.rs:260-268 — each 480-sample frame
must process within its own duration on the callback thread)."""

import time

import numpy as np

from crispy_tpu.api.events import EventBus
from crispy_tpu.engine.denoiser import LegacyProcessor, RnnNoiseProcessor
from crispy_tpu.engine.monitoring import MonitoringEngine


def test_single_frame_step_fits_frame_budget():
    proc = RnnNoiseProcessor(48000.0, 48000.0, 1.0)
    block = (0.2 * np.sin(np.arange(480) / 20)).astype(np.float32)
    proc.push_block(block)  # warm-up (compile + first-frame drop)
    times = []
    for _ in range(30):
        t0 = time.perf_counter()
        out = proc.push_block(block)
        times.append((time.perf_counter() - t0) * 1e3)
        assert out is not None and out.shape == (480,)
    median = float(np.median(times))
    # budget = 10 ms; CPU steady state measures ~0.6 ms — leave headroom
    # for loaded CI machines but still prove the real-time property
    assert median < 8.0, f"median single-frame latency {median:.2f} ms"


def test_legacy_block_path_matches_per_sample():
    """The vectorized legacy path is bit-identical to per-sample pushes
    (LCG closed form), so the monitor loop never needs a Python loop."""
    a = LegacyProcessor(48000.0, 48000.0, "noisy", 0.8)
    b = LegacyProcessor(48000.0, 48000.0, "noisy", 0.8)
    x = (0.3 * np.sin(np.arange(960) / 10)).astype(np.float32)
    want = np.concatenate([a.push_sample(float(s)) for s in x]).astype(np.float32)
    got = b.push_block(x)
    np.testing.assert_array_equal(got, want)


def test_monitoring_emits_latency_evidence():
    bus = EventBus()
    bus.keep_history = True
    eng = MonitoringEngine(bus=bus)
    eng.realtime = False
    eng.start_monitoring(model_name="rnnoise")
    deadline = time.monotonic() + 5.0
    while time.monotonic() < deadline:
        if any(e == "stage-timing" for e, _ in bus.history):
            break
        time.sleep(0.05)
    eng.stop_monitoring()
    evs = [p for e, p in bus.history if e == "stage-timing"]
    assert evs, "no stage-timing event within 5 s"
    assert evs[0]["stage"] == "ns-block"
    assert evs[0]["budget_ms"] == 10.0
    assert evs[0]["max_ms"] > 0.0
