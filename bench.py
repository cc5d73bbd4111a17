"""Headline benchmark: RNNoise denoise throughput per chip (48 kHz).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: >= 5000x real time per chip (BASELINE.json north_star).

Measures the steady-state jitted block step on device-resident batches
(the production feeder double-buffers host->device transfers); the full
algorithm runs per frame — windowed DFT analysis, Bark bands, celt pitch
search + remove_doubling, 42 features, GRU inference, pitch filter, gain
interpolation, synthesis overlap-add — at oracle parity (<=1e-4).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crispy_tpu.dsp.rnnoise import jax_pipeline as jp
    from crispy_tpu.dsp.rnnoise.weights import deterministic_test_model

    S, F = 128, 100  # 128 streams x 1 s per block
    params = jp.make_params(deterministic_test_model())
    state = jp.init_state(S)
    rng = np.random.default_rng(0)
    block = jnp.asarray(rng.standard_normal((S, F * 480), dtype=np.float32) * 0.3)

    state, out, _ = jp._denoise_block_jit(params, state, block)
    _ = float(out.sum())  # force full execution (block_until_ready lies on proxied backends)

    best = 0.0
    for _rep in range(3):
        n = 15
        t0 = time.time()
        for _ in range(n):
            state, out, _ = jp._denoise_block_jit(params, state, block)
        _ = float(out.sum())
        dt = (time.time() - t0) / n
        best = max(best, (S * F * 480 / 48000) / dt)

    print(json.dumps({
        "metric": "rnnoise_denoise_realtime_factor_per_chip",
        "value": round(best, 1),
        "unit": "x_realtime_48khz",
        "vs_baseline": round(best / 5000.0, 3),
    }))


if __name__ == "__main__":
    main()
