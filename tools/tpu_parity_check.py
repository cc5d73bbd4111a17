#!/usr/bin/env python
"""On-hardware parity check: TPU denoise pipeline vs the NumPy oracle.

The pytest suite runs on CPU, which exercises the FFT/gather fallbacks; the
TPU-only branches (matmul DFT, Pallas window gather, one-hot tansig) are
validated here on the real chip. Run: python tools/tpu_parity_check.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import numpy as np


def speechlike(n, seed=0, f0=110.0, sr=48000, level=0.4):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    sig = sum((0.5 / k) * np.sin(2 * np.pi * f0 * k * t + 0.13 * k) for k in range(1, 9))
    sig = sig * (0.6 + 0.4 * np.sin(2 * np.pi * 1.3 * t + seed))
    sig += 0.03 * rng.standard_normal(n)
    return (level * sig / np.max(np.abs(sig))).astype(np.float32)


def main():
    import jax

    from crispy_tpu.dsp.rnnoise import jax_pipeline as jp
    from crispy_tpu.dsp.rnnoise import oracle
    from crispy_tpu.dsp.rnnoise.weights import deterministic_test_model

    print("backend:", jax.default_backend(), jax.devices())
    model = deterministic_test_model()
    params = jp.make_params(model)
    tol = 1.5e-4
    failures = 0

    cases = {
        "speech 2-stream": np.stack(
            [speechlike(30 * 480, seed=3, f0=95.0), speechlike(30 * 480, seed=4, f0=240.0)]
        ),
    }
    sil = np.zeros((1, 20 * 480), np.float32)
    sil[0, 5 * 480:] = speechlike(15 * 480, seed=6)
    cases["leading silence"] = sil
    gap = speechlike(24 * 480, seed=5)[None, :].copy()
    gap[0, 8 * 480: 14 * 480] = 0.0
    cases["silence gap"] = gap

    for name, audio in cases.items():
        want = np.stack([oracle.denoise_stream(a, model) for a in audio])
        got = jp.denoise_batch(audio, params=params, block_frames=7)
        err = float(np.abs(got - want).max())
        status = "OK " if err < tol else "FAIL"
        failures += err >= tol
        print(f"  [{status}] {name}: max err {err:.2e} (tol {tol:.0e})")
    if failures:
        raise SystemExit(f"{failures} parity case(s) FAILED")
    print("TPU parity: all cases passed")


if __name__ == "__main__":
    main()
