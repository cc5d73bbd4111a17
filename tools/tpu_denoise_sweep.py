"""Denoise throughput vs stream count S (and block frames F) on the
current backend — finds the throughput-optimal batch geometry for the
bench/headline configuration. Donation-safe, scalar-fetch timed.

Usage: python tools/tpu_denoise_sweep.py [S ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from crispy_tpu.dsp.rnnoise import jax_pipeline as jp
from crispy_tpu.dsp.rnnoise.weights import builtin_model, deterministic_test_model


def bench_one(params, S, F, reps=3, inner=20):
    rng = np.random.default_rng(0)
    block = jnp.asarray(rng.standard_normal((S, F * 480), np.float32) * 0.3)
    carry = [jp.init_state(S)]
    box = [None]

    def step():
        carry[0], out, _ = jp._denoise_block_jit(params, carry[0], block)
        box[0] = out

    step()
    float(box[0].sum())
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            step()
        float(box[0].sum())
        best = min(best, (time.time() - t0) / inner)
    return (S * F * 480 / 48000) / best, best * 1e3


def main():
    Ss = [int(a) for a in sys.argv[1:]] or [64, 128, 256, 512]
    try:
        model = builtin_model()
    except Exception:
        model = deterministic_test_model()
    params = jp.make_params(model)
    print(f"backend={jax.default_backend()}  F=100")
    for S in Ss:
        x, ms = bench_one(params, S, 100)
        print(f"S={S:4d}  {x:10.1f}x realtime  ({ms:.2f} ms/block)")


if __name__ == "__main__":
    main()
