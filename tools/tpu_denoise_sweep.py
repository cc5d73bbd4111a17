"""Denoise throughput vs stream count S (and block frames F) on the
current backend — finds the throughput-optimal batch geometry for the
bench/headline configuration. Reuses bench.py's timing harness
(donation-safe carry, scalar-fetch sync, inner=40 fetch amortization).

Usage: python tools/tpu_denoise_sweep.py [--frames F] [S ...]
Measured on v5e (round 3): S=128 F=100 is the optimum — throughput is
flat at 256 and declines at 512. Round 4 re-checked the frame axis:
F=400 is ~14% WORSE (10,110x at S=128, 9,456x at S=256) — per-dispatch
overhead is already hidden by async pipelining, and the 4x working set
(windows/spectra tensors) costs more in HBM traffic than it saves.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _timeit
from crispy_tpu.dsp.rnnoise import jax_pipeline as jp
from crispy_tpu.dsp.rnnoise.weights import builtin_model, deterministic_test_model


def bench_one(params, S, F):
    rng = np.random.default_rng(0)
    block = jnp.asarray(rng.standard_normal((S, F * 480), np.float32) * 0.3)
    carry = [jp.init_state(S)]  # donated: re-thread every call
    box = [None]

    def step():
        carry[0], out, _ = jp._denoise_block_jit(params, carry[0], block)
        box[0] = out

    dt = _timeit(step, lambda: float(box[0].sum()), reps=3, inner=40)
    return (S * F * 480 / 48000) / dt, dt * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("streams", type=int, nargs="*", default=[64, 128, 256, 512])
    ap.add_argument("--frames", type=int, default=100)
    args = ap.parse_args()
    try:
        model = builtin_model()
    except Exception:
        model = deterministic_test_model()
    params = jp.make_params(model)
    print(f"backend={jax.default_backend()}  F={args.frames}")
    for S in args.streams:
        x, ms = bench_one(params, S, args.frames)
        print(f"S={S:4d}  {x:10.1f}x realtime  ({ms:.2f} ms/block)")


if __name__ == "__main__":
    main()
