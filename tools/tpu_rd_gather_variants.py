"""A/B the shipped rd_candidate_gather against alternative formulations.

History (v5e, S=128 F=100): take_along_axis 12.9 ms → one-hot MXU Pallas
kernel 5.9 ms → the now-shipped broadcast-compare-select-reduce 1.5 ms
(exact: one nonzero per reduced row). The Pallas kernel was deleted when
the mask-reduce won; this tool keeps the remaining alternatives honest —
if XLA's gather lowering ever improves past the mask-reduce, it shows up
here first.

Variants:
  shipped    — pallas_ops.rd_candidate_gather (mask-reduce on TPU,
               take_along_axis on CPU)
  xla_gather — plain take_along_axis on every backend

Both must agree bit-exactly; prints ms each.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from crispy_tpu.dsp.rnnoise.pallas_ops import (
    _rd_candidates, rd_candidate_gather)


def xla_gather(corr, yyl, T0):
    L = corr.shape[-1]
    tcand, tbcand = _rd_candidates(T0)

    def take(arr, idx):
        return jnp.take_along_axis(arr, jnp.clip(idx, 0, L - 1), axis=-1)

    return (take(corr, tcand), take(corr, tcand - 1), take(corr, tcand + 1),
            take(yyl, tcand), take(corr, tbcand), take(yyl, tbcand))


def scal(out):
    return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out))


def timeit(fn, reps=3, inner=20):
    float(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            s = fn()
        float(s)
        best = min(best, (time.time() - t0) / inner)
    return best * 1e3


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    F = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    rng = np.random.default_rng(0)
    corr = jnp.asarray(rng.standard_normal((S, F, 385)), jnp.float32)
    yyl = jnp.asarray(np.abs(rng.standard_normal((S, F, 385))), jnp.float32)
    T0 = jnp.asarray(rng.integers(30, 384, (S, F)), jnp.int32)

    ref = jax.jit(xla_gather)(corr, yyl, T0)
    got = jax.jit(rd_candidate_gather)(corr, yyl, T0)
    for i, (a, b) in enumerate(zip(ref, got)):
        if not np.array_equal(np.asarray(a), np.asarray(b)):
            print(f"shipped output {i} MISMATCH "
                  f"max={np.abs(np.asarray(a)-np.asarray(b)).max()}")
    fns = {
        "shipped": jax.jit(lambda c, y, t: scal(rd_candidate_gather(c, y, t))),
        "xla_gather": jax.jit(lambda c, y, t: scal(xla_gather(c, y, t))),
    }
    print(f"S={S} F={F} backend={jax.default_backend()}")
    for name, fn in fns.items():
        print(f"{name:12s} {timeit(lambda fn=fn: fn(corr, yyl, T0)):8.3f} ms")


if __name__ == "__main__":
    main()
