"""Compare rd_candidate_gather formulations on the current backend.

Variants:
  pallas   — the shipped one-hot MXU kernel (pallas_ops.rd_candidate_gather)
  xla_gather — plain take_along_axis (what the kernel replaced)
  xla_mask — broadcast-compare-select-reduce (no gather, no pallas; exact
             because each reduction row has exactly one nonzero)

All must agree bit-exactly; prints ms each.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from crispy_tpu.dsp.rnnoise.pallas_ops import SECOND_CHECK, rd_candidate_gather


def candidates(T0):
    ks = jnp.arange(2, 16, dtype=jnp.int32)
    T0k = T0[..., None]
    T1 = (2 * T0k + ks) // (2 * ks)
    sc = jnp.asarray(np.asarray(SECOND_CHECK), jnp.int32)[ks]
    T1b = jnp.where(ks == 2, jnp.where(T0k + T1 > 384, T0k, T0k + T1),
                    (2 * sc * T0k + ks) // (2 * ks))
    tcand = jnp.concatenate([T0k, T1], axis=-1)
    tbcand = jnp.concatenate([T0k, T1b], axis=-1)
    return tcand, tbcand


def xla_gather(corr, yyl, T0):
    L = corr.shape[-1]
    tcand, tbcand = candidates(T0)

    def take(arr, idx):
        return jnp.take_along_axis(arr, jnp.clip(idx, 0, L - 1), axis=-1)

    return (take(corr, tcand), take(corr, tcand - 1), take(corr, tcand + 1),
            take(yyl, tcand), take(corr, tbcand), take(yyl, tbcand))


def xla_mask(corr, yyl, T0):
    L = corr.shape[-1]
    tcand, tbcand = candidates(T0)
    lanes = jnp.arange(L, dtype=jnp.int32)

    def take(arr, idx):
        idx = jnp.clip(idx, 0, L - 1)
        m = lanes == idx[..., None]  # [S,F,15,L], exactly one hot
        return jnp.sum(jnp.where(m, arr[..., None, :], 0.0), axis=-1)

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

    fns = {
        "pallas": jax.jit(lambda c, y, t: scal(rd_candidate_gather(c, y, t))),
        "xla_gather": jax.jit(lambda c, y, t: scal(xla_gather(c, y, t))),
        "xla_mask": jax.jit(lambda c, y, t: scal(xla_mask(c, y, t))),
    }
    # bit-exact agreement first
    ref = jax.jit(xla_gather)(corr, yyl, T0)
    got = jax.jit(rd_candidate_gather)(corr, yyl, T0)
    msk = jax.jit(xla_mask)(corr, yyl, T0)
    for name, out in (("pallas", got), ("xla_mask", msk)):
        for i, (a, b) in enumerate(zip(ref, out)):
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                print(f"{name} output {i} MISMATCH "
                      f"max={np.abs(np.asarray(a)-np.asarray(b)).max()}")
    print(f"S={S} F={F} backend={jax.default_backend()}")
    for name, fn in fns.items():
        print(f"{name:12s} {timeit(lambda fn=fn: fn(corr, yyl, T0)):8.3f} ms")


if __name__ == "__main__":
    main()
