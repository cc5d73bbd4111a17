"""Sub-stage timing inside jax_pipeline._pitch_index on the current
backend (which the stage profile shows is ~60% of the denoise block).

Replicates the function's internal tensor flow with each piece as its
own jitted scalar-reduced fn (same DCE discipline as tpu_stage_profile).
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from crispy_tpu.dsp.rnnoise import jax_pipeline as jp
from crispy_tpu.dsp.rnnoise.jax_pipeline import (
    FRAME, PBUF, PFRAME, PMAX, PMIN, _COARSE_LAGS, _FINE_LAGS, _RD_MAXP)
from crispy_tpu.dsp.rnnoise.weights import builtin_model, deterministic_test_model


def _scal(out):
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


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
    try:
        model = builtin_model()
    except Exception:
        model = deterministic_test_model()
    params = jp.make_params(model)
    rng = np.random.default_rng(0)
    block = jnp.asarray(rng.standard_normal((S, F * 480), np.float32) * 0.3)
    state0 = jp.init_state(S)
    x = (block * 32768.0).reshape(S, F, FRAME)
    _st, hp = jax.jit(jp._hp_biquad)(params, state0, x)
    ext = jnp.concatenate([state0["hp_tail"], hp.reshape(S, F * FRAME)], axis=-1)

    # replicate _pitch_index's decimation + windows once, on device
    def decim(ext):
        S_ = ext.shape[0]
        nD = (ext.shape[1] - 1) // 2
        pairs = ext[:, : 2 * nD].reshape(S_, nD, 2)
        D = (0.5 * (0.5 * (pairs[:, :, 0] + jnp.concatenate(
            [pairs[:, 1:, 0], ext[:, 2 * nD: 2 * nD + 1]], axis=1)) + pairs[:, :, 1]))
        nD2 = (ext.shape[1] - 3) // 4
        quads = ext[:, : 4 * nD2].reshape(S_, nD2, 4)
        D2 = (0.5 * (0.5 * (quads[:, :, 0] + quads[:, :, 2]) + quads[:, :, 1]))
        return D.astype(jnp.float32), D2.astype(jnp.float32)

    decim_j = jax.jit(decim)
    D, D2 = decim_j(ext)
    wins = jax.jit(lambda D, D2: (
        jp._windows(D, 240, PBUF // 2, F),
        jp._windows(D2[:, (PMAX >> 2):], 120, PFRAME >> 2, F),
        jp._windows(D2, 120, (PFRAME + (PMAX - 3 * PMIN)) >> 2, F)))
    bds, x4, y4 = wins(D, D2)
    x2 = bds[..., PMAX // 2:]

    xc4_fn = jax.jit(lambda p, a, b: _scal(
        jp._cross_corr(p, a, b, "x4", "y4", "c4", _COARSE_LAGS)))
    esw4_fn = jax.jit(lambda p, b: _scal(
        jnp.einsum("...n,ni->...i", b * b, p["esw_4"])))
    cc_fn = jax.jit(lambda p, a, b: _scal(
        jp._cross_corr(p, a, b, "x2", "y2", "c2", _RD_MAXP + 1)))
    eswf_fn = jax.jit(lambda p, b: _scal(
        jnp.einsum("...n,ni->...i", b * b, p["esw_fine"])))

    cc = jax.jit(lambda p, a, b: jp._cross_corr(
        p, a, b, "x2", "y2", "c2", _RD_MAXP + 1))(params, x2, bds)
    energies = jax.jit(lambda p, b: jnp.einsum(
        "...n,ni->...i", b * b, p["esw_fine"]))(params, bds)
    T0 = jnp.clip(jnp.asarray(
        rng.integers(60, _RD_MAXP - 1, (S, F)), jnp.int32), 0, _RD_MAXP - 1)
    corr = jnp.flip(cc, axis=-1)
    yyl = jnp.maximum(0.0, energies[..., _FINE_LAGS:])

    from crispy_tpu.dsp.rnnoise.pallas_ops import rd_candidate_gather
    from crispy_tpu.dsp.rnnoise.pallas_rnn import rd_scan_pallas

    rdg_fn = jax.jit(lambda c, y, t: _scal(rd_candidate_gather(c, y, t)))
    packed = jnp.asarray(rng.standard_normal((S, F, 74)), jnp.float32)
    rds_fn = jax.jit(lambda pk, lp, lg: _scal(rd_scan_pallas(pk, lp, lg)))

    full_fn = jax.jit(lambda p, st, e: _scal(jp._pitch_index(p, st, e, F)[0]))
    decim_s = jax.jit(lambda e: _scal(decim(e)))

    stages = {
        "pitch_full": lambda: full_fn(params, state0, ext),
        "decimate": lambda: decim_s(ext),
        "windows(bds,x4,y4)": lambda: jax.jit(
            lambda D_, D2_: _scal((jp._windows(D_, 240, PBUF // 2, F),
                                   jp._windows(D2_[:, (PMAX >> 2):], 120,
                                               PFRAME >> 2, F))))(D, D2),
        "xcorr_coarse(c4)": lambda: xc4_fn(params, x4, y4),
        "energy_coarse": lambda: esw4_fn(params, y4),
        "xcorr_fine(c2)": lambda: cc_fn(params, x2, bds),
        "energy_fine": lambda: eswf_fn(params, bds),
        "rd_gather": lambda: rdg_fn(corr, yyl, T0),
        "rd_scan": lambda: rds_fn(packed, state0["last_period"].astype(jnp.float32),
                                  state0["last_gain"]),
    }
    print(f"S={S} F={F} backend={jax.default_backend()}")
    for name, fn in stages.items():
        try:
            print(f"{name:20s} {timeit(fn):8.3f} ms")
        except Exception as e:
            print(f"{name:20s} ERROR {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
