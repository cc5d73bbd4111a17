"""Per-stage timing of the RNNoise denoise block on the current backend.

Times each pipeline stage as its own jitted function with live inputs
(inputs are computed once, materialized on device, and every timed stage
consumes them through a value fetch — never replace a consumer with a
fake, XLA will DCE the producers). Amortizes the tunnel's ~29 ms fetch
RTT over `inner` iterations.

Usage: python tools/tpu_stage_profile.py [S] [F]
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from crispy_tpu.dsp.rnnoise import jax_pipeline as jp
from crispy_tpu.dsp.rnnoise.jax_pipeline import FRAME, HIST, PBUF, WIN
from crispy_tpu.dsp.rnnoise.weights import builtin_model, deterministic_test_model


def _scalarize(out):
    """Reduce a stage's outputs to ONE f32 on device so the timing fetch
    moves 4 bytes, not the stage's full output (the tunnel pushes ~5 MB/s;
    a 49 MB window tensor would swamp the measurement). The sum consumes
    every output element, so nothing DCEs."""
    leaves = [l for l in jax.tree_util.tree_leaves(out)
              if hasattr(l, "dtype")]
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def timeit(fn, reps=3, inner=20):
    s = fn()
    float(s)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            s = fn()
        float(s)  # one scalar fetch per rep
        best = min(best, (time.time() - t0) / inner)
    return best * 1e3  # ms


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

    # Precompute stage inputs once (device-resident).
    x = (block * 32768.0).reshape(S, F, FRAME)
    st1, hp = jax.jit(jp._hp_biquad)(params, state0, x)
    ext = jnp.concatenate([st1["hp_tail"], hp.reshape(S, F * FRAME)], axis=-1)
    pitch_fn = jax.jit(lambda p, st, e: jp._pitch_index(p, st, e, F))
    pitch_idx, _lp, _lg = pitch_fn(params, state0, ext)

    awin = jax.jit(lambda e: jp._windows(e[:, 1 + HIST - FRAME:], FRAME, WIN, F))(ext)
    spec_fn = jax.jit(lambda p, w: jp._spectrum(p, w))
    Xr, Xi = spec_fn(params, awin)

    from crispy_tpu.dsp.rnnoise.pallas_ops import pitch_window_gather

    starts = 1 + jnp.arange(F, dtype=jnp.int32)[None, :] * FRAME + (PBUF - WIN) - pitch_idx
    pwin_fn = jax.jit(lambda e, s: pitch_window_gather(e, s))
    pwin = pwin_fn(ext, starts)

    frontend = jax.jit(jp.frontend_block)
    stf, fr = frontend(params, state0, block)
    feats, silence = fr["feats"], fr["silence"]

    from crispy_tpu.dsp.rnnoise.pallas_rnn import nn_scan_pallas

    nn_fn = jax.jit(lambda p, st, f, s: nn_scan_pallas(p, st, f, s))
    inv_fn = jax.jit(lambda p, r, i: jp._inv_spectrum(p, r, i))

    carry = [jp.init_state(S)]  # donated: re-thread every call
    sum_jit = jax.jit(_scalarize)

    def full_block():
        carry[0], out, _ = jp._denoise_block_jit(params, carry[0], block)
        return sum_jit(out)

    # Each stage is a jitted fn ending in a device-side scalar reduction.
    frontend_s = jax.jit(lambda p, st, b: _scalarize(
        jp.frontend_block(p, st, b)[1]["feats"]))
    hp_s = jax.jit(lambda p, st, xx: _scalarize(jp._hp_biquad(p, st, xx)[1]))
    pitch_s = jax.jit(lambda p, st, e: _scalarize(
        jp._pitch_index(p, st, e, F)[0]))
    awin_s = jax.jit(lambda e: _scalarize(
        jp._windows(e[:, 1 + HIST - FRAME:], FRAME, WIN, F)))
    spec_s = jax.jit(lambda p, w: _scalarize(jp._spectrum(p, w)))
    pwin_s = jax.jit(lambda e, st_: _scalarize(pitch_window_gather(e, st_)))
    nn_s = jax.jit(lambda p, st, f, s: _scalarize(
        nn_scan_pallas(p, st, f, s)[0]))
    inv_s = jax.jit(lambda p, r, i: _scalarize(jp._inv_spectrum(p, r, i)))

    stages = {
        "full_block": full_block,
        "frontend_block": lambda: frontend_s(params, state0, block),
        "hp_biquad": lambda: hp_s(params, state0, x),
        "pitch_index": lambda: pitch_s(params, state0, ext),
        "awin_windows": lambda: awin_s(ext),
        "spectrum(awin)": lambda: spec_s(params, awin),
        "pwin_gather": lambda: pwin_s(ext, starts),
        "spectrum(pwin)": lambda: spec_s(params, pwin),
        "nn_scan": lambda: nn_s(params, state0, feats, silence),
        "inv_spectrum": lambda: inv_s(params, Xr, Xi),
    }
    print(f"S={S} F={F} backend={jax.default_backend()}")
    for name, fn in stages.items():
        try:
            ms = timeit(fn)
            print(f"{name:18s} {ms:8.3f} ms")
        except Exception as e:
            print(f"{name:18s} ERROR {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
