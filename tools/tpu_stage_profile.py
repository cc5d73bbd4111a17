"""Per-stage timing of the RNNoise denoise block on the current backend.

Times each pipeline stage as its own jitted function with live inputs
(inputs are computed once, materialized on device, and every timed stage
consumes them through a value fetch — never replace a consumer with a
fake, XLA will DCE the producers). Amortizes the tunnel's ~29 ms fetch
RTT over `inner` iterations.

Usage: python tools/tpu_stage_profile.py [S] [F]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from crispy_tpu.dsp.rnnoise import jax_pipeline as jp
from crispy_tpu.dsp.rnnoise.jax_pipeline import FRAME, HIST, PBUF, WIN
from crispy_tpu.dsp.rnnoise.weights import builtin_model, deterministic_test_model


def timeit(fn, reps=3, inner=20):
    out = fn()
    jax.tree_util.tree_map(lambda a: np.asarray(a).sum(), out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            out = fn()
        jax.tree_util.tree_map(lambda a: np.asarray(a).sum(), out)
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

    def full_block():
        carry[0], out, _ = jp._denoise_block_jit(params, carry[0], block)
        return out

    stages = {
        "full_block": full_block,
        "frontend_block": lambda: frontend(params, state0, block)[1]["feats"],
        "hp_biquad": lambda: jax.jit(jp._hp_biquad)(params, state0, x)[1],
        "pitch_index": lambda: pitch_fn(params, state0, ext)[0],
        "awin_windows": lambda: jax.jit(
            lambda e: jp._windows(e[:, 1 + HIST - FRAME:], FRAME, WIN, F))(ext),
        "spectrum(awin)": lambda: spec_fn(params, awin)[0],
        "pwin_gather": lambda: pwin_fn(ext, starts),
        "spectrum(pwin)": lambda: spec_fn(params, pwin)[0],
        "nn_scan": lambda: nn_fn(params, state0, feats, silence)[0][1],
        "inv_spectrum": lambda: inv_fn(params, Xr, Xi),
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
