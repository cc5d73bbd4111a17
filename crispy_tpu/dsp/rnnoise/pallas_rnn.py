"""Fused Pallas kernel for the RNNoise network scan.

The GRU chain (input dense → vad GRU → noise GRU → denoise GRU → gain/VAD
heads + lastg smoothing) is the pipeline's only frame recurrence with
weight reuse. This kernel runs the ENTIRE scan in one pallas_call: grid
(stream-blocks, frames) iterates frames innermost on-core, the recurrent
state lives in VMEM scratch across grid steps, and the ~350 KB of weights
stay VMEM-resident — no per-step XLA dispatch, no HBM weight refetch.

Numerics match jax_pipeline._nn_scan (same tansig construction: tanh at
the 0.04 grid point + the table-interpolation correction).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import constants as C

NB = C.NB_BANDS
_VAD, _NOI, _DEN = C.VAD_GRU_SIZE, C.NOISE_GRU_SIZE, C.DENOISE_GRU_SIZE
_STATE = _VAD + _NOI + _DEN + NB  # 190
_IN = 48  # feats 42 + silence flag, padded
_OUT = 48  # graw 22 + gsmooth 22 + vad 1, padded
S_BLK = 128


def _tansig(x):
    sign = jnp.where(x < 0, -1.0, 1.0)
    ax = jnp.abs(x)
    i = jnp.clip(jnp.floor(0.5 + 25.0 * ax), 0.0, 200.0)
    dx = ax - 0.04 * i
    y = jnp.tanh(0.04 * i)
    dy = 1.0 - y * y
    y = y + dx * dy * (1.0 - y * dx)
    out = sign * y
    return jnp.where(x >= 8.0, 1.0, jnp.where(x <= -8.0, -1.0, out))


def _sigmoid(x):
    return 0.5 + 0.5 * _tansig(0.5 * x)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST,
    )


def _gru(x, h, w, u, b, n):
    pre = _dot(x, w) + b
    rec = _dot(h, u[:, : 2 * n])
    z = _sigmoid(pre[:, :n] + rec[:, :n])
    r = _sigmoid(pre[:, n: 2 * n] + rec[:, n:])
    cand = jnp.maximum(pre[:, 2 * n:] + _dot(h * r, u[:, 2 * n:]), 0.0)
    return z * h + (1.0 - z) * cand


def _kernel(feats_ref, state_in_ref,
            w_id, b_id, w_vg, u_vg, b_vg, w_ng, u_ng, b_ng,
            w_dg, u_dg, b_dg, w_do, b_do, w_vo, b_vo,
            out_ref, state_out_ref, scratch):
    f = pl.program_id(1)

    @pl.when(f == 0)
    def _():
        scratch[:] = state_in_ref[:]

    st = scratch[:]
    vad_s = st[:, :_VAD]
    noi_s = st[:, _VAD: _VAD + _NOI]
    den_s = st[:, _VAD + _NOI: _VAD + _NOI + _DEN]
    lastg = st[:, _VAD + _NOI + _DEN:]

    x = feats_ref[0]
    feats = x[:, :42]
    keep = x[:, 42:43] > 0.5  # silence flag

    dense = _tansig(_dot(feats, w_id[:]) + b_id[:])
    vad_n = _gru(dense, vad_s, w_vg[:], u_vg[:], b_vg[:], _VAD)
    vad_s2 = jnp.where(keep, vad_s, vad_n)
    vad_p = _sigmoid(_dot(vad_s2, w_vo[:]) + b_vo[:])

    noise_in = jnp.concatenate([dense, vad_s2, feats], axis=1)
    noi_n = _gru(noise_in, noi_s, w_ng[:], u_ng[:], b_ng[:], _NOI)
    noi_s2 = jnp.where(keep, noi_s, noi_n)

    den_in = jnp.concatenate([vad_s2, noi_s2, feats], axis=1)
    den_n = _gru(den_in, den_s, w_dg[:], u_dg[:], b_dg[:], _DEN)
    den_s2 = jnp.where(keep, den_s, den_n)

    graw = _sigmoid(_dot(den_s2, w_do[:]) + b_do[:])
    gs = jnp.maximum(graw, np.float32(C.ALPHA_LASTG) * lastg)
    lastg2 = jnp.where(keep, lastg, gs)
    vad_out = jnp.where(keep[:, 0:1], 0.0, vad_p)

    out = jnp.concatenate(
        [graw, gs, vad_out, jnp.zeros((graw.shape[0], _OUT - 2 * NB - 1), jnp.float32)],
        axis=1,
    )
    out_ref[0] = out
    new_state = jnp.concatenate([vad_s2, noi_s2, den_s2, lastg2], axis=1)
    scratch[:] = new_state
    state_out_ref[:] = new_state


def nn_scan_pallas(params, state, feats: jnp.ndarray, silence: jnp.ndarray,
                   interpret: bool = False):
    """Drop-in for jax_pipeline._nn_scan on TPU: same inputs/outputs."""
    S, F, _ = feats.shape
    if S % S_BLK != 0:
        # pad streams to the block size (padded rows are ignored on output)
        pad = S_BLK - S % S_BLK
        feats = jnp.pad(feats, ((0, pad), (0, 0), (0, 0)))
        silence = jnp.pad(silence, ((0, pad), (0, 0)), constant_values=True)
        state = {k: jnp.pad(v, tuple((0, pad) if i == 0 else (0, 0)
                                     for i in range(v.ndim)))
                 for k, v in state.items()}
    Sp = feats.shape[0]

    packed = jnp.concatenate(
        [feats, silence[..., None].astype(jnp.float32),
         jnp.zeros((Sp, F, _IN - 43), jnp.float32)], axis=-1)
    packed = jnp.moveaxis(packed, 1, 0)  # [F, S, 48]
    st_in = jnp.concatenate(
        [state["gru_vad"], state["gru_noise"], state["gru_denoise"], state["lastg"]],
        axis=-1)

    cmap = lambda s, f: (0, 0)
    weights = [
        ("input_dense.w", "input_dense.b"),
        ("vad_gru.w", "vad_gru.u", "vad_gru.b"),
        ("noise_gru.w", "noise_gru.u", "noise_gru.b"),
        ("denoise_gru.w", "denoise_gru.u", "denoise_gru.b"),
        ("denoise_output.w", "denoise_output.b"),
        ("vad_output.w", "vad_output.b"),
    ]
    wkeys = [k for grp in weights for k in grp]
    wvals = [params[k] for k in wkeys]

    def wspec(v):
        shape = v.shape if v.ndim == 2 else (1, v.shape[0])
        return pl.BlockSpec(shape, cmap, memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, S_BLK, _IN), lambda s, f: (f, s, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((S_BLK, _STATE), lambda s, f: (s, 0), memory_space=pltpu.VMEM),
    ] + [wspec(v) for v in wvals]
    wargs = [v if v.ndim == 2 else v[None, :] for v in wvals]

    out, st_out = pl.pallas_call(
        _kernel,
        grid=(Sp // S_BLK, F),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, S_BLK, _OUT), lambda s, f: (f, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S_BLK, _STATE), lambda s, f: (s, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F, Sp, _OUT), jnp.float32),
            jax.ShapeDtypeStruct((Sp, _STATE), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((S_BLK, _STATE), jnp.float32)],
        interpret=interpret,
    )(packed, st_in, *wargs)

    out = jnp.moveaxis(out, 0, 1)[:S]
    st_out = st_out[:S]
    outs = (out[..., :NB], out[..., NB: 2 * NB], out[..., 2 * NB])
    nn_state = {
        "gru_vad": st_out[:, :_VAD],
        "gru_noise": st_out[:, _VAD: _VAD + _NOI],
        "gru_denoise": st_out[:, _VAD + _NOI: _VAD + _NOI + _DEN],
        "lastg": st_out[:, _VAD + _NOI + _DEN:],
    }
    return outs, nn_state


# ---------------------------------------------------------------------------
# remove_doubling continuation scan
# ---------------------------------------------------------------------------
#
# The rd continuation is the pipeline's other frame recurrence: per frame,
# candidate subharmonics are accepted against thresholds that depend on the
# previous frame's (period, gain). As a lax.scan it costs ~F dispatches of
# tiny elementwise work; here the whole scan is one pallas_call with the
# carry in VMEM scratch (same shape of solution as the GRU kernel above).

_RD_W = 74  # packed layout from jax_pipeline._pitch_index
_RD_OUT = 8  # pitch written in lane 0 (padded lane width)


RD_FPP = 10  # frames per program: amortizes the ~25 us/program Mosaic
# dispatch overhead that dominated the one-frame-per-program version
# (2.5 ms -> sub-ms at F=100); the recurrence inside a program is a
# plain Python loop over the K resident frames, bit-identical ordering.


def _rd_kernel(n_frames: int, packed_ref, carry_in_ref, out_ref,
               carry_out_ref, scratch):
    fb = pl.program_id(1)

    @pl.when(fb == 0)
    def _():
        scratch[:] = carry_in_ref[:]

    for i in range(RD_FPP):
        @pl.when(fb * RD_FPP + i < n_frames)  # tail-padded frames inert
        def _(i=i):
            inp = packed_ref[i]  # [S_BLK, 74]
            prev_T = scratch[:, 0]
            prev_g = scratch[:, 1]

            T1_f = inp[:, 0:14]
            g1_f = inp[:, 14:28]
            valid_f = inp[:, 28:42] > 0.5
            g0_f = inp[:, 42]
            T0_f = inp[:, 43]
            Tout_f = inp[:, 44:59]
            pg_f = inp[:, 59:74]

            # mosaic iota must be integer; convert after
            ksf = (2 + lax.broadcasted_iota(jnp.int32, (1, 14), 1)).astype(jnp.float32)
            pph = jnp.floor(prev_T * 0.5)
            dT = jnp.abs(T1_f - pph[:, None])
            cont = jnp.where(
                dT <= 1, prev_g[:, None],
                jnp.where((dT <= 2) & (5.0 * ksf * ksf < T0_f[:, None]),
                          0.5 * prev_g[:, None], 0.0),
            )
            thresh = jnp.maximum(0.3, 0.7 * g0_f[:, None] - cont)
            thresh = jnp.where(
                T1_f < 3 * 30.0, jnp.maximum(0.4, 0.85 * g0_f[:, None] - cont),
                jnp.where(T1_f < 2 * 30.0,
                          jnp.maximum(0.5, 0.9 * g0_f[:, None] - cont),
                          thresh),
            )
            choose = valid_f & (g1_f > thresh)
            iota14 = lax.broadcasted_iota(jnp.int32, choose.shape, 1)
            kidx = jnp.max(jnp.where(choose, iota14, -1), axis=-1)  # last winner
            iota15 = lax.broadcasted_iota(jnp.int32, Tout_f.shape, 1)
            sel = (iota15 == (kidx + 1)[:, None]).astype(jnp.float32)
            T_out = jnp.sum(sel * Tout_f, axis=-1)
            pg = jnp.sum(sel * pg_f, axis=-1)

            scratch[:, 0] = T_out
            scratch[:, 1] = pg
            out_ref[i, :, 0] = T_out

    carry_out_ref[:] = scratch[:]


def rd_scan_pallas(packed: jnp.ndarray, last_period: jnp.ndarray,
                   last_gain: jnp.ndarray, interpret: bool = False):
    """Drop-in for the rd_step lax.scan: packed [S, F, 74], carries [S] →
    (pitch_idx f32 [S, F], last_period f32 [S], last_gain f32 [S])."""
    S, F, W = packed.shape
    assert W == _RD_W
    if S % S_BLK != 0:
        pad = S_BLK - S % S_BLK
        packed = jnp.pad(packed, ((0, pad), (0, 0), (0, 0)))
        last_period = jnp.pad(last_period, (0, pad))
        last_gain = jnp.pad(last_gain, (0, pad))
    Sp = packed.shape[0]
    Fp = -(-F // RD_FPP) * RD_FPP
    xs = jnp.moveaxis(packed, 1, 0)  # [F, S, 74]
    if Fp != F:
        xs = jnp.pad(xs, ((0, Fp - F), (0, 0), (0, 0)))
    carry0 = jnp.stack([last_period.astype(jnp.float32),
                        last_gain.astype(jnp.float32)], axis=-1)  # [S, 2]

    import functools

    out, carry = pl.pallas_call(
        functools.partial(_rd_kernel, F),
        grid=(Sp // S_BLK, Fp // RD_FPP),
        in_specs=[
            pl.BlockSpec((RD_FPP, S_BLK, _RD_W), lambda s, f: (f, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_BLK, 2), lambda s, f: (s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((RD_FPP, S_BLK, _RD_OUT), lambda s, f: (f, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_BLK, 2), lambda s, f: (s, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Fp, Sp, _RD_OUT), jnp.float32),
            jax.ShapeDtypeStruct((Sp, 2), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((S_BLK, 2), jnp.float32)],
        interpret=interpret,
    )(xs, carry0)

    pitch = jnp.moveaxis(out[..., 0], 0, 1)[:S, :F]  # [S, F]
    return pitch, carry[:S, 0], carry[:S, 1]
