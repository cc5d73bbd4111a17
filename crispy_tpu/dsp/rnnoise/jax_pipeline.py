"""Batched TPU RNNoise pipeline (JAX/XLA).

A from-scratch re-architecture of the per-sample streaming chain the
reference runs inside its audio callback (src-tauri/src/audio.rs:202-315)
into a frame-parallel, stream-batched TPU program:

  * Everything that is per-frame independent — windowed rfft analysis, Bark
    band energies (a [481→22] MXU matmul), the celt pitch correlation
    searches (FFT cross-correlations + vectorized top-2), the pitch-delayed
    spectrum, the pitch filter, synthesis irfft and overlap-add — runs as one
    big [streams, frames, ...] batch.
  * The four genuinely sequential recurrences are isolated into tiny
    `lax.scan`s over frames: (1) the HP-biquad cross-frame carry (modal
    single-pole form — the local 480-tap response is a lower-triangular
    Toeplitz matmul on the MXU), (2) remove_doubling's previous-pitch
    continuation, (3) the intra-frame log-energy follower (22 steps), and
    (4) the GRU network + lastg gain smoothing.
  * The GRU scan is the only per-frame compute with real weight reuse; it
    batches across streams so its matmuls hit the MXU, and has a fused
    Pallas implementation in pallas_rnn.py.

Layout: `denoise_block(params, state, block[S, F*480])` is a single jitted
step with a carried state pytree, so hour-long audio streams as fixed-shape
blocks with zero host round-trips in between; `denoise_batch` drives it.

Numerical contract: matches the NumPy oracle (oracle.py) to ≲1e-4 per sample
on [-1, 1]-scaled audio — see tests/test_rnnoise_jax.py. The HP biquad uses
an exact modal decomposition (more accurate than the reference's sequential
f32; see oracle.biquad docstring).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import constants as C
from . import radix_dft as rdft
from .weights import RNNoiseModel, builtin_model

_HIGH = lax.Precision.HIGHEST  # output-affecting matmuls (1e-4 parity budget)


def _pitch_prec() -> lax.Precision:
    """Precision for the pitch-search correlation/energy matmuls.

    These matmuls reach the output only through discrete selections (the
    top-2 lag argmax, remove_doubling's candidate thresholds, next-frame
    continuation gates), so one might hope 3-pass bf16x3 suffices — but
    measured on hardware, its ~1e-6 relative error flips a near-tie lag
    about once per 450 frame decisions on periodic speech (vs zero
    observed flips at 6-pass), and a single flipped pitch lag moves the
    denoised output by up to ~6e-2: far outside the 1e-4 parity budget.
    Default therefore stays HIGHEST. `CRISPY_PITCH_PREC=high` is the
    measured opt-in throughput mode (~1.3 ms off the S=128 block step,
    ~+14%) for callers who accept occasional lag flips — the same
    positioning as CRISPY_FUSED_SPECTRA.
    """
    if os.environ.get("CRISPY_PITCH_PREC", "").lower() == "high":
        return lax.Precision.HIGH
    return _HIGH

FRAME = C.FRAME_SIZE  # 480
WIN = C.WINDOW_SIZE  # 960
NFREQ = C.FREQ_SIZE  # 481
PBUF = C.PITCH_BUF_SIZE  # 1728
PMAX = C.PITCH_MAX_PERIOD  # 768
PMIN = C.PITCH_MIN_PERIOD  # 60
PFRAME = C.PITCH_FRAME_SIZE  # 960
HIST = PBUF - FRAME  # 1248 raw carry samples (+1 for the decimator edge)
NB = C.NB_BANDS

_COARSE_LAGS = (PMAX - 3 * PMIN) >> 2  # 147
_FINE_LAGS = (PMAX - 3 * PMIN) >> 1  # 294
_RD_MAXP = PMAX // 2  # 384: remove_doubling half-rate max period
_RD_N = PFRAME // 2  # 480
_RD_MINP = PMIN // 2  # 30
_ESW_B = 48  # sliding-energy block size (divides both window lengths 240/480)


# ---------------------------------------------------------------------------
# Parameter/table preparation (host-side, float64 → device float32)
# ---------------------------------------------------------------------------

_BIQ_BS = 120  # biquad sub-frame: 480 = 4×120; [120,120] pads to one MXU tile


def _biquad_tables() -> Dict[str, np.ndarray]:
    """Modal decomposition of the HP biquad's IIR part.

    y_n = x'_n - A1 y_{n-1} - A2 y_{n-2}, poles p, conj(p); impulse response
    h[m] = 2 Re(c p^m) with c = p / (p - conj(p)). The within-sub-frame
    response is a lower-triangular Toeplitz matmul at sub-frame size 120
    (4× fewer MACs than per-frame 480, and [120,120] fits a single padded
    128-lane MXU tile); cross-sub-frame state is a single complex modal
    amplitude (bounded basis, so f32 stays accurate — carrying
    (y[-1], y[-2]) instead would amplify rounding ~150x via the
    near-degenerate pole pair).
    """
    bs = _BIQ_BS
    a1, a2 = np.float64(C.BIQUAD_A_HP[0]), np.float64(C.BIQUAD_A_HP[1])
    # y_n = x'_n + (-a1) y_{n-1} + (-a2) y_{n-2}
    p = (-a1 + np.sqrt(complex(a1 * a1 - 4 * a2))) / 2.0
    c = p / (p - np.conj(p))
    n = np.arange(bs, dtype=np.float64)
    pn = p ** n  # [120]
    h = 2.0 * np.real(c * pn)  # h[0..119]
    toe = np.zeros((bs, bs), dtype=np.float64)
    i, j = np.indices((bs, bs))
    mask = i >= j
    toe[mask] = h[(i - j)[mask]]
    # Injection weights: a_inj = sum_j (c * p^(bs - j)) x'_j
    kinj = c * p ** (bs - n)
    # p^(120*(g+1)) for the carry propagation (4096 frames = 16384 sub-frames)
    pows = (p ** bs) ** np.arange(1, 4 * 4096 + 1, dtype=np.float64)
    return {
        "biq_pows_re": np.real(pows).astype(np.float32),
        "biq_pows_im": np.imag(pows).astype(np.float32),
        "biq_toeplitz": toe.T.astype(np.float32),  # used as x' @ T^T
        "biq_kinj_re": np.real(kinj).astype(np.float32),
        "biq_kinj_im": np.imag(kinj).astype(np.float32),
        "biq_pvec_re": np.real(pn).astype(np.float32),
        "biq_pvec_im": np.imag(pn).astype(np.float32),
        "biq_p480_re": np.float32(np.real(p ** bs)),
        "biq_p480_im": np.float32(np.imag(p ** bs)),
    }


def _corr_tables() -> Dict[str, np.ndarray]:
    """Real-DFT matrices for the pitch cross-correlations (matmul path).

    corr[i] = sum_j x[j] y[j+i] = irfft(conj(rfft(x)) * rfft(y)); at these
    sizes (448/896-point transforms over short signals — the no-wrap
    minimum rounded to a lane multiple, not a power of two) MXU matmuls
    beat the XLA FFT on TPU. Matrices map directly between time samples
    and (re, im) bins, with only the needed lag outputs kept.
    """
    out: Dict[str, np.ndarray] = {}

    def fwd(nfft, length, tag):
        n = np.arange(length, dtype=np.float64)[:, None]
        k = np.arange(nfft // 2 + 1, dtype=np.float64)[None, :]
        ang = 2.0 * np.pi * n * k / nfft
        out[f"cf_{tag}_re"] = np.cos(ang).astype(np.float32)  # [len, bins]
        out[f"cf_{tag}_im"] = (-np.sin(ang)).astype(np.float32)

    def inv(nfft, nlags, tag):
        nb = nfft // 2 + 1
        k = np.arange(nb, dtype=np.float64)[:, None]
        i = np.arange(nlags, dtype=np.float64)[None, :]
        ck = np.full((nb, 1), 2.0)
        ck[0] = ck[-1] = 1.0
        ang = 2.0 * np.pi * k * i / nfft
        out[f"ci_{tag}_re"] = (ck * np.cos(ang) / nfft).astype(np.float32)  # [bins, lags]
        out[f"ci_{tag}_im"] = (-ck * np.sin(ang) / nfft).astype(np.float32)

    # nfft only needs signal length + no circular wrap (max j+i < nfft),
    # NOT a power of two — the matmul DFT has no radix constraint. Coarse:
    # max index 239+146 = 385 < 448; fine: 479+384 = 863 < 896. The
    # smaller transforms cut the pitch path's largest matmuls by ~12%.
    fwd(448, 240, "x4")
    fwd(448, 387, "y4")
    inv(448, _COARSE_LAGS, "c4")
    # Fine stage and remove_doubling share one cross-correlation (the same
    # 480-segment x 864-buffer pair); one inverse covers both lag ranges.
    fwd(896, _RD_N, "x2")
    fwd(896, PBUF // 2, "y2")
    inv(896, _RD_MAXP + 1, "c2")

    # Sliding-window energies as banded 0/1 matmuls over the squared signal
    # (cumsum-free: rides the MXU, exact summation order per window).
    w4 = np.zeros((387, _COARSE_LAGS), np.float32)
    for i in range(_COARSE_LAGS):
        w4[i: i + 240, i] = 1.0
    out["esw_4"] = w4
    # columns 0..293: syy2 windows [i, i+480); columns 294..678: yyl windows
    # [384-T, 864-T) for T = 0..384.
    wf = np.zeros((PBUF // 2, _FINE_LAGS + _RD_MAXP + 1), np.float32)
    for i in range(_FINE_LAGS):
        wf[i: i + _RD_N, i] = 1.0
    for T in range(_RD_MAXP + 1):
        wf[_RD_MAXP - T: _RD_MAXP - T + _RD_N, _FINE_LAGS + T] = 1.0
    out["esw_fine"] = wf
    return out


def _dft_tables() -> Dict[str, np.ndarray]:
    """Windowed 960-point real DFT as MXU matmuls.

    At RNNoise's transform size, an O(N^2) matmul DFT beats XLA's FFT on TPU
    by a wide margin (the MXU runs it at full tilt; the FFT lowers to a long
    scalar-ish pipeline). The Vorbis window and RNNoise's 1/N forward scaling
    are folded into the matrices.
    """
    n = np.arange(WIN, dtype=np.float64)[:, None]
    k = np.arange(NFREQ, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / WIN
    w = C.full_window().astype(np.float64)[:, None]
    fwd_re = (w * np.cos(ang)) / WIN  # [960, 481]
    fwd_im = (-w * np.sin(ang)) / WIN
    ck = np.full(NFREQ, 2.0)
    ck[0] = ck[-1] = 1.0
    # inverse (x WIN) with synthesis window folded: [481, 960]
    inv_re = (ck[:, None] * np.cos(ang.T)) * w.T
    inv_im = (-ck[:, None] * np.sin(ang.T)) * w.T
    return {
        "dft_fwd_re": fwd_re.astype(np.float32),
        "dft_fwd_im": fwd_im.astype(np.float32),
        "dft_inv_re": inv_re.astype(np.float32),
        "dft_inv_im": inv_im.astype(np.float32),
    }


# Radix (Cooley–Tukey split) per transform: chosen so the base matmuls pad
# to near-full 128-lane MXU tiles (see radix_dft docstring). Tuned on chip.
_RADIX = {"dft": 8, "inv": 16, "x4": 2, "y4": 2, "c4": 2, "x2": 8, "y2": 8, "c2": 8}


def _radix_tables() -> Dict[str, np.ndarray]:
    """One-level split factorizations of every matmul DFT in the pipeline
    (4–8× fewer padded MACs at identical HIGHEST-precision matmuls)."""
    w = C.full_window().astype(np.float64)
    t: Dict[str, np.ndarray] = {}
    t.update(rdft.fwd_tables(WIN, WIN, _RADIX["dft"], NFREQ, w, 1.0 / WIN, "rx_dft"))
    t.update(rdft.inv_tables(WIN, NFREQ, WIN, _RADIX["inv"], w, 1.0, prefix="rx_inv"))
    t.update(rdft.fwd_tables(448, 240, _RADIX["x4"], 225, prefix="rx_x4"))
    t.update(rdft.fwd_tables(448, 387, _RADIX["y4"], 225, prefix="rx_y4"))
    t.update(rdft.inv_tables(448, 225, _COARSE_LAGS, _RADIX["c4"],
                             scale=1.0 / 448, prefix="rx_c4"))
    t.update(rdft.fwd_tables(896, _RD_N, _RADIX["x2"], 449, prefix="rx_x2"))
    t.update(rdft.fwd_tables(896, PBUF // 2, _RADIX["y2"], 449, prefix="rx_y2"))
    t.update(rdft.inv_tables(896, 449, _RD_MAXP + 1, _RADIX["c2"],
                             scale=1.0 / 896, prefix="rx_c2"))
    return t


def make_params(model: Optional[RNNoiseModel] = None) -> Dict[str, jnp.ndarray]:
    model = model or builtin_model()
    t: Dict[str, np.ndarray] = {}
    t.update(_biquad_tables())
    t.update(_dft_tables())
    t.update(_corr_tables())
    t.update(_radix_tables())
    # Fused (re‖im) forward-DFT tables: one MXU matmul instead of two, and
    # the input frames stream from HBM once. Per-column dot products are
    # unchanged, so results are bitwise identical to the split tables.
    for k in [k for k in t if k.endswith("_re") and (k.startswith("cf_") or k == "dft_fwd_re")]:
        base = k[:-3]
        t[base] = np.concatenate([t[k], t[f"{base}_im"]], axis=1)
    t["half_window"] = C.half_window()
    t["band_e"] = C.band_energy_matrix().T  # [481, 22] for e @ W
    t["band_interp"] = C.band_interp_matrix().T  # [22, 481] for g @ W
    # Packed (re‖im) tables for the default XLA path (see _use_packed_mid):
    # one [962, 960] synthesis dot instead of two [481, 960] dots + add;
    # packed xcorr inverses likewise. band_interp duplicated across both
    # halves applies per-frequency gains directly on the packed layout
    # (identical values per column — pure layout, no math change).
    t["dft_inv"] = np.concatenate([t["dft_inv_re"], t["dft_inv_im"]], axis=0)
    for tag in ("c4", "c2"):
        t[f"ci_{tag}"] = np.concatenate(
            [t[f"ci_{tag}_re"], t[f"ci_{tag}_im"]], axis=0)
    t["band_interp_ri"] = np.concatenate(
        [t["band_interp"], t["band_interp"]], axis=1)  # [22, 962]
    # Fused-frontend tables (pallas_frontend): the padded [.., 1024]
    # spectrum layout (re 0..480, im 512..992) keeps every slice
    # 128-lane aligned; band/interp tables duplicated across both halves
    # so banded sums and gain interpolation act directly on that layout.
    from . import pallas_frontend as pf

    t["dft_fwd_pad"] = pf.pad_dft_fwd(t["dft_fwd"])  # [960, 1024]
    t["dft_fwd_a512"], t["dft_fwd_b512"] = pf.split_dft_fwd(t["dft_fwd_pad"])
    t["band_e_pad"] = pf.pad_band_e(t["band_e"])  # [512, 22]
    be1024 = np.zeros((1024, NB), np.float32)
    be1024[:NFREQ] = t["band_e"]
    be1024[512: 512 + NFREQ] = t["band_e"]
    t["band_e_1024"] = be1024
    bi1024 = np.zeros((NB, 1024), np.float32)
    bi1024[:, :NFREQ] = t["band_interp"]
    bi1024[:, 512: 512 + NFREQ] = t["band_interp"]
    t["band_interp_1024"] = bi1024
    inv_pad = pf.pad_dft_inv(t["dft_inv_re"], t["dft_inv_im"])  # [1024, 960]
    t["dft_inv_a"] = inv_pad[:, :FRAME].copy()
    t["dft_inv_b"] = inv_pad[:, FRAME:].copy()
    t["dct"] = C.dct_matrix().T  # [22, 22] for x @ D
    t["tansig_table"] = C.tansig_table()
    t["second_check"] = C.SECOND_CHECK.astype(np.int32)
    for lname in ("input_dense", "denoise_output", "vad_output"):
        layer = getattr(model, lname)
        t[f"{lname}.w"] = layer.w
        t[f"{lname}.b"] = layer.b
    for lname in ("vad_gru", "noise_gru", "denoise_gru"):
        g = getattr(model, lname)
        t[f"{lname}.w"] = g.w
        t[f"{lname}.u"] = g.u
        t[f"{lname}.b"] = g.b
    return {k: jnp.asarray(v) for k, v in t.items()}


def init_state(n_streams: int) -> Dict[str, jnp.ndarray]:
    """Zero state for `n_streams` independent streams (= fresh DenoiseState)."""
    S = n_streams
    f32 = jnp.float32
    return {
        "x_prev": jnp.zeros((S, 2), f32),  # raw scaled input history (x_{-2}, x_{-1})
        "biq_a_re": jnp.zeros((S,), f32),  # modal IIR amplitude
        "biq_a_im": jnp.zeros((S,), f32),
        "hp_tail": jnp.zeros((S, HIST + 1), f32),  # last 1249 HP samples
        "last_period": jnp.zeros((S,), jnp.int32),
        "last_gain": jnp.zeros((S,), f32),
        "ceps_hist": jnp.zeros((S, C.CEPS_MEM, NB), f32),  # oldest → newest
        "gru_vad": jnp.zeros((S, C.VAD_GRU_SIZE), f32),
        "gru_noise": jnp.zeros((S, C.NOISE_GRU_SIZE), f32),
        "gru_denoise": jnp.zeros((S, C.DENOISE_GRU_SIZE), f32),
        "lastg": jnp.zeros((S, NB), f32),
        "syn_mem": jnp.zeros((S, FRAME), f32),
    }


# ---------------------------------------------------------------------------
# Small numerical helpers
# ---------------------------------------------------------------------------

def _tansig(table: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """tansig_approx: table-interpolated tanh, matching the oracle exactly.

    The 201-entry lookup is a one-hot matmul rather than a gather — TPU
    gathers inside a scan body are slow; a [.., 201] one-hot contraction
    rides the MXU/VPU instead.
    """
    sign = jnp.where(x < 0, -1.0, 1.0).astype(jnp.float32)
    ax = jnp.abs(x)
    i = jnp.clip(jnp.floor(0.5 + 25.0 * jnp.nan_to_num(ax)).astype(jnp.int32), 0, 200)
    fi = i.astype(jnp.float32)
    dx = ax - 0.04 * fi
    if jax.default_backend() == "tpu":
        # table[i] == f32(tanh(0.04 i)); evaluating tanh at the grid point on
        # the VPU differs by ~1 ulp from the host-built table and avoids a
        # gather inside the scan (gathers/one-hots dominated the scan cost).
        y = jnp.tanh(0.04 * fi)
    else:
        y = jnp.take(table, i)
    dy = 1.0 - y * y
    y = y + dx * dy * (1.0 - y * dx)
    out = sign * y
    out = jnp.where(x >= 8.0, 1.0, jnp.where(x <= -8.0, -1.0, out))
    return jnp.where(jnp.isnan(x), 0.0, out).astype(jnp.float32)


def _sigmoid(table: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 + 0.5 * _tansig(table, 0.5 * x)


def _windows(x: jnp.ndarray, stride: int, size: int, num: int) -> jnp.ndarray:
    """[S, L] → [S, num, size] sliding windows, gather-free.

    Built as k = ceil(size/stride) shifted views of a strided reshape,
    concatenated on the window axis — slices + concat lower to copies on
    TPU, where the equivalent advanced-indexing gather was the single most
    expensive op in the whole pipeline (~11 ms/block at S=128, F=100)."""
    S = x.shape[0]
    k = -(-size // stride)
    need = (num + k - 1) * stride
    if x.shape[1] < need:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
    chunks = x[:, :need].reshape(S, num + k - 1, stride)
    parts = [chunks[:, i: i + num] for i in range(k)]
    return jnp.concatenate(parts, axis=-1)[:, :, :size]


def _xcorr_fft(x: jnp.ndarray, y: jnp.ndarray, nfft: int, nlags: int) -> jnp.ndarray:
    """corr[..., i] = sum_j x[..., j] * y[..., j+i] via rfft of size nfft."""
    X = jnp.fft.rfft(x, n=nfft)
    Y = jnp.fft.rfft(y, n=nfft)
    full = jnp.fft.irfft(jnp.conj(X) * Y, n=nfft)
    return full[..., :nlags].astype(jnp.float32)


def _sliding_energy(y: jnp.ndarray, win: int, nlags: int) -> jnp.ndarray:
    """E[..., i] = sum_{j<win} y[..., i+j]^2."""
    c = jnp.cumsum(y.astype(jnp.float32) ** 2, axis=-1)
    zero = jnp.zeros_like(c[..., :1])
    c = jnp.concatenate([zero, c], axis=-1)
    return c[..., win: win + nlags] - c[..., :nlags]


def _use_block_esw() -> bool:
    """Hierarchical block-sum sliding energies instead of the banded
    [len, lags] matmuls — ~14× fewer MACs on the fine path, no window
    subtraction across blocks (head/tail resolve within a single block,
    so there is no prefix-cancellation error). Measured a WASH on v5e
    (11.87 vs 11.83 ms block step: the freed MXU time is repaid in VPU
    cumsum passes), so the battle-tested banded tables stay the default;
    CRISPY_BLOCK_ESW=on opts in (useful on MXU-bound parts)."""
    return (_use_matmul_dft()
            and os.environ.get("CRISPY_BLOCK_ESW", "off") == "on")


def _sliding_energy_blocks(sq: jnp.ndarray, win: int, nstarts: int) -> jnp.ndarray:
    """ws[.., s] = sum_{j<win} sq[.., s+j] for s in 0..nstarts-1.

    Decomposes each window at block granularity B (win must be a multiple
    of B): head = blocksum[q] − prefix[q, r], then whole blocks q+1..q+w−1
    from a cumulative block-sum, then tail = prefix[q+w, r], where
    s = B·q + r. One tiny [B, B+1] prefix matmul replaces the banded
    [len, nstarts] energy matrix."""
    B = _ESW_B
    assert win % B == 0
    nwb = win // B
    L = sq.shape[-1]
    nb = -(-L // B)
    if nb * B > L:
        sq = jnp.pad(sq, [(0, 0)] * (sq.ndim - 1) + [(0, nb * B - L)])
    nq = (nstarts - 1) // B + 1
    blocks = sq.reshape(*sq.shape[:-1], nb, B)
    # Within-block prefix sums on the VPU (a [B, B+1] HIGHEST matmul here
    # would pad K to 128 lanes and 6-pass — costlier than it saves).
    ics = jnp.cumsum(blocks, axis=-1)  # inclusive
    bsum = ics[..., -1]
    P = jnp.concatenate([jnp.zeros_like(ics[..., :1]), ics[..., :-1]],
                        axis=-1)  # exclusive prefix [.., nb, B]
    cbi = jnp.cumsum(bsum, axis=-1)  # inclusive block-sum prefix
    if nq + nwb > nb:
        P = jnp.pad(P, [(0, 0)] * (P.ndim - 2) + [(0, nq + nwb - nb), (0, 0)])
    # full[q] = sum of blocks q+1 .. q+nwb-1 = cbi[q+nwb-1] − cbi[q]
    full = cbi[..., nwb - 1: nwb - 1 + nq] - cbi[..., :nq]
    head = bsum[..., :nq, None] - P[..., :nq, :B]  # block q minus prefix r
    ws = head + full[..., None] + P[..., nwb: nwb + nq, :B]
    ws = ws.reshape(*ws.shape[:-2], nq * B)
    return ws[..., :nstarts]


def _top2(ratio: jnp.ndarray, valid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """C find_best_pitch selection: top-2 lags of ratio among valid entries,
    first-index tie-break, with the C defaults (0, 1) / (i, 0) on <2 valid."""
    neg = jnp.float32(-np.inf)
    r = jnp.where(valid, ratio, neg)
    best = jnp.argmax(r, axis=-1)
    nlags = ratio.shape[-1]
    onehot = jax.nn.one_hot(best, nlags, dtype=bool)
    r2 = jnp.where(onehot, neg, r)
    second = jnp.argmax(r2, axis=-1)
    nvalid = valid.sum(axis=-1)
    best = jnp.where(nvalid > 0, best, 0)
    second = jnp.where(nvalid > 1, second, jnp.where(nvalid == 1, 0, 1))
    return best.astype(jnp.int32), second.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Stage 1: HP biquad (Toeplitz local + modal carry scan)
# ---------------------------------------------------------------------------

def _hp_biquad(params, state, x: jnp.ndarray) -> Tuple[dict, jnp.ndarray]:
    """x: [S, F, 480] scaled raw frames → HP-filtered frames, same shape."""
    S, F, _ = x.shape
    G = F * (FRAME // _BIQ_BS)  # sub-frame count
    flat = x.reshape(S, F * FRAME)
    hist = jnp.concatenate([state["x_prev"], flat], axis=-1)
    xm1 = hist[:, 1:-1].reshape(S, G, _BIQ_BS)
    xm2 = hist[:, :-2].reshape(S, G, _BIQ_BS)
    xp = flat.reshape(S, G, _BIQ_BS) + C.BIQUAD_B_HP[0] * xm1 + C.BIQUAD_B_HP[1] * xm2

    y_local = jnp.einsum("sgj,ji->sgi", xp, params["biq_toeplitz"], precision=_HIGH)
    inj_re = jnp.einsum("sgj,j->sg", xp, params["biq_kinj_re"], precision=_HIGH)
    inj_im = jnp.einsum("sgj,j->sg", xp, params["biq_kinj_im"], precision=_HIGH)

    p_re, p_im = params["biq_p480_re"], params["biq_p480_im"]

    # Linear complex recurrence a_g = p^120 * a_{g-1} + inj_g: log-depth
    # associative scan instead of a sequential lax.scan (whose per-step
    # output stacking dominated the stage).
    ones = jnp.ones((S, G), jnp.float32)
    elems = (ones * p_re, ones * p_im, inj_re, inj_im)

    def combine(x, y):
        # (A, b) o (C, d) = (C*A, C*b + d), complex pairs
        ar, ai, br, bi = x
        cr, ci, dr, di = y
        return (
            cr * ar - ci * ai,
            cr * ai + ci * ar,
            cr * br - ci * bi + dr,
            cr * bi + ci * br + di,
        )

    _, _, acc_re, acc_im = lax.associative_scan(combine, elems, axis=1)
    # acc_g = amplitude AFTER sub-frame g given zero initial state; add the
    # carried initial amplitude propagated by p^(120*(g+1)).
    pk_re, pk_im = params["biq_pows_re"], params["biq_pows_im"]  # p^(120(g+1)), [G]
    a0r = state["biq_a_re"][:, None]
    a0i = state["biq_a_im"][:, None]
    tot_re = acc_re + a0r * pk_re[:G] - a0i * pk_im[:G]
    tot_im = acc_im + a0r * pk_im[:G] + a0i * pk_re[:G]
    # Amplitude at frame START = previous frame's total (frame 0: the carry).
    amps_re = jnp.concatenate([a0r, tot_re[:, :-1]], axis=1)[..., None]
    amps_im = jnp.concatenate([a0i, tot_im[:, :-1]], axis=1)[..., None]
    a_re_f = tot_re[:, -1]
    a_im_f = tot_im[:, -1]
    y = y_local + 2.0 * (amps_re * params["biq_pvec_re"] - amps_im * params["biq_pvec_im"])

    new_state = dict(state)
    new_state["x_prev"] = flat[:, -2:]
    new_state["biq_a_re"] = a_re_f
    new_state["biq_a_im"] = a_im_f
    return new_state, y.astype(jnp.float32).reshape(S, F, FRAME)


# ---------------------------------------------------------------------------
# Stage 2: pitch analysis (frame-parallel search + tiny continuation scan)
# ---------------------------------------------------------------------------

def _cross_corr(params, x, y, tagx, tagy, tagc, nlags):
    """corr[.., i] = sum_j x[.., j] y[.., j+i] — matmul DFT on TPU, FFT off."""
    if _use_matmul_dft():
        prec = _pitch_prec()
        if _use_radix_dft():
            kx = 225 if tagc == "c4" else 449
            xri = rdft.apply_fwd(params, f"rx_{tagx}", x, kx, precision=prec)
            yri = rdft.apply_fwd(params, f"rx_{tagy}", y, kx, precision=prec)
            xr, xi = xri[..., :kx], xri[..., kx:]
            yr, yi = yri[..., :kx], yri[..., kx:]
            cr = xr * yr + xi * yi  # conj(X) * Y
            ci = xr * yi - xi * yr
            return rdft.apply_inv(params, f"rx_{tagc}", cr, ci, nlags,
                                  precision=prec)
        kx = params[f"cf_{tagx}_re"].shape[1]
        ky = params[f"cf_{tagy}_re"].shape[1]
        xri = jnp.einsum("...n,nk->...k", x, params[f"cf_{tagx}"], precision=prec)
        yri = jnp.einsum("...n,nk->...k", y, params[f"cf_{tagy}"], precision=prec)
        xr, xi = xri[..., :kx], xri[..., kx:]
        yr, yi = yri[..., :ky], yri[..., ky:]
        cr = xr * yr + xi * yi  # conj(X) * Y
        ci = xr * yi - xi * yr
        if _use_packed_mid():
            # One packed [2k, lags] dot: the split form lowered to FOUR
            # kOutput fusions that each re-read the [.., 2k] transforms
            # (~360 MB/block at S=128, F=100 — tools/tpu_denoise_traffic).
            # Accumulation regroups (one 2k-sum vs two k-sums added):
            # ~1e-7 relative, far inside the pitch path's decision margins.
            cri = jnp.concatenate([cr, ci], axis=-1)
            full = jnp.einsum("...k,ki->...i", cri, params[f"ci_{tagc}"],
                              precision=prec)
            return full[..., :nlags]
        full = (
            jnp.einsum("...k,ki->...i", cr, params[f"ci_{tagc}_re"], precision=prec)
            + jnp.einsum("...k,ki->...i", ci, params[f"ci_{tagc}_im"], precision=prec)
        )
        return full[..., :nlags]
    nfft = 512 if tagc == "c4" else 1024
    return _xcorr_fft(x, y, nfft, nlags)


def _pitch_index(params, state, ext: jnp.ndarray, F: int):
    """ext: [S, 1+HIST+F*480] HP samples (ext[0] is the decimator edge).

    Returns (pitch_index [S, F] int32, new last_period/last_gain).
    """
    S = ext.shape[0]
    # Global 2x decimation with the 3-tap smoother, via a free reshape into
    # sample pairs (strided slices lower to slow gathers on TPU):
    # D[j] = .5*(.5*(ext[2j] + ext[2j+2]) + ext[2j+1]).
    nD = (ext.shape[1] - 1) // 2
    pairs = ext[:, : 2 * nD].reshape(S, nD, 2)
    D = (0.5 * (0.5 * (pairs[:, :, 0] + jnp.concatenate(
        [pairs[:, 1:, 0], ext[:, 2 * nD: 2 * nD + 1]], axis=1)) + pairs[:, :, 1])
    ).astype(jnp.float32)  # [S, nD]
    # Quarter-rate stream D2[m] = D[2m], built the same way from quads.
    nD2 = (ext.shape[1] - 3) // 4
    quads = ext[:, : 4 * nD2].reshape(S, nD2, 4)
    D2 = (0.5 * (0.5 * (quads[:, :, 0] + quads[:, :, 2]) + quads[:, :, 1])).astype(jnp.float32)

    # Per-frame 864-sample decimated pitch buffers (stride 240).
    bds = _windows(D, 240, PBUF // 2, F)  # [S, F, 864]
    # Fix index 0: per-frame left edge uses only its own first two samples
    # (buffer f starts at ext[1 + f*480]; b_ds[0] = .5*(.5*buf[1] + buf[0])).
    starts = np.arange(F) * FRAME
    b0 = 0.5 * (0.5 * ext[:, starts + 2] + ext[:, starts + 1])
    bds = bds.at[:, :, 0].set(b0)

    # --- pitch_search: coarse at /4 of full rate --------------------------
    x4 = _windows(D2[:, (PMAX >> 2):], 120, PFRAME >> 2, F)  # [S, F, 240]
    y4 = _windows(D2, 120, (PFRAME + (PMAX - 3 * PMIN)) >> 2, F)  # [S, F, 387]
    y4 = y4.at[:, :, 0].set(b0)  # y4[0] = bds[0] (per-frame edge fix)
    xc4 = _cross_corr(params, x4, y4, "x4", "y4", "c4", _COARSE_LAGS)
    if _use_block_esw():
        e4 = _sliding_energy_blocks(y4 * y4, 240, _COARSE_LAGS)
    else:
        e4 = jnp.einsum("...n,ni->...i", y4 * y4, params["esw_4"],
                        precision=_pitch_prec())
    syy4 = jnp.maximum(1.0, 1.0 + e4)
    neg = jnp.float32(-1e30)
    ratio4 = jnp.where(xc4 > 0, (xc4 * xc4) / syy4, neg)
    best4, second4 = _top2(ratio4, xc4 > 0)

    # --- fine stage + remove_doubling share one cross-correlation ----------
    x2 = bds[..., PMAX // 2:]  # [S, F, 480]
    cc = _cross_corr(params, x2, bds, "x2", "y2", "c2", _RD_MAXP + 1)  # [S,F,385]
    if _use_block_esw():
        # Both banded-column families of esw_fine are length-480 windows
        # with starts 0..384: syy2[i] = ws[i], yyl[T] = ws[384 − T].
        ws = _sliding_energy_blocks(bds * bds, _RD_N, _RD_MAXP + 1)
        energies = jnp.concatenate(
            [ws[..., :_FINE_LAGS], jnp.flip(ws, axis=-1)], axis=-1)
    else:
        energies = jnp.einsum("...n,ni->...i", bds * bds, params["esw_fine"],
                              precision=_pitch_prec())
    xc2_raw = cc[..., :_FINE_LAGS]
    lags2 = jnp.arange(_FINE_LAGS, dtype=jnp.int32)
    near = (jnp.abs(lags2 - 2 * best4[..., None]) <= 2) | (
        jnp.abs(lags2 - 2 * second4[..., None]) <= 2
    )
    xc2 = jnp.where(near, jnp.maximum(-1.0, xc2_raw), 0.0)
    syy2 = jnp.maximum(1.0, 1.0 + energies[..., :_FINE_LAGS])
    ratio2 = jnp.where(xc2 > 0, (xc2 * xc2) / syy2, neg)
    best2, _ = _top2(ratio2, xc2 > 0)

    # Pseudo-interpolation around the fine winner.
    bm1 = jnp.take_along_axis(xc2, jnp.maximum(best2 - 1, 0)[..., None], axis=-1)[..., 0]
    b0v = jnp.take_along_axis(xc2, best2[..., None], axis=-1)[..., 0]
    bp1 = jnp.take_along_axis(xc2, jnp.minimum(best2 + 1, _FINE_LAGS - 1)[..., None], axis=-1)[..., 0]
    offs = jnp.where(
        bp1 - bm1 > 0.7 * (b0v - bm1), 1,
        jnp.where(bm1 - bp1 > 0.7 * (b0v - bp1), -1, 0),
    )
    offs = jnp.where((best2 > 0) & (best2 < _FINE_LAGS - 1), offs, 0)
    pitch0 = 2 * best2 - offs  # full-rate period from pitch_search
    T0 = jnp.minimum((PMAX - pitch0) // 2, _RD_MAXP - 1)  # half-rate, clamped

    # --- remove_doubling: everything per-candidate, frame-parallel ---------
    v = x2  # [S, F, 480] the analysis segment
    xx = jnp.sum(v * v, axis=-1)
    corr = jnp.flip(cc, axis=-1)  # corr[T] = cc[384 - T], T in 0..384
    yyl = jnp.maximum(0.0, energies[..., _FINE_LAGS:])  # already T-indexed

    # All candidate reads (corr/yyl at T_cand, T_cand±1, Tb_cand) in one
    # Pallas one-hot-matmul kernel — XLA's take_along_axis gathers were the
    # pipeline's dominant cost.
    from .pallas_ops import rd_candidate_gather

    ks = jnp.arange(2, 16, dtype=jnp.int32)  # [14]
    T0k = T0[..., None]
    T1 = (2 * T0k + ks) // (2 * ks)  # [S, F, 14]
    xy_t, xc_m1, xc_p1, yy_t, xy_tb, yy_tb = rd_candidate_gather(corr, yyl, T0)
    # Candidate axis: index 0 = "keep T0", 1.. = subharmonics k=2..15.
    T_cand = jnp.concatenate([T0k, T1], axis=-1)  # [S, F, 15]
    xy_cand = 0.5 * (xy_t + xy_tb)
    yy_cand = 0.5 * (yy_t + yy_tb)
    # Candidate 0 averages (T0, T0) with itself — exactly xy(T0), yy(T0).
    g_cand = xy_cand / jnp.sqrt(1.0 + xx[..., None] * yy_cand)
    g0 = g_cand[..., 0]
    valid = jnp.cumprod((T1 >= _RD_MINP).astype(jnp.int32), axis=-1).astype(bool)

    # Per-candidate refinement (offset interpolation + gain), all parallel.
    off = jnp.where(
        xc_p1 - xc_m1 > 0.7 * (xy_t - xc_m1), 1,
        jnp.where(xc_m1 - xc_p1 > 0.7 * (xy_t - xc_p1), -1, 0),
    )
    best_xy = jnp.maximum(0.0, xy_cand)
    pg_cand = jnp.where(yy_cand <= best_xy, 1.0, best_xy / (yy_cand + 1.0))
    pg_cand = jnp.minimum(pg_cand, g_cand)
    Tout_cand = jnp.maximum(2 * T_cand + off, PMIN).astype(jnp.int32)  # [S, F, 15]

    # --- sequential continuation scan (pure elementwise, no gathers) -------
    # All per-frame inputs pack into ONE array so the scan does a single
    # dynamic-slice per step (7 separate xs cost ~7 ms/block in slice fusions).
    ksf = ks.astype(jnp.float32)
    packed = jnp.concatenate(
        [
            T1.astype(jnp.float32),  # [..., 0:14]   (ints <= 384: exact in f32)
            g_cand[..., 1:],  # [..., 14:28]
            valid.astype(jnp.float32),  # [..., 28:42]
            g0[..., None],  # [..., 42]
            T0.astype(jnp.float32)[..., None],  # [..., 43]
            Tout_cand.astype(jnp.float32),  # [..., 44:59]
            pg_cand,  # [..., 59:74]
        ],
        axis=-1,
    )  # [S, F, 74]

    def rd_step(carry, inp):
        prev_T, prev_g = carry  # [S] full-rate period (f32, exact), gain
        T1_f = inp[:, 0:14]
        g1_f = inp[:, 14:28]
        valid_f = inp[:, 28:42] > 0.5
        g0_f = inp[:, 42]
        T0_f = inp[:, 43]
        Tout_f = inp[:, 44:59]
        pg_f = inp[:, 59:74]
        pph = jnp.floor(prev_T * 0.5)  # prev_T // 2 on exact small ints
        dT = jnp.abs(T1_f - pph[:, None])
        cont = jnp.where(
            dT <= 1, prev_g[:, None],
            jnp.where((dT <= 2) & (5.0 * ksf * ksf < T0_f[:, None]), 0.5 * prev_g[:, None], 0.0),
        )
        thresh = jnp.maximum(0.3, 0.7 * g0_f[:, None] - cont)
        thresh = jnp.where(
            T1_f < 3 * _RD_MINP, jnp.maximum(0.4, 0.85 * g0_f[:, None] - cont),
            jnp.where(T1_f < 2 * _RD_MINP, jnp.maximum(0.5, 0.9 * g0_f[:, None] - cont), thresh),
        )
        choose = valid_f & (g1_f > thresh)
        kidx = jnp.max(jnp.where(choose, jnp.arange(14), -1), axis=-1)  # last winner
        sel = jax.nn.one_hot(kidx + 1, 15, dtype=jnp.float32)  # [S, 15]; 0 = T0
        T_out = jnp.sum(sel * Tout_f, axis=-1)
        pg = jnp.sum(sel * pg_f, axis=-1)
        return (T_out, pg), T_out

    if _use_matmul_dft():
        # Fused Pallas scan: the lax.scan version dispatches F tiny steps
        # (~8.6 ms/block at F=100 — half the whole block step); the kernel
        # runs the recurrence in VMEM in one pallas_call. Bit-exact.
        from .pallas_rnn import rd_scan_pallas

        pitch_f, lp_f, lg = rd_scan_pallas(
            packed, state["last_period"].astype(jnp.float32), state["last_gain"],
            interpret=jax.default_backend() != "tpu")
        return pitch_f.astype(jnp.int32), lp_f.astype(jnp.int32), lg

    (lp, lg), pitch_idx = lax.scan(
        rd_step,
        (state["last_period"].astype(jnp.float32), state["last_gain"]),
        jnp.moveaxis(packed, 1, 0),
    )
    return (
        jnp.moveaxis(pitch_idx, 0, 1).astype(jnp.int32),
        lp.astype(jnp.int32),
        lg,
    )  # [S, F], [S], [S]


# ---------------------------------------------------------------------------
# Stage 3: spectra, band energies, features
# ---------------------------------------------------------------------------

def _use_matmul_dft() -> bool:
    """MXU matmul DFT on TPU (much faster than XLA FFT at N=960); FFT on
    CPU/GPU where an O(N^2) matmul would be the slow path."""
    return jax.default_backend() == "tpu"


def _use_radix_dft() -> bool:
    """Radix-split matmul DFTs (radix_dft.py): mathematically exact
    regroupings of the flat matrices with 4–8× fewer padded MACs — but
    MEASURED NET-NEGATIVE on v5e (block step 14.4 ms vs 11.8 flat at
    S=128/F=100): the twiddle/recombine passes add ~50 MB of VPU/HBM
    traffic per transform, which costs more than the saved MXU time at
    this chip's compute/bandwidth balance (the flat HIGHEST matmul DFT
    sits near the roofline knee; see NEXT_STEPS round-4 notes). Kept as
    an opt-in (CRISPY_RADIX_DFT=on) because the balance differs on
    larger TPUs where MXU time dominates."""
    return (_use_matmul_dft()
            and os.environ.get("CRISPY_RADIX_DFT", "off") == "on")


def _use_packed_mid() -> bool:
    """Packed (re‖im) spectrum layout through the default XLA path's
    mid-section: the analysis DFT already emits [.., 962] packed; carrying
    it packed through the pitch filter + gain stage and synthesizing with
    ONE [962, 960] HIGHEST dot (instead of two [481, 960] dots + add)
    removes several ~50 MB HBM passes per block (tools/tpu_denoise_traffic:
    the split synthesis alone was 246 MB of fusion traffic at S=128,
    F=100). Elementwise math is identical (per-frequency gains duplicated
    across both halves); only the synthesis/xcorr dot accumulation
    regroups (~1e-7 relative). CRISPY_PACKED_MID=off restores the split
    lowering (kept for in-graph A/Bs)."""
    return (_use_matmul_dft()
            and os.environ.get("CRISPY_PACKED_MID", "on") != "off")


def _use_fused_spectra() -> bool:
    """OPT-IN fused Pallas spectra kernels (pallas_frontend): ~+10%
    denoise throughput, but Mosaic's single-pass f32 matmul relaxes
    worst-sample oracle parity to ~1e-3 (the default XLA path holds the
    north-star 1e-4; see the measured precision table in
    pallas_frontend.py). Enable with CRISPY_FUSED_SPECTRA=on."""
    return (_use_matmul_dft()
            and os.environ.get("CRISPY_FUSED_SPECTRA", "off") == "on")


def _spectrum_ri(params, frames: jnp.ndarray) -> jnp.ndarray:
    """frames [.., 960] → PACKED windowed DFT [.., 962] (re 0..480 ‖ im
    481..961) — the matmul path's native output layout. Bit-identical to
    `_spectrum`'s halves (which are slices of this very dot)."""
    if _use_radix_dft():
        return rdft.apply_fwd(params, "rx_dft", frames, NFREQ)
    return jnp.einsum("...n,nk->...k", frames, params["dft_fwd"],
                      precision=_HIGH)


def _spectrum(params, frames: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """frames [.., 960] → windowed DFT (re, im) [.., 481], RNNoise 1/N scaling."""
    if _use_matmul_dft():
        ri = _spectrum_ri(params, frames)
        return ri[..., :NFREQ], ri[..., NFREQ:]
    hw = params["half_window"]
    w = jnp.concatenate([hw, hw[::-1]])
    X = jnp.fft.rfft(frames * w, n=WIN, axis=-1) / WIN
    return jnp.real(X).astype(jnp.float32), jnp.imag(X).astype(jnp.float32)


def _inv_spectrum(params, re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    """(re, im) [.., 481] → windowed time frame [.., 960] (x WIN scaling folded)."""
    if _use_matmul_dft():
        if _use_radix_dft():
            return rdft.apply_inv(params, "rx_inv", re, im, WIN)
        return (
            jnp.einsum("...k,kn->...n", re, params["dft_inv_re"], precision=_HIGH)
            + jnp.einsum("...k,kn->...n", im, params["dft_inv_im"], precision=_HIGH)
        )
    hw = params["half_window"]
    w = jnp.concatenate([hw, hw[::-1]])
    return jnp.fft.irfft(lax.complex(re, im), n=WIN, axis=-1) * WIN * w


def _band_energy(params, Xr: jnp.ndarray, Xi: jnp.ndarray) -> jnp.ndarray:
    e = Xr * Xr + Xi * Xi
    return jnp.einsum("...q,qb->...b", e, params["band_e"], precision=_HIGH)


def _band_corr(params, Xr, Xi, Pr, Pi) -> jnp.ndarray:
    c = Xr * Pr + Xi * Pi
    return jnp.einsum("...q,qb->...b", c, params["band_e"], precision=_HIGH)


def _interp_gain(params, g: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...b,bq->...q", g, params["band_interp"], precision=_HIGH)


def _log_band_energies(Ex: jnp.ndarray) -> jnp.ndarray:
    """Intra-frame max-follow smoothing over the 22 bands (tiny scan)."""
    v = jnp.log10(1e-2 + Ex)  # [S, F, 22]

    def step(carry, vi):
        log_max, follow = carry
        val = jnp.maximum(log_max - 7.0, jnp.maximum(follow - 1.5, vi))
        return (jnp.maximum(log_max, val), jnp.maximum(follow - 1.5, val)), val

    init = (jnp.full(v.shape[:-1], -2.0, jnp.float32),
            jnp.full(v.shape[:-1], -2.0, jnp.float32))
    _, ly = lax.scan(step, init, jnp.moveaxis(v, -1, 0))
    return jnp.moveaxis(ly, 0, -1)


def _cepstral_features(params, state, ceps0: jnp.ndarray, silence: jnp.ndarray):
    """Silence-aware cepstral delta + variability features, frame-parallel.

    The reference's ring buffer only advances on non-silent frames, so
    "previous" means previous *non-silent*: we rank non-silent frames with a
    cumsum, scatter their cepstra into rank order behind the carried
    8-deep history, and gather deltas/variability windows by rank.
    """
    S, F, _ = ceps0.shape
    nonsil = ~silence
    rank = jnp.cumsum(nonsil.astype(jnp.int32), axis=1)  # inclusive [S, F]
    pos = jnp.where(nonsil, rank - 1, F)  # silent → dustbin
    ordered = jnp.zeros((S, F + 1, NB), jnp.float32)
    ordered = ordered.at[jnp.arange(S)[:, None], pos].set(ceps0)
    padded = jnp.concatenate([state["ceps_hist"], ordered[:, :F]], axis=1)  # [S, 8+F, 22]

    def gather(idx):  # idx [S, F] → [S, F, 22]
        return jnp.take_along_axis(padded, jnp.clip(idx, 0, 7 + F)[..., None], axis=1)

    c1 = gather(C.CEPS_MEM + rank - 2)
    c2 = gather(C.CEPS_MEM + rank - 3)

    # Variability: the 8-slot window ending at the current frame's rank.
    widx = rank[..., None] + jnp.arange(C.CEPS_MEM)  # [S, F, 8] into padded
    mem = jax.vmap(lambda p, w: p[w])(padded, jnp.clip(widx, 0, 7 + F))  # [S, F, 8, 22]
    diff = mem[:, :, :, None, :] - mem[:, :, None, :, :]
    dist = jnp.sum(diff * diff, axis=-1)  # [S, F, 8, 8]
    eye = jnp.eye(C.CEPS_MEM, dtype=bool)
    dist = jnp.where(eye, jnp.float32(np.inf), dist)
    spec_var = jnp.sum(jnp.min(dist, axis=-1), axis=-1) / C.CEPS_MEM  # [S, F]

    # Updated history: last 8 non-silent cepstra at block end.
    r_last = rank[:, -1]
    hidx = r_last[:, None] + jnp.arange(C.CEPS_MEM)
    new_hist = jax.vmap(lambda p, w: p[w])(padded, hidx)
    return c1, c2, spec_var, new_hist


# ---------------------------------------------------------------------------
# Stage 4: the GRU network scan (jnp version; see pallas_rnn for the kernel)
# ---------------------------------------------------------------------------

def _gru_step(params, table, prefix: str, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    w, u, b = params[f"{prefix}.w"], params[f"{prefix}.u"], params[f"{prefix}.b"]
    n = u.shape[0]
    pre_in = jnp.dot(x, w, precision=_HIGH) + b
    rec_zr = jnp.dot(h, u[:, : 2 * n], precision=_HIGH)
    z = _sigmoid(table, pre_in[:, :n] + rec_zr[:, :n])
    r = _sigmoid(table, pre_in[:, n: 2 * n] + rec_zr[:, n:])
    hcand = pre_in[:, 2 * n:] + jnp.dot(h * r, u[:, 2 * n:], precision=_HIGH)
    hcand = jnp.maximum(hcand, 0.0)  # relu candidate
    return z * h + (1.0 - z) * hcand


def _nn_scan(params, state, feats: jnp.ndarray, silence: jnp.ndarray):
    """feats [S, F, 42], silence [S, F] → raw gains, smoothed gains, vad."""
    table = params["tansig_table"]

    def step(carry, inp):
        vad_s, noi_s, den_s, lastg = carry
        f, sil = inp[:, :42], inp[:, 42] > 0.5  # packed xs: one slice per step
        keep = sil[:, None]
        dense = _tansig(table, jnp.dot(f, params["input_dense.w"], precision=_HIGH)
                        + params["input_dense.b"])
        vad_n = _gru_step(params, table, "vad_gru", vad_s, dense)
        vad_s2 = jnp.where(keep, vad_s, vad_n)
        vad_p = _sigmoid(table, jnp.dot(vad_s2, params["vad_output.w"], precision=_HIGH)
                         + params["vad_output.b"])[:, 0]
        noise_in = jnp.concatenate([dense, vad_s2, f], axis=-1)
        noi_n = _gru_step(params, table, "noise_gru", noi_s, noise_in)
        noi_s2 = jnp.where(keep, noi_s, noi_n)
        den_in = jnp.concatenate([vad_s2, noi_s2, f], axis=-1)
        den_n = _gru_step(params, table, "denoise_gru", den_s, den_in)
        den_s2 = jnp.where(keep, den_s, den_n)
        graw = _sigmoid(table, jnp.dot(den_s2, params["denoise_output.w"], precision=_HIGH)
                        + params["denoise_output.b"])
        gs = jnp.maximum(graw, np.float32(C.ALPHA_LASTG) * lastg)
        lastg2 = jnp.where(keep, lastg, gs)
        vad_out = jnp.where(sil, 0.0, vad_p)
        # one packed emit per step: scan-output stacking costs per array
        out = jnp.concatenate([graw, gs, vad_out[:, None]], axis=-1)  # [S, 45]
        return (vad_s2, noi_s2, den_s2, lastg2), out

    init = (state["gru_vad"], state["gru_noise"], state["gru_denoise"], state["lastg"])
    packed = jnp.concatenate([feats, silence[..., None].astype(jnp.float32)], axis=-1)
    (vad_f, noi_f, den_f, lastg_f), out = lax.scan(
        step, init, jnp.moveaxis(packed, 1, 0)
    )
    out = jnp.moveaxis(out, 0, 1)  # [S, F, 45]
    outs = (out[..., :NB], out[..., NB: 2 * NB], out[..., 2 * NB])
    return outs, {"gru_vad": vad_f, "gru_noise": noi_f, "gru_denoise": den_f, "lastg": lastg_f}


# ---------------------------------------------------------------------------
# The block step
# ---------------------------------------------------------------------------

def frontend_block(params, state, block: jnp.ndarray):
    """The analysis frontend: block [S, F*480] in [-1, 1] → (new_state,
    dict of spectra/energies/features). Shared by denoising and training
    (the trainer computes gain targets from these band energies)."""
    S, L = block.shape
    assert L % FRAME == 0, "block length must be a multiple of 480"
    F = L // FRAME

    x = (block.astype(jnp.float32) * 32768.0).reshape(S, F, FRAME)
    state, hp = _hp_biquad(params, state, x)
    hp_flat = hp.reshape(S, F * FRAME)
    ext = jnp.concatenate([state["hp_tail"], hp_flat], axis=-1)  # [S, 1+1248+L]
    state = dict(state)
    state["hp_tail"] = ext[:, -(HIST + 1):]

    fused = _use_fused_spectra()
    if fused:
        # ONE kernel: windows formed in VMEM from the raw signal, DFT +
        # band energies fused (pallas_frontend). Y/P carry the padded
        # (re 0..480 ‖ im 512..992) layout end-to-end.
        from . import pallas_frontend as pf

        Y, Ex = pf.fwd_spectrum_bands(
            ext[:, 1 + HIST - FRAME:], params["dft_fwd_a512"],
            params["dft_fwd_b512"], params["band_e_pad"], F)
        Xr, Xi = Y[..., :NFREQ], Y[..., 512: 512 + NFREQ]
        Yri = None
    else:
        # Analysis spectra: window f covers ext[769 + f*480 : +960]. Each
        # _spectrum call is ONE fused (re‖im) DFT matmul; concatenating awin
        # and pwin into a single call was tried and lost — the [S, 2F, 960]
        # copy it materializes costs more HBM than the saved dispatch.
        Y = None
        awin = _windows(ext[:, 1 + HIST - FRAME:], FRAME, WIN, F)  # [S, F, 960]
        if _use_packed_mid():
            Yri = _spectrum_ri(params, awin)  # carried packed to the gain stage
            Xr, Xi = Yri[..., :NFREQ], Yri[..., NFREQ:]
        else:
            Yri = None
            Xr, Xi = _spectrum(params, awin)
        Ex = _band_energy(params, Xr, Xi)

    # Pitch.
    pitch_idx, lp, lg = _pitch_index(params, state, ext, F)
    state["last_period"], state["last_gain"] = lp, lg

    # Pitch-delayed window: ext[1 + f*480 + 1728 - 960 - idx : +960] — a
    # contiguous slice per frame; the Pallas DMA kernel avoids XLA's
    # per-element gather lowering.
    from .pallas_ops import pitch_window_gather

    starts = 1 + jnp.arange(F, dtype=jnp.int32)[None, :] * FRAME + (PBUF - WIN) - pitch_idx
    pwin = pitch_window_gather(ext, starts)  # [S, F, 960]
    if fused:
        P, Ep = pf.win_spectrum_bands(pwin, params["dft_fwd_pad"],
                                      params["band_e_pad"])
        Pr, Pi = P[..., :NFREQ], P[..., 512: 512 + NFREQ]
        # banded Xr*Pr + Xi*Pi directly on the padded layout (the table
        # is duplicated across both halves; pad columns are zero)
        Exp = jnp.einsum("sfq,qb->sfb", Y * P, params["band_e_1024"],
                         precision=_HIGH) / jnp.sqrt(0.001 + Ex * Ep)
    else:
        P = None
        if Yri is not None:
            Pri = _spectrum_ri(params, pwin)
            Pr, Pi = Pri[..., :NFREQ], Pri[..., NFREQ:]
        else:
            Pri = None
            Pr, Pi = _spectrum(params, pwin)
        Ep = _band_energy(params, Pr, Pi)
        Exp = _band_corr(params, Xr, Xi, Pr, Pi) / jnp.sqrt(0.001 + Ex * Ep)

    # Features.
    E = jnp.sum(Ex, axis=-1)
    silence = E < C.SILENCE_ENERGY  # [S, F]
    Ly = _log_band_energies(Ex)
    ceps0 = jnp.einsum("sfb,bc->sfc", Ly, params["dct"], precision=_HIGH)
    ceps0 = ceps0.at[:, :, 0].add(-12.0).at[:, :, 1].add(-4.0)
    c1, c2, spec_var, new_hist = _cepstral_features(params, state, ceps0, silence)
    state["ceps_hist"] = new_hist

    nd = C.NB_DELTA_CEPS
    exp_dct = jnp.einsum("sfb,bc->sfc", Exp, params["dct"], precision=_HIGH)[..., :nd]
    exp_dct = exp_dct.at[..., 0].add(-1.3).at[..., 1].add(-0.9)
    feats = jnp.concatenate(
        [
            jnp.concatenate([(ceps0 + c1 + c2)[..., :nd], ceps0[..., nd:]], axis=-1),
            (ceps0 - c2)[..., :nd],
            (ceps0 - 2.0 * c1 + c2)[..., :nd],
            exp_dct,
            (0.01 * (pitch_idx.astype(jnp.float32) - 300.0))[..., None],
            (spec_var - 2.1)[..., None],
        ],
        axis=-1,
    )  # [S, F, 42]
    feats = jnp.where(silence[..., None], 0.0, feats)
    return state, {
        "Xr": Xr, "Xi": Xi, "Ex": Ex, "Pr": Pr, "Pi": Pi, "Ep": Ep,
        "Exp": Exp, "feats": feats, "silence": silence,
        # padded-layout spectra (fused path only; None otherwise)
        "Y": Y, "P": P,
        # packed [.., 962] spectra (default path with _use_packed_mid)
        "Yri": Yri, "Pri": Pri if Yri is not None else None,
    }


def denoise_block(params, state, block: jnp.ndarray):
    """One jitted step: block [S, F*480] in [-1, 1] → (new_state, out same shape)."""
    S, L = block.shape
    state, fr = frontend_block(params, state, block)
    Xr, Xi, Ex = fr["Xr"], fr["Xi"], fr["Ex"]
    Pr, Pi, Ep, Exp = fr["Pr"], fr["Pi"], fr["Ep"], fr["Exp"]
    feats, silence = fr["feats"], fr["silence"]

    # Network: fused Pallas scan on TPU (weights VMEM-resident, state in
    # scratch across frames), XLA scan elsewhere.
    if _use_matmul_dft():
        from .pallas_rnn import nn_scan_pallas

        (graw, gsmooth, vad), nn_state = nn_scan_pallas(
            params, state, feats, silence,
            interpret=jax.default_backend() != "tpu")
    else:
        (graw, gsmooth, vad), nn_state = _nn_scan(params, state, feats, silence)
    state.update(nn_state)

    # Pitch filter (raw gains), then smoothed-gain application.
    g2 = graw * graw
    exp2 = Exp * Exp
    r = jnp.where(Exp > graw, 1.0, exp2 * (1.0 - g2) / (0.001 + g2 * (1.0 - exp2)))
    r = jnp.sqrt(jnp.clip(r, 0.0, 1.0)) * jnp.sqrt(Ex / (1e-8 + Ep))
    keep = silence[..., None]
    if fr["Y"] is not None:
        # padded-layout mid-section: the same per-frequency gains apply to
        # the re and im halves, so interp/band tables duplicated across
        # both halves run the filter with NO repacking; synthesis is the
        # fused inverse-DFT + overlap-add kernel.
        from . import pallas_frontend as pf

        Y, P = fr["Y"], fr["P"]
        rf = jnp.einsum("...b,bq->...q", r, params["band_interp_1024"],
                        precision=_HIGH)
        Xp = Y + rf * P
        newE = jnp.einsum("sfq,qb->sfb", Xp * Xp, params["band_e_1024"],
                          precision=_HIGH)
        norm = jnp.sqrt(Ex / (1e-8 + newE))
        gain_all = (jnp.einsum("...b,bq->...q", norm,
                               params["band_interp_1024"], precision=_HIGH)
                    * jnp.einsum("...b,bq->...q", gsmooth,
                                 params["band_interp_1024"], precision=_HIGH))
        Xo = jnp.where(keep, Y, Xp * gain_all)
        out, new_mem = pf.inv_spectrum_ola(
            Xo, params["dft_inv_a"], params["dft_inv_b"], state["syn_mem"],
            Xo.shape[1])
        state["syn_mem"] = new_mem
        return state, (out / 32768.0).reshape(S, L), vad

    if fr["Yri"] is not None:
        # Packed mid-section (default TPU path): identical elementwise math
        # on the [.., 962] layout (interp tables duplicated across halves),
        # ONE packed synthesis dot. See _use_packed_mid.
        Yri, Pri = fr["Yri"], fr["Pri"]
        rf = jnp.einsum("...b,bq->...q", r, params["band_interp_ri"],
                        precision=_HIGH)
        Xp = Yri + rf * Pri
        newE = _band_energy(params, Xp[..., :NFREQ], Xp[..., NFREQ:])
        norm = jnp.sqrt(Ex / (1e-8 + newE))
        gain_all = (
            jnp.einsum("...b,bq->...q", norm, params["band_interp_ri"],
                       precision=_HIGH)
            * jnp.einsum("...b,bq->...q", gsmooth, params["band_interp_ri"],
                         precision=_HIGH))
        Xo = jnp.where(keep, Yri, Xp * gain_all)
        xt = jnp.einsum("...k,kn->...n", Xo, params["dft_inv"],
                        precision=_HIGH)
        tails = jnp.concatenate(
            [state["syn_mem"][:, None, :], xt[:, :-1, FRAME:]], axis=1)
        out = (xt[..., :FRAME] + tails) / 32768.0
        state["syn_mem"] = xt[:, -1, FRAME:]
        return state, out.reshape(S, L), vad

    rf = _interp_gain(params, r)
    Xpr, Xpi = Xr + rf * Pr, Xi + rf * Pi
    newE = _band_energy(params, Xpr, Xpi)
    norm = jnp.sqrt(Ex / (1e-8 + newE))
    gain_all = _interp_gain(params, norm) * _interp_gain(params, gsmooth)
    Xor = jnp.where(keep, Xr, Xpr * gain_all)
    Xoi = jnp.where(keep, Xi, Xpi * gain_all)

    # Synthesis: inverse windowed DFT (matmul), overlap-add with carried tail.
    xt = _inv_spectrum(params, Xor, Xoi)  # [S, F, 960], window folded in
    tails = jnp.concatenate([state["syn_mem"][:, None, :], xt[:, :-1, FRAME:]], axis=1)
    out = (xt[..., :FRAME] + tails) / 32768.0
    state["syn_mem"] = xt[:, -1, FRAME:]
    return state, out.reshape(S, L), vad


_denoise_block_jit = jax.jit(denoise_block, donate_argnums=(1,))


def _denoise_block_i16(params, state, block_i16):
    """Int16-wire block step: PCM in, PCM out (tunnel/PCIe traffic halved).

    The input scaling is exact (int16/32768 is a power-of-two divide) and
    the output quantization reproduces io.wav.write_wav's float path bit
    for bit (clip → ×32767 → round-toward-zero cast) on every processed
    frame. Partial-frame tails pass through as the RAW input PCM — one
    LSB *more* faithful than the f32 wire, whose float round trip loses
    the ×32767/÷32768 asymmetry on passthrough samples.
    """
    blockf = block_i16.astype(jnp.float32) / 32768.0
    state, out, vad = denoise_block(params, state, blockf)
    # Explicit trunc: numpy's float→int16 cast truncates toward zero, but
    # this backend's ConvertElementType rounds — without it ~2% of samples
    # land 1 LSB off the f32-wire-then-quantize result.
    o16 = jnp.trunc(jnp.clip(out, -1.0, 1.0) * 32767.0).astype(jnp.int16)
    return state, o16, vad


_denoise_block_i16_jit = jax.jit(_denoise_block_i16, donate_argnums=(1,))

_sharded_steps: Dict[object, object] = {}


def denoise_block_sharded(mesh, params, state):
    """Jitted per-device SPMD block step: `shard_map` over the mesh's
    'data' axis, so every op — including the Pallas kernels, which GSPMD
    has no partitioning rules for and would otherwise replicate or
    reject on real multichip — runs on its LOCAL stream shard with zero
    collectives (the block step is embarrassingly stream-parallel).
    Cached per mesh; the params/state arguments only provide pytree
    structure for the specs."""
    key = mesh
    fn = _sharded_steps.get(key)
    if fn is None:
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        def dspec(x):
            return P("data", *([None] * (x.ndim - 1)))

        in_specs = (jax.tree.map(lambda x: P(), params),
                    jax.tree.map(dspec, state), P("data", None))
        out_specs = (jax.tree.map(dspec, state), P("data", None),
                     P("data", None))
        fn = jax.jit(
            shard_map(denoise_block, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_rep=False),
            donate_argnums=(1,))
        _sharded_steps[key] = fn
    return fn


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------

def denoise_batch(
    audio: np.ndarray,
    model: Optional[RNNoiseModel] = None,
    block_frames: int = 500,
    params=None,
    return_vad: bool = False,
    mesh=None,
    wire: str = "f32",
):
    """Denoise [S, T] (or [T]) mono audio in [-1, 1]; returns same shape.

    Processes fixed-size blocks through the jitted step; trailing samples
    that don't fill a frame pass through unchanged (reference behavior:
    partial frames are never emitted by the NS processor). With a mesh the
    stream axis shards over 'data' (padded to the dp size) and the block
    step runs SPMD across chips.

    ``wire="i16"`` takes int16 PCM input and returns int16 PCM output —
    halving host↔device transfer on both directions, which dominates the
    wall time of long single-stream file denoises (the tunnel moves
    ~20-40 MB/s). Exact: input scaling is a power-of-two divide and the
    output quantization is bit-identical to io.wav.write_wav's. Not
    available with a mesh (the sharded step keeps the f32 surface).
    """
    squeeze = audio.ndim == 1
    if wire == "i16":
        if mesh is not None:
            raise ValueError("wire='i16' is not supported with a mesh")
        a = np.atleast_2d(np.asarray(audio))
        if a.dtype != np.int16:
            raise TypeError("wire='i16' requires int16 PCM input")
    else:
        a = np.atleast_2d(np.asarray(audio, dtype=np.float32))
    S, T = a.shape
    if params is None:
        params = make_params(model)
    n_frames = T // FRAME
    out = np.array(a, copy=True)
    vads = []
    Sp = S
    shard = None
    if mesh is not None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = mesh.devices.shape[0]
        Sp = -(-S // dp) * dp

        def shard(x):
            spec = P("data", *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))

        params = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), params)
    state = init_state(Sp)
    if shard is not None:
        state = jax.tree.map(shard, state)
    blk = block_frames * FRAME
    done = 0
    # Deferred fetches: jit dispatch is async, so the loop streams every
    # block to the device back-to-back and device→host copies overlap the
    # next blocks' compute (copy_to_host_async). The old per-block
    # np.asarray serialized a full tunnel round trip into every block —
    # at S=1 that was ~86% of the wall time of a 4-minute denoise.
    pending: list = []  # (sample offset, length, out block, vad block)
    pending_bytes = 0
    flush_bytes = 512 << 20  # bound device-resident output

    def flush():
        nonlocal pending_bytes
        for d, td, o, v in pending:
            out[:, d: d + td] = np.asarray(o)[:S, :td]
            if return_vad:
                vads.append(np.asarray(v)[:S, : td // FRAME])
        pending.clear()
        pending_bytes = 0

    while done < n_frames * FRAME:
        todo = min(blk, n_frames * FRAME - done)
        chunk = a[:, done: done + todo]
        if todo < blk:  # pad the tail block to keep one compiled shape
            chunk = np.pad(chunk, ((0, 0), (0, blk - todo)))
        if Sp != S:
            chunk = np.pad(chunk, ((0, Sp - S), (0, 0)))
        chunk = jnp.asarray(chunk) if shard is None else shard(jnp.asarray(chunk))
        if mesh is not None:
            step = denoise_block_sharded(mesh, params, state)
            state, o, v = step(params, state, chunk)
        elif wire == "i16":
            state, o, v = _denoise_block_i16_jit(params, state, chunk)
        else:
            state, o, v = _denoise_block_jit(params, state, chunk)
        for arr in (o, v) if return_vad else (o,):
            try:
                arr.copy_to_host_async()
            except Exception:  # backend without async copies
                pass
        pending.append((done, todo, o, v))
        pending_bytes += o.size * o.dtype.itemsize
        if pending_bytes >= flush_bytes:
            flush()
        done += todo
    flush()
    if return_vad:
        v = np.concatenate(vads, axis=1) if vads else np.zeros((S, 0), np.float32)
        return (out[0] if squeeze else out), (v[0] if squeeze else v)
    return out[0] if squeeze else out
