"""Fused Pallas frontend for the RNNoise analysis/synthesis spectra.

The block step's spectra stages were three separate XLA ops each way
(materialize [S, F, 960] windows → DFT matmul → band-energy matmul;
inverse DFT → concat → overlap-add), paying HBM round trips for every
intermediate. Here each direction is ONE kernel:

  * `fwd_spectrum_bands`: per (stream-tile, frame-tile) program, DMA the
    raw extended signal once, form the 50%-overlapped 960-sample windows
    in VMEM, run the DFT as a [tile, 960] x [960, 1024] MXU matmul
    against a VMEM-resident table (re in cols 0..480, im in 512..992,
    zero padding so every downstream slice is 128-lane aligned), square
    into band energies via a second small matmul — and write only the
    final spectra + energies.
  * `inv_spectrum_ola`: the synthesis inverse DFT with the overlap-add
    folded in. Frame f's output block is Y[f] @ invA + Y[f-1] @ invB
    (invA/invB = first/second halves of the windowed inverse table), so
    each program DMAs one extra frame of Y and never materializes the
    [S, F, 960] time-domain tensor; the carried syn_mem tail is added by
    the first frame-tile and the new tail emitted by the last.

Status: OPT-IN throughput mode (CRISPY_FUSED_SPECTRA=on), ~+10% block
throughput (11.6 → 10.5 ms at S=128/F=100 on v5e). Mosaic's fast f32
matmul is a single bf16 MXU pass, which relaxes worst-sample oracle
parity to ~1e-3; at matched precision (6-pass) the kernels lose to
XLA's better-scheduled matmul pipeline — see the measured table at the
precision section below. The DEFAULT block path therefore keeps the XLA
matmuls and the north-star ≤1e-4 parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .constants import FRAME_SIZE as FRAME, FREQ_SIZE as NFREQ, WINDOW_SIZE as WIN

_LANES = 128
_SB = 8      # streams per program
_FB = 16     # frames per program
_YPAD = 1024  # padded (re ‖ im) spectrum width: re 0..480, im 512..992
_IM0 = 512


def pad_dft_fwd(dft_fwd: np.ndarray) -> np.ndarray:
    """[960, 962] (re‖im) → [960, 1024] with re at 0..480, im at 512..992."""
    t = np.zeros((WIN, _YPAD), np.float32)
    t[:, :NFREQ] = dft_fwd[:, :NFREQ]
    t[:, _IM0: _IM0 + NFREQ] = dft_fwd[:, NFREQ:]
    return t


def split_dft_fwd(dft_pad: np.ndarray):
    """[960, 1024] → (A, B) [512, 1024] halves on the padded-frame grid:
    window = frame_f ‖ frame_{f+1} (480 samples each, stored 512-padded),
    so Y = frame_f @ A + frame_{f+1} @ B with zero rows 480..511. This is
    how the kernel forms windows without any unaligned slicing: frame
    boundaries on a 512 grid are 128-lane aligned."""
    a = np.zeros((_IM0, _YPAD), np.float32)
    b = np.zeros((_IM0, _YPAD), np.float32)
    a[:FRAME] = dft_pad[:FRAME]
    b[:FRAME] = dft_pad[FRAME:]
    return a, b


def pad_band_e(band_e: np.ndarray) -> np.ndarray:
    """[481, 22] → [512, 22] zero-padded (energy rows 481..511 are zero)."""
    t = np.zeros((_IM0, band_e.shape[1]), np.float32)
    t[:NFREQ] = band_e
    return t


def pad_dft_inv(inv_re: np.ndarray, inv_im: np.ndarray) -> np.ndarray:
    """([481, 960], [481, 960]) → [1024, 960] matching the padded Y layout."""
    t = np.zeros((_YPAD, WIN), np.float32)
    t[:NFREQ] = inv_re
    t[_IM0: _IM0 + NFREQ] = inv_im
    return t


# ---------------------------------------------------------------------------
# matmul precision inside Mosaic — measured trade (v5e, S=128, F=100)
# ---------------------------------------------------------------------------
# Mosaic's f32 dot choices and the resulting FULL-BLOCK numbers:
#   * DEFAULT (one bf16 MXU pass):  block 10.5 ms, oracle parity ~1e-3
#   * manual bf16x4 (_split_table): block 12.0 ms, parity ~5e-4
#   * HIGHEST (six passes):         block 12.9 ms, parity 2.7e-5
#   * unfused XLA path (HIGHEST):   block 11.6 ms, parity 2.7e-5
# Extra Mosaic matmul passes cost ~0.45 ms each across the three kernels
# — XLA's own 6-pass matmul pipeline is simply better scheduled, so the
# fused kernels only WIN at single-pass precision. They are therefore an
# opt-in throughput mode (CRISPY_FUSED_SPECTRA=on: ~+10% denoise
# throughput at ~1e-3 worst-sample parity); the default path keeps the
# north-star 1e-4 oracle parity via the XLA matmuls.

def _dot1(x, w_ref):
    """Single-pass Mosaic dot (see the precision table above)."""
    return jnp.dot(x, w_ref[:, :], preferred_element_type=jnp.float32)


def _table_spec(shape):
    return pl.BlockSpec(shape, lambda s, f: (0, 0), memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# Forward: windows + DFT + band energies
# ---------------------------------------------------------------------------

def _fwd_kernel(frames_ref, edge_ref, dfta_ref, dftb_ref, band_ref,
                y_ref, ex_ref):
    cur3 = frames_ref[:, :, :]  # [SB, FB, 512]
    # frame f+1 for every window: the block's own frames shifted left by
    # one, plus the NEXT block's first frame from the tiny edge input —
    # no overlapping blocks, no manual DMA, standard pipelining
    nxt3 = jnp.concatenate(
        [cur3[:, 1:], edge_ref[:, :].reshape(_SB, 1, _IM0)], axis=1)
    cur = cur3.reshape(_SB * _FB, _IM0)
    nxt = nxt3.reshape(_SB * _FB, _IM0)
    # window = frame_f ‖ frame_{f+1}: two aligned matmuls (split table)
    y = _dot1(cur, dfta_ref) + _dot1(nxt, dftb_ref)
    e = y[:, :_IM0] * y[:, :_IM0] + y[:, _IM0:] * y[:, _IM0:]
    ex = _dot1(e, band_ref)
    y_ref[:, :, :] = y.reshape(_SB, _FB, _YPAD)
    ex_ref[:, :, :] = ex.reshape(_SB, _FB, ex.shape[-1])


def fwd_spectrum_bands(ext_a: jnp.ndarray, dft_a: jnp.ndarray,
                       dft_b: jnp.ndarray, band_pad: jnp.ndarray, F: int,
                       interpret: bool = False):
    """ext_a [S, (F+1)*480] → (Y [S, F, 1024], Ex [S, F, NB]).

    Window f covers ext_a[:, f*480 : f*480+960]; Y carries re at cols
    0..480 and im at 512..992 (everything else zero). The signal is
    re-laid as 512-padded 480-sample frames so every kernel access is
    lane-aligned (Mosaic rejects 480-grain slicing), and each grid block
    additionally receives the NEXT block's first frame as a tiny strided
    'edge' input so blocks never overlap.
    """
    interpret = interpret or jax.default_backend() != "tpu"
    S = ext_a.shape[0]
    NB = band_pad.shape[1]
    Sp = -(-S // _SB) * _SB
    Fp = -(-F // _FB) * _FB
    nfb = Fp // _FB
    frames = jnp.zeros((Sp, Fp + 1, _IM0), ext_a.dtype)
    frames = frames.at[:S, : F + 1, :FRAME].set(
        ext_a[:, : (F + 1) * FRAME].reshape(S, F + 1, FRAME))
    # edge rows flattened 2D: Pallas block middle dims must divide by 8
    edge = frames[:, _FB::_FB][:, :nfb].reshape(Sp, nfb * _IM0)

    grid = (Sp // _SB, nfb)
    y, ex = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_SB, _FB, _IM0), lambda s, f: (s, f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SB, _IM0), lambda s, f: (s, f),
                         memory_space=pltpu.VMEM),
            _table_spec((_IM0, _YPAD)), _table_spec((_IM0, _YPAD)),
            _table_spec((_IM0, NB)),
        ],
        out_specs=[
            pl.BlockSpec((_SB, _FB, _YPAD), lambda s, f: (s, f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SB, _FB, NB), lambda s, f: (s, f, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Sp, Fp, _YPAD), jnp.float32),
            jax.ShapeDtypeStruct((Sp, Fp, NB), jnp.float32),
        ],
        interpret=interpret,
    )(frames[:, :Fp], edge, dft_a, dft_b, band_pad)
    return y[:S, :F], ex[:S, :F]


# ---------------------------------------------------------------------------
# Forward for pre-gathered windows (the pitch-delayed path)
# ---------------------------------------------------------------------------

def _win_kernel(w_ref, dft_ref, band_ref, y_ref, ex_ref):
    w = w_ref[:, :, :].reshape(_SB * _FB, WIN)
    y = _dot1(w, dft_ref)
    e = y[:, :_IM0] * y[:, :_IM0] + y[:, _IM0:] * y[:, _IM0:]
    ex = _dot1(e, band_ref)
    y_ref[:, :, :] = y.reshape(_SB, _FB, _YPAD)
    ex_ref[:, :, :] = ex.reshape(_SB, _FB, ex.shape[-1])


def win_spectrum_bands(wins: jnp.ndarray, dft_pad: jnp.ndarray,
                       band_pad: jnp.ndarray, interpret: bool = False):
    """wins [S, F, 960] (already materialized) → (Y [S, F, 1024], Ex)."""
    interpret = interpret or jax.default_backend() != "tpu"
    S, F, _ = wins.shape
    NB = band_pad.shape[1]
    Sp = -(-S // _SB) * _SB
    Fp = -(-F // _FB) * _FB
    w = jnp.zeros((Sp, Fp, WIN), wins.dtype).at[:S, :F].set(wins)
    grid = (Sp // _SB, Fp // _FB)
    y, ex = pl.pallas_call(
        _win_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_SB, _FB, WIN), lambda s, f: (s, f, 0),
                         memory_space=pltpu.VMEM),
            _table_spec((WIN, _YPAD)),
            _table_spec((_IM0, NB)),
        ],
        out_specs=[
            pl.BlockSpec((_SB, _FB, _YPAD), lambda s, f: (s, f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SB, _FB, NB), lambda s, f: (s, f, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Sp, Fp, _YPAD), jnp.float32),
            jax.ShapeDtypeStruct((Sp, Fp, NB), jnp.float32),
        ],
        interpret=interpret,
    )(w, dft_pad, band_pad)
    return y[:S, :F], ex[:S, :F]


# ---------------------------------------------------------------------------
# Inverse: DFT + overlap-add, no [S, F, 960] materialization
# ---------------------------------------------------------------------------

def _inv_kernel(y_ref, edge_ref, inva_ref, invb_ref, mem_ref, out_ref,
                newmem_ref):
    fb = pl.program_id(1)
    nfb = pl.num_programs(1)
    cur3 = y_ref[:, :, :]  # [SB, FB, YPAD]
    # frame f-1 for every output frame: the previous block's LAST frame
    # (edge input; zeros before frame 0) plus this block shifted right
    prv3 = jnp.concatenate(
        [edge_ref[:, :].reshape(_SB, 1, _YPAD), cur3[:, : _FB - 1]], axis=1)
    cur = cur3.reshape(_SB * _FB, _YPAD)
    prv = prv3.reshape(_SB * _FB, _YPAD)
    head = _dot1(cur, inva_ref)
    tail = _dot1(prv, invb_ref)
    head = head.reshape(_SB, _FB, FRAME)
    tail = tail.reshape(_SB, _FB, FRAME)
    # first global frame: the previous tail is the carried syn_mem (the
    # edge there is the zero frame, so its invB product is zero)
    tail0 = jnp.where(fb == 0, mem_ref[:, :], tail[:, 0])
    tail = jnp.concatenate([tail0[:, None, :], tail[:, 1:]], axis=1)
    out_ref[:, :, :] = head + tail
    # last program of the frame axis emits the new carry tail:
    # xt[F_padded-1, 480:] = Y[last] @ invB
    @pl.when(fb == nfb - 1)
    def _():
        newmem_ref[:, :] = _dot1(cur3[:, _FB - 1], invb_ref)


def inv_spectrum_ola(Y: jnp.ndarray, inva: jnp.ndarray, invb: jnp.ndarray,
                     syn_mem: jnp.ndarray, F: int, interpret: bool = False):
    """Y [S, F, 1024] padded spectra → (out [S, F*480], new_mem [S, 480]).

    out[:, f*480:(f+1)*480] = Y[f] @ invA + (Y[f-1] @ invB | syn_mem).
    invA/invB are the [1024, 480] halves of the windowed inverse table.
    """
    interpret = interpret or jax.default_backend() != "tpu"
    S = Y.shape[0]
    Sp = -(-S // _SB) * _SB
    Fp = -(-F // _FB) * _FB
    nfb = Fp // _FB
    yp = jnp.zeros((Sp, Fp, _YPAD), Y.dtype).at[:S, :F].set(Y[:, :F])
    # edge[s, fb] = Y[s, fb*FB - 1] (zeros for fb == 0)
    edge = jnp.zeros((Sp, nfb, _YPAD), Y.dtype)
    if nfb > 1:
        edge = edge.at[:, 1:].set(yp[:, _FB - 1:: _FB][:, : nfb - 1])
    edge = edge.reshape(Sp, nfb * _YPAD)
    memp = jnp.zeros((Sp, FRAME), syn_mem.dtype).at[:S].set(syn_mem)
    grid = (Sp // _SB, nfb)
    out, newmem = pl.pallas_call(
        _inv_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_SB, _FB, _YPAD), lambda s, f: (s, f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SB, _YPAD), lambda s, f: (s, f),
                         memory_space=pltpu.VMEM),
            _table_spec((_YPAD, FRAME)), _table_spec((_YPAD, FRAME)),
            pl.BlockSpec((_SB, FRAME), lambda s, f: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_SB, _FB, FRAME), lambda s, f: (s, f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SB, FRAME), lambda s, f: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Sp, Fp, FRAME), jnp.float32),
            jax.ShapeDtypeStruct((Sp, FRAME), jnp.float32),
        ],
        interpret=interpret,
    )(yp, edge, inva, invb, memp)
    # frames F..Fp are zero-padded spectra: their head/tail contributions
    # are zero, so out[:, :F] is exact; the true carry is xt[F-1, 480:],
    # which the kernel only computes when F lands on the LAST tile. When F
    # is not a multiple of _FB the carry instead equals frame F-1's invB
    # product, read back from the padded out tile (frame F's tail).
    if F % _FB == 0:
        mem_out = newmem[:S]
    else:
        mem_out = out[:S, F, :]  # head(F)=0 ⇒ out[F] = tail = Y[F-1] @ invB
    return out[:S, :F].reshape(S, F * FRAME), mem_out
