"""Pallas TPU kernels for the RNNoise pipeline's irregular-memory ops.

The pitch-delayed window extraction (reference semantics: p =
pitch_buf[PITCH_BUF_SIZE - WINDOW_SIZE - pitch_index ..] per frame) is a
variable-offset contiguous slice per (stream, frame). XLA lowers that to a
per-element gather — the slowest op on TPU by far. Here it is a
scalar-prefetch Pallas kernel:

  * audio lives as a [rows, 128] lane-tiled HBM buffer; each window's
    2048-element cover is fetched with one aligned 16x128 DMA
    (Mosaic DMA offsets must be 8-row / 128-lane aligned),
  * the unaligned residual r = start mod 1024 is resolved in VMEM with a
    dynamic sublane rotate (r // 128) plus a dynamic lane rotate (r % 128)
    blended across the row boundary,
  * the kernel emits pre-shifted [16, 128] blocks; the caller reshapes to
    2048 and keeps the first 960 columns — both free in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .constants import SECOND_CHECK, WINDOW_SIZE as WIN

_LANES = 128
_ROWS = 16  # rows per window cover (2048 elems >= 1023 residual + 960 window)
_RALIGN = 8  # DMA row-offset alignment
_F_BLK = 8  # frames per grid step


def _gather_kernel(rows_per_stream: int, starts_ref, ext_ref, out_ref, scratch, sems):
    s = pl.program_id(0)
    fb = pl.program_id(1)

    def copy(i):
        st = starts_ref[s, fb * _F_BLK + i]
        row0 = pl.multiple_of((st // (_LANES * _RALIGN)) * _RALIGN, _RALIGN)
        src_row = pl.multiple_of(s * rows_per_stream + row0, _RALIGN)
        return pltpu.make_async_copy(
            ext_ref.at[pl.ds(src_row, _ROWS), :],
            scratch.at[pl.ds(i * _ROWS, _ROWS), :],
            sems.at[i],
        )

    for i in range(_F_BLK):
        copy(i).start()
    for i in range(_F_BLK):
        copy(i).wait()
    lane = lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 1)
    for i in range(_F_BLK):
        st = starts_ref[s, fb * _F_BLK + i]
        r = st - (st // (_LANES * _RALIGN)) * (_LANES * _RALIGN)  # 0..1023
        q, rl = r // _LANES, r % _LANES
        blk = scratch[i * _ROWS: (i + 1) * _ROWS, :]
        a = pltpu.roll(blk, (_ROWS - q) % _ROWS, axis=0)  # row shift (left by q)
        a1 = pltpu.roll(a, (_LANES - rl) % _LANES, axis=1)  # lane shift (left by rl)...
        a2 = pltpu.roll(a1, _ROWS - 1, axis=0)  # ...with next-row blend
        out_ref[0, i, :, :] = jnp.where(lane < _LANES - rl, a1, a2)


def pitch_window_gather(
    ext: jnp.ndarray, starts: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """ext [S, L], starts [S, F] int32 → windows [S, F, WIN].

    Equivalent to ext[s, starts[s, f] : starts[s, f] + WIN] per (s, f).
    """
    S, L = ext.shape
    F = starts.shape[1]
    if jax.default_backend() != "tpu" and not interpret:
        return jax.vmap(
            jax.vmap(lambda e, s: lax.dynamic_slice(e, (s,), (WIN,)), in_axes=(None, 0)),
            in_axes=(0, 0),
        )(ext, starts)

    Fp = -(-F // _F_BLK) * _F_BLK
    if Fp != F:
        starts = jnp.pad(starts, ((0, 0), (0, Fp - F)))
    # Row-tiled layout with per-stream row stride a multiple of 8; trailing
    # pad keeps the last 16-row cover in bounds.
    chunk = _LANES * _RALIGN  # 1024
    Lp = -(-(L + _ROWS * _LANES) // chunk) * chunk
    rows_per_stream = Lp // _LANES
    ext2 = jnp.pad(ext, ((0, 0), (0, Lp - L))).reshape(S * rows_per_stream, _LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, Fp // _F_BLK),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, _F_BLK, _ROWS, _LANES),
            lambda s, fb, starts: (s, fb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((_F_BLK * _ROWS, _LANES), ext.dtype),
            pltpu.SemaphoreType.DMA((_F_BLK,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, rows_per_stream),
        out_shape=jax.ShapeDtypeStruct((S, Fp, _ROWS, _LANES), ext.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, ext2)
    return out.reshape(S, Fp, _ROWS * _LANES)[:, :F, :WIN]


# ---------------------------------------------------------------------------
# remove_doubling candidate gather
# ---------------------------------------------------------------------------
#
# Per frame, remove_doubling needs corr/yyl values at 15 candidate periods
# T_cand(T0, k) plus corr at T_cand±1 (90 scattered reads). XLA lowers the
# take_along_axis formulation to per-element gathers (~13 ms/block on TPU);
# a one-hot MXU Pallas kernel got that to ~5.9 ms. The winner (measured on
# v5e, tools/tpu_rd_gather_variants.py: 1.5 ms) is a plain XLA
# broadcast-compare-select-reduce: the mask generation, select, and the
# 385-lane reduction fuse into one VPU loop, and the result is EXACT —
# each reduced row has exactly one nonzero element, so reduction order
# cannot change the value. CPU keeps take_along_axis (fastest there).

_NCAND = 15  # candidate 0 = T0 itself; 1..14 = subharmonics k = 2..15


def _rd_candidates(T0: jnp.ndarray):
    """Candidate periods per frame: T_cand [.., 15] and the second-check
    periods T_bcand [.., 15] (remove_doubling's k-subharmonic table)."""
    ks = jnp.arange(2, 16, dtype=jnp.int32)
    T0k = T0[..., None]
    T1 = (2 * T0k + ks) // (2 * ks)
    sc = jnp.asarray(np.asarray(SECOND_CHECK), jnp.int32)[ks]
    T1b = jnp.where(ks == 2, jnp.where(T0k + T1 > 384, T0k, T0k + T1),
                    (2 * sc * T0k + ks) // (2 * ks))
    tcand = jnp.concatenate([T0k, T1], axis=-1)
    tbcand = jnp.concatenate([T0k, T1b], axis=-1)
    return tcand, tbcand


def rd_candidate_gather(corr: jnp.ndarray, yyl: jnp.ndarray, T0: jnp.ndarray):
    """corr/yyl [S, F, 385], T0 [S, F] int32 →
    (xy_t [S,F,15], xc_m1, xc_p1, yy_t, xy_tb, yy_tb) at the 15 candidates.

    Candidate c=0 is T0; c>=1 are the k=2..15 subharmonics with their
    second-check periods (remove_doubling's reads).
    """
    L = corr.shape[-1]
    tcand, tbcand = _rd_candidates(T0)

    if jax.default_backend() != "tpu":
        def take(arr, idx):
            return jnp.take_along_axis(arr, jnp.clip(idx, 0, L - 1), axis=-1)
    else:
        lanes = jnp.arange(L, dtype=jnp.int32)

        def take(arr, idx):
            m = lanes == jnp.clip(idx, 0, L - 1)[..., None]  # one-hot rows
            return jnp.sum(jnp.where(m, arr[..., None, :], 0.0), axis=-1)

    return (take(corr, tcand), take(corr, tcand - 1), take(corr, tcand + 1),
            take(yyl, tcand), take(corr, tbcand), take(yyl, tbcand))
