"""Radix-split (Cooley–Tukey) matmul DFTs for the RNNoise TPU pipeline.

The pipeline's spectra and pitch correlations run real DFTs as dense MXU
matmuls (jax_pipeline._dft_tables / _corr_tables): at N=960/896 a flat
O(N^2) matmul beats XLA's FFT on TPU, but it still does R× more MACs than
a one-level Cooley–Tukey split. This module factors each transform once:

  forward  (decimation in time):  subsequences x[R·m+r] go through ONE
    shared base real-DFT matmul [M, 2·Bb] (the analysis window is applied
    elementwise *before* the split, so all R subsequences share the GEMM),
    then the bins recombine:  with k = j + s·Nb,
       Y[j + s·Nb] = Σ_r ω^(rs) · W^(rj) · S_r[j],   ω = e^(-2πi/R),
    i.e. a per-(r,j) twiddle (elementwise on the small [.., R, Nb] array)
    followed by a length-R contraction against the scalar ω table — the
    big [.., R, nbins] broadcast the naive combine would materialize
    never exists.
  inverse  (decimation in output): the same identity run backwards —
    fold the nbins inputs into segments [.., s, j], contract with ω^(rs),
    twiddle by W^(rj), then ONE shared base inverse matmul [2·Nb, Mo]
    produces the output groups x[R·m+r]; the synthesis window applies
    elementwise at the end.

The base GEMMs keep contraction and output dims near the MXU's 128-lane
tiles (R chosen per transform), cutting padded MAC counts 4–8×, while
every matmul stays at `lax.Precision.HIGHEST` — the combines are
mathematically exact regroupings, so end-to-end oracle parity (≤1e-4,
measured ~3e-5) is preserved.

This replaces compute the reference performs inside nnnoiseless's FFT
(src-tauri/src/audio.rs:268 → DenoiseState::process_frame) and celt's
pitch cross-correlations; the factorization is the standard Cooley–Tukey
identity, re-derived for a matmul (not butterfly) backend.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np
from jax import lax

_HIGH = lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Table builders (host, float64 → float32)
# ---------------------------------------------------------------------------

def fwd_tables(
    nfft: int,
    length: int,
    radix: int,
    nbins: int,
    window: Optional[np.ndarray] = None,
    scale: float = 1.0,
    prefix: str = "rf",
) -> Dict[str, np.ndarray]:
    """Tables for Y[k] = scale · Σ_n w[n]·x[n]·e^(-2πi nk/nfft), k < nbins."""
    assert nfft % radix == 0, (nfft, radix)
    nb_base = nfft // radix
    assert nb_base % 2 == 0, "base transform size must be even"
    bb = nb_base // 2 + 1
    m = -(-length // radix)
    # Shared base real DFT (scale folded): [M, 2·Bb].
    mm = np.arange(m, dtype=np.float64)[:, None]
    jj = np.arange(bb, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * mm * jj / nb_base
    base = np.concatenate([np.cos(ang), -np.sin(ang)], axis=-1) * scale
    # Input window/zero-pad mask in [M, R] subsequence layout.
    w = np.ones(radix * m, np.float64)
    if window is not None:
        w[: len(window)] = np.asarray(window, np.float64)
        w[len(window):] = 0.0
    elif radix * m > length:
        w[length:] = 0.0
    need_win = window is not None or radix * m > length
    # Per-(r, j) twiddle W^(rj), W = e^(-2πi/nfft); per-(r, s) ω^(rs).
    rr = np.arange(radix, dtype=np.float64)[:, None]
    tw = 2.0 * np.pi * rr * np.arange(nb_base, dtype=np.float64)[None, :] / nfft
    reps = -(-nbins // nb_base)
    om = 2.0 * np.pi * rr * np.arange(reps, dtype=np.float64)[None, :] / radix
    out = {
        f"{prefix}_base": base.astype(np.float32),
        f"{prefix}_twr": np.cos(tw).astype(np.float32),
        f"{prefix}_twi": (-np.sin(tw)).astype(np.float32),
        f"{prefix}_omr": np.cos(om).astype(np.float32),
        f"{prefix}_omi": (-np.sin(om)).astype(np.float32),
    }
    if need_win:
        out[f"{prefix}_win"] = w.reshape(m, radix).astype(np.float32)
    return out


def apply_fwd(params, prefix: str, x: jnp.ndarray, nbins: int,
              precision=_HIGH) -> jnp.ndarray:
    """x [..., length] → fused (re‖im) [..., 2·nbins] (same layout as the
    flat `dft_fwd`/`cf_*` tables in jax_pipeline)."""
    base = params[f"{prefix}_base"]  # [M, 2·Bb]
    twr = params[f"{prefix}_twr"]  # [R, Nb]
    twi = params[f"{prefix}_twi"]
    omr = params[f"{prefix}_omr"]  # [R, reps]
    omi = params[f"{prefix}_omi"]
    m, bb2 = base.shape
    bb = bb2 // 2
    nb_base = 2 * (bb - 1)
    radix = twr.shape[0]
    reps = omr.shape[1]
    lead = x.shape[:-1]
    pad = m * radix - x.shape[-1]
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    xs = x.reshape(*lead, m, radix)
    win = params.get(f"{prefix}_win")
    if win is not None:
        xs = xs * win
    s = jnp.einsum("...mr,mj->...rj", xs, base, precision=precision)
    sre, sim = s[..., :bb], s[..., bb:]
    # Real-input conjugate symmetry: S_r[Nb − j] = conj(S_r[j]).
    sre = jnp.concatenate([sre, sre[..., 1: bb - 1][..., ::-1]], axis=-1)
    sim = jnp.concatenate([sim, -sim[..., 1: bb - 1][..., ::-1]], axis=-1)
    # V_r[j] = W^(rj)·S_r[j]; then Y[j + s·Nb] = Σ_r ω^(rs)·V_r[j].
    # The ω contraction is R≤16 long: a broadcast multiply-reduce on the
    # VPU (exact f32) — as a HIGHEST matmul it would pad K to 128 lanes
    # and 6-pass, costing more than the whole radix saving.
    vre = sre * twr - sim * twi
    vim = sre * twi + sim * twr
    vre = vre[..., :, None, :]  # [..., R, 1, Nb]
    vim = vim[..., :, None, :]
    o_re = omr[:, :, None]  # [R, reps, 1]
    o_im = omi[:, :, None]
    yre = jnp.sum(vre * o_re - vim * o_im, axis=-3)  # over R → [..., reps, Nb]
    yim = jnp.sum(vre * o_im + vim * o_re, axis=-3)
    yre = yre.reshape(*lead, reps * nb_base)[..., :nbins]
    yim = yim.reshape(*lead, reps * nb_base)[..., :nbins]
    return jnp.concatenate([yre, yim], axis=-1)


def inv_tables(
    nfft: int,
    nbins: int,
    nout: int,
    radix: int,
    window: Optional[np.ndarray] = None,
    scale: float = 1.0,
    prefix: str = "ri",
) -> Dict[str, np.ndarray]:
    """Tables for x[n] = w[n] · Σ_k g_k·Re(Ŷ[k]·e^(2πi kn/nfft)), n < nout,
    with g_k = scale·ck (ck = 2 except DC — and Nyquist when nbins spans
    the full half-spectrum).

    Matches jax_pipeline's flat inverse tables: the spectra inverse uses
    scale=1 with the synthesis window folded; the correlation inverses use
    scale=1/nfft, no window.
    """
    assert nfft % radix == 0
    nb_base = nfft // radix
    mo = -(-nout // radix)
    ck = np.full(nbins, 2.0)
    ck[0] = 1.0
    if nbins == nfft // 2 + 1:
        ck[-1] = 1.0
    rr = np.arange(radix, dtype=np.float64)[:, None]
    tw = 2.0 * np.pi * rr * np.arange(nb_base, dtype=np.float64)[None, :] / nfft
    reps = -(-nbins // nb_base)
    om = 2.0 * np.pi * rr * np.arange(reps, dtype=np.float64)[None, :] / radix
    jj = np.arange(nb_base, dtype=np.float64)[:, None]
    mm = np.arange(mo, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * jj * mm / nb_base
    base = np.concatenate([np.cos(ang), -np.sin(ang)], axis=0)  # [2·Nb, Mo]
    out = {
        f"{prefix}_g": (ck * scale).astype(np.float32),
        f"{prefix}_twr": np.cos(tw).astype(np.float32),  # e^(+2πi rj/nfft)
        f"{prefix}_twi": np.sin(tw).astype(np.float32),
        f"{prefix}_omr": np.cos(om).astype(np.float32),  # e^(+2πi rs/R)
        f"{prefix}_omi": np.sin(om).astype(np.float32),
        f"{prefix}_base": base.astype(np.float32),
    }
    if window is not None:
        w = np.zeros(radix * mo, np.float64)
        w[: min(len(window), radix * mo)] = np.asarray(
            window, np.float64)[: radix * mo]
        out[f"{prefix}_wout"] = w[:nout].astype(np.float32)
    return out


def apply_inv(params, prefix: str, re: jnp.ndarray, im: jnp.ndarray,
              nout: int, precision=_HIGH) -> jnp.ndarray:
    """(re, im) [..., nbins] → x [..., nout]."""
    g = params[f"{prefix}_g"]
    twr = params[f"{prefix}_twr"]  # [R, Nb]
    twi = params[f"{prefix}_twi"]
    omr = params[f"{prefix}_omr"]  # [R, reps]
    omi = params[f"{prefix}_omi"]
    base = params[f"{prefix}_base"]  # [2·Nb, Mo]
    radix = twr.shape[0]
    nb_base = twr.shape[1]
    reps = omr.shape[1]
    mo = base.shape[1]
    nbins = re.shape[-1]
    lead = re.shape[:-1]
    gre = re * g
    gim = im * g
    pad = reps * nb_base - nbins
    if pad:
        padw = [(0, 0)] * (re.ndim - 1) + [(0, pad)]
        gre = jnp.pad(gre, padw)
        gim = jnp.pad(gim, padw)
    gre = gre.reshape(*lead, reps, nb_base)  # segment s holds bins j + s·Nb
    gim = gim.reshape(*lead, reps, nb_base)
    # U_r[j] = Σ_s ω^(rs)·(g·Ŷ)[j + s·Nb]; Zc_r[j] = W^(rj)·U_r[j].
    # Like the forward combine: a length-reps (≤9) broadcast reduce on
    # the VPU, never a padded tiny-K matmul.
    gre = gre[..., None, :, :]  # [..., 1, reps, Nb]
    gim = gim[..., None, :, :]
    o_re = omr[:, :, None]  # [R, reps, 1]
    o_im = omi[:, :, None]
    ure = jnp.sum(gre * o_re - gim * o_im, axis=-2)
    uim = jnp.sum(gre * o_im + gim * o_re, axis=-2)
    zre = ure * twr - uim * twi
    zim = ure * twi + uim * twr
    zc = jnp.concatenate([zre, zim], axis=-1)  # [..., R, 2·Nb]
    xr = jnp.einsum("...rj,jm->...rm", zc, base, precision=precision)
    # Interleave output groups: x[R·m + r] ← xr[..., r, m].
    x = jnp.swapaxes(xr, -1, -2).reshape(*lead, mo * radix)[..., :nout]
    wout = params.get(f"{prefix}_wout")
    if wout is not None:
        x = x * wout
    return x
