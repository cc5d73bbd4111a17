"""Sample-rate conversion: streaming linear resamplers + polyphase converter.

Three distinct resamplers exist in the reference, each with its own
semantics, all re-expressed here as vectorized block operations:

  * ``LinearResampler`` — the input-side streaming linear interpolator
    (src-tauri/src/audio.rs:73-134): sample-at-a-time state machine with
    same-rate bypass (<1 Hz delta) and full state reset on rate hot-swap.
    Re-implemented to consume whole blocks with identical emission pattern.
  * ``PullResampler`` — the output-side ring-buffer interpolator used by the
    NS processors' ``next_sample`` (audio.rs:140-199, 297-315): pull one
    output at a time, popping the ring as the read position advances.
  * ``resample_block`` — one-shot linear block resampling as used by the
    macOS app-audio capture path (src-tauri/src/recording.rs:13-39).
  * ``resample_poly`` — high-quality windowed-sinc polyphase conversion for
    the offline transcription path (the reference uses rubato's FftFixedIn —
    commands/transcription.rs:316); here it lowers to an XLA conv so whole
    recordings convert on-TPU in one shot. Functional (anti-aliased,
    linear-phase) equivalent, not a bit-exact clone of rubato.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


class LinearResampler:
    """Streaming linear interpolator with reference emission semantics.

    Feeding sample x_n (n >= 1 after the priming sample) emits outputs for
    every pending output position p <= n, each valued
    lerp(x_{n-1}, x_n, clamp(p - (n-1), 0, 1)); output positions advance by
    step = in_rate / out_rate. Rates within 1 Hz bypass entirely.
    """

    def __init__(self, input_rate: float, output_rate: float):
        self.input_rate = float(input_rate)
        self.output_rate = float(output_rate)
        self._reset()

    def _reset(self):
        self.last_sample = np.float32(0.0)
        self.has_last = False
        self.input_pos = 0.0
        self.next_output_pos = 0.0

    def set_rates(self, input_rate: float, output_rate: float) -> None:
        self.input_rate = float(input_rate)
        self.output_rate = float(output_rate)
        self._reset()

    @property
    def bypass(self) -> bool:
        return abs(self.input_rate - self.output_rate) < 1.0

    def process(self, samples: np.ndarray) -> np.ndarray:
        """Consume a block, return all emitted output samples (float32)."""
        x = np.asarray(samples, dtype=np.float32)
        if x.size == 0:
            return x
        if self.bypass:
            return x.copy()

        if not self.has_last:
            self.last_sample = x[0]
            self.has_last = True
            self.input_pos = 0.0
            self.next_output_pos = 0.0
            x = x[1:]
            if x.size == 0:
                return np.empty(0, np.float32)

        # f32 division then f64 accumulation — the reference's exact step
        # arithmetic (audio.rs:124: `(input_rate / output_rate) as f64`).
        step = float(np.float32(self.input_rate) / np.float32(self.output_rate))
        n0 = self.input_pos  # position of last consumed sample
        n_last = n0 + x.size
        # Pending output positions p_k = next_output_pos + k*step, p_k <= n_last.
        if self.next_output_pos > n_last:
            k = 0
        else:
            k = int(math.floor((n_last - self.next_output_pos) / step)) + 1
            while self.next_output_pos + k * step <= n_last:  # fp guard
                k += 1
        if k == 0:
            self.input_pos = n_last
            self.last_sample = x[-1]
            return np.empty(0, np.float32)

        p = self.next_output_pos + step * np.arange(k, dtype=np.float64)
        # Emitting input index n(p) = first integer n >= p within (n0, n_last].
        n = np.maximum(np.ceil(p), np.float64(n0 + 1.0))
        t = np.clip(p - (n - 1.0), 0.0, 1.0).astype(np.float32)
        li = (n - n0 - 1).astype(np.int64)  # local index of x_n in this block
        prev = np.concatenate([[self.last_sample], x[:-1]])
        out = prev[li] + (x[li] - prev[li]) * t

        self.next_output_pos = float(p[-1] + step)
        self.input_pos = n_last
        self.last_sample = x[-1]
        return out.astype(np.float32)


class PullResampler:
    """Output-side interpolating reader over a bounded ring buffer.

    Mirrors the NS processors' ``next_sample`` loop: keeps a read position
    in [0, 1), pops consumed samples, returns 0.0 while fewer than two
    samples are buffered.
    """

    def __init__(self, input_rate: float, output_rate: float, max_len: int):
        self.input_rate = float(input_rate)
        self.output_rate = float(output_rate)
        self.max_len = int(max_len)
        self._buf: list = []
        self.resample_pos = 0.0

    def push(self, samples) -> None:
        for s in np.asarray(samples, dtype=np.float32).ravel():
            if len(self._buf) >= self.max_len:
                self._buf.pop(0)
            self._buf.append(np.float32(s))

    def next_sample_opt(self):
        """One output sample, or None when under-buffered (the reference's
        early `return 0.0` paths, audio.rs:168-179 — distinct from a real
        0.0 sample so callers can skip their post-processing exactly when
        the reference does)."""
        if len(self._buf) < 2:
            return None
        step = self.input_rate / self.output_rate
        while self.resample_pos >= 1.0:
            self._buf.pop(0)
            self.resample_pos -= 1.0
            if len(self._buf) < 2:
                return None
        s0, s1 = self._buf[0], self._buf[1]
        frac = np.float32(self.resample_pos)
        self.resample_pos += step
        return float(s0 + (s1 - s0) * frac)

    def next_sample(self) -> float:
        s = self.next_sample_opt()
        return 0.0 if s is None else s


def resample_block(samples: np.ndarray, from_rate: float, to_rate: float) -> np.ndarray:
    """One-shot linear block resample (recording.rs:13-39 semantics).

    This host-side path is what the PRODUCT recording worker uses (the R3
    mixer + R5/R6 capture feeds, engine/recording.py): capture blocks are
    small (≤ a few thousand samples) and arrive on host threads, where the
    TPU conv path's per-call tunnel dispatch (~29 ms RTT on this harness)
    dwarfs the math. The device polyphase conv (`make_resampler_jax`,
    BENCH `resample_mix_tpu_x` — tunnel-transfer-bound on this harness, so
    quoted only as a median with spread in BENCH) is the bulk path for
    device-resident audio (transcription preprocessing); the native C++
    `resampler_process` mirrors this linear path for the embedded runtime.
    Any of the three beats the realtime requirement by >300x."""
    x = np.asarray(samples, dtype=np.float32)
    if abs(from_rate - to_rate) < 1e-6 or x.size == 0:
        return x.copy()
    ratio = float(from_rate) / float(to_rate)
    out_len = int(x.size / ratio)
    idx = np.arange(out_len, dtype=np.float64) * ratio
    i0 = np.minimum(idx.astype(np.int64), x.size - 1)
    i1 = np.minimum(i0 + 1, x.size - 1)
    frac = (idx - i0).astype(np.float32)
    return (x[i0] + (x[i1] - x[i0]) * frac).astype(np.float32)


# ---------------------------------------------------------------------------
# Polyphase windowed-sinc conversion (the quality path, on-TPU capable)
# ---------------------------------------------------------------------------

def _kaiser_sinc_filter(up: int, down: int, taps_per_phase: int = 24, beta: float = 9.0):
    """Lowpass prototype for rational-rate conversion by up/down.

    The length must scale with max(up, down), not up: for down-heavy
    conversions (48k→16k: up=1, down=3) an up-scaled filter collapses to
    ~taps_per_phase taps and the anti-alias stopband evaporates (measured
    16.6 dB instead of ≥90). scipy's resample_poly sizes its default
    window the same way (half_len = 10 * max(up, down))."""
    cutoff = 0.5 / max(up, down)  # normalized to the upsampled rate
    half = taps_per_phase * max(up, down) // 2
    n = np.arange(-half, half + 1, dtype=np.float64)
    h = 2 * cutoff * np.sinc(2 * cutoff * n)
    h *= np.kaiser(n.size, beta)
    h *= up  # gain compensation for zero-stuffing
    return h.astype(np.float64)


def resample_poly(
    x: np.ndarray, from_rate: int, to_rate: int, use_jax: Optional[bool] = None,
    wire: str = "f32", device_out: bool = False,
):
    """Anti-aliased rational resampling (e.g. 48000 → 16000, 44100 → 48000).

    Implemented as polyphase convolution; on TPU the phases evaluate as one
    batched conv (MXU), on host via numpy. Matches the reference's
    rubato-quality offline path functionally (≥90 dB stopband).

    ``wire="i16"`` (device path only) ships the input as int16 PCM —
    exact when the samples sit on the int16 grid, i.e. came from a 16-bit
    WAV — halving the upload that dominates long-file resampling through
    the tunnel.

    ``device_out=True`` (device path only) returns the result as a
    device-resident jax array instead of fetching it to host — for
    consumers that feed the samples straight back into device compute
    (run_transcription's chunk batches), where the round trip is pure
    waste: ~2x the audio bytes over PCIe, far worse over a tunnel.
    """
    x = np.asarray(x, dtype=np.float32)
    if from_rate == to_rate or x.size == 0:
        if device_out:
            import jax.numpy as jnp

            return jnp.asarray(x)
        return x.copy()
    g = math.gcd(int(from_rate), int(to_rate))
    up, down = int(to_rate) // g, int(from_rate) // g
    h = _kaiser_sinc_filter(up, down)

    if use_jax is None:
        import jax

        use_jax = jax.default_backend() == "tpu"

    if not use_jax:
        from scipy.signal import resample_poly as sp_resample_poly

        # Same prototype filter as the TPU path (scipy treats an array
        # window as the FIR coefficients, compensates the group delay, and
        # applies the x up gain itself — hand it the unscaled prototype).
        return sp_resample_poly(x.astype(np.float64), up, down, window=h / up).astype(
            np.float32
        )

    # Bucket the compiled length: the conv is built per input length, and
    # every distinct recording length would otherwise pay a fresh XLA
    # compile (tens of seconds through a tunneled compiler). Trailing
    # zero-pad is exact — the windows for the first ceil(n·up/down)
    # outputs only ever see those zeros where the unpadded conv saw its
    # own zero edge. Powers of two below 2^22 samples; multiples of 2^22
    # above (pow-2 padding on an hour-long file would upload up to ~2x
    # the bytes — at ~87 s per step the pad stays under ~2.5% while the
    # compile count stays bounded, and the persistent XLA cache amortizes
    # each size across runs).
    n = x.size
    nout = int(np.ceil(n * up / down))
    if n > (1 << 22):
        bucket = -(-n // (1 << 22)) * (1 << 22)
    else:
        bucket = max(1 << 14, 1 << (n - 1).bit_length())
    fn = _cached_resampler_jax(int(from_rate), int(to_rate), bucket)
    xp = np.pad(x, (0, bucket - n)) if bucket != n else x
    if wire == "i16":
        xp = (xp * 32768.0).astype(np.int16)  # exact for 16-bit sources
    if device_out:
        return fn(xp)[:nout]  # stays on device
    return np.asarray(fn(xp), dtype=np.float32)[:nout]


@functools.lru_cache(maxsize=32)
def _cached_resampler_jax(from_rate: int, to_rate: int, n_samples: int):
    import jax

    return jax.jit(make_resampler_jax(from_rate, to_rate, n_samples))


def make_resampler_jax(from_rate: int, to_rate: int, n_samples: int):
    """Jittable device-resident polyphase resampler for a fixed input
    length (the conv formulation of resample_poly's TPU branch). Returns
    a function jnp [n_samples] → jnp [ceil(n*up/down)] that stays on
    device — composable into larger jitted pipelines (mix, dual-mono)."""
    import jax.numpy as jnp
    from jax import lax

    g = math.gcd(int(from_rate), int(to_rate))
    up, down = int(to_rate) // g, int(from_rate) // g
    h = _kaiser_sinc_filter(up, down)

    # True polyphase as one strided conv: y[b*up + c] = sum_t xpad[b*down + t]
    # * F[c, t] where F[c, t] = h[pad + up*(i_lo + t) - down*c] (0 outside).
    L = h.size
    pad = L // 2
    nout = int(np.ceil(n_samples * up / down))
    i_lo = int(np.floor(-pad / up))
    i_hi = int(np.floor((down * (up - 1) - pad + L - 1) / up))
    T = i_hi - i_lo + 1
    c = np.arange(up)[:, None]
    t = np.arange(T)[None, :]
    hidx = pad + up * (i_lo + t) - down * c
    F = np.where((hidx >= 0) & (hidx < L), h[np.clip(hidx, 0, L - 1)], 0.0)
    B = -(-nout // up)
    lpad = -i_lo
    rpad = max(0, (B - 1) * down + i_hi + 1 - n_samples)
    Fj = jnp.asarray(F, jnp.float32)[:, None, :]

    def fn(x):
        x = jnp.asarray(x)
        if x.dtype == jnp.int16:  # i16 wire: exact power-of-two rescale
            x = x.astype(jnp.float32) / 32768.0
        xp = jnp.pad(x, (lpad, rpad))[None, None, :]
        # HIGHEST: the prototype filter's ≥90 dB stopband is meaningless
        # if the conv itself runs as a single bf16 pass (≈ -52 dB noise).
        out = lax.conv_general_dilated(
            xp, Fj, window_strides=(down,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=lax.Precision.HIGHEST,
        )[0]  # [up, B]
        return out.T.reshape(-1)[:nout]

    return fn
