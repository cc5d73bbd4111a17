"""Diarization nets from their distributed ONNX files, via the generic
ONNX→JAX executor.

The reference runs pyannote segmentation-3.0 and WeSpeaker CAM++ through
ONNX Runtime (managers/diarization.rs:40-75,133-134: session.run per 10 s
window / per ≤4 s chunk). Here the same .onnx files execute as jitted JAX
— the whole window batch in one compiled call — with input names and
layouts introspected from the graph rather than hardcoded.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np

from .onnx_exec import OnnxRunner


def _first_input(runner: OnnxRunner):
    infos = runner.input_info()
    if not infos:
        raise ValueError("ONNX graph has no runtime inputs")
    return infos[0]


def segmentation_runner(path) -> Callable[[np.ndarray], np.ndarray]:
    """segmentation .onnx → fn(windows [W, 160000]) → logits [W, F, C].

    pyannote segmentation-3.0 takes waveform [B, 1, T] and returns powerset
    logits [B, 589, 7]; rank is introspected so a [B, T] export also works.
    """
    import jax
    import jax.numpy as jnp

    runner = OnnxRunner.load(path).validate()
    name, _, shape = _first_input(runner)
    rank = len(shape) if shape else 3
    big = runner.lift_big_params()

    def _forward(windows, params):
        x = windows[:, None, :] if rank == 3 else windows
        out = runner(params, **{name: x})
        y = out[runner.output_names[0]]
        if y.ndim == 2:  # [F, C] single-window export
            y = y[None]
        return y

    fn = jax.jit(_forward)
    flat_jits: dict = {}

    def _fn_flat(mesh):
        # one-upload path: the flat int16 recording is already resident on
        # the device; windows are a free reshape there (engine/diarization
        # uploads it once and runs segmentation + embedding off the same
        # array — the host path re-uploads ~230 MB/hour of f32 windows).
        # With a mesh the window axis shards over 'data' (SPMD: each chip
        # segments its own stretch of the recording).
        @jax.jit
        def f(x16, params):
            x = x16.astype(jnp.float32) * (1.0 / 32768.0)
            w = x.reshape(-1, 160000)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                w = jax.lax.with_sharding_constraint(
                    w, NamedSharding(mesh, PartitionSpec("data", None)))
            return _forward(w, params)

        return f

    def call(windows: np.ndarray) -> np.ndarray:
        return np.asarray(fn(windows.astype(np.float32), big))

    def from_device(dev_i16, mesh=None) -> np.ndarray:
        if mesh not in flat_jits:
            flat_jits[mesh] = _fn_flat(mesh)
        return np.asarray(flat_jits[mesh](dev_i16, big))

    call.from_device = from_device
    return call


def embedding_runner(path, feat_dim: int = 80) -> Callable[[Sequence[np.ndarray]], np.ndarray]:
    """speaker-embedding .onnx → fn([segments]) → [N, D].

    WeSpeaker CAM++ takes kaldi fbank feats [B, T, 80] ('feats' → 'embs').
    Variable-length segments are bucketed by frame count so each compiled
    shape runs its whole bucket as one batch (the reference loops one ONNX
    run per chunk — diarization.rs:53-74).
    """
    import jax
    import jax.numpy as jnp

    from ..dsp.fbank import fbank

    runner = OnnxRunner.load(path).validate()
    name, _, shape = _first_input(runner)
    if shape and len(shape) not in (2, 3):
        raise ValueError(f"unexpected embedding input rank {len(shape)}")
    big = runner.lift_big_params()

    @jax.jit
    def run_audio(audio, params):
        # fbank + CMN + net in ONE compiled program: features stay on the
        # device between stages. (Computing fbank on-device, pulling the
        # [B, T, 80] feature tensor to the host for the mean-subtract, and
        # re-uploading it measured 2x slower end-to-end over the hour
        # pipeline — a ~230 MB round trip per 900-chunk batch.)
        feats = fbank(audio, feat_dim)
        # WeSpeaker applies per-utterance CMN (subtract feature mean)
        feats = feats - jnp.mean(feats, axis=1, keepdims=True)
        out = runner(params, **{name: feats.astype(jnp.float32)})
        return out[runner.output_names[0]]

    import functools

    slice_jits: dict = {}

    def _run_slices(mesh):
        @functools.partial(jax.jit, static_argnums=(2,))
        def f(x16, starts, L, params):
            # one-upload path: chunks are dynamic slices of the device-
            # resident int16 recording — no per-chunk host audio crosses
            # the link. With a mesh the chunk batch shards over 'data'.
            audio = jax.vmap(
                lambda s: jax.lax.dynamic_slice(x16, (s,), (L,)))(starts)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                audio = jax.lax.with_sharding_constraint(
                    audio, NamedSharding(mesh, PartitionSpec("data", None)))
            audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
            feats = fbank(audio, feat_dim)
            feats = feats - jnp.mean(feats, axis=1, keepdims=True)
            out = runner(params, **{name: feats.astype(jnp.float32)})
            return out[runner.output_names[0]]

        return f

    def call(segments: Sequence[np.ndarray]) -> np.ndarray:
        if not len(segments):
            return np.zeros((0, 0), np.float32)
        # bucket by sample count: fbank + the net run whole buckets batched
        buckets = {}
        for i, seg in enumerate(segments):
            buckets.setdefault(len(seg), []).append(i)
        out: List[np.ndarray] = [None] * len(segments)  # type: ignore
        for _n, idxs in buckets.items():
            audio = np.stack([np.asarray(segments[i], np.float32) for i in idxs])
            embs = np.asarray(run_audio(jnp.asarray(audio), big))
            for j, i in enumerate(idxs):
                out[i] = embs[j]
        return np.stack(out).astype(np.float32)

    def from_device(dev_i16, ranges, mesh=None) -> np.ndarray:
        """[(sample_start, sample_end)] chunk ranges over the device-resident
        flat int16 recording → [N, D] embeddings. Batch counts bucket to
        powers of two so chunk populations reuse compiled programs."""
        if not len(ranges):
            return np.zeros((0, 0), np.float32)
        if mesh not in slice_jits:
            slice_jits[mesh] = _run_slices(mesh)
        run = slice_jits[mesh]
        buckets: dict = {}
        for i, (a, b) in enumerate(ranges):
            buckets.setdefault(int(b - a), []).append(i)
        out: List[np.ndarray] = [None] * len(ranges)  # type: ignore
        for L, idxs in buckets.items():
            k = len(idxs)
            npad = 1 << (k - 1).bit_length()
            starts = np.zeros(npad, np.int32)
            starts[:k] = [ranges[i][0] for i in idxs]
            embs = np.asarray(run(dev_i16, jnp.asarray(starts), L, big))
            for j, i in enumerate(idxs):
                out[i] = embs[j]
        return np.stack(out).astype(np.float32)

    call.from_device = from_device
    return call

    return call
