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

    runner = OnnxRunner.load(path).validate()
    name, _, shape = _first_input(runner)
    rank = len(shape) if shape else 3
    big = runner.lift_big_params()

    @jax.jit
    def fn(windows, params):
        x = windows[:, None, :] if rank == 3 else windows
        out = runner(params, **{name: x})
        y = out[runner.output_names[0]]
        if y.ndim == 2:  # [F, C] single-window export
            y = y[None]
        return y

    def call(windows: np.ndarray) -> np.ndarray:
        return np.asarray(fn(windows.astype(np.float32), big))

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
    def run_feats(feats, params):
        out = runner(params, **{name: feats})
        return out[runner.output_names[0]]

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
            feats = np.asarray(fbank(jnp.asarray(audio), feat_dim))
            # WeSpeaker applies per-utterance CMN (subtract feature mean)
            feats = feats - feats.mean(axis=1, keepdims=True)
            embs = np.asarray(run_feats(feats.astype(np.float32), big))
            for j, i in enumerate(idxs):
                out[i] = embs[j]
        return np.stack(out).astype(np.float32)

    return call
