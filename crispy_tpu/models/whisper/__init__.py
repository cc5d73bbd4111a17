"""Whisper family: JAX encoder-decoder + KV-cached greedy decoding.

Replaces the reference's whisper.cpp engine (managers/transcription.rs:124).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from .model import (
    CONFIGS, WhisperConfig, beam_decode, decode_logits, encode, greedy_decode,
    sample_decode,
)
from .tokenizer import WhisperTokenizer
from .weights import from_hf_state_dict, init_random, load_ggml, load_hf


class WhisperModel:
    """Bundled params + config + tokenizer with a batched transcribe API."""

    def __init__(self, params, cfg: WhisperConfig, tokenizer: WhisperTokenizer,
                 name: str = "whisper"):
        import jax.numpy as jnp

        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.name = name
        self.mesh = None

    # -- multi-chip -------------------------------------------------------------
    def shard_to(self, mesh) -> "WhisperModel":
        """Shard for SPMD execution: params tensor-parallel over 'model'
        (parallel/asr.py specs — XLA inserts the ICI all-reduces), chunk
        batches data-parallel over 'data' in every transcribe path.
        This is SURVEY §2.8's TPU equivalent of the reference's serial
        30 s-chunk loop."""
        from ...parallel.asr import shard_whisper

        self.params = shard_whisper(self.params, mesh)
        self.mesh = mesh
        return self

    def _shard_batch(self, B: int, *arrays):
        """device_put arrays (leading batch axis) over 'data', padding the
        batch to a multiple of the dp size. Returns (arrays, orig_B)."""
        if self.mesh is None:
            return arrays, B
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = self.mesh.devices.shape[0]
        Bp = -(-B // dp) * dp
        out = []
        for a in arrays:
            if Bp != B:
                a = jnp.concatenate([a, jnp.repeat(a[-1:], Bp - B, axis=0)])
            spec = P("data", *([None] * (a.ndim - 1)))
            out.append(jax.device_put(a, NamedSharding(self.mesh, spec)))
        return tuple(out), B

    # -- constructors ---------------------------------------------------------
    @staticmethod
    def from_ggml(path, name: Optional[str] = None) -> "WhisperModel":
        params, cfg, vocab, _filters = load_ggml(path)
        tok = WhisperTokenizer.from_ggml_vocab(vocab, cfg.n_vocab)
        return WhisperModel(params, cfg, tok, name or Path(path).stem)

    @staticmethod
    def from_hf(path, name: Optional[str] = None) -> "WhisperModel":
        params, cfg = load_hf(path)
        tok = WhisperTokenizer.from_hf_dir(path, n_vocab=cfg.n_vocab)
        return WhisperModel(params, cfg, tok, name or Path(path).name)

    @staticmethod
    def random(size: str = "test-random", seed: int = 0) -> "WhisperModel":
        cfg = CONFIGS[size]
        return WhisperModel(init_random(cfg, seed), cfg,
                            WhisperTokenizer.dummy(cfg.n_vocab), f"random-{size}")

    # -- inference -------------------------------------------------------------
    def _prompt_ids(self, language: str, initial_prompt: Optional[str],
                    timestamps: bool = False) -> List[int]:
        """SOT sequence, optionally preceded by <|startofprev|> + prompt
        tokens (whisper's initial-prompt conditioning; the previous-context
        window is capped at n_text_ctx//2 − 1 tokens)."""
        tok = self.tokenizer
        seq = tok.sot_sequence(language=language, timestamps=timestamps)
        if initial_prompt:
            ids = tok.encode(" " + initial_prompt.strip())
            return [tok.sot_prev] + ids[-(self.cfg.n_text_ctx // 2 - 1):] + seq
        return seq

    def transcribe_chunks(
        self,
        audio_16k: np.ndarray,
        language: str = "en",
        max_new: int = 224,
        initial_prompt: Optional[str] = None,
        beam: int = 1,
    ) -> List[str]:
        """audio [B, T<=480000] 16 kHz chunks → one text per chunk (batched).

        beam > 1 switches to beam search with length-normalized ranking."""
        import jax.numpy as jnp

        from ...dsp.mel import log_mel_spectrogram

        a = np.atleast_2d(np.asarray(audio_16k, dtype=np.float32))
        mel = log_mel_spectrogram(jnp.asarray(a), n_mels=self.cfg.n_mels,
                                  pad_to_chunk=True)
        tok = self.tokenizer
        sot = self._prompt_ids(language, initial_prompt)
        prompt = jnp.asarray(np.tile(np.array(sot, np.int32), (a.shape[0], 1)))
        (mel, prompt), B0 = self._shard_batch(a.shape[0], mel, prompt)
        if beam > 1:
            tokens, lengths, _ = beam_decode(
                self.params, self.cfg, mel, prompt, beam=beam,
                max_new=max_new, eot=tok.eot)
        else:
            tokens, lengths = greedy_decode(
                self.params, self.cfg, mel, prompt, max_new=max_new, eot=tok.eot
            )
        tokens, lengths = np.asarray(tokens), np.asarray(lengths)
        return [tok.decode(tokens[b, : lengths[b]]) for b in range(B0)]

    def transcribe_chunks_robust(
        self,
        audio_16k: np.ndarray,
        language: str = "en",
        max_new: int = 224,
        temperatures: Tuple[float, ...] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
        compression_ratio_threshold: float = 2.4,
        logprob_threshold: float = -1.0,
        no_speech_threshold: float = 0.6,
        seed: int = 0,
        initial_prompt: Optional[str] = None,
    ) -> List[str]:
        """Quality-gated decoding with the Whisper temperature-fallback
        policy: greedy first; a chunk whose output is degenerate
        (zlib compression ratio > threshold → looping/repetition) or
        low-confidence (avg logprob < threshold) re-decodes at the next
        temperature. Chunks whose no_speech probability exceeds the
        threshold while confidence stays low are emitted as silence.
        The whole ladder reuses ONE compilation (temperature is traced);
        each retry re-decodes the full batch and keeps rows that already
        passed, so shapes never change.
        """
        import jax
        import jax.numpy as jnp

        from ...dsp.mel import log_mel_spectrogram

        if isinstance(audio_16k, jax.Array):
            # device-resident chunks (run_transcription's device pipeline):
            # never round-trip them through host numpy — mel consumes them
            # where they already live
            a = audio_16k if audio_16k.ndim == 2 else audio_16k[None]
            a = a.astype(jnp.float32)
        else:
            a = np.atleast_2d(np.asarray(audio_16k, dtype=np.float32))
        B = int(a.shape[0])
        mel = log_mel_spectrogram(jnp.asarray(a), n_mels=self.cfg.n_mels,
                                  pad_to_chunk=True)
        tok = self.tokenizer
        prompt_ids = self._prompt_ids(language, initial_prompt)
        prompt = jnp.asarray(np.tile(np.array(prompt_ids, np.int32), (B, 1)))
        ns_id = jnp.int32(min(tok.no_speech, self.cfg.n_vocab - 1))
        # no-speech prob is read at the SOT position (≠ 0 when an
        # initial_prompt prepends <|startofprev|> context)
        sot_index = jnp.int32(prompt_ids.index(tok.sot) if tok.sot in prompt_ids else 0)
        (mel, prompt), B = self._shard_batch(B, mel, prompt)
        # Encode ONCE: every fallback rung shares the encoder output (the
        # rungs differ only in sampling temperature), so retries cost a
        # decoder pass, not an encoder+decoder pass.
        from .model import encode_jit

        enc = encode_jit(self.params, self.cfg, mel)

        results: List[Optional[str]] = [None] * B
        for t_i, temp in enumerate(temperatures):
            key = jax.random.PRNGKey(seed + t_i)
            tokens, lengths, lp_sum, ns_prob = sample_decode(
                self.params, self.cfg, enc, prompt, jnp.float32(temp), key,
                ns_id, sot_index, max_new=max_new, eot=tok.eot)
            tokens, lengths = np.asarray(tokens), np.asarray(lengths)
            lp_sum, ns_prob = np.asarray(lp_sum), np.asarray(ns_prob)
            last = t_i == len(temperatures) - 1
            for b in range(B):
                if results[b] is not None:
                    continue
                text = tok.decode(tokens[b, : lengths[b]])
                avg_lp = float(lp_sum[b]) / (int(lengths[b]) + 1)
                degenerate = compression_ratio(text) > compression_ratio_threshold
                low_conf = avg_lp < logprob_threshold
                if (degenerate or low_conf) and not last:
                    continue  # fall back to the next temperature
                if float(ns_prob[b]) > no_speech_threshold and low_conf:
                    text = ""  # confident silence (whisper no-speech gate)
                results[b] = text
            if all(r is not None for r in results):
                break
        return [r if r is not None else "" for r in results]

    def transcribe_chunks_with_timestamps(
        self, audio_16k: np.ndarray, offsets_seconds: Optional[List[float]] = None,
        language: str = "en", max_new: int = 224,
        initial_prompt: Optional[str] = None,
    ) -> List[List[Tuple[float, float, str]]]:
        """[B, T] chunks → per-chunk [(start, end, text)] segments from
        Whisper's timestamp tokens, decoded in ONE batched greedy call (the
        reference gets word segments from its engines one chunk at a time —
        managers/transcription.rs:196-249; batching keeps the TPU advantage
        on diarization-enabled jobs)."""
        import jax
        import jax.numpy as jnp

        from ...dsp.mel import log_mel_spectrogram

        if isinstance(audio_16k, jax.Array):  # device chunks: stay on device
            a = audio_16k if audio_16k.ndim == 2 else audio_16k[None]
            a = a.astype(jnp.float32)
        else:
            a = np.atleast_2d(np.asarray(audio_16k, dtype=np.float32))
        B = int(a.shape[0])
        if offsets_seconds is None:
            offsets_seconds = [0.0] * B
        dur = a.shape[1] / 16000.0
        mel = log_mel_spectrogram(jnp.asarray(a), n_mels=self.cfg.n_mels, pad_to_chunk=True)
        tok = self.tokenizer
        sot = self._prompt_ids(language, initial_prompt, timestamps=True)
        prompt = jnp.asarray(np.tile(np.array(sot, np.int32), (B, 1)))
        (mel, prompt), B = self._shard_batch(B, mel, prompt)
        tokens, lengths = greedy_decode(
            self.params, self.cfg, mel, prompt, max_new=max_new, eot=tok.eot
        )
        tokens, lengths = np.asarray(tokens), np.asarray(lengths)
        return [
            parse_timestamp_segments(
                tokens[b, : int(lengths[b])].tolist(), tok,
                float(offsets_seconds[b]), dur)
            for b in range(B)
        ]

    def transcribe_chunk_with_timestamps(
        self, audio_16k: np.ndarray, offset_seconds: float = 0.0,
        language: str = "en", max_new: int = 224,
        initial_prompt: Optional[str] = None,
    ) -> List[Tuple[float, float, str]]:
        """Single-chunk convenience wrapper over the batched path."""
        return self.transcribe_chunks_with_timestamps(
            np.atleast_2d(np.asarray(audio_16k, dtype=np.float32)),
            [offset_seconds], language=language, max_new=max_new,
            initial_prompt=initial_prompt)[0]


def compression_ratio(text: str) -> float:
    """len(utf-8)/len(zlib): > ~2.4 flags degenerate looping output."""
    import zlib

    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def parse_timestamp_segments(ids, tok: WhisperTokenizer, offset: float,
                             chunk_dur: float) -> List[Tuple[float, float, str]]:
    """Token stream with <|t|> markers → [(start, end, text)]; robust to
    malformed sequences (missing close markers use the chunk end)."""
    segments: List[Tuple[float, float, str]] = []
    cur_start: Optional[float] = None
    cur: List[int] = []
    for t in ids:
        ts = tok.timestamp_seconds(t)
        if ts is None:
            if not tok.is_special(t):
                cur.append(t)
            continue
        if cur_start is None:
            cur_start = ts
        else:
            text = tok.decode(cur).strip()
            if text:
                segments.append((offset + cur_start, offset + min(ts, chunk_dur), text))
            cur, cur_start = [], ts
    if cur and cur_start is not None:
        text = tok.decode(cur).strip()
        if text:
            segments.append((offset + cur_start, offset + chunk_dur, text))
    elif cur:  # no timestamps at all: whole-chunk fallback
        text = tok.decode(cur).strip()
        if text:
            segments.append((offset, offset + chunk_dur, text))
    return segments
