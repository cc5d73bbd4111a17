"""File→text transcription pipeline.

Rebuild of the reference's transcription stack (SURVEY §2.3):
  * TranscriptionManager (managers/transcription.rs:26-249): one loaded
    engine, current model id, per-recording state map + cancel flags.
  * run_transcription (commands/transcription.rs:98-481): WAV → mono →
    16 kHz → 30 s chunks → text, with phase/progress/ETA events,
    cancellation, diarization hand-off, and result persistence.
  * Sidecar persistence (managers/transcription.rs:252-361): hash-keyed
    .txt / .meta / .chat.json under ~/Documents/Crispy/Transcriptions.

TPU-first redesign: the reference transcribes 30 s chunks serially on CPU
(its throughput bottleneck, SURVEY §2.8); here chunks are *batched* and
decoded together on the accelerator — long recordings become a batch
dimension, and progress advances per batch.
"""

from __future__ import annotations

import json
import threading
import time
from dataclasses import asdict, dataclass
from pathlib import Path
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from ..api.events import BUS, EventBus
from ..io import wav as wavio
from ..models.registry import ModelManager
from ..utils import paths

TARGET_SAMPLE_RATE = 16000  # commands/transcription.rs:173
TRANSCRIBE_CHUNK_SECONDS = 30  # :175
CHUNK_SAMPLES = TARGET_SAMPLE_RATE * TRANSCRIBE_CHUNK_SECONDS


# ---------------------------------------------------------------------------
# Persistence (hash-keyed sidecars)
# ---------------------------------------------------------------------------

def _is_device_array(x) -> bool:
    """True for jax device arrays (duck-typed: no jax import on the host
    paths that never touch a device)."""
    return type(x).__module__.startswith("jax") or hasattr(x, "addressable_shards")


def transcription_file_stem(recording_path: str) -> str:
    """Stable 16-hex stem from the recording path.

    The reference uses Rust's DefaultHasher (SipHash with an unspecified
    key); any stable 64-bit hash with the same format works — FNV-1a here.
    """
    h = np.uint64(0xCBF29CE484222325)
    for b in str(recording_path).encode("utf-8"):
        h = np.uint64((int(h) ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
    return f"{int(h):016x}"


def _tdir() -> Path:
    return paths.ensure_dir(paths.transcriptions_dir())


def transcription_result_path(recording_path: str) -> Path:
    return _tdir() / f"{transcription_file_stem(recording_path)}.txt"


def transcription_metadata_path(recording_path: str) -> Path:
    return _tdir() / f"{transcription_file_stem(recording_path)}.meta"


def transcription_chat_history_path(recording_path: str) -> Path:
    return _tdir() / f"{transcription_file_stem(recording_path)}.chat.json"


def save_transcription_result(recording_path: str, text: str) -> None:
    transcription_result_path(recording_path).write_text(text, encoding="utf-8")


def load_transcription_result(recording_path: str) -> Optional[str]:
    p = transcription_result_path(recording_path)
    return p.read_text(encoding="utf-8") if p.exists() else None


def save_transcription_metadata(recording_path: str, model_id: str) -> None:
    transcription_metadata_path(recording_path).write_text(
        json.dumps({"model_id": model_id}), encoding="utf-8"
    )


def load_transcription_metadata(recording_path: str) -> Optional[str]:
    p = transcription_metadata_path(recording_path)
    if not p.exists():
        return None
    return json.loads(p.read_text(encoding="utf-8")).get("model_id")


def transcription_progress_path(recording_path: str) -> Path:
    return _tdir() / f"{transcription_file_stem(recording_path)}.progress.json"


def _save_progress(recording_path: str, payload: dict) -> None:
    """Atomic temp+rename write (the settings-store discipline) so a crash
    mid-write can't corrupt the checkpoint."""
    p = transcription_progress_path(recording_path)
    tmp = p.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(payload), encoding="utf-8")
    tmp.replace(p)


def _load_progress(recording_path: str) -> Optional[dict]:
    p = transcription_progress_path(recording_path)
    if not p.exists():
        return None
    try:
        return json.loads(p.read_text(encoding="utf-8"))
    except (json.JSONDecodeError, OSError):
        return None  # unreadable checkpoint: restart from zero


def clear_transcription_progress(recording_path: str) -> None:
    transcription_progress_path(recording_path).unlink(missing_ok=True)


def save_transcription_chat_history(recording_path: str, messages: List[dict]) -> None:
    transcription_chat_history_path(recording_path).write_text(
        json.dumps(messages, indent=2), encoding="utf-8"
    )


def load_transcription_chat_history(recording_path: str) -> List[dict]:
    p = transcription_chat_history_path(recording_path)
    if not p.exists():
        return []
    return json.loads(p.read_text(encoding="utf-8"))


# ---------------------------------------------------------------------------
# Engine loading
# ---------------------------------------------------------------------------

class EngineProtocol:
    """A loaded speech model: batched 30 s chunk transcription."""

    name: str = "engine"

    #: Preferred large chunk-batch size, 0 = no preference. Engines whose
    #: decode cost is dominated by a sequential per-step scan (whisper's
    #: 224-step greedy loop) amortize steps over bigger batches: measured
    #: on chip (whisper-base, 224-step worst case), B=16 runs 1.74x the
    #: B=8 wall — 13% less time per audio second — so one padded 16-batch
    #: (321 ms) beats two 8-batches (368 ms) for any remainder >8.
    #: run_transcription schedules batches of this size while more than
    #: `batch_chunks` chunks remain. Engines left at 0 keep the fixed
    #: `batch_chunks` schedule (the executor engines' step-time scaling
    #: is unmeasured; linear scaling would make big buckets a wash).
    decode_batch_bucket: int = 0

    def transcribe_batch(self, chunks_16k: np.ndarray, language: str = "en") -> List[str]:
        raise NotImplementedError

    def transcribe_with_timestamps(
        self, chunk_16k: np.ndarray, offset_seconds: float, language: str = "en"
    ) -> List[Tuple[float, float, str]]:
        """Word segments (start, end, text); default: whole-chunk fallback
        (managers/transcription.rs:196-249's fallback path)."""
        text = self.transcribe_batch(chunk_16k[None, :], language=language)[0]
        dur = len(chunk_16k) / TARGET_SAMPLE_RATE
        return [(offset_seconds, offset_seconds + dur, text)] if text.strip() else []

    def transcribe_batch_with_timestamps(
        self, chunks_16k: np.ndarray, offsets_seconds: List[float],
        language: str = "en"
    ) -> List[List[Tuple[float, float, str]]]:
        """Batched timestamped decode. The default runs ONE batched
        transcribe_batch call and returns whole-chunk segments (the
        reference's fallback granularity, managers/transcription.rs:196-249)
        — so diarization-enabled jobs keep the batch advantage even for
        engines without word-level timestamps. Engines with word alignment
        (whisper, the ONNX CTC/TDT/enc-dec engines) override. An engine
        that overrides only the single-chunk method keeps its word
        granularity (delegation preserved)."""
        if (type(self).transcribe_with_timestamps
                is not EngineProtocol.transcribe_with_timestamps):
            import inspect

            takes_lang = "language" in inspect.signature(
                type(self).transcribe_with_timestamps).parameters
            return [self.transcribe_with_timestamps(
                        chunks_16k[j], offsets_seconds[j],
                        **({"language": language} if takes_lang else {}))
                    for j in range(len(chunks_16k))]
        a = np.atleast_2d(np.asarray(chunks_16k))
        texts = self.transcribe_batch(a, language=language)
        dur = a.shape[1] / TARGET_SAMPLE_RATE
        return [[(off, off + dur, t)] if t.strip() else []
                for t, off in zip(texts, offsets_seconds)]


def resolve_mesh(mesh):
    """Resolve the lazy 'auto' mesh sentinel: a Mesh over all visible
    devices when more than one exists, else None. Deferred to first engine
    use because jax.devices() pays the accelerator handshake — a CLI call
    like `crispy models list` must not touch the device."""
    if mesh == "auto":
        import jax

        from .. import parallel

        if len(jax.devices()) <= 1:
            return None
        # product path: every device on the 'data' axis. The default
        # (data, model=2) mesh would leave the ONNX engines' P('data')
        # sharding with a size-1 data axis on 2 chips (full replication);
        # DP over chunk batches scales every engine, whisper included.
        return parallel.make_mesh(model_parallel=1)
    return mesh


def load_engine(model_id: str, model_manager: ModelManager,
                mesh=None) -> EngineProtocol:
    """EngineType dispatch (managers/transcription.rs:119-172).

    whisper ggml files and HF checkpoint dirs load into the JAX Whisper;
    the ONNX-family bundles run through executor-backed engines. With a
    mesh, whisper shards TP over 'model' and every chunk batch DP over
    'data' (SURVEY §2.8's scaling story, wired into the product path).
    """
    mesh = resolve_mesh(mesh)
    info = model_manager.find(model_id)
    if info is None:
        raise ValueError(f"unknown model: {model_id}")
    path = model_manager.model_path(model_id)
    if not model_manager.is_downloaded(model_id):
        raise FileNotFoundError(f"model not downloaded: {model_id}")

    if info.engine_type == "whisper":
        from ..models.whisper import WhisperModel

        if path.is_dir():
            wm = WhisperModel.from_hf(path, name=model_id)
        else:
            wm = WhisperModel.from_ggml(path, name=model_id)
        if mesh is not None:
            wm.shard_to(mesh)

        class _WhisperEngine(EngineProtocol):
            name = model_id
            decode_batch_bucket = 16  # measured: -13% RTF vs B=8 (PERF.md)

            def transcribe_batch(self, chunks, language="en"):
                # whisper.cpp applies temperature fallback + the no-speech
                # gate internally (transcription.rs delegates); match it.
                return wm.transcribe_chunks_robust(chunks, language=language)

            def transcribe_with_timestamps(self, chunk_16k, offset_seconds,
                                           language="en"):
                return wm.transcribe_chunk_with_timestamps(
                    chunk_16k, offset_seconds, language=language)

            def transcribe_batch_with_timestamps(self, chunks, offsets,
                                                 language="en"):
                return wm.transcribe_chunks_with_timestamps(
                    chunks, offsets, language=language)

        return _WhisperEngine()
    if info.engine_type == "moonshine":
        from ..models.moonshine import CONFIGS as MS_CONFIGS
        from ..models.moonshine import MoonshineConfig, MoonshineModel

        if (path / "params.npz").exists():
            import json

            raw = json.loads((path / "config.json").read_text())
            ms_cfg = (MS_CONFIGS[raw["config"]] if "config" in raw
                      else MoonshineConfig(**raw))
            ms_tok = None
            if (path / "tokenizer.json").exists():
                from tokenizers import Tokenizer

                ms_tok = Tokenizer.from_file(str(path / "tokenizer.json"))
            mm = MoonshineModel(dict(np.load(path / "params.npz")), ms_cfg,
                                ms_tok, name=model_id)
        elif (path / "model.safetensors").exists() or (path / "pytorch_model.bin").exists():
            mm = MoonshineModel.from_hf(path, name=model_id)
        else:
            # the catalog bundle ships ONNX graphs (transcribe-rs
            # MoonshineModel, managers/transcription.rs:146-149): run them
            # directly through the ONNX->JAX executor
            from .onnx_engines import engine_from_onnx_dir

            return engine_from_onnx_dir(model_id, path, mesh=mesh)

        class _MoonshineEngine(EngineProtocol):
            name = model_id

            def transcribe_batch(self, chunks, language="en"):
                return mm.transcribe_chunks(chunks, language=language)

        return _MoonshineEngine()
    if info.engine_type == "parakeet":
        import jax.numpy as jnp

        from ..models import parakeet as pk
        from ..dsp.mel import log_mel_spectrogram

        if (path / "params.npz").exists():
            # Prepared TDT bundle (the converter's output): params.npz in
            # models/parakeet layout + config.json + tokenizer.model.
            import json

            from ..models.spm import SentencePieceVocab
            from ..dsp.fbank import fbank

            raw = json.loads((path / "config.json").read_text())
            cfg = pk.ParakeetConfig(**raw.get("encoder", {}))
            params = {k: jnp.asarray(v)
                      for k, v in np.load(path / "params.npz").items()}
            vocab = SentencePieceVocab.load(path / "tokenizer.model")
            from ..dsp import asr_frontend as fe

            class _ParakeetTdtEngine(EngineProtocol):
                name = model_id

                def transcribe_batch(self, chunks, language="en"):
                    # NeMo models train on the NeMo mel preprocessor
                    # (preemphasis + slaney mel + per-feature norm), not
                    # kaldi fbank — same frontend as the ONNX-bundle path
                    feats = fe.nemo_log_mel(
                        jnp.asarray(np.atleast_2d(chunks)), cfg.n_mels
                    ).swapaxes(1, 2)
                    toks, n = pk.tdt_greedy_decode(params, cfg, feats)
                    toks, n = np.asarray(toks), np.asarray(n)
                    return [vocab.decode(row[:k]) for row, k in zip(toks, n)]

            return _ParakeetTdtEngine()
        if (path / "model.safetensors").exists() or (path / "pytorch_model.bin").exists():
            if (path / "model.safetensors").exists():
                from safetensors.numpy import load_file

                sd = load_file(path / "model.safetensors")
            else:
                import torch

                sd = {k: v.numpy() for k, v in torch.load(
                    path / "pytorch_model.bin", map_location="cpu",
                    weights_only=True).items()}
            params, cfg = pk.from_hf_ctc_state_dict(sd)
            params = {k: jnp.asarray(v) for k, v in params.items()}
            tok = None
            if (path / "tokenizer.json").exists():
                from tokenizers import Tokenizer

                tok = Tokenizer.from_file(str(path / "tokenizer.json"))

            class _ParakeetCtcEngine(EngineProtocol):
                name = model_id

                def transcribe_batch(self, chunks, language="en"):
                    mel = log_mel_spectrogram(jnp.asarray(np.atleast_2d(chunks)),
                                              pad_to_chunk=True)
                    logits = pk.ctc_logits(params, cfg, mel.swapaxes(-1, -2))
                    seqs = pk.ctc_greedy(np.asarray(logits), cfg.blank_id)
                    if tok is not None:
                        return [tok.decode(s) for s in seqs]
                    return [" ".join(map(str, s)) for s in seqs]

            return _ParakeetCtcEngine()
        # the catalog bundle is the NeMo ONNX export pair (transcribe-rs
        # ParakeetModel, managers/transcription.rs:141-144): greedy TDT over
        # the executor
        from .onnx_engines import OnnxTdtEngine

        return OnnxTdtEngine(path, model_id, mesh=mesh)
    if info.engine_type == "canary":
        import json

        import jax.numpy as jnp

        from ..models import canary as cn
        from ..models import parakeet as pk
        from ..models.spm import SentencePieceVocab
        from ..dsp.fbank import fbank

        if not (path / "params.npz").exists():
            # the catalog bundle is the NeMo ONNX export (transcribe-rs
            # CanaryModel, managers/transcription.rs:157-160): AR greedy over
            # the executor
            from .onnx_engines import OnnxEncDecEngine

            return OnnxEncDecEngine(path, model_id, mesh=mesh)
        raw = json.loads((path / "config.json").read_text())
        prompt_ids = raw.pop("prompt_ids", None)
        if "config" in raw:
            cfg = cn.CONFIGS[raw["config"]]
        else:
            cfg = cn.CanaryConfig(
                encoder=pk.ParakeetConfig(**raw.pop("encoder", {})), **raw)
        if prompt_ids is None:
            prompt_ids = [cfg.bos]
        params = {k: jnp.asarray(v)
                  for k, v in np.load(path / "params.npz").items()}
        vocab = SentencePieceVocab.load(path / "tokenizer.model")

        pieces = list(vocab.pieces)

        def _prompt_for_language(language: str):
            """Swap <|lang|> slots in the canary prompt when the vocab has
            the requested language token (same contract as the ONNX
            enc-dec engine's prompt substitution)."""
            if language == "en" or f"<|{language}|>" not in pieces:
                return prompt_ids
            en, lang = (pieces.index("<|en|>") if "<|en|>" in pieces else -1,
                        pieces.index(f"<|{language}|>"))
            if en < 0:
                return prompt_ids
            return [lang if t == en else t for t in prompt_ids]

        from ..dsp import asr_frontend as fe

        class _CanaryEngine(EngineProtocol):
            name = model_id
            prompt_for_language = staticmethod(_prompt_for_language)

            def transcribe_batch(self, chunks, language="en"):
                B = len(np.atleast_2d(chunks))
                # NeMo mel preprocessor (same frontend as the ONNX path)
                feats = fe.nemo_log_mel(
                    jnp.asarray(np.atleast_2d(chunks)), cfg.encoder.n_mels
                ).swapaxes(1, 2)
                prompt = jnp.asarray(np.tile(
                    np.array(self.prompt_for_language(language), np.int32),
                    (B, 1)))
                tokens, lengths = cn.greedy_decode(params, cfg, feats, prompt=prompt)
                tokens, lengths = np.asarray(tokens), np.asarray(lengths)
                return [vocab.decode(row[:n]) for row, n in zip(tokens, lengths)]

        return _CanaryEngine()
    if info.engine_type == "gigaam":
        import json

        import jax.numpy as jnp

        from ..models import parakeet as pk
        from ..dsp.fbank import fbank

        if not (path / "params.npz").exists():
            # the catalog bundle is the GigaAM ONNX export (transcribe-rs
            # GigaAMModel, managers/transcription.rs:149-152): CTC over the
            # executor
            from .onnx_engines import OnnxCtcEngine

            return OnnxCtcEngine(path, model_id, mesh=mesh)
        raw = json.loads((path / "config.json").read_text())
        cfg = pk.ParakeetConfig(**raw.get("encoder", {}))
        labels = raw["labels"]  # id → string; blank is cfg.blank_id
        params = {k: jnp.asarray(v)
                  for k, v in np.load(path / "params.npz").items()}

        from ..dsp import asr_frontend as fe

        class _GigaamEngine(EngineProtocol):
            name = model_id

            def transcribe_batch(self, chunks, language="ru"):
                # GigaAM trains on the torchaudio MelSpectrogram recipe
                # (same frontend as the ONNX-bundle path)
                feats = fe.gigaam_log_mel(
                    jnp.asarray(np.atleast_2d(chunks)), cfg.n_mels
                ).swapaxes(1, 2)
                logits = pk.ctc_logits(params, cfg, feats)
                seqs = pk.ctc_greedy(np.asarray(logits), cfg.blank_id)
                return ["".join(labels[i] for i in s if i < len(labels)).strip()
                        for s in seqs]

        return _GigaamEngine()
    if info.engine_type == "sensevoice":
        import json

        import jax.numpy as jnp

        from ..models import sensevoice as sv
        from ..models.spm import SentencePieceVocab
        from ..dsp.fbank import fbank

        if not (path / "params.npz").exists():
            # the catalog bundle is the FunASR ONNX export (transcribe-rs
            # SenseVoiceModel, managers/transcription.rs:153-156): CTC (blank
            # id 0, FunASR convention) over the executor
            from .onnx_engines import OnnxCtcEngine

            return OnnxCtcEngine(path, model_id, blank_id=0, mesh=mesh)
        raw = json.loads((path / "config.json").read_text())
        cfg = (sv.CONFIGS[raw["config"]] if "config" in raw
               else sv.SenseVoiceConfig(**{k: v for k, v in raw.items()
                                           if k != "prompt_ids"}))
        prompt_ids = jnp.asarray(raw.get("prompt_ids", [0] * cfg.n_prompt),
                                 jnp.int32)
        params = {k: jnp.asarray(v)
                  for k, v in np.load(path / "params.npz").items()}
        vocab = SentencePieceVocab.load(path / "tokenizer.model")

        class _SenseVoiceEngine(EngineProtocol):
            name = model_id

            def transcribe_batch(self, chunks, language="en"):
                feats = fbank(jnp.asarray(np.atleast_2d(chunks)), cfg.feat_dim)
                logits = sv.ctc_logits(params, cfg, feats, prompt_ids)
                return [vocab.decode(s) for s in sv.ctc_greedy(logits, cfg)]

        return _SenseVoiceEngine()
    if info.engine_type == "cohere":
        # transcribe-rs's CohereModel is an external ONNX crate
        # (managers/transcription.rs:161-164); the bundle's architecture is
        # pinned at load time from its file inventory and runs through the
        # executor (encoder+decoder -> AR greedy; single graph -> CTC)
        from .onnx_engines import engine_from_onnx_dir

        return engine_from_onnx_dir(model_id, path, mesh=mesh)
    raise ValueError(f"unknown engine type '{info.engine_type}'")


# ---------------------------------------------------------------------------
# Manager
# ---------------------------------------------------------------------------

@dataclass
class TranscriptionState:
    status: str
    progress: float = 0.0
    eta_seconds: Optional[int] = None
    phase: Optional[str] = None


class TranscriptionManager:
    """Loaded engine + per-recording state/cancel registry."""

    def __init__(self, model_manager: ModelManager, bus: EventBus = BUS,
                 engine_loader: Callable = None, mesh=None):
        self.model_manager = model_manager
        self.bus = bus
        self.mesh = mesh  # Mesh | None | the lazy "auto" sentinel
        self._engine: Optional[EngineProtocol] = None
        self._current_model_id: Optional[str] = None
        self._states: Dict[str, TranscriptionState] = {}
        self._cancel: Dict[str, threading.Event] = {}
        self._lock = threading.Lock()
        self._loader = engine_loader or (
            lambda mid, mm: load_engine(mid, mm, mesh=self.mesh))

    # -- model ------------------------------------------------------------------
    def get_current_model(self) -> Optional[str]:
        return self._current_model_id

    def load_model(self, model_id: str) -> None:
        if self._current_model_id == model_id and self._engine is not None:
            return
        self._engine = self._loader(model_id, self.model_manager)
        self._current_model_id = model_id

    @property
    def engine(self) -> Optional[EngineProtocol]:
        return self._engine

    # -- state ------------------------------------------------------------------
    def set_state(self, recording_path: str, state: TranscriptionState) -> None:
        with self._lock:
            self._states[recording_path] = state

    def get_state(self, recording_path: str) -> Optional[TranscriptionState]:
        with self._lock:
            return self._states.get(recording_path)

    def get_all_states(self) -> Dict[str, dict]:
        with self._lock:
            return {k: asdict(v) for k, v in self._states.items()}

    def create_cancel_flag(self, recording_path: str) -> threading.Event:
        ev = threading.Event()
        with self._lock:
            self._cancel[recording_path] = ev
        return ev

    def cancel(self, recording_path: str) -> bool:
        with self._lock:
            ev = self._cancel.get(recording_path)
        if ev is not None:
            ev.set()
            return True
        return False

    def remove_cancel_flag(self, recording_path: str) -> None:
        with self._lock:
            self._cancel.pop(recording_path, None)


# ---------------------------------------------------------------------------
# The pipeline
# ---------------------------------------------------------------------------

def run_transcription(
    recording_path: str,
    tm: TranscriptionManager,
    model_id: str,
    language: str = "en",
    diarization: Optional[dict] = None,
    batch_chunks: int = 8,
) -> Optional[str]:
    """Blocking transcription of one recording. Returns the final text
    (None on cancel); raises on errors. Emits the reference's event stream."""
    bus = tm.bus
    cancel = tm.create_cancel_flag(recording_path)

    def set_phase(phase: str):
        tm.set_state(recording_path, TranscriptionState("transcribing", prog[0], None, phase))
        bus.emit("transcription-phase", {"recording_path": recording_path, "phase": phase})

    prog = [0.0]
    try:
        tm.set_state(recording_path, TranscriptionState("started", 0.0, None, "preparing-audio"))
        bus.emit("transcription-status",
                 {"recording_path": recording_path, "status": "started", "error": None})
        set_phase("preparing-audio")

        audio, sr = wavio.read_wav_mono(recording_path)  # channel 0
        if audio.size == 0:
            save_transcription_result(recording_path, "")
            save_transcription_metadata(recording_path, model_id)
            _finish(tm, bus, recording_path, "completed")
            return ""
        total_seconds = audio.size / sr

        set_phase("loading-model")
        tm.load_model(model_id)

        if sr != TARGET_SAMPLE_RATE:
            from ..dsp.resample import resample_poly

            # 16-bit sources ship to the device as int16 PCM (exact — the
            # decoded floats sit on the int16 grid): halves the upload,
            # which dominates long-file resampling through the tunnel.
            # device_out keeps the 16 kHz result ON the device: the chunk
            # batches feed straight back into device compute, so fetching
            # and re-uploading the whole recording (~2x the audio bytes)
            # is pure waste (docs/PERF.md itemization: that round trip was
            # the single largest cost of the file pipeline here).
            fmt = wavio.read_format(recording_path)
            wire = "i16" if fmt is not None and fmt.bits_per_sample == 16 else "f32"
            audio = resample_poly(audio, sr, TARGET_SAMPLE_RATE, wire=wire,
                                  device_out=True)
        total_out = int(audio.size)

        # 30 s chunks, final partial chunk zero-padded (tail flush,
        # commands/transcription.rs:347-400). Device audio chunks on
        # device; host audio stays host (engines accept either).
        n_chunks = max(1, -(-total_out // CHUNK_SAMPLES))
        if _is_device_array(audio):
            import jax.numpy as jnp

            chunks = jnp.pad(
                audio, (0, n_chunks * CHUNK_SAMPLES - total_out)
            ).reshape(n_chunks, CHUNK_SAMPLES)
        else:
            chunks = np.zeros((n_chunks, CHUNK_SAMPLES), np.float32)
            flat = audio[: n_chunks * CHUNK_SAMPLES]
            chunks.reshape(-1)[: flat.size] = flat

        set_phase("transcribing")
        # Chunk-level checkpoint/resume: a cancelled or crashed job restarts
        # from its last completed batch, not from zero (the reference
        # restarts from zero — SURVEY §5 flags this as the natural TPU-build
        # improvement over commands/transcription.rs).
        parts: List[Tuple[float, float, str]] = []
        resume_chunk = 0
        ckpt = _load_progress(recording_path)
        if (ckpt and ckpt.get("model_id") == model_id
                and ckpt.get("language") == language
                and ckpt.get("n_chunks") == n_chunks
                and bool(ckpt.get("diarization")) == bool(
                    diarization and diarization.get("enabled"))):
            parts = [(float(s), float(e), t) for s, e, t in ckpt.get("parts", [])]
            resume_chunk = min(int(ckpt.get("done_chunks", 0)), n_chunks)
        start_t = time.monotonic()
        done_samples = 0
        # Batch schedule: the engine's preferred large bucket while more
        # than `batch_chunks` chunks remain (whisper: B=16 amortizes the
        # sequential decode scan — see EngineProtocol.decode_batch_bucket),
        # the `batch_chunks` bucket for the tail, exact shape for short
        # files. At most two compiled batch shapes per engine.
        big = max(getattr(tm.engine, "decode_batch_bucket", 0) or 0,
                  batch_chunks)
        b0 = resume_chunk
        while b0 < n_chunks:
            if cancel.is_set():
                _finish(tm, bus, recording_path, "cancelled")
                return None
            from ..utils.tracing import stage as _stage

            rem = n_chunks - b0
            if n_chunks <= batch_chunks:
                bsz = rem  # short file: one exact-shape batch
            elif rem > batch_chunks:
                bsz = big
            else:
                bsz = batch_chunks
            batch = chunks[b0: b0 + bsz]
            n_live = batch.shape[0]
            if n_live < bsz:
                # Pad the tail batch to the bucket shape: a smaller B would
                # trigger a fresh multi-second XLA compile for one batch.
                if _is_device_array(batch):
                    import jax.numpy as jnp

                    batch = jnp.pad(
                        batch, ((0, bsz - n_live), (0, 0)))
                else:
                    batch = np.concatenate(
                        [batch, np.zeros((bsz - n_live, CHUNK_SAMPLES),
                                         np.float32)])
            if diarization and diarization.get("enabled"):
                # timestamped segments for speaker alignment (:272-280),
                # decoded for the whole batch in one compiled call
                offsets = [(b0 + j) * TRANSCRIBE_CHUNK_SECONDS
                           for j in range(batch.shape[0])]
                with _stage("transcribe-batch-timestamps", tm.bus,
                            {"chunks": n_live}):
                    seg_lists = tm.engine.transcribe_batch_with_timestamps(
                        batch, offsets, language=language)
                for segs in seg_lists[:n_live]:
                    for s, e, text in segs:
                        if text.strip():
                            parts.append((s, min(e, total_seconds), text))
                texts = [""] * n_live
            else:
                with _stage("transcribe-batch", tm.bus,
                            {"chunks": n_live}):
                    texts = tm.engine.transcribe_batch(batch, language=language)[:n_live]
                for j, text in enumerate(texts):
                    cs = (b0 + j) * TRANSCRIBE_CHUNK_SECONDS
                    if text.strip():
                        parts.append((cs, min(cs + TRANSCRIBE_CHUNK_SECONDS, total_seconds), text))
            done_chunks = b0 + len(texts)
            _save_progress(recording_path, {
                "model_id": model_id, "language": language,
                "n_chunks": n_chunks, "done_chunks": done_chunks,
                "diarization": bool(diarization and diarization.get("enabled")),
                "parts": [[s, e, t] for s, e, t in parts],
            })
            done_samples = min(done_chunks * CHUNK_SAMPLES, total_out)
            progress = min(1.0, done_samples / max(total_out, 1))
            done_sec = done_samples / TARGET_SAMPLE_RATE
            # ETA from the rate realized THIS session (:287-299); resumed
            # chunks took no wall time here.
            sess_sec = done_sec - resume_chunk * TRANSCRIBE_CHUNK_SECONDS
            eta = None
            if sess_sec > 0.5:
                rate = (time.monotonic() - start_t) / sess_sec
                eta = int(round(max(total_seconds - done_sec, 0.0) * rate))
            prog[0] = progress
            tm.set_state(recording_path,
                         TranscriptionState("transcribing", progress, eta, "transcribing"))
            bus.emit("transcription-progress",
                     {"recording_path": recording_path, "progress": progress,
                      "eta_seconds": eta})
            b0 += n_live

        text = " ".join(t for _, _, t in parts).strip()

        if diarization and diarization.get("enabled"):
            set_phase("diarizing")
            try:
                from . import diarization as dz

                text = dz.run_diarization(
                    np.asarray(audio, np.float32), TARGET_SAMPLE_RATE, parts,
                    model_manager=tm.model_manager,
                    max_speakers=int(diarization.get("max_speakers", 4)),
                    merge_gap=float(diarization.get("merge_gap", 1.0)),
                    bus=bus,
                    mesh=resolve_mesh(tm.mesh),
                )
            except Exception as dz_err:
                # diarization failure falls back to the plain transcript
                # (commands/transcription.rs:456-465 — which logs the error;
                # here it is surfaced as an event, never swallowed silently)
                bus.emit("diarization-fallback",
                         {"recording_path": recording_path, "net": "pipeline",
                          "error": str(dz_err)})

        save_transcription_result(recording_path, text)
        save_transcription_metadata(recording_path, model_id)
        clear_transcription_progress(recording_path)  # checkpoint consumed
        _finish(tm, bus, recording_path, "completed")
        return text
    except Exception as e:
        tm.set_state(recording_path, TranscriptionState("error", prog[0]))
        bus.emit("transcription-status",
                 {"recording_path": recording_path, "status": "error", "error": str(e)})
        raise
    finally:
        tm.remove_cancel_flag(recording_path)


def _finish(tm, bus, recording_path, status):
    tm.set_state(recording_path, TranscriptionState(status, 1.0 if status == "completed" else 0.0))
    bus.emit("transcription-status",
             {"recording_path": recording_path, "status": status, "error": None})


def start_transcription(recording_path: str, tm: TranscriptionManager, model_id: str,
                        **kwargs) -> threading.Thread:
    """Spawn the worker thread (commands/transcription.rs:32-96)."""
    t = threading.Thread(
        target=lambda: _guarded(run_transcription, recording_path, tm, model_id, **kwargs),
        daemon=True,
    )
    t.start()
    return t


def _guarded(fn, *a, **kw):
    try:
        fn(*a, **kw)
    except Exception:
        pass  # state/events already record the error
