"""crispy-tpu: a TPU-native audio framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of sleep3r/crispy
(reference: a Rust/Tauri desktop app): real-time RNNoise denoising, sample-rate
conversion and dual-source mixing, offline speech-to-text, speaker diarization,
model management, and an LLM chat surface — redesigned as batched, sharded TPU
pipelines rather than per-sample callback code.

Layers (see SURVEY.md §7):
  dsp/       pure-JAX + Pallas DSP kernels (RNNoise, resampling, mel, mixing)
  models/    JAX ASR / diarization model families + registry/downloader
  engine/    streaming orchestration (monitoring, recording, transcription)
  parallel/  mesh + sharding helpers (pjit/shard_map over ICI)
  api/       reference-compatible command surface + event bus
  io/, utils/ host-side substrate (WAV, paths, settings)
"""

__version__ = "0.1.0"
