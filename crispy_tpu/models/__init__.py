"""Model families: JAX ASR/diarization models, weight loaders, registry.

  whisper/     encoder-decoder ASR with KV-cached greedy decoding
  registry     the model catalog + download manager (reference: ModelManager,
               src-tauri/src/managers/model.rs)
"""
