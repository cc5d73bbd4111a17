"""Engine layer: streaming state machines over the TPU DSP kernels.

  denoiser      — NS engine (dummy / noisy / rnnoise) with the reference's
                  push/pull streaming semantics + batched file denoising
  monitoring    — start/stop_monitoring-compatible session management
  recording     — dual-source mixer, WAV writer lifecycle, recordings CRUD
  transcription — chunked file→text pipeline with progress/cancel
"""
