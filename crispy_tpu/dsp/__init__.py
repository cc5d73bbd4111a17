"""DSP layer: pure-JAX + Pallas kernels for the hot audio ops.

Subpackages
  rnnoise/   the RNNoise noise-suppression chain (reference: nnnoiseless 0.5.2
             via src-tauri/src/audio.rs:202-315) as a batched TPU pipeline
  resample   streaming linear + polyphase/FFT resamplers (audio.rs:73-134,
             rubato FftFixedIn at commands/transcription.rs:316)
  mel        Whisper-style 80-bin log-mel STFT frontend
  mix        dual-source mixer (commands/recording.rs:188-291)
"""
