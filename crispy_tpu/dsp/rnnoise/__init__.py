"""RNNoise noise suppression for TPU.

  oracle        — sequential NumPy spec (per-frame, matches the public
                  RNNoise algorithm consumed by the reference via nnnoiseless)
  jax_pipeline  — batched frame-parallel JAX/XLA implementation
  pallas_rnn    — fused Pallas TPU kernel for the recurrent network scan
  weights       — model container / importers / builtin test model
"""

from .constants import FRAME_SIZE, NB_BANDS, NB_FEATURES  # noqa: F401
from .oracle import DenoiseState, denoise_stream  # noqa: F401
from .weights import RNNoiseModel, builtin_model, deterministic_test_model  # noqa: F401
