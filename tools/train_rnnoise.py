#!/usr/bin/env python
"""Mint a working RNNoise model on synthetic mixtures (run on the TPU).

    python tools/train_rnnoise.py --steps 2000 --out crispy_tpu/dsp/rnnoise/builtin_weights.npz

The result is int8-quantized into the reference's weight grid and validated
by SNR improvement on held-out mixtures before saving.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch-streams", type=int, default=32)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", type=Path,
                    default=Path("crispy_tpu/dsp/rnnoise/builtin_weights.npz"))
    ap.add_argument("--corpus-streams", type=int, default=None,
                    help="device-resident training from a fixed int16 pool")
    ap.add_argument("--steps-per-call", type=int, default=25)
    args = ap.parse_args()

    from crispy_tpu.dsp.rnnoise import training

    t0 = time.time()
    model, losses = training.train_model(
        steps=args.steps, batch_streams=args.batch_streams,
        frames=args.frames, learning_rate=args.lr, log_every=max(args.steps // 20, 1),
        corpus_streams=args.corpus_streams, steps_per_call=args.steps_per_call,
    )
    print(f"trained in {time.time()-t0:.0f}s; loss curve: "
          f"{[round(l, 4) for l in losses]}")
    gain = training.snr_improvement(model)
    print(f"held-out SNR improvement: {gain:+.2f} dB")
    model.save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
