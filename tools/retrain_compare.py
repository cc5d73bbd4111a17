#!/usr/bin/env python
"""Retrain the builtin denoiser on the six-family synthetic mixtures and
ship it ONLY if it beats the current builtin on the same held-out
distribution (honest upgrade gate — the shipped weights predate the
richer noise families).

    python tools/retrain_compare.py --steps 4000
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
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch-streams", type=int, default=32)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seeds", type=int, nargs="+", default=[123, 456, 789])
    ap.add_argument("--out", type=Path,
                    default=Path("crispy_tpu/dsp/rnnoise/builtin_weights.npz"))
    ap.add_argument("--force", action="store_true",
                    help="save even if the new model does not win")
    ap.add_argument("--corpus-streams", type=int, default=None,
                    help="device-resident training from a fixed int16 pool "
                    "of this many streams (the long-retrain path; see "
                    "training.build_corpus)")
    ap.add_argument("--steps-per-call", type=int, default=25,
                    help="optimizer steps fused per device dispatch "
                    "(corpus mode only)")
    args = ap.parse_args()

    from crispy_tpu.dsp.rnnoise import training
    from crispy_tpu.dsp.rnnoise.weights import builtin_model

    old = builtin_model()
    old_gains = [training.snr_improvement(old, seed=s) for s in args.seeds]
    print(f"builtin on held-out mixtures: "
          f"{[f'{g:+.2f}' for g in old_gains]} dB "
          f"(mean {sum(old_gains)/len(old_gains):+.2f})", flush=True)

    t0 = time.time()
    model, losses = training.train_model(
        steps=args.steps, batch_streams=args.batch_streams,
        frames=args.frames, learning_rate=args.lr,
        log_every=max(args.steps // 20, 1),
        corpus_streams=args.corpus_streams,
        steps_per_call=args.steps_per_call)
    print(f"trained in {time.time()-t0:.0f}s; final losses "
          f"{[round(l, 4) for l in losses[-5:]]}", flush=True)

    new_gains = [training.snr_improvement(model, seed=s) for s in args.seeds]
    print(f"retrained on held-out mixtures: "
          f"{[f'{g:+.2f}' for g in new_gains]} dB "
          f"(mean {sum(new_gains)/len(new_gains):+.2f})", flush=True)

    old_mean = sum(old_gains) / len(old_gains)
    new_mean = sum(new_gains) / len(new_gains)
    if new_mean >= old_mean or args.force:
        model.save(args.out)
        print(f"saved {args.out} ({new_mean:+.2f} vs builtin {old_mean:+.2f} dB)")
    else:
        print(f"NOT saved: retrained {new_mean:+.2f} dB < builtin "
              f"{old_mean:+.2f} dB on the held-out mixtures")


if __name__ == "__main__":
    main()
