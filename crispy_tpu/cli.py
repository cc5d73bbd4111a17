"""crispy — command-line surface for the TPU-native audio framework.

Mirrors the reference app's capabilities as subcommands (the reference is a
desktop app; on a TPU host the CLI is the user surface):

  crispy denoise IN.wav OUT.wav [--ns-model rnnoise]   noise suppression
  crispy resample IN.wav OUT.wav --rate 16000          rate conversion
  crispy transcribe IN.wav [--model ID]                speech-to-text
  crispy models [list|download|delete] ...             model management
  crispy recordings [list|rename|delete] ...           recordings CRUD
  crispy convert IN.mp4 [OUT.wav]                      ffmpeg conversion
  crispy bench                                         denoise throughput
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path


def _cmd_denoise(args) -> int:
    from .engine.denoiser import denoise_file
    from .dsp.rnnoise.weights import RNNoiseModel, builtin_model

    model = None
    if args.weights:
        model = RNNoiseModel.load(args.weights)
    if args.ns_model != "rnnoise":
        # Legacy models are trivial on files: dummy = copy, noisy = +LCG noise.
        import numpy as np

        from .engine.denoiser import _Lcg
        from .io import wav as wavio

        audio, sr = wavio.read_wav(args.input)
        if args.ns_model == "noisy":
            rng = _Lcg()
            noise = np.array([rng.next_noise() for _ in range(audio.shape[0])], np.float32)
            audio = audio + noise[:, None] * 0.05
        wavio.write_wav(args.output, audio, sr)
        print(json.dumps({"output": str(args.output), "ns_model": args.ns_model}))
        return 0
    t0 = time.time()
    info = denoise_file(args.input, args.output, model=model)
    dt = time.time() - t0
    audio_s = info["samples"] / info["sample_rate"]
    print(json.dumps({
        "output": str(args.output), "ns_model": "rnnoise", **info,
        "seconds_audio": round(audio_s, 3), "seconds_wall": round(dt, 3),
        "realtime_factor": round(audio_s * info["channels"] / max(dt, 1e-9), 1),
    }))
    return 0


def _cmd_resample(args) -> int:
    import numpy as np

    from .dsp.resample import resample_poly
    from .io import wav as wavio

    audio, sr = wavio.read_wav(args.input)
    out = np.stack(
        [resample_poly(audio[:, c], sr, args.rate) for c in range(audio.shape[1])],
        axis=1,
    )
    wavio.write_wav(args.output, out, args.rate)
    print(json.dumps({"output": str(args.output), "from_rate": sr, "to_rate": args.rate}))
    return 0


def _cmd_bench(args) -> int:
    import bench_impl  # pragma: no cover

    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="crispy", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("denoise", help="RNNoise noise suppression on a WAV file")
    d.add_argument("input", type=Path)
    d.add_argument("output", type=Path)
    d.add_argument("--ns-model", default="rnnoise", choices=["dummy", "noisy", "rnnoise"])
    d.add_argument("--weights", type=Path, default=None, help="rnnoise .npz weights")
    d.set_defaults(fn=_cmd_denoise)

    r = sub.add_parser("resample", help="high-quality sample rate conversion")
    r.add_argument("input", type=Path)
    r.add_argument("output", type=Path)
    r.add_argument("--rate", type=int, required=True)
    r.set_defaults(fn=_cmd_resample)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
