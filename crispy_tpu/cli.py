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
import os
import sys
import time
from pathlib import Path

# Persistent XLA compilation cache: a cold CLI run otherwise pays the full
# remote compile every time (~minutes for the denoise pipeline through a
# tunneled chip; measured 712 s wall for a 4 s denoise without the cache).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/crispy_jax_cache"))


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


def _cmd_transcribe(args) -> int:
    from .api.commands import CrispyApp

    app = CrispyApp()
    if args.model:
        app.set_active_model(args.model)
    if not app.get_current_model():
        print(json.dumps({"error": "no model selected; pass --model or "
                                   "`crispy models set <id>`"}))
        return 1
    if args.diarize:
        app.set_app_setting("diarization_enabled", "true")
    t0 = time.time()
    th = app.start_transcription(str(args.input), language=args.language)
    th.join()
    st = app.get_transcription_state(str(args.input)) or {}
    text = app.get_transcription_result(str(args.input))
    if args.output:
        Path(args.output).write_text(text or "", encoding="utf-8")
    else:
        print(text or "")
    print(json.dumps({"status": st.get("status"), "seconds_wall": round(time.time() - t0, 2)}),
          file=sys.stderr)
    return 0 if st.get("status") == "completed" else 1


def _cmd_models(args) -> int:
    from .api.commands import CrispyApp

    app = CrispyApp()
    if args.action == "list":
        for m in app.get_available_models():
            mark = "*" if m["is_downloaded"] else " "
            print(f"{mark} {m['id']:24s} {m['size_mb']:>6} MB  acc {m['accuracy_score']:.2f} "
                  f"spd {m['speed_score']:.2f}  {m['name']}")
        cur = app.get_current_model()
        print(f"\nactive: {cur or '(none)'}  recommended: {app.get_recommended_first_model()}")
    elif args.action == "download":
        from .api.model_state import ModelStateTracker

        tracker = ModelStateTracker(bus=app.bus)  # F5's state machine + EMA speed
        t = app.download_model(args.model_id)

        def show(_p):
            snap = tracker.snapshot()
            m = snap["models"].get(args.model_id, {})
            pct = m.get("percentage") or 0.0
            print(f"\r[{snap['status']}] {pct:5.1f}%  {snap['total_speed_mbps']:.2f} MB/s",
                  end="", file=sys.stderr)

        app.bus.listen("model-download-progress", show)
        t.join()
        print("", file=sys.stderr)
        tracker.close()
        print(json.dumps(app.get_model_info(args.model_id)))
    elif args.action == "set":
        app.set_active_model(args.model_id)
        print(json.dumps({"active": args.model_id}))
    elif args.action == "delete":
        print(json.dumps({"deleted": app.delete_model(args.model_id)}))
    elif args.action == "validate":
        # turnkey real-artifact validation: load the REAL bundle through
        # the normal engine path, decode the committed 10 s utterance,
        # optionally pin golden tokens (consumed by
        # tests/test_real_artifacts.py, skipped unless downloaded)
        from pathlib import Path as _P

        from .models import validate as val

        if not app.model_manager.is_downloaded(args.model_id):
            print(json.dumps({"error": f"{args.model_id} is not downloaded"}))
            return 1
        result = val.validate_model(args.model_id, app.model_manager,
                                    mesh=app.mesh, language=args.language)
        print(json.dumps(result, indent=2, ensure_ascii=False))
        if args.pin is not None:
            dest = (_P(args.pin) if args.pin
                    else val.golden_path(_P.cwd(), args.model_id))
            val.pin_golden(result, dest)
            print(f"pinned → {dest}", file=sys.stderr)
    elif args.action == "inspect":
        # bundle debugging: file inventory + ONNX graph I/O + op histogram
        from collections import Counter

        from .engine.onnx_engines import find_onnx
        from .models.onnx_exec import load_onnx_graph

        path = app.model_manager.model_path(args.model_id)
        info = {"model_id": args.model_id, "path": str(path),
                "downloaded": app.model_manager.is_downloaded(args.model_id),
                "files": [], "graphs": {}}
        if path and path.is_dir():
            info["files"] = sorted(str(f.relative_to(path))
                                   for f in path.rglob("*") if f.is_file())
            for onnx in sorted(path.rglob("*.onnx")):
                g = load_onnx_graph(onnx)
                ops = Counter(n.op_type for n in g.nodes)
                info["graphs"][onnx.name] = {
                    "inputs": [{"name": n, "elem_type": t, "shape": sh}
                               for n, t, sh in g.inputs if n not in g.initializers],
                    "outputs": g.outputs,
                    "initializers": len(g.initializers),
                    "ops": dict(ops.most_common()),
                }
        elif path and path.is_file():
            info["files"] = [path.name]
        print(json.dumps(info, indent=2))
    return 0


def _cmd_recordings(args) -> int:
    from .api.commands import CrispyApp

    app = CrispyApp()
    if args.action == "list":
        for r in app.get_recordings():
            dur = f"{r['duration_seconds']:.1f}s" if r["duration_seconds"] else "?"
            print(f"{r['name']:40s} {dur:>8} {r['size']:>10} B  {r['path']}")
    elif args.action == "rename":
        print(app.rename_recording(args.path, args.new_name))
    elif args.action == "delete":
        app.delete_recording(args.path)
    return 0


def _cmd_convert(args) -> int:
    from .engine.convert import check_ffmpeg, convert_to_wav

    if not check_ffmpeg():
        print(json.dumps({"error": "ffmpeg not found"}))
        return 1
    out = convert_to_wav(args.input)
    print(json.dumps({"output": str(out)}))
    return 0


def _cmd_bench(args) -> int:
    """Denoise throughput on the local accelerator (one JSON line)."""
    import numpy as np

    from .dsp.rnnoise import jax_pipeline as jp
    from .dsp.rnnoise.weights import builtin_model, deterministic_test_model

    try:
        model = builtin_model()
    except Exception:
        model = deterministic_test_model()
    import jax.numpy as jnp

    S, F = args.streams, 100
    params = jp.make_params(model)
    rng = np.random.default_rng(0)
    block = jnp.asarray(rng.standard_normal((S, F * 480), dtype=np.float32) * 0.3)
    state = jp.init_state(S)
    state, out, _ = jp._denoise_block_jit(params, state, block)
    _ = float(out.sum())
    n = 20
    t0 = time.time()
    for _ in range(n):
        state, out, _ = jp._denoise_block_jit(params, state, block)
    _ = float(out.sum())
    dt = (time.time() - t0) / n
    x = S * F * 480 / 48000 / dt
    print(json.dumps({"metric": "rnnoise_denoise_realtime_factor_per_chip",
                      "value": round(x, 1), "unit": "x_realtime_48khz",
                      "streams": S}))
    return 0


def _cmd_serve(args) -> int:
    from .api.commands import CrispyApp
    from .api.web_server import WebServer

    app = CrispyApp()
    srv = WebServer(app, port=args.port).start()
    print(json.dumps({"url": srv.url,
                      "recordings": app.get_recordings_dir_path()}))
    sys.stdout.flush()
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()
    return 0


def _cmd_update(args) -> int:
    """Updater analog (X9): report whether a newer release exists; the
    upgrade itself stays a user action (the printed pip command)."""
    from .utils import updater

    print(json.dumps(updater.check_for_updates()))
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

    t = sub.add_parser("transcribe", help="speech-to-text on a recording")
    t.add_argument("input", type=Path)
    t.add_argument("--model", default=None, help="model id (see `crispy models list`)")
    t.add_argument("--language", default="en", help="spoken language code (e.g. de, ru)")
    t.add_argument("--output", type=Path, default=None)
    t.add_argument("--diarize", action="store_true")
    t.set_defaults(fn=_cmd_transcribe)

    m = sub.add_parser("models", help="model catalog / downloads / selection")
    m.add_argument("action", choices=["list", "download", "set", "delete",
                                      "inspect", "validate"])
    m.add_argument("model_id", nargs="?")
    m.add_argument("--language", default="en")
    m.add_argument("--pin", nargs="?", const="", default=None, metavar="PATH",
                   help="write the golden record (default: "
                        "tests/goldens/real_artifacts/<id>.json under the cwd)")
    m.set_defaults(fn=_cmd_models)

    rec = sub.add_parser("recordings", help="recordings CRUD")
    rec.add_argument("action", choices=["list", "rename", "delete"])
    rec.add_argument("path", nargs="?")
    rec.add_argument("new_name", nargs="?")
    rec.set_defaults(fn=_cmd_recordings)

    c = sub.add_parser("convert", help="any media file → 48 kHz WAV (ffmpeg)")
    c.add_argument("input", type=Path)
    c.set_defaults(fn=_cmd_convert)

    upd = sub.add_parser(
        "update", help="check the package index for a newer crispy-tpu release")
    upd.set_defaults(fn=_cmd_update)

    bch = sub.add_parser("bench", help="denoise throughput on this accelerator")
    bch.add_argument("--streams", type=int, default=128)
    bch.set_defaults(fn=_cmd_bench)

    s = sub.add_parser(
        "serve",
        help="launch the web UI (monitoring, recordings, models, "
             "transcription, diarization, chat) over /api + SSE /events")
    s.add_argument("--port", type=int, default=0)
    s.set_defaults(fn=_cmd_serve)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
