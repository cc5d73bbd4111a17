"""CLI surface: models/recordings/transcribe commands end to end."""

import numpy as np
import pytest

from crispy_tpu.cli import main
from crispy_tpu.io import wav as wavio
from crispy_tpu.utils import paths
from crispy_tpu.utils.tracing import Timings, stage
from crispy_tpu.api.events import EventBus


def test_models_list(capsys, data_root):
    assert main(["models", "list"]) == 0
    out = capsys.readouterr().out
    assert "parakeet-tdt-0.6b-v3" in out and "recommended" in out


def test_recordings_list_and_delete(capsys, data_root):
    d = paths.ensure_dir(paths.recordings_dir())
    p = wavio.write_wav(d / "x.wav", np.zeros((480, 1), np.float32), 48000)
    assert main(["recordings", "list"]) == 0
    assert "x.wav" in capsys.readouterr().out
    assert main(["recordings", "delete", str(p)]) == 0
    assert not p.exists()


def test_transcribe_requires_model(capsys, data_root, tmp_path):
    wav = wavio.write_wav(tmp_path / "r.wav", np.zeros((480, 1), np.float32), 48000)
    assert main(["transcribe", str(wav)]) == 1
    assert "no model selected" in capsys.readouterr().out


def test_stage_timing_events():
    bus = EventBus()
    t = Timings(bus)
    with stage("unit", bus, {"n": 3}):
        pass
    assert t.counts["unit"] == 1 and t.totals["unit"] >= 0
    assert "unit" in t.report()
    t.close()


def test_models_validate_cli(capsys, data_root, tmp_path):
    """`crispy models validate <id> --pin` end to end on a synthetic
    catalog bundle: prints the golden record and writes the pin file."""
    import json

    from test_onnx_engines import make_canary_bundle

    from crispy_tpu.models.registry import ModelManager

    mm = ModelManager()
    bundle_dir = mm.model_path("canary-180m-flash")
    bundle_dir.mkdir(parents=True)
    make_canary_bundle(bundle_dir)

    pin = tmp_path / "golden.json"
    assert main(["models", "validate", "canary-180m-flash",
                 "--pin", str(pin)]) == 0
    out = capsys.readouterr().out
    rec = json.loads(out[out.index("{"): out.rindex("}") + 1])
    assert rec["model_id"] == "canary-180m-flash"
    pinned = json.loads(pin.read_text())
    assert pinned["text"] == rec["text"]

    # not downloaded → error + exit 1
    assert main(["models", "validate", "cohere-int8"]) == 1
