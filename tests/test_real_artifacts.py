"""Turnkey real-artifact validation (VERDICT r2 #1a).

`crispy models validate <id>` loads a model's real downloaded bundle
through the normal engine path, decodes the committed 10 s utterance,
and pins golden tokens. This file (a) proves the whole flow works
offline against a synthetic bundle placed in the catalog's model dir —
so a real bundle needs ZERO code changes — and (b) replays every pinned
golden in tests/goldens/real_artifacts/ against models that are actually
downloaded (skipped otherwise; this environment has no egress).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from crispy_tpu.models import validate as val
from crispy_tpu.models.registry import ModelManager

GOLDEN_DIR = Path(__file__).resolve().parent / "goldens" / "real_artifacts"


def test_validation_utterance_committed():
    audio = val.validation_utterance()
    assert audio.shape == (160000,) and audio.dtype == np.float32
    assert 0.01 < float(np.abs(audio).mean()) < 0.5


def test_validate_model_turnkey_offline(data_root):
    """End-to-end: bundle in the catalog dir → validate_model → golden →
    replay comparison. The same call path a real download will take."""
    from test_onnx_engines import make_canary_bundle

    mm = ModelManager()
    bundle_dir = mm.model_path("canary-180m-flash")
    bundle_dir.mkdir(parents=True)
    make_canary_bundle(bundle_dir)

    result = val.validate_model("canary-180m-flash", mm)
    assert result["model_id"] == "canary-180m-flash"
    assert isinstance(result["text"], str)
    assert isinstance(result["words"], list)
    assert result["bundle_inventory"]  # files recorded with sizes

    golden = val.pin_golden(result, data_root / "golden.json")
    replay = val.validate_model("canary-180m-flash", mm)
    pinned = json.loads(golden.read_text(encoding="utf-8"))
    assert replay["text"] == pinned["text"]
    assert replay["words"] == pinned["words"]
    assert replay["bundle_inventory"] == pinned["bundle_inventory"]


def test_validate_model_every_family(data_root):
    """validate_model is turnkey for EVERY catalog engine family — the
    moment any real bundle lands, `crispy models validate <id>` runs with
    zero code changes (whisper ggml included, via the container writer)."""
    from test_catalog_engines import BUNDLE_MAKERS

    mm = ModelManager()
    for model_id, maker in sorted(BUNDLE_MAKERS.items()):
        bundle_dir = mm.model_path(model_id)
        bundle_dir.mkdir(parents=True)
        maker(bundle_dir)
        result = val.validate_model(model_id, mm)
        assert isinstance(result["text"], str), model_id
        assert result["bundle_inventory"], model_id

    # whisper: a synthetic f16 ggml container through the same flow
    from crispy_tpu.models.whisper import CONFIGS
    from crispy_tpu.models.whisper.ggml_io import write_ggml
    from crispy_tpu.models.whisper.weights import init_random

    wid = "small"  # ggml-small.bin in the catalog (managers/model.rs:74-99)
    info = mm.find(wid)
    assert info is not None and not info.is_archive
    path = mm.model_path(wid)
    path.parent.mkdir(parents=True, exist_ok=True)
    cfg = CONFIGS["test-random"]
    write_ggml(path, init_random(cfg, seed=0), cfg, ttype=1)
    result = val.validate_model(wid, mm)
    assert isinstance(result["text"], str)
    assert result["engine"] == "_WhisperEngine"


def _pinned_ids():
    if not GOLDEN_DIR.exists():
        return []
    return sorted(p.stem for p in GOLDEN_DIR.glob("*.json"))


@pytest.mark.parametrize("model_id", _pinned_ids() or ["__none_pinned__"])
def test_pinned_golden_replays(model_id):
    """For every pinned real-artifact golden: if the model is downloaded,
    the decode must still match. Runs automatically the moment real
    bundles become reachable."""
    if model_id == "__none_pinned__":
        pytest.skip("no real-artifact goldens pinned yet (no egress)")
    mm = ModelManager()
    if not mm.is_downloaded(model_id):
        pytest.skip(f"{model_id} not downloaded")
    pinned = json.loads((GOLDEN_DIR / f"{model_id}.json").read_text("utf-8"))
    result = val.validate_model(model_id, mm,
                                language=pinned.get("language", "en"))
    assert result["bundle_inventory"] == pinned["bundle_inventory"], \
        "bundle changed since the golden was pinned — re-pin with " \
        f"`crispy models validate {model_id} --pin`"
    assert result["text"] == pinned["text"]
    assert result["words"] == pinned["words"]
