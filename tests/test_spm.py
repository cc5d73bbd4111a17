"""SentencePiece .model parser + the prepared-bundle Canary engine."""

import json

import numpy as np
import pytest

from crispy_tpu.models.spm import (
    BYTE, CONTROL, NORMAL, UNKNOWN, SentencePieceVocab, build_model_bytes,
)


def _vocab():
    pieces = ["<unk>", "<s>", "</s>", "▁hello", "▁wor", "ld", "▁", "a", "b"]
    types = [UNKNOWN, CONTROL, CONTROL, NORMAL, NORMAL, NORMAL, NORMAL,
             NORMAL, NORMAL]
    for i in range(256):
        pieces.append(f"<0x{i:02X}>")
        types.append(BYTE)
    return pieces, types


def test_round_trip_through_wire_format():
    pieces, types = _vocab()
    v = SentencePieceVocab.from_bytes(build_model_bytes(pieces, types))
    assert len(v) == len(pieces)
    assert v.pieces[3] == "▁hello"
    assert v.is_control(1) and v.is_control(2) and v.is_control(0)
    assert not v.is_control(3)


def test_decode_metaspace_and_controls():
    pieces, types = _vocab()
    v = SentencePieceVocab(pieces, types)
    ids = [1, 3, 4, 5, 2]  # <s> ▁hello ▁wor ld </s>
    assert v.decode(ids) == "hello world"


def test_decode_byte_pieces_utf8():
    pieces, types = _vocab()
    v = SentencePieceVocab(pieces, types)
    base = 9  # first byte piece id
    euro = [base + b for b in "€".encode("utf-8")]
    assert v.decode([3] + euro) == "hello€"


def test_encode_greedy_longest_match():
    pieces, types = _vocab()
    v = SentencePieceVocab(pieces, types)
    ids = v.encode("hello world")
    assert ids == [3, 4, 5]
    assert v.decode(ids) == "hello world"


def test_encode_unknown_char_byte_fallback():
    pieces, types = _vocab()
    v = SentencePieceVocab(pieces, types)
    ids = v.encode("hello é")
    assert v.decode(ids) == "hello é"


def test_load_from_file(tmp_path):
    pieces, types = _vocab()
    p = tmp_path / "tokenizer.model"
    p.write_bytes(build_model_bytes(pieces, types))
    v = SentencePieceVocab.load(p)
    assert v.decode([3, 4, 5]) == "hello world"
    assert v.id("▁hello") == 3


def test_rejects_non_spm():
    with pytest.raises(ValueError, match="no sentencepiece"):
        SentencePieceVocab.from_bytes(b"")


def test_canary_engine_from_prepared_bundle(tmp_path):
    """load_engine boots a Canary bundle (params.npz + config + spm) and
    produces decoded text end-to-end (random weights, structural check)."""
    from crispy_tpu.engine.transcription import load_engine
    from crispy_tpu.models import canary as cn
    from crispy_tpu.models.registry import ModelManager

    cfg = cn.CONFIGS["test-random"]
    mm = ModelManager(models_dir=tmp_path / "Models")
    bundle = mm.model_path("canary-180m-flash")
    bundle.mkdir(parents=True)
    np.savez(bundle / "params.npz", **cn.init_random(cfg, seed=0))
    (bundle / "config.json").write_text(json.dumps({"config": "test-random"}))
    pieces = ["<unk>"] + [f"▁w{i}" for i in range(cfg.vocab_size - 3)] + ["<s>", "</s>"]
    types = [UNKNOWN] + [NORMAL] * (cfg.vocab_size - 3) + [CONTROL, CONTROL]
    (bundle / "tokenizer.model").write_bytes(build_model_bytes(pieces, types))

    eng = load_engine("canary-180m-flash", mm)
    sr = 16000
    t = np.arange(sr) / sr
    audio = (0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    out = eng.transcribe_batch([audio, audio * 0.5])
    assert len(out) == 2 and all(isinstance(s, str) for s in out)


def test_canary_engine_requires_prepared_bundle(tmp_path):
    from crispy_tpu.engine.transcription import load_engine
    from crispy_tpu.models.registry import ModelManager

    mm = ModelManager(models_dir=tmp_path / "Models")
    mm.model_path("canary-180m-flash").mkdir(parents=True)  # NeMo-style: empty
    # an empty bundle (no params.npz AND no .onnx) now fails as "missing
    # files", not NotImplementedError — the ONNX executor path handles the
    # catalog's real artifacts
    with pytest.raises(FileNotFoundError):
        load_engine("canary-180m-flash", mm)


def test_gigaam_engine_from_prepared_bundle(tmp_path):
    """GigaAM conformer-CTC boots from a prepared bundle with 4x subsampling
    and a char label map (Russian CTC vocab)."""
    from crispy_tpu.engine.transcription import load_engine
    from crispy_tpu.models import parakeet as pk
    from crispy_tpu.models.registry import ModelManager

    enc = dict(n_mels=64, hidden_size=64, layers=2, heads=2, kv_heads=2,
               intermediate_size=128, sub_channels=32, sub_factor=4,
               vocab_size=34)
    cfg = pk.ParakeetConfig(**enc)
    labels = [" "] + [chr(0x430 + i) for i in range(32)] + ["ё"]
    mm = ModelManager(models_dir=tmp_path / "Models")
    bundle = mm.model_path("gigaam-v3-e2e-ctc")
    bundle.mkdir(parents=True)
    np.savez(bundle / "params.npz", **pk.init_random(cfg, seed=0))
    (bundle / "config.json").write_text(
        json.dumps({"encoder": enc, "labels": labels}))

    eng = load_engine("gigaam-v3-e2e-ctc", mm)
    sr = 16000
    t = np.arange(sr) / sr
    audio = (0.2 * np.sin(2 * np.pi * 250 * t)).astype(np.float32)
    out = eng.transcribe_batch([audio])
    assert len(out) == 1 and isinstance(out[0], str)


def test_gigaam_engine_requires_prepared_bundle(tmp_path):
    from crispy_tpu.engine.transcription import load_engine
    from crispy_tpu.models.registry import ModelManager

    mm = ModelManager(models_dir=tmp_path / "Models")
    mm.model_path("gigaam-v3-e2e-ctc").mkdir(parents=True)
    # an empty bundle (no params.npz AND no .onnx) now fails as "missing
    # files", not NotImplementedError — the ONNX executor path handles the
    # catalog's real artifacts
    with pytest.raises(FileNotFoundError):
        load_engine("gigaam-v3-e2e-ctc", mm)


def test_parakeet_tdt_engine_from_prepared_bundle(tmp_path):
    """The recommended catalog model (parakeet-tdt) boots from a prepared
    bundle and decodes through the TDT while_loop + SentencePiece."""
    from crispy_tpu.engine.transcription import load_engine
    from crispy_tpu.models import parakeet as pk
    from crispy_tpu.models.registry import ModelManager

    enc = dict(n_mels=32, hidden_size=64, layers=2, heads=2, kv_heads=2,
               intermediate_size=128, sub_channels=32, vocab_size=32,
               pred_hidden=32, joint_hidden=32)
    cfg = pk.ParakeetConfig(**enc)
    mm = ModelManager(models_dir=tmp_path / "Models")
    bundle = mm.model_path("parakeet-tdt-0.6b-v3")
    bundle.mkdir(parents=True)
    np.savez(bundle / "params.npz", **pk.init_random(cfg, seed=0))
    (bundle / "config.json").write_text(json.dumps({"encoder": enc}))
    pieces = ["<unk>"] + [f"▁p{i}" for i in range(cfg.vocab_size - 1)]
    types = [UNKNOWN] + [NORMAL] * (cfg.vocab_size - 1)
    (bundle / "tokenizer.model").write_bytes(build_model_bytes(pieces, types))

    eng = load_engine("parakeet-tdt-0.6b-v3", mm)
    sr = 16000
    t = np.arange(sr) / sr
    out = eng.transcribe_batch([(0.2 * np.sin(2 * np.pi * 350 * t)).astype(np.float32)])
    assert len(out) == 1 and isinstance(out[0], str)


def test_moonshine_engine_from_prepared_bundle(tmp_path):
    from crispy_tpu.engine.transcription import load_engine
    from crispy_tpu.models.moonshine import CONFIGS as MS_CONFIGS
    from crispy_tpu.models.moonshine import init_random as ms_init
    from crispy_tpu.models.registry import ModelManager

    cfg = MS_CONFIGS["test-random"]
    mm = ModelManager(models_dir=tmp_path / "Models")
    bundle = mm.model_path("moonshine-base")
    bundle.mkdir(parents=True)
    np.savez(bundle / "params.npz", **ms_init(cfg, seed=0))
    (bundle / "config.json").write_text(json.dumps({"config": "test-random"}))

    eng = load_engine("moonshine-base", mm)
    sr = 16000
    t = np.arange(sr) / sr
    out = eng.transcribe_batch([(0.2 * np.sin(2 * np.pi * 260 * t)).astype(np.float32)])
    assert len(out) == 1 and isinstance(out[0], str)


def test_canary_prepared_language_prompt_substitution(tmp_path):
    """Per-call language swaps the <|lang|> prompt slots on the NATIVE
    canary engine (same contract as the ONNX enc-dec path)."""
    from crispy_tpu.engine.transcription import load_engine
    from crispy_tpu.models import canary as cn
    from crispy_tpu.models.registry import ModelManager

    cfg = cn.CONFIGS["test-random"]
    mm = ModelManager(models_dir=tmp_path / "Models")
    bundle = mm.model_path("canary-180m-flash")
    bundle.mkdir(parents=True)
    np.savez(bundle / "params.npz", **cn.init_random(cfg, seed=0))
    n = cfg.vocab_size
    pieces = (["<unk>", "<|en|>", "<|de|>", "<|transcribe|>"]
              + [f"▁w{i}" for i in range(n - 6)] + ["<s>", "</s>"])
    types = [UNKNOWN, CONTROL, CONTROL, CONTROL] + [NORMAL] * (n - 6) \
        + [CONTROL, CONTROL]
    (bundle / "tokenizer.model").write_bytes(build_model_bytes(pieces, types))
    en_id, de_id, task_id = 1, 2, 3
    (bundle / "config.json").write_text(json.dumps(
        {"config": "test-random", "prompt_ids": [n - 2, en_id, task_id, en_id]}))

    eng = load_engine("canary-180m-flash", mm)
    assert eng.prompt_for_language("en") == [n - 2, en_id, task_id, en_id]
    assert eng.prompt_for_language("de") == [n - 2, de_id, task_id, de_id]
    assert eng.prompt_for_language("xx") == [n - 2, en_id, task_id, en_id]
    # and the engine decodes with the substituted prompt
    sr = 16000
    audio = (0.2 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    out = eng.transcribe_batch([audio], language="de")
    assert len(out) == 1 and isinstance(out[0], str)
