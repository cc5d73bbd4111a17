"""Headline benchmarks on the real chip. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "extra": {...}}.

Primary metric (north star #1): RNNoise denoise throughput per chip
(target >= 5000x real time @48 kHz, BASELINE.json). The "extra" field
carries the remaining BASELINE configs measured in the same run:
  * whisper_base_rtf / whisper_tiny_rtf — config 4 / north star #2
    (RTF <= 0.05): batched 30 s chunks, greedy decode to the full 224-step
    worst case, base/tiny-shaped weights loaded through the REAL
    from_ggml file path (synthetic f16 container of the true shapes).
  * logmel_x_realtime — config 3: 80-bin log-mel frontend.
  * resample_mix_x_realtime — config 2 host path: 44.1->48 kHz polyphase
    resample + dual-mono mix (recording pipeline).
  * resample_mix_tpu_x — config 2 device path: the same pipeline as one
    jitted MXU conv, device-resident.
  * monitoring_frame_ms — single 480-sample frame (S=1) through the
    denoise block vs the 10 ms budget (audio.rs:260-268).
  * concurrent_denoise_asr_rtf — config 5: denoise @48 kHz + ASR on the
    same audio, minutes-long input.
  * onnx_asr_rtf — the ONNX-executor ASR route (12 of 13 catalog models):
    an int8 bundle at parakeet-tdt-0.6b-v3 dims through OnnxTdtEngine.
  * onnx_asr_device_rtf — same engine with device-resident chunks
    (run_transcription's wiring); the delta to onnx_asr_rtf is the
    tunnel's per-call chunk-upload tax.
  * transcribe_file_ladder_off_x — the file pipeline at temp-0 only (the
    rung real weights take), companion to the worst-case-ladder floor.
  * diarization_builtin_x_realtime — subsystem D end-to-end with the
    BUILTIN stand-in nets (energy-VAD + mel-stats embeddings).
  * diarization_staged_x_realtime — subsystem D with the real staged
    nets at real shapes (PyanNet segmentation + CAM++ embeddings,
    init_random weights — egress-blocked, like whisper_base_rtf).
  * diarization_exec_x_realtime — subsystem D with the nets running
    through the ONNX→JAX executor (the real-artifact route).
  * denoise_mesh_x — pre-wired multi-chip denoise (recorded automatically
    when >1 device is visible; absent on one chip).

Timing discipline: compute-bound device metrics report best-of-N
(steady-state; noise is additive); tunnel/pipeline-bound metrics report
median-of-N with a *_spread_pct companion so round-over-round deltas are
interpretable (VERDICT r4 #4). The `weights` extra tags what weights each
metric ran with. All paths measure steady-state jitted steps on
device-resident data; the full algorithms run (no stubs), at oracle
parity where defined.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")


def _timeit(fn, sync, reps=3, inner=5):
    """Best-of-reps — for COMPUTE-BOUND device metrics, where the minimum
    is the honest steady-state (noise is strictly additive)."""
    fn()
    sync()
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            fn()
        sync()
        best = min(best, (time.time() - t0) / inner)
    return best


def _timeit_median(fn, sync, reps=5, inner=1):
    """Median-of-reps with spread — for TUNNEL/PIPELINE-BOUND metrics
    (VERDICT r4 #4): under a ~29 ms-RTT proxied backend, host-side fetches
    and I/O make run-to-run spread real signal, not additive noise, so a
    best-of-N point value is a lottery ticket. Returns
    (median_seconds, spread_pct) where spread = (max-min)/median·100;
    main() records both so every r4→r5 delta is interpretable."""
    fn()
    sync()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            fn()
        sync()
        ts.append((time.time() - t0) / inner)
    ts.sort()
    n = len(ts)
    med = ts[n // 2] if n % 2 else 0.5 * (ts[n // 2 - 1] + ts[n // 2])
    return med, 100.0 * (ts[-1] - ts[0]) / med


_DENOISE_MEASURE = {}  # dt + shapes from bench_denoise, for the MFU extra


def bench_denoise():
    import jax.numpy as jnp
    import numpy as np

    from crispy_tpu.dsp.rnnoise import jax_pipeline as jp
    from crispy_tpu.dsp.rnnoise.weights import builtin_model, deterministic_test_model

    S, F = 128, 100  # 128 streams x 1 s per block
    try:
        model = builtin_model()  # the shipped artifact (VERDICT r1 weak #10)
    except Exception:
        model = deterministic_test_model()
    params = jp.make_params(model)
    rng = np.random.default_rng(0)
    block = jnp.asarray(rng.standard_normal((S, F * 480), dtype=np.float32) * 0.3)
    # _denoise_block_jit donates the state buffer — it MUST be re-threaded
    # every call (reusing the donated initial state is use-after-free on TPU)
    carry = [jp.init_state(S)]
    out_box = [None]

    def step():
        carry[0], out, _ = jp._denoise_block_jit(params, carry[0], block)
        out_box[0] = out

    # inner=40: the proxied backend's value fetch costs ~29 ms; amortize it
    # so the number reflects steady-state device throughput
    dt = _timeit(step, lambda: float(out_box[0].sum()), reps=3, inner=40)
    _DENOISE_MEASURE.update(dt=dt, params=params, block=block,
                            state=jp.init_state(S))
    return (S * F * 480 / 48000) / dt


def bench_denoise_mfu():
    """denoise_mfu_pct: achieved logical-f32 FLOP/s of the denoise block as
    % of the f32@HIGHEST MXU ceiling (~197/6 = 32.8 TFLOP/s on v5e: every
    output-affecting matmul runs 6-pass bf16 for the ≤1e-4 parity budget).
    FLOPs come from XLA's own cost model on the compiled step; the timing
    is bench_denoise's. Full roofline table: tools/mfu_report.py +
    docs/PERF.md (VERDICT r4 #3)."""
    if not _DENOISE_MEASURE:
        return None
    from crispy_tpu.dsp.rnnoise import jax_pipeline as jp

    m = _DENOISE_MEASURE
    c = jp._denoise_block_jit.lower(m["params"], m["state"],
                                    m["block"]).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    flops = float(c.get("flops", 0.0))
    if not flops:
        return None
    return 100.0 * (flops / m["dt"]) / (197e12 / 6.0)


def _ggml_model(size):
    """WhisperModel for the bench, loaded through the REAL from_ggml file
    path (a cached synthetic f16 container of the size's true shapes —
    BASELINE config 4's offline half, VERDICT r2 #7)."""
    from pathlib import Path

    from crispy_tpu.models.whisper import CONFIGS, WhisperModel
    from crispy_tpu.models.whisper.ggml_io import write_ggml
    from crispy_tpu.models.whisper.weights import init_random

    # v2: conv tensors in the REAL whisper.cpp layout (a pre-fix cached
    # file would load transposed)
    path = Path(f"/tmp/crispy_bench_ggml_{size}_f16_v2.bin")
    if not path.exists():
        cfg = CONFIGS[size]
        write_ggml(path, init_random(cfg, seed=0), cfg, ttype=1)
    return WhisperModel.from_ggml(path)


def bench_whisper(size="base", B=8, max_new=224):
    import jax.numpy as jnp
    import numpy as np

    from crispy_tpu.dsp.mel import log_mel_spectrogram
    from crispy_tpu.models.whisper.model import greedy_decode

    m = _ggml_model(size) if size in ("tiny", "base") else None
    if m is None:
        raise ValueError(size)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, 480000)).astype(np.float32) * 0.1)
    mel = log_mel_spectrogram(audio, n_mels=m.cfg.n_mels)
    prompt = jnp.asarray(
        np.tile(np.array([m.cfg.sot, m.cfg.sot + 1, m.cfg.sot + 2], np.int32), (B, 1)))
    box = [None]

    def step():
        toks, lens = greedy_decode(m.params, m.cfg, mel, prompt,
                                   max_new=max_new, eot=-1)  # never stops: worst case
        box[0] = toks

    dt = _timeit(step, lambda: int(np.asarray(box[0]).sum()), reps=2, inner=2)
    return dt / (B * 30.0)  # RTF (wall seconds per audio second)


def bench_logmel(B=64):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crispy_tpu.dsp.mel import log_mel_spectrogram

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, 480000)).astype(np.float32) * 0.1)
    fn = jax.jit(lambda a: log_mel_spectrogram(a, n_mels=80))
    box = [None]

    def step():
        box[0] = fn(audio)

    dt = _timeit(step, lambda: float(box[0].sum()), reps=3, inner=5)
    return (B * 30.0) / dt  # x real time


def bench_resample_mix(seconds=600):
    import numpy as np

    from crispy_tpu.dsp.resample import resample_poly

    rng = np.random.default_rng(0)
    mic = (rng.standard_normal(int(44100 * seconds)) * 0.3).astype(np.float32)
    app = (rng.standard_normal(int(48000 * seconds)) * 0.3).astype(np.float32)
    box = [None]

    def step():
        # host path: the recording mixer is a host-side streaming pipeline
        # (the TPU conv path wins on-host, but this harness reaches the chip
        # through a network tunnel where the 100 MB transfer dominates)
        mic48 = resample_poly(mic, 44100, 48000, use_jax=False)
        n = min(mic48.size, app.size)
        mixed = mic48[:n] + app[:n]
        box[0] = np.stack([mixed, mixed], axis=1)  # dual-mono (recording.rs R3)

    dt = _timeit(step, lambda: float(box[0].sum()), reps=3, inner=2)
    return seconds / dt


def bench_resample_mix_tpu(seconds=600):
    """Config 2, device path: 44.1→48 kHz polyphase (one MXU conv) + mix +
    dual-mono, everything device-resident under one jit (the host-path
    number stays as resample_mix_x_realtime; VERDICT r2 #6)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crispy_tpu.dsp.resample import make_resampler_jax

    rng = np.random.default_rng(0)
    mic = jnp.asarray((rng.standard_normal(int(44100 * seconds)) * 0.3
                       ).astype(np.float32))
    app = jnp.asarray((rng.standard_normal(int(48000 * seconds)) * 0.3
                       ).astype(np.float32))
    res = make_resampler_jax(44100, 48000, mic.size)
    n = min(int(np.ceil(mic.size * 160 / 147)), app.size)

    @jax.jit
    def step_fn(mic_d, app_d):
        mic48 = res(mic_d)
        mixed = mic48[:n] + app_d[:n]
        return jnp.stack([mixed, mixed], axis=1)  # dual-mono (recording.rs R3)

    box = [None]

    def step():
        box[0] = step_fn(mic, app)

    # tunnel-bound (100 MB host→device per step on this harness): median
    # of 7 with reported spread, not best-of (VERDICT r4 #4 — the r3→r4
    # halving of this metric was sampling noise, not a regression)
    dt, spread = _timeit_median(step, lambda: float(box[0].sum()),
                                reps=7, inner=2)
    return seconds / dt, spread


def bench_monitoring_frame(frames=50):
    """Single-frame monitoring latency: one 480-sample 48 kHz frame (S=1,
    F=1) through the denoise block step, amortized device time per frame
    vs the 10 ms real-time budget (audio.rs:260-268; VERDICT r2 #6)."""
    import jax.numpy as jnp
    import numpy as np

    from crispy_tpu.dsp.rnnoise import jax_pipeline as jp
    from crispy_tpu.dsp.rnnoise.weights import builtin_model, deterministic_test_model

    try:
        model = builtin_model()
    except Exception:
        model = deterministic_test_model()
    params = jp.make_params(model)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.standard_normal((1, 480), dtype=np.float32) * 0.3)
    carry = [jp.init_state(1)]  # donated: must be re-threaded
    box = [None]

    def step():
        carry[0], out, _ = jp._denoise_block_jit(params, carry[0], frame)
        box[0] = out

    dt = _timeit(step, lambda: float(box[0].sum()), reps=3, inner=frames)
    return dt * 1e3  # ms per frame


def bench_denoise_mesh(per_device_streams=128, F=100, inner=20):
    """Pre-wired multi-chip entry: the denoise block sharded over all
    visible devices (records the moment >1 real chip appears; on one chip
    this reports None and is skipped — VERDICT r2 #9)."""
    import jax

    if len(jax.devices()) < 2:
        return None
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from crispy_tpu import parallel
    from crispy_tpu.dsp.rnnoise import jax_pipeline as jp
    from crispy_tpu.dsp.rnnoise.weights import builtin_model, deterministic_test_model

    # data-only mesh: all devices shard streams (the default (data, model=2)
    # mesh would replicate everything on a 2-chip host)
    mesh = parallel.make_mesh(model_parallel=1)
    ndev = len(jax.devices())
    S = per_device_streams * ndev
    try:
        model = builtin_model()
    except Exception:
        model = deterministic_test_model()
    params = jp.make_params(model)
    rng = np.random.default_rng(0)
    sharding = NamedSharding(mesh, P("data"))
    block = jax.device_put(
        jnp.asarray(rng.standard_normal((S, F * 480), dtype=np.float32) * 0.3),
        sharding)
    carry = [jax.device_put(jp.init_state(S), sharding)]
    box = [None]
    # shard_map step: Pallas kernels run on local shards (GSPMD cannot
    # partition custom calls)
    fn = jp.denoise_block_sharded(mesh, params, carry[0])

    def step():
        carry[0], out, _ = fn(params, carry[0], block)
        box[0] = out

    dt = _timeit(step, lambda: float(box[0].sum()), reps=3, inner=inner)
    return (S * F * 480 / 48000) / dt


def bench_diarization_builtin(minutes=60):
    """Subsystem D end-to-end with the BUILT-IN stand-in nets (energy-VAD
    segmentation + mel-stats embeddings — `dz.diarize` defaults): a
    synthetic multi-speaker hour through the FULL pipeline — segmentation
    (D1), ≤4 s chunking, embeddings (D2), device NME-SC clustering (D3:
    batched eigvalsh p-sweep on chip), chronological merge (D4). Bout
    durations come from a small fixed set so embedding-shape compiles are
    bounded (the embedding path buckets by exact length). This is NOT the
    real-architecture number — see diarization_staged_x_realtime (native
    JAX ports at real shapes) and diarization_exec_x_realtime (the ONNX-
    executor route real artifacts take). Reference: the serial per-window/
    per-chunk ORT + host nalgebra loop (managers/diarization.rs:77-611)."""
    from crispy_tpu.engine import diarization as dz
    from crispy_tpu.utils.synth import synth_speaker_hour

    audio = synth_speaker_hour(minutes)  # 3 "speakers" by spectral envelope
    box = [None]

    def step():
        box[0] = dz.diarize(audio, max_speakers=8, merge_gap=1.0)

    dt, spread = _timeit_median(step, lambda: len(box[0]), reps=3, inner=1)
    return (minutes * 60) / dt, spread


def bench_diarization_staged(minutes=60):
    """Subsystem D with the REAL staged networks at real architecture
    shapes: PyanNet segmentation-3.0 forward over every 10 s window (D1)
    and the CAM++ embedding net over every <=4 s chunk (D2), plus device
    NME-SC (D3) and chronological merge (D4). Weights are init_random —
    egress-blocked, the same caveat as whisper_base_rtf: the number is
    honest for throughput, silent on output quality. Segment DECISIONS
    ride the builtin energy-VAD structure (net logits enter at weight 0,
    so every staged FLOP executes and stays in the data flow) so the
    downstream chunk/cluster load matches a real 3-speaker hour instead
    of whatever random logits decode to. Since round 5 the route is
    one-upload: the recording crosses the link once as int16 and both
    nets consume the device-resident array (windows via reshape, chunks
    via dynamic_slice) instead of re-uploading ~460 MB/hour of f32.
    Reference: the serial per-window / per-chunk ORT loop
    (managers/diarization.rs:77-348)."""
    import numpy as np

    from crispy_tpu.engine import diarization as dz
    from crispy_tpu.models import campplus, segmentation as segnet
    from crispy_tpu.utils.synth import synth_speaker_hour

    from crispy_tpu.engine import diar_device as dd

    seg_model = segnet.SegmentationModel(segnet.init_random())
    emb_model = campplus.CamPPlusModel(campplus.init_random())

    def seg_fn(windows):
        real = seg_model(windows)           # [W, F, 7] — full D1 cost
        ev = dz.energy_vad_logits(windows)  # [W, F, 2] — decode structure
        f = min(real.shape[1], ev.shape[1])
        return ev[:, :f] + 0.0 * real[:, :f, :2]

    def emb_fn(chunks):
        real = np.asarray(emb_model(chunks))        # [N, E] — full D2 cost
        stand = dz.melstats_embedding(chunks)       # [N, d] — structure
        reps = -(-real.shape[1] // stand.shape[1])
        tiled = np.tile(stand, (1, reps))[:, :real.shape[1]]
        return tiled + 0.0 * real

    # one-upload variants: the real nets consume the device-resident i16
    # recording; decode structure comes from the device energy-VAD margins
    # (pinned equal to the host energy_vad_logits by the fused-path tests)
    def seg_dev(dev, mesh=None):
        real = seg_model.from_device(dev, mesh=mesh)            # [W, F, 7]
        m = dd.segmentation_margins(dev, int(dev.shape[0]), mesh)  # [W, F']
        ev = np.stack([-m, m], axis=-1)
        f = min(real.shape[1], ev.shape[1])
        return ev[:, :f] + 0.0 * real[:, :f, :2]

    def emb_dev(dev, ranges, mesh=None):
        real = np.asarray(emb_model.from_device(dev, ranges, mesh=mesh))
        stand = dd.chunk_stats(dev, int(dev.shape[0]), list(ranges), mesh)
        reps = -(-real.shape[1] // stand.shape[1])
        tiled = np.tile(stand, (1, reps))[:, :real.shape[1]]
        return tiled + 0.0 * real

    seg_fn.from_device = seg_dev
    emb_fn.from_device = emb_dev

    audio = np.asarray(synth_speaker_hour(minutes), np.float32)
    box = [None]

    def step():
        box[0] = dz.diarize(audio, max_speakers=8, merge_gap=1.0,
                            segmentation_fn=seg_fn, embedding_fn=emb_fn)

    dt, spread = _timeit_median(step, lambda: len(box[0]), reps=3, inner=1)
    return (minutes * 60) / dt, spread


def bench_diarization_exec(minutes=60):
    """diarization_exec_x_realtime (VERDICT r4 #1b): the EXECUTOR route —
    the path real downloaded .onnx diarization artifacts take
    (engine/diarization's onnx_nets.segmentation_runner/embedding_runner;
    reference analog: ort Session::run per window/chunk,
    managers/diarization.rs:133-134,67-68). Synthetic .onnx bundles at the
    real architectures' shapes (pyannote-segmentation-3.0 SincNet-conv +
    4-layer BiLSTM over every 10 s window; CAM++-scale TDNN embedder over
    every ≤4 s chunk — tools/bench_bundles.py) execute through the
    ONNX→JAX executor, batched per compiled shape. Random weights (egress-
    blocked, same caveat as whisper_base_rtf): throughput is honest,
    output quality unmeasured. Segment DECISIONS ride the builtin
    energy-VAD structure (executor logits/embeddings enter at weight 0 —
    every executor FLOP runs and stays in the data flow) so the cluster
    load matches a real 3-speaker hour instead of whatever random logits
    decode to. Since round 5 the route is one-upload (int16, device-
    resident windows/chunks), and the executor embedding runner fuses
    fbank+CMN+net into one program — the feature tensor never visits the
    host (the round trip measured 2x end-to-end)."""
    import sys
    from pathlib import Path

    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))
    import bench_bundles as bb

    from crispy_tpu.engine import diarization as dz
    from crispy_tpu.models import onnx_nets
    from crispy_tpu.utils.synth import synth_speaker_hour

    seg_p = Path("/tmp/crispy_bench_seg_pyannote_v1.onnx")
    emb_p = Path("/tmp/crispy_bench_emb_campplus_v1.onnx")
    if not seg_p.exists():
        bb.make_pyannote_sized_segmentation(seg_p)
    if not emb_p.exists():
        bb.make_campplus_scale_embedding(emb_p)
    seg_exec = onnx_nets.segmentation_runner(seg_p)
    emb_exec = onnx_nets.embedding_runner(emb_p)

    from crispy_tpu.engine import diar_device as dd

    def seg_fn(windows):
        real = seg_exec(windows)            # [W, 589, 7] — full executor D1
        ev = dz.energy_vad_logits(windows)  # [W, F, 2] — decode structure
        f = min(real.shape[1], ev.shape[1])
        return ev[:, :f] + 0.0 * real[:, :f, :2]

    def emb_fn(chunks):
        real = np.asarray(emb_exec(chunks))  # [N, 192] — full executor D2
        stand = dz.melstats_embedding(chunks)
        reps = -(-real.shape[1] // stand.shape[1])
        tiled = np.tile(stand, (1, reps))[:, :real.shape[1]]
        return tiled + 0.0 * real

    # one-upload variants (same trick as bench_diarization_staged)
    def seg_dev(dev, mesh=None):
        real = seg_exec.from_device(dev, mesh=mesh)          # [W, 589, 7]
        m = dd.segmentation_margins(dev, int(dev.shape[0]), mesh)  # [W, F']
        ev = np.stack([-m, m], axis=-1)
        f = min(real.shape[1], ev.shape[1])
        return ev[:, :f] + 0.0 * real[:, :f, :2]

    def emb_dev(dev, ranges, mesh=None):
        real = np.asarray(emb_exec.from_device(dev, ranges, mesh=mesh))
        stand = dd.chunk_stats(dev, int(dev.shape[0]), list(ranges), mesh)
        reps = -(-real.shape[1] // stand.shape[1])
        tiled = np.tile(stand, (1, reps))[:, :real.shape[1]]
        return tiled + 0.0 * real

    seg_fn.from_device = seg_dev
    emb_fn.from_device = emb_dev

    audio = np.asarray(synth_speaker_hour(minutes), np.float32)
    box = [None]

    def step():
        box[0] = dz.diarize(audio, max_speakers=8, merge_gap=1.0,
                            segmentation_fn=seg_fn, embedding_fn=emb_fn)

    dt, spread = _timeit_median(step, lambda: len(box[0]), reps=3, inner=1)
    return (minutes * 60) / dt, spread


def bench_onnx_asr(B=8, cache_dir="/tmp/crispy_bench_parakeet_v2"):
    """onnx_asr_rtf (VERDICT r4 #1a): the ONNX-executor ASR path — the
    route 12 of 13 catalog models actually take (the reference serves them
    through ONNX Runtime: managers/transcription.rs:183-185). A synthetic
    int8 bundle at parakeet-tdt-0.6b-v3's REAL dims (24-layer macaron
    Conformer d=1024/ffn=4096, DynamicQuantizeLinear→MatMulInteger weight
    chains exactly like ort quantize_dynamic exports, LSTM-640 prediction
    net + TDT joint — tools/bench_bundles.py) runs B×30 s chunk batches
    through OnnxTdtEngine: executor-jitted encoder + the one-while_loop
    on-device TDT greedy decode. Random weights (egress): throughput
    honest, transcript quality unmeasured; the joint carries a calibrated
    blank bias so emission/duration statistics (and hence decode-loop trip
    counts) match real TDT decoding instead of the degenerate
    max-symbols-per-frame worst case.

    Spread caveat: each call uploads 15 MB of float chunks through the
    ~20-40 MB/s tunnel before a ~0.2 s device step, so per-call wall time
    is transfer-dominated and swings with tunnel weather (docs/PERF.md
    itemization); the median is the honest harness number and sits well
    above the on-device cost a locally-attached chip would see.
    `onnx_asr_device_rtf` is the companion with chunks already device-
    resident — the wiring run_transcription actually uses since the
    device-resident file pipeline (resample_poly device_out feeds device
    chunk batches straight to the engine), isolating the machine from
    the link."""
    import numpy as np

    from crispy_tpu.engine.onnx_engines import OnnxTdtEngine

    bundle = _parakeet_bundle(cache_dir)
    eng = OnnxTdtEngine(bundle, model_id="parakeet-v3-bench")
    rng = np.random.default_rng(0)
    chunks = (rng.standard_normal((B, 480000)) * 0.2).astype(np.float32)
    box = [None]

    def step():
        box[0] = eng.transcribe_batch(chunks)  # host strings: inherent sync

    dt, spread = _timeit_median(step, lambda: None, reps=5, inner=1)
    return dt / (B * 30.0), spread  # RTF


def bench_onnx_asr_device(B=8, cache_dir="/tmp/crispy_bench_parakeet_v2"):
    """onnx_asr_device_rtf: the same executor TDT engine and bundle as
    onnx_asr_rtf, but with the chunk batch pre-placed on the device —
    run_transcription's wiring (its chunks arrive device-resident from
    the device file pipeline). Measures the executor+decode step itself;
    the delta to onnx_asr_rtf is the tunnel's 15 MB/call upload tax."""
    import jax
    import numpy as np

    from crispy_tpu.engine.onnx_engines import OnnxTdtEngine

    bundle = _parakeet_bundle(cache_dir)
    eng = OnnxTdtEngine(bundle, model_id="parakeet-v3-bench")
    rng = np.random.default_rng(0)
    dev_chunks = jax.device_put(
        (rng.standard_normal((B, 480000)) * 0.2).astype(np.float32))
    jax.block_until_ready(dev_chunks)
    box = [None]

    def step():
        box[0] = eng.transcribe_batch(dev_chunks)  # host strings: sync

    dt, spread = _timeit_median(step, lambda: None, reps=5, inner=1)
    return dt / (B * 30.0), spread  # RTF


def _parakeet_bundle(cache_dir):
    from pathlib import Path

    d = Path(cache_dir)
    if not (d / "encoder-model.int8.onnx").exists():
        import sys

        sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))
        import bench_bundles as bb

        bb.make_parakeet_sized_bundle(d)
    return d


def bench_concurrent(minutes=4):
    """Config 5: denoise @48 kHz + whisper-tiny ASR on the same audio."""
    import jax.numpy as jnp
    import numpy as np

    from crispy_tpu.dsp.mel import log_mel_spectrogram
    from crispy_tpu.dsp.rnnoise import jax_pipeline as jp
    from crispy_tpu.dsp.rnnoise.weights import builtin_model, deterministic_test_model
    from crispy_tpu.models.whisper.model import greedy_decode

    seconds = minutes * 60
    rng = np.random.default_rng(0)
    # 16-bit PCM source, like every recording the product denoises —
    # denoise_file's int16 wire halves the tunnel transfer both ways
    pcm48 = (np.clip(rng.standard_normal((1, 48000 * seconds)) * 0.2, -1, 1)
             * 32767).astype(np.int16)
    try:
        params = jp.make_params(builtin_model())  # the shipped artifact
    except Exception:
        params = jp.make_params(deterministic_test_model())
    m = _ggml_model("tiny")  # the real file-load path
    B = seconds // 30
    audio16 = jnp.asarray(rng.standard_normal((B, 480000)).astype(np.float32) * 0.1)
    prompt = jnp.asarray(np.tile(np.array([m.cfg.sot], np.int32), (B, 1)))
    box = [None]

    def step():
        den = jp.denoise_batch(pcm48, params=params, wire="i16")
        mel = log_mel_spectrogram(audio16, n_mels=m.cfg.n_mels)
        toks, _ = greedy_decode(m.params, m.cfg, mel, prompt, max_new=64, eot=-1)
        box[0] = (den, toks)

    dt, spread = _timeit_median(
        step, lambda: (int(np.asarray(box[0][0]).astype(np.int64).sum()),
                       int(np.asarray(box[0][1]).sum())), reps=5, inner=1)
    return dt / seconds, spread  # RTF


def bench_transcribe_file(minutes=10, ladder=True):
    """Product-level end to end: a 16-bit 48 kHz mono WAV through the FULL
    file pipeline — header parse + read, 48→16 kHz resample, 30 s chunk
    batching, mel + encoder + greedy decode (whisper-tiny through the real
    from_ggml container), progress/ETA events, result persistence and
    checkpoint clearing (engine/transcription.run_transcription). The
    reference analog is the serial whisper.cpp chunk loop
    (commands/transcription.rs:98-481).

    Floor semantics (ladder=True): random weights never pass the quality
    gates, so every chunk re-decodes through the FULL 6-rung temperature-
    fallback ladder — real weights take the temp-0 rung almost always, so
    production throughput sits well above this number. ladder=False is the
    companion measurement (transcribe_file_ladder_off_x): temp-0 only,
    isolating ladder cost from pipeline overhead (VERDICT r4 #5) — with
    real weights the product sits near THIS number."""
    import os
    import tempfile
    from pathlib import Path

    import numpy as np

    from crispy_tpu.api.events import EventBus
    from crispy_tpu.engine import transcription as tr
    from crispy_tpu.io import wav as wavio
    from crispy_tpu.models.registry import ModelManager

    m = _ggml_model("tiny")
    sr = 48000
    seconds = minutes * 60
    wav_path = Path(f"/tmp/crispy_bench_file_{minutes}min.wav")
    if not wav_path.exists():
        rng = np.random.default_rng(0)
        t = np.arange(sr * seconds) / sr
        sig = (0.3 * np.sin(2 * np.pi * 220 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 0.7 * t))
               + 0.02 * rng.standard_normal(t.size))
        wavio.write_wav(wav_path, np.clip(sig, -1, 1).astype(np.float32), sr)
    old = os.environ.get("CRISPY_DATA_DIR")
    data = Path(tempfile.mkdtemp(prefix="crispy_bench_data"))
    os.environ["CRISPY_DATA_DIR"] = str(data)
    try:
        bus = EventBus()
        mm = ModelManager(models_dir=data / "Models", bus=bus)

        temps = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0) if ladder else (0.0,)

        class _W(tr.EngineProtocol):
            name = "whisper-tiny-bench"

            def transcribe_batch(self, chunks, language="en"):
                return m.transcribe_chunks_robust(np.atleast_2d(chunks),
                                                  language=language,
                                                  temperatures=temps)

        tm = tr.TranscriptionManager(mm, bus=bus,
                                     engine_loader=lambda mid, mgr: _W())
        box = [None]

        def step():
            box[0] = tr.run_transcription(str(wav_path), tm,
                                          "whisper-tiny-bench", batch_chunks=8)

        dt, spread = _timeit_median(step, lambda: len(box[0] or ""),
                                    reps=3, inner=1)
        return seconds / dt, spread
    finally:
        if old is None:
            os.environ.pop("CRISPY_DATA_DIR", None)
        else:
            os.environ["CRISPY_DATA_DIR"] = old


WEIGHTS_TAGS = {
    # what weights each metric ran with (VERDICT r4 #6: a BENCH consumer
    # must not mistake stand-in throughput for product throughput)
    "rnnoise_denoise_realtime_factor_per_chip": "shipped (trained builtin artifact)",
    "whisper_base_rtf": "random (real shapes via from_ggml; egress-blocked)",
    "whisper_base_rtf_b16": "random (real shapes via from_ggml; egress-blocked)",
    "whisper_tiny_rtf": "random (real shapes via from_ggml; egress-blocked)",
    "onnx_asr_rtf": "random (parakeet-v3 int8 shapes; egress-blocked)",
    "onnx_asr_device_rtf": "random (parakeet-v3 int8 shapes; egress-blocked)",
    "onnx_asr_device_rtf_b16": "random (parakeet-v3 int8 shapes; egress-blocked)",
    "transcribe_file_x_realtime": "random whisper-tiny (worst-case ladder floor)",
    "transcribe_file_ladder_off_x": "random whisper-tiny (temp-0 only)",
    "concurrent_denoise_asr_rtf": "shipped denoiser + random whisper-tiny",
    "diarization_builtin_x_realtime": "builtin stand-in nets (energy-VAD + mel-stats)",
    "diarization_staged_x_realtime": "random, real architectures (native JAX ports)",
    "diarization_exec_x_realtime": "random, real shapes via ONNX executor",
}


def main():
    t0 = time.time()
    denoise_x = bench_denoise()
    bench_secs = {"rnnoise_denoise": round(time.time() - t0, 1)}
    extra = {}
    for key, fn in (
        ("denoise_mfu_pct", bench_denoise_mfu),
        ("whisper_base_rtf", lambda: bench_whisper("base")),
        # the 16-chunk bucket run_transcription actually schedules for
        # whisper on files >4 min (EngineProtocol.decode_batch_bucket):
        # bigger batches amortize the sequential decode scan
        ("whisper_base_rtf_b16", lambda: bench_whisper("base", B=16)),
        ("whisper_tiny_rtf", lambda: bench_whisper("tiny")),
        ("onnx_asr_rtf", bench_onnx_asr),
        ("onnx_asr_device_rtf", bench_onnx_asr_device),
        # the 16-chunk bucket run_transcription schedules for the TDT
        # engine on files >4 min (OnnxTdtEngine.decode_batch_bucket):
        # B=16 runs 1.18x the B=8 wall -> -41% RTF
        ("onnx_asr_device_rtf_b16", lambda: bench_onnx_asr_device(B=16)),
        ("logmel_x_realtime", bench_logmel),
        ("resample_mix_x_realtime", bench_resample_mix),
        ("resample_mix_tpu_x", bench_resample_mix_tpu),
        ("monitoring_frame_ms", bench_monitoring_frame),
        ("concurrent_denoise_asr_rtf", bench_concurrent),
        ("transcribe_file_x_realtime", bench_transcribe_file),
        ("transcribe_file_ladder_off_x",
         lambda: bench_transcribe_file(ladder=False)),
        ("diarization_builtin_x_realtime", bench_diarization_builtin),
        ("diarization_staged_x_realtime", bench_diarization_staged),
        ("diarization_exec_x_realtime", bench_diarization_exec),
        ("denoise_mesh_x", bench_denoise_mesh),
    ):
        t0 = time.time()
        try:
            v = fn()
            if isinstance(v, tuple):  # (median value, spread pct)
                extra[key] = round(v[0], 5)
                extra[key + "_spread_pct"] = round(v[1], 1)
            elif v is not None:  # None = not applicable (e.g. single chip)
                extra[key] = round(v, 5)
        except Exception as e:  # a sub-bench must never kill the headline
            extra[key] = f"error: {type(e).__name__}: {e}"[:200]
        bench_secs[key] = round(time.time() - t0, 1)
    import jax

    extra["n_devices"] = len(jax.devices())
    extra["weights"] = WEIGHTS_TAGS
    extra["bench_seconds"] = bench_secs  # wall cost per metric (incl. compiles)

    print(json.dumps({
        "metric": "rnnoise_denoise_realtime_factor_per_chip",
        "value": round(denoise_x, 1),
        "unit": "x_realtime_48khz",
        "vs_baseline": round(denoise_x / 5000.0, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
