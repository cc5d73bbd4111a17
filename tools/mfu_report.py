"""MFU / roofline accounting for the hot stages (VERDICT r4 #3).

Prints one table: per stage, analytic FLOPs and HBM bytes from XLA's own
cost model (``compiled.cost_analysis()``), measured steady-state time on
the chip, achieved FLOP/s and bytes/s, and the position against peak —
so "beats a 5,000x target" becomes "here is what the machine has left".

Peaks (TPU v5e / v5 lite, per chip):
  * bf16 MXU          ~197 TFLOP/s
  * int8 MXU          ~394 TOP/s
  * f32 @ Precision.HIGHEST: every f32 matmul executes as 6 bf16 passes
    (3 per operand-half product) -> effective logical-f32 matmul ceiling
    ~197/6 = 32.8 TFLOP/s. XLA's cost model counts LOGICAL flops, so
    f32-HIGHEST stages are scored against 32.8, bf16 stages against 197.
  * HBM               ~819 GB/s

Stages (the product's hot paths):
  * denoise block      S=128 streams x 100 frames (bench_denoise shapes)
  * whisper-base encoder (B=8 x 30 s mel)
  * whisper-base decode  (224-step greedy minus the encoder; per-step too)
  * NME-SC p-sweep     n=512 bucket (the O(p*n^3) eigendecomposition batch)

Run on the real chip: ``python tools/mfu_report.py`` (add ``--json`` for
machine-readable output). Timing uses value fetches (block_until_ready is
unreliable on the proxied backend) amortized over inner reps.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

PEAK_BF16 = 197e12
PEAK_INT8 = 394e12
PEAK_F32_HIGHEST = PEAK_BF16 / 6.0
PEAK_HBM = 819e9


def _cost(lowered_compiled):
    c = lowered_compiled.cost_analysis()
    if isinstance(c, (list, tuple)):  # older jax returns [dict]
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def _time(fn, sync, reps=3, inner=10):
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


def stage_denoise(S=128, F=100):
    import jax.numpy as jnp

    from crispy_tpu.dsp.rnnoise import jax_pipeline as jp
    from crispy_tpu.dsp.rnnoise.weights import builtin_model, deterministic_test_model

    try:
        model = builtin_model()
    except Exception:
        model = deterministic_test_model()
    params = jp.make_params(model)
    rng = np.random.default_rng(0)
    block = jnp.asarray(rng.standard_normal((S, F * 480), dtype=np.float32) * 0.3)
    state = jp.init_state(S)
    flops, bbytes = _cost(
        jp._denoise_block_jit.lower(params, state, block).compile())
    carry = [jp.init_state(S)]
    box = [None]

    def step():
        carry[0], out, _ = jp._denoise_block_jit(params, carry[0], block)
        box[0] = out

    dt = _time(step, lambda: float(box[0].sum()), inner=20)
    return dict(name="denoise block (S=128,F=100)", flops=flops, bytes=bbytes,
                dt=dt, ceiling=PEAK_F32_HIGHEST, ceiling_name="f32@HIGHEST")


def _whisper(size="base", B=8):
    import jax
    import jax.numpy as jnp

    from bench import _ggml_model
    from crispy_tpu.dsp.mel import log_mel_spectrogram
    from crispy_tpu.models.whisper.model import encode, greedy_decode

    m = _ggml_model(size)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, 480000)).astype(np.float32) * 0.1)
    mel = log_mel_spectrogram(audio, n_mels=m.cfg.n_mels)
    prompt = jnp.asarray(np.tile(np.array([m.cfg.sot], np.int32), (B, 1)))

    enc = jax.jit(lambda p, x: encode(p, m.cfg, x))
    e_flops, e_bytes = _cost(enc.lower(m.params, mel).compile())
    ebox = [None]

    def estep():
        ebox[0] = enc(m.params, mel)

    e_dt = _time(estep, lambda: float(ebox[0].sum()), inner=10)

    MAX_NEW = 224
    dec = jax.jit(lambda p, x, pr: greedy_decode(p, m.cfg, x, pr,
                                                 max_new=MAX_NEW, eot=-1))
    g_flops, g_bytes = _cost(dec.lower(m.params, mel, prompt).compile())
    gbox = [None]

    def gstep():
        gbox[0] = dec(m.params, mel, prompt)[0]

    g_dt = _time(gstep, lambda: int(np.asarray(gbox[0]).sum()), inner=2)

    # whisper matmuls run at DEFAULT precision (single-pass bf16 MXU with
    # f32 accumulation — the model tolerates it; parity is gated at the
    # transcript level), so the relevant ceiling is the full bf16 peak
    enc_stage = dict(name=f"whisper-{size} encoder (B={B})", flops=e_flops,
                     bytes=e_bytes, dt=e_dt, ceiling=PEAK_BF16,
                     ceiling_name="bf16(default)")
    # decode = full greedy minus the encode it contains (mel input path
    # runs encode inside); per-step numbers divide by the step count
    dec_stage = dict(name=f"whisper-{size} decode x224 (B={B})",
                     flops=g_flops - e_flops, bytes=g_bytes - e_bytes,
                     dt=g_dt - e_dt, ceiling=PEAK_BF16,
                     ceiling_name="bf16(default)",
                     per_step=MAX_NEW)
    return [enc_stage, dec_stage]


def stage_nme(n=500):
    import jax.numpy as jnp

    from crispy_tpu.engine import nme_device as nd

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((3, 192))
    emb = np.concatenate(
        [c + 0.05 * rng.standard_normal((n // 3 + 1, 192)) for c in centers]
    )[:n].astype(np.float32)
    N = nd._bucket(n)
    P = nd._p_cap(N)
    KMAX = 8
    n_sq = int(np.ceil(np.log2(max(N, 2))))
    core = nd._build_core(N, P, KMAX, n_sq)
    emb_pad = np.zeros((N, emb.shape[1]), np.float32)
    emb_pad[:n] = emb
    args = (jnp.asarray(emb_pad), jnp.int32(n), jnp.int32(KMAX))
    flops, bbytes = _cost(core.lower(*args).compile())
    box = [None]

    def step():
        box[0] = core(*args)

    dt = _time(step, lambda: int(np.asarray(box[0]).sum()), inner=3)
    return dict(name=f"NME-SC p-sweep+final (n={n}, N={N}, P={P})",
                flops=flops, bytes=bbytes, dt=dt,
                ceiling=PEAK_F32_HIGHEST, ceiling_name="f32@HIGHEST")


def stage_onnx_encoder(B=8):
    """The ONNX-executor serving path's encoder (parakeet-v3-dim int8
    conformer, tools/bench_bundles.py): int8 matmuls score against the
    int8 MXU peak — XLA's cost model counts their MACs as flops."""
    import jax.numpy as jnp

    from bench import _parakeet_bundle
    from crispy_tpu.engine.onnx_engines import OnnxTdtEngine, _length_extra

    eng = OnnxTdtEngine(_parakeet_bundle("/tmp/crispy_bench_parakeet_v2"),
                        model_id="pk-mfu")
    rng = np.random.default_rng(0)
    chunks = jnp.asarray((rng.standard_normal((B, 480000)) * 0.2
                          ).astype(np.float32))
    feats = eng.frontend(chunks)
    from crispy_tpu.engine.onnx_engines import _frame_count

    extra = _length_extra(eng.enc_ints, eng.enc_roles, B,
                          _frame_count(eng.kind, 480000), "mfu encoder")
    flops, bbytes = _cost(
        eng._encode.lower(feats, extra, eng._enc_big).compile())
    box = [None]

    def step():
        box[0] = eng._encode(feats, extra, eng._enc_big)

    dt = _time(step, lambda: float(box[0].sum()), inner=5)
    return dict(name=f"onnx-exec parakeet-v3 encoder int8 (B={B})",
                flops=flops, bytes=bbytes, dt=dt, ceiling=PEAK_INT8,
                ceiling_name="int8")


def render(stages, as_json=False):
    rows = []
    for s in stages:
        fs = s["flops"] / s["dt"]
        bs = s["bytes"] / s["dt"]
        comp_pct = 100.0 * fs / s["ceiling"]
        hbm_pct = 100.0 * bs / PEAK_HBM
        if max(comp_pct, hbm_pct) < 10.0:
            # far from both walls: sequential-dependency/dispatch bound
            # (e.g. AR decode steps, eigensolver iteration chains)
            bound = "latency/serialization"
        else:
            bound = "compute" if comp_pct >= hbm_pct else "memory"
        row = dict(stage=s["name"], gflops_per_call=s["flops"] / 1e9,
                   gb_per_call=s["bytes"] / 1e9, ms=s["dt"] * 1e3,
                   achieved_tflops=fs / 1e12, achieved_gbs=bs / 1e9,
                   pct_of_compute_ceiling=comp_pct,
                   ceiling=s["ceiling_name"], pct_of_hbm=hbm_pct, bound=bound)
        if s.get("per_step"):
            row["ms_per_step"] = s["dt"] * 1e3 / s["per_step"]
        rows.append(row)
    if as_json:
        print(json.dumps(rows))
        return rows
    hdr = (f"{'stage':<42} {'GFLOP':>8} {'GB':>6} {'ms':>8} "
           f"{'TFLOP/s':>8} {'GB/s':>7} {'%comp':>6} {'%HBM':>6}  bound")
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        print(f"{r['stage']:<42} {r['gflops_per_call']:>8.1f} "
              f"{r['gb_per_call']:>6.2f} {r['ms']:>8.2f} "
              f"{r['achieved_tflops']:>8.2f} {r['achieved_gbs']:>7.1f} "
              f"{r['pct_of_compute_ceiling']:>6.1f} {r['pct_of_hbm']:>6.1f}"
              f"  {r['bound']} (vs {r['ceiling']})")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    stages = [stage_denoise()]
    stages += _whisper("base")
    stages.append(stage_nme())
    try:
        stages.append(stage_onnx_encoder())
    except Exception as e:  # bundle build needs ~600 MB of /tmp
        print(f"(onnx encoder stage skipped: {e})")
    render(stages, as_json=args.json)


if __name__ == "__main__":
    main()
