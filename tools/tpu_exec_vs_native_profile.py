"""A/B profile: executor-route diarization nets vs the native JAX ports.

NEXT_STEPS round-6 #2: the hour-pipeline executor route (~110x) trails the
native-port staged route (~160x), but both carry 30-44% measured spread.
This tool isolates the two stages that differ — segmentation net over the
10 s window batch, embedding net over the chunk population — and times each
implementation on identical inputs with medians, so the gap (if real) is
attributed to a stage rather than to pipeline noise.

Stages timed (same shapes the hour bench produces):
  seg:  [W=361, 160000] windows -> logits          (pyannote-3.0 shapes)
  emb:  ~900 chunks of <=4 s -> [N, 192]           (CAM++ shapes)
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
import bench_bundles as bb


def median_time(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], ts


def main():
    from crispy_tpu.engine import diarization as dz
    from crispy_tpu.models import campplus, onnx_nets, segmentation as segnet
    from crispy_tpu.utils.synth import synth_speaker_hour

    rng = np.random.default_rng(0)
    audio = np.asarray(synth_speaker_hour(60), np.float32)

    # --- build the same window batch diarize() would ---
    sr, win = 16000, 160000
    n_win = len(audio) // win
    windows = audio[: n_win * win].reshape(n_win, win)
    print(f"windows: {windows.shape}", flush=True)

    # --- chunk population from the builtin VAD (what both routes embed) ---
    segments = dz.segment_speech(audio, 1.0, dz.energy_vad_logits)
    chunks = [c.samples for c in dz.chunk_segments(segments)]
    lens = sorted({len(c) for c in chunks})
    print(f"chunks: {len(chunks)}, distinct lengths: {len(lens)} {lens[:8]}...",
          flush=True)

    # === segmentation ===
    seg_p = Path("/tmp/crispy_bench_seg_pyannote_v1.onnx")
    if not seg_p.exists():
        bb.make_pyannote_sized_segmentation(seg_p)
    seg_exec = onnx_nets.segmentation_runner(seg_p)
    seg_model = segnet.SegmentationModel(segnet.init_random())

    def run_exec_seg():
        return np.asarray(seg_exec(windows))

    def run_native_seg():
        return seg_model(windows)  # jits internally, returns np

    run_exec_seg(); run_native_seg()  # compile
    m_exec, ts_e = median_time(run_exec_seg)
    m_nat, ts_n = median_time(run_native_seg)
    print(f"seg  exec   median {m_exec*1e3:8.1f} ms  {[f'{t*1e3:.0f}' for t in ts_e]}")
    print(f"seg  native median {m_nat*1e3:8.1f} ms  {[f'{t*1e3:.0f}' for t in ts_n]}")

    # === embedding ===
    emb_p = Path("/tmp/crispy_bench_emb_campplus_v1.onnx")
    if not emb_p.exists():
        bb.make_campplus_scale_embedding(emb_p)
    emb_exec = onnx_nets.embedding_runner(emb_p)
    emb_model = campplus.CamPPlusModel(campplus.init_random())

    def run_exec_emb():
        return np.asarray(emb_exec(chunks))

    def run_native_emb():
        return np.asarray(emb_model(chunks))

    run_exec_emb(); run_native_emb()  # compile all buckets
    m_exec, ts_e = median_time(run_exec_emb)
    m_nat, ts_n = median_time(run_native_emb)
    print(f"emb  exec   median {m_exec*1e3:8.1f} ms  {[f'{t*1e3:.0f}' for t in ts_e]}")
    print(f"emb  native median {m_nat*1e3:8.1f} ms  {[f'{t*1e3:.0f}' for t in ts_n]}")


if __name__ == "__main__":
    main()
