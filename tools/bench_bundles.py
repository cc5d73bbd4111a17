"""Synthetic ONNX bundles at REAL catalog shapes for executor-path benches.

The reference serves every non-whisper catalog model through ONNX Runtime
(managers/transcription.rs:183-185 `engine.transcribe`,
managers/diarization.rs:133-134 `Session::run`); here the same .onnx
bundles execute through the in-repo ONNX→JAX executor. Egress is dead, so
the real artifacts cannot be fetched — these generators build bundles with
the op patterns the real int8 exports contain (DynamicQuantizeLinear →
MatMulInteger chains, LayerNormalization, ONNX LSTM, depthwise Conv,
softmax attention) at the real architectures' dimensions, so the measured
throughput is honest for compute and binding cost while silent on output
quality (random weights — the same caveat as whisper_base_rtf).

Shapes:
  * parakeet-tdt-0.6b-v3-like: 24-layer macaron Conformer encoder,
    d_model 1024, ffn 4096, 8 heads, depthwise conv k=9, 8x conv
    subsampling from 80-mel; LSTM-640 prediction net; 640-wide joint;
    vocab 1024+blank, 5 TDT duration heads. ≈0.6 B params, int8 weights
    (the catalog artifact is parakeet-tdt-0.6b-v3-int8.tar.gz).
  * pyannote-segmentation-3.0-like: SincNet-as-conv (80 k=251 s=10 →
    60 k=5 → 60 k=5, maxpool 3 between) + 4-layer BiLSTM h=128 + two
    128-linear + 7-class powerset head; waveform [B,1,160000] →
    logits [B,589,7] (managers/diarization.rs:77-272 frame grid).
  * CAM++-scale embedder: 'feats' [B,T,80] → 'embs' [B,192] through a
    FLOP-matched TDNN stack (≈8.6 MMAC/frame ≈ the 7.2 M-param D-TDNN;
    the exact D-TDNN dense topology is irrelevant to throughput).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
import onnx_builder as ob  # noqa: E402  (the test writer IS the generator)

F32, I32, I64 = 1, 6, 7


def _qmatmul(prefix, x_name, w_q: np.ndarray, w_scale: float, out_name):
    """ort quantize_dynamic weight-linear: DynamicQuantizeLinear →
    MatMulInteger → Cast → Mul(act_scale·w_scale). w_q already int8."""
    p = prefix
    nodes = [
        ob.node("DynamicQuantizeLinear", [x_name], [f"{p}_xq", f"{p}_xs", f"{p}_xzp"]),
        ob.node("MatMulInteger", [f"{p}_xq", f"{p}_wq", f"{p}_xzp", f"{p}_wzp"],
                [f"{p}_yi"]),
        ob.node("Cast", [f"{p}_yi"], [f"{p}_yf"], to=1),
        ob.node("Mul", [f"{p}_xs", f"{p}_ws"], [f"{p}_sc"]),
        ob.node("Mul", [f"{p}_yf", f"{p}_sc"], [out_name]),
    ]
    inits = {f"{p}_wq": w_q, f"{p}_ws": np.float32(w_scale),
             f"{p}_wzp": np.int8(0)}
    return nodes, inits


def _int8_w(rng, shape):
    """int8 weights directly (no float detour: 0.6 B params) with a scale
    that keeps post-LayerNorm activations O(1)."""
    w = rng.integers(-127, 128, shape, dtype=np.int8)
    fan_in = shape[0]
    return w, 0.7 / (np.sqrt(fan_in) * 73.0)  # E|w_q| ≈ 63.5 ≈ 73·0.87


def _ln(prefix, x, gamma_name, beta_name, out):
    return [ob.node("LayerNormalization", [x, gamma_name, beta_name], [out],
                    axis=-1, epsilon=1e-5)]


def _swish(prefix, x, out):
    return [ob.node("Sigmoid", [x], [f"{prefix}_sg"]),
            ob.node("Mul", [x, f"{prefix}_sg"], [out])]


def make_parakeet_sized_encoder(path, D=1024, L=24, FF=4096, HEADS=8,
                                seed=0):
    rng = np.random.default_rng(seed)
    nodes = []
    inits = {}
    DH = D // HEADS

    # ---- 8x conv subsampling from [B, 80, T] (NeMo dw-striding analog) ----
    sub1 = (rng.integers(-127, 128, (256, 80, 3), dtype=np.int8)
            .astype(np.float32) * (0.7 / (np.sqrt(80 * 3) * 73.0)))
    sub2 = (rng.integers(-127, 128, (256, 256, 3), dtype=np.int8)
            .astype(np.float32) * (0.7 / (np.sqrt(256 * 3) * 73.0)))
    sub3 = (rng.integers(-127, 128, (D, 256, 3), dtype=np.int8)
            .astype(np.float32) * (0.7 / (np.sqrt(256 * 3) * 73.0)))
    inits.update({"sub1": sub1.astype(np.float32),
                  "sub2": sub2.astype(np.float32),
                  "sub3": sub3.astype(np.float32)})
    nodes += [
        ob.node("Conv", ["audio_signal", "sub1"], ["s1"], strides=[2],
                pads=[1, 1], kernel_shape=[3]),
        ob.node("Relu", ["s1"], ["s1r"]),
        ob.node("Conv", ["s1r", "sub2"], ["s2"], strides=[2],
                pads=[1, 1], kernel_shape=[3]),
        ob.node("Relu", ["s2"], ["s2r"]),
        ob.node("Conv", ["s2r", "sub3"], ["s3"], strides=[2],
                pads=[1, 1], kernel_shape=[3]),
        ob.node("Transpose", ["s3"], ["x0"], perm=[0, 2, 1]),  # [B, T', D]
    ]

    # shape scaffolding for the head reshapes (runtime B/T')
    inits.update({
        "i0": np.array(0, np.int64), "i1": np.array(1, np.int64),
        "ax0": np.array([0], np.int64),
        "heads_tail": np.array([HEADS, DH], np.int64),
        "flat_tail": np.array([D], np.int64),
        "attn_scale": np.float32(1.0 / np.sqrt(DH)),
        "half": np.float32(0.5),
    })
    nodes += [
        ob.node("Shape", ["x0"], ["xsh"]),
        ob.node("Gather", ["xsh", "i0"], ["bdim"], axis=0),
        ob.node("Gather", ["xsh", "i1"], ["tdim"], axis=0),
        ob.node("Unsqueeze", ["bdim", "ax0"], ["bu"]),
        ob.node("Unsqueeze", ["tdim", "ax0"], ["tu"]),
        # [B, T, HEADS, DH] and [B, T, D] reshape targets
        ob.node("Concat", ["bu", "tu", "heads_tail"], ["hd_shape"], axis=0),
        ob.node("Concat", ["bu", "tu", "flat_tail"], ["fl_shape"], axis=0),
    ]

    x = "x0"
    for li in range(L):
        p = f"l{li}"

        def q(tag, x_in, shape, out):
            w, s = _int8_w(rng, shape)
            n, i = _qmatmul(f"{p}_{tag}", x_in, w, s, out)
            nodes.extend(n)
            inits.update(i)

        # --- macaron FFN 1 (half-step residual) ---
        g = rng.standard_normal(D).astype(np.float32) * 0.1 + 1.0
        b = np.zeros(D, np.float32)
        inits[f"{p}_ff1g"], inits[f"{p}_ff1b"] = g, b
        nodes += _ln(p, x, f"{p}_ff1g", f"{p}_ff1b", f"{p}_ff1n")
        q("ff1a", f"{p}_ff1n", (D, FF), f"{p}_ff1h")
        nodes += _swish(f"{p}_ff1", f"{p}_ff1h", f"{p}_ff1s")
        q("ff1b2", f"{p}_ff1s", (FF, D), f"{p}_ff1o")
        nodes += [ob.node("Mul", [f"{p}_ff1o", "half"], [f"{p}_ff1hf"]),
                  ob.node("Add", [x, f"{p}_ff1hf"], [f"{p}_x1"])]

        # --- MHSA ---
        inits[f"{p}_mhg"] = rng.standard_normal(D).astype(np.float32) * 0.1 + 1.0
        inits[f"{p}_mhb"] = np.zeros(D, np.float32)
        nodes += _ln(p, f"{p}_x1", f"{p}_mhg", f"{p}_mhb", f"{p}_mhn")
        for t in ("q", "k", "v"):
            q(f"w{t}", f"{p}_mhn", (D, D), f"{p}_{t}f")
            nodes += [
                ob.node("Reshape", [f"{p}_{t}f", "hd_shape"], [f"{p}_{t}4"]),
                ob.node("Transpose", [f"{p}_{t}4"], [f"{p}_{t}h"],
                        perm=[0, 2, 1, 3]),  # [B, H, T, DH]
            ]
        nodes += [
            ob.node("Transpose", [f"{p}_kh"], [f"{p}_kT"], perm=[0, 1, 3, 2]),
            ob.node("MatMul", [f"{p}_qh", f"{p}_kT"], [f"{p}_sc0"]),
            ob.node("Mul", [f"{p}_sc0", "attn_scale"], [f"{p}_sc1"]),
            ob.node("Softmax", [f"{p}_sc1"], [f"{p}_aw"], axis=-1),
            ob.node("MatMul", [f"{p}_aw", f"{p}_vh"], [f"{p}_ctx"]),
            ob.node("Transpose", [f"{p}_ctx"], [f"{p}_ctxt"], perm=[0, 2, 1, 3]),
            ob.node("Reshape", [f"{p}_ctxt", "fl_shape"], [f"{p}_ctxf"]),
        ]
        q("wo", f"{p}_ctxf", (D, D), f"{p}_attno")
        nodes += [ob.node("Add", [f"{p}_x1", f"{p}_attno"], [f"{p}_x2"])]

        # --- conv module: pw(D→2D) → GLU → dw k=9 → swish → pw(D→D) ---
        inits[f"{p}_cvg"] = rng.standard_normal(D).astype(np.float32) * 0.1 + 1.0
        inits[f"{p}_cvb"] = np.zeros(D, np.float32)
        nodes += _ln(p, f"{p}_x2", f"{p}_cvg", f"{p}_cvb", f"{p}_cvn")
        q("pw1", f"{p}_cvn", (D, 2 * D), f"{p}_pw1")
        dw = (rng.integers(-127, 128, (D, 1, 9), dtype=np.int8)
              .astype(np.float32) * (0.7 / (3.0 * 73.0)))
        inits[f"{p}_dw"] = dw
        nodes += [
            ob.node("Split", [f"{p}_pw1"], [f"{p}_ga", f"{p}_gb"],
                    axis=-1, num_outputs=2),
            ob.node("Sigmoid", [f"{p}_gb"], [f"{p}_gs"]),
            ob.node("Mul", [f"{p}_ga", f"{p}_gs"], [f"{p}_glu"]),
            ob.node("Transpose", [f"{p}_glu"], [f"{p}_gluT"], perm=[0, 2, 1]),
            ob.node("Conv", [f"{p}_gluT", f"{p}_dw"], [f"{p}_dwo"],
                    group=D, kernel_shape=[9], pads=[4, 4]),
            ob.node("Transpose", [f"{p}_dwo"], [f"{p}_dwT"], perm=[0, 2, 1]),
        ]
        nodes += _swish(f"{p}_cv", f"{p}_dwT", f"{p}_cvs")
        q("pw2", f"{p}_cvs", (D, D), f"{p}_cvo")
        nodes += [ob.node("Add", [f"{p}_x2", f"{p}_cvo"], [f"{p}_x3"])]

        # --- macaron FFN 2 ---
        inits[f"{p}_ff2g"] = rng.standard_normal(D).astype(np.float32) * 0.1 + 1.0
        inits[f"{p}_ff2b"] = np.zeros(D, np.float32)
        nodes += _ln(p, f"{p}_x3", f"{p}_ff2g", f"{p}_ff2b", f"{p}_ff2n")
        q("ff2a", f"{p}_ff2n", (D, FF), f"{p}_ff2h")
        nodes += _swish(f"{p}_ff2", f"{p}_ff2h", f"{p}_ff2s")
        q("ff2b2", f"{p}_ff2s", (FF, D), f"{p}_ff2o")
        nodes += [ob.node("Mul", [f"{p}_ff2o", "half"], [f"{p}_ff2hf"]),
                  ob.node("Add", [f"{p}_x3", f"{p}_ff2hf"], [f"{p}_x4"])]
        x = f"{p}_x4"

    # final LN + [B, T', D] → [B, D, T'] (NeMo encoder output layout)
    inits["fin_g"] = np.ones(D, np.float32)
    inits["fin_b"] = np.zeros(D, np.float32)
    nodes += _ln("fin", x, "fin_g", "fin_b", "xf")
    nodes += [ob.node("Transpose", ["xf"], ["outputs"], perm=[0, 2, 1])]

    ob.write_model(path, nodes,
                   [("audio_signal", F32, [None, 80, None]),
                    ("length", I64, [None])],
                   [("outputs", F32, [None, D, None])], inits)
    return path


def make_parakeet_sized_decoder_joint(path, D=1024, H=640, V=1024, n_dur=5,
                                      blank_bias=1.0, seed=1):
    """LSTM-640 prediction net + 640-wide joint, the onnx-asr
    decoder_joint contract (frame, targets, states → joint logits).

    blank_bias is added to the blank logit (index V) so random-weight
    greedy decoding emits tokens at a realistic rate instead of the
    max-symbols-per-frame worst case. Calibrated empirically: +1.0 gives
    ~2.5 emitted tokens per audio second (~real ASR rate; ~70-85 tokens
    per 30 s chunk), +2.0 already silences everything — keeping the
    measured while_loop trip count honest for the product."""
    rng = np.random.default_rng(seed)
    VO = V + 1 + n_dur
    emb = (rng.standard_normal((V + 1, H)) * 0.3).astype(np.float32)
    W = (rng.standard_normal((1, 4 * H, H)) * (0.5 / np.sqrt(H))).astype(np.float32)
    R = (rng.standard_normal((1, 4 * H, H)) * (0.5 / np.sqrt(H))).astype(np.float32)
    Bb = np.zeros((1, 8 * H), np.float32)
    w_enc, s_enc = _int8_w(rng, (D, H))
    w_pred, s_pred = _int8_w(rng, (H, H))
    w_out, s_out = _int8_w(rng, (H, VO))

    nodes = [
        # frame [B, D, 1] → [B, D]
        ob.node("Squeeze", ["encoder_outputs", "ax2"], ["frame"]),
        # prediction net: embed last target, one LSTM step with carried state
        ob.node("Gather", ["emb", "targets"], ["et"], axis=0),   # [B, 1, H]
        ob.node("Transpose", ["et"], ["etT"], perm=[1, 0, 2]),   # [1, B, H]
        ob.node("LSTM", ["etT", "W", "R", "Bb", "", "input_states_1",
                         "input_states_2"],
                ["lstm_y", "output_states_1", "output_states_2"],
                hidden_size=H),
        # Y [T=1, D=1, B, H] → pred [B, H]
        ob.node("Squeeze", ["lstm_y", "ax01"], ["pred"]),
    ]
    inits = {
        "emb": emb, "W": W, "R": R, "Bb": Bb,
        "ax2": np.array([2], np.int64), "ax01": np.array([0, 1], np.int64),
        "ax1": np.array([1], np.int64),
    }
    n1, i1 = _qmatmul("je", "frame", w_enc, s_enc, "jenc")
    n2, i2 = _qmatmul("jp", "pred", w_pred, s_pred, "jpred")
    nodes += n1 + n2
    inits.update(i1)
    inits.update(i2)
    nodes += [
        ob.node("Add", ["jenc", "jpred"], ["jsum"]),
        ob.node("Relu", ["jsum"], ["jact"]),
    ]
    n3, i3 = _qmatmul("jo", "jact", w_out, s_out, "jlog0")
    nodes += n3
    inits.update(i3)
    out_bias = np.zeros(VO, np.float32)
    out_bias[V] = blank_bias
    inits["jbias"] = out_bias
    nodes += [
        ob.node("Add", ["jlog0", "jbias"], ["jlog"]),
        ob.node("Unsqueeze", ["jlog", "ax1"], ["j3"]),
        ob.node("Unsqueeze", ["j3", "ax1"], ["outputs"]),  # [B, 1, 1, VO]
    ]
    ob.write_model(path, nodes,
                   [("encoder_outputs", F32, [None, D, 1]),
                    ("targets", I32, [None, 1]),
                    ("target_length", I32, [None]),
                    ("input_states_1", F32, [1, None, H]),
                    ("input_states_2", F32, [1, None, H])],
                   [("outputs", F32, [None, 1, 1, VO]),
                    ("output_states_1", F32, [1, None, H]),
                    ("output_states_2", F32, [1, None, H])], inits)
    return path


def make_parakeet_sized_bundle(d, D=1024, L=24, FF=4096, HEADS=8, H=640,
                               V=1024, seed=0):
    d = Path(d)
    d.mkdir(parents=True, exist_ok=True)
    make_parakeet_sized_encoder(d / "encoder-model.int8.onnx", D=D, L=L,
                                FF=FF, HEADS=HEADS, seed=seed)
    make_parakeet_sized_decoder_joint(d / "decoder_joint-model.int8.onnx",
                                      D=D, H=H, V=V, seed=seed + 1)
    (d / "vocab.txt").write_text(
        "\n".join(f"▁t{i}" for i in range(V)), encoding="utf-8")
    return d


# ---------------------------------------------------------------------------
# Diarization nets at real shapes
# ---------------------------------------------------------------------------

def make_pyannote_sized_segmentation(path, seed=0):
    """waveform [B,1,160000] → SincNet-as-conv stack → 4-layer BiLSTM
    h=128 → linear×2 → powerset logits [B, 589, 7] (the reference's
    frame grid: 589 frames per 10 s window)."""
    rng = np.random.default_rng(seed)
    H = 128
    nodes = [
        ob.node("Conv", ["waveform", "c1w"], ["c1"], strides=[10],
                kernel_shape=[251]),
        ob.node("InstanceNormalization", ["c1", "in1g", "in1b"], ["c1n"],
                epsilon=1e-5),
        ob.node("LeakyRelu", ["c1n"], ["c1a"], alpha=0.01),
        ob.node("MaxPool", ["c1a"], ["p1"], kernel_shape=[3], strides=[3]),
        ob.node("Conv", ["p1", "c2w"], ["c2"], kernel_shape=[5]),
        ob.node("InstanceNormalization", ["c2", "in2g", "in2b"], ["c2n"],
                epsilon=1e-5),
        ob.node("LeakyRelu", ["c2n"], ["c2a"], alpha=0.01),
        ob.node("MaxPool", ["c2a"], ["p2"], kernel_shape=[3], strides=[3]),
        ob.node("Conv", ["p2", "c3w"], ["c3"], kernel_shape=[5]),
        ob.node("InstanceNormalization", ["c3", "in3g", "in3b"], ["c3n"],
                epsilon=1e-5),
        ob.node("LeakyRelu", ["c3n"], ["c3a"], alpha=0.01),
        ob.node("MaxPool", ["c3a"], ["p3"], kernel_shape=[3], strides=[3]),
        # [B, 60, 589] → [T=589, B, 60] for LSTM layout 0
        ob.node("Transpose", ["p3"], ["t0"], perm=[2, 0, 1]),
    ]
    inits = {
        "c1w": (rng.standard_normal((80, 1, 251)) * 0.05).astype(np.float32),
        "c2w": (rng.standard_normal((60, 80, 5)) * 0.05).astype(np.float32),
        "c3w": (rng.standard_normal((60, 60, 5)) * 0.05).astype(np.float32),
    }
    for i, ch in ((1, 80), (2, 60), (3, 60)):
        inits[f"in{i}g"] = np.ones(ch, np.float32)
        inits[f"in{i}b"] = np.zeros(ch, np.float32)
    x = "t0"
    in_dim = 60
    for li in range(4):
        sc = 0.5 / np.sqrt(max(in_dim, H))
        inits[f"W{li}"] = (rng.standard_normal((2, 4 * H, in_dim)) * sc
                           ).astype(np.float32)
        inits[f"R{li}"] = (rng.standard_normal((2, 4 * H, H)) * sc
                           ).astype(np.float32)
        inits[f"B{li}"] = np.zeros((2, 8 * H), np.float32)
        nodes += [
            ob.node("LSTM", [x, f"W{li}", f"R{li}", f"B{li}"],
                    [f"y{li}", "", ""], hidden_size=H,
                    direction="bidirectional"),
            # Y [T, 2, B, H] → [T, B, 2H] (dynamic T/B via Shape)
            ob.node("Transpose", [f"y{li}"], [f"yt{li}"], perm=[0, 2, 1, 3]),
            ob.node("Shape", [f"yt{li}"], [f"sh{li}"]),
            ob.node("Gather", [f"sh{li}", "i0"], [f"td{li}"], axis=0),
            ob.node("Gather", [f"sh{li}", "i1"], [f"bd{li}"], axis=0),
            ob.node("Unsqueeze", [f"td{li}", "ax0"], [f"tu{li}"]),
            ob.node("Unsqueeze", [f"bd{li}", "ax0"], [f"bu{li}"]),
            ob.node("Concat", [f"tu{li}", f"bu{li}", "h2"], [f"tgt{li}"],
                    axis=0),
            ob.node("Reshape", [f"yt{li}", f"tgt{li}"], [f"x{li + 1}"]),
        ]
        x = f"x{li + 1}"
        in_dim = 2 * H
    inits.update({"i0": np.array(0, np.int64), "i1": np.array(1, np.int64),
                  "ax0": np.array([0], np.int64),
                  "h2": np.array([2 * H], np.int64),
                  "l1w": (rng.standard_normal((2 * H, H)) * 0.08).astype(np.float32),
                  "l2w": (rng.standard_normal((H, H)) * 0.08).astype(np.float32),
                  "clw": (rng.standard_normal((H, 7)) * 0.2).astype(np.float32),
                  "clb": np.zeros(7, np.float32)})
    nodes += [
        ob.node("MatMul", [x, "l1w"], ["l1"]),
        ob.node("LeakyRelu", ["l1"], ["l1a"], alpha=0.01),
        ob.node("MatMul", ["l1a", "l2w"], ["l2"]),
        ob.node("LeakyRelu", ["l2"], ["l2a"], alpha=0.01),
        ob.node("MatMul", ["l2a", "clw"], ["cl"]),
        ob.node("Add", ["cl", "clb"], ["cl2"]),
        # [T, B, 7] → [B, T, 7]
        ob.node("Transpose", ["cl2"], ["logits"], perm=[1, 0, 2]),
    ]
    ob.write_model(path, nodes,
                   [("waveform", F32, [None, 1, 160000])],
                   [("logits", F32, [None, 589, 7])], inits)
    return path


def make_campplus_scale_embedding(path, C=768, emb_dim=192, seed=1):
    """'feats' [B,T,80] → TDNN stack → attentive-free stats pooling →
    'embs' [B,192]. ≈8.6 MMAC/frame, FLOP-matched to the 7.2 M-param
    CAM++ D-TDNN (whose dense connectivity changes memory traffic, not
    the MXU story)."""
    rng = np.random.default_rng(seed)
    nodes = [
        # [B, T, 80] → [B, 80, T]
        ob.node("Transpose", ["feats"], ["fT"], perm=[0, 2, 1]),
        ob.node("Conv", ["fT", "k0"], ["h0"], kernel_shape=[5], pads=[2, 2]),
        ob.node("Relu", ["h0"], ["a0"]),
    ]
    inits = {"k0": (rng.standard_normal((C, 80, 5)) * 0.04).astype(np.float32)}
    x = "a0"
    for li, dil in enumerate((2, 3, 4, 5)):
        inits[f"k{li + 1}"] = (rng.standard_normal((C, C, 3))
                               * (0.5 / np.sqrt(3 * C))).astype(np.float32)
        nodes += [
            ob.node("Conv", [x, f"k{li + 1}"], [f"h{li + 1}"],
                    kernel_shape=[3], dilations=[dil], pads=[dil, dil]),
            ob.node("Relu", [f"h{li + 1}"], [f"a{li + 1}"]),
        ]
        x = f"a{li + 1}"
    inits["kf"] = (rng.standard_normal((2 * C, C, 1)) * 0.05).astype(np.float32)
    nodes += [
        ob.node("Conv", [x, "kf"], ["hf"], kernel_shape=[1]),
        ob.node("Relu", ["hf"], ["af"]),
        # stats pooling over time: mean ++ std
        ob.node("ReduceMean", ["af"], ["mu"], axes=[2], keepdims=1),
        ob.node("Sub", ["af", "mu"], ["cen"]),
        ob.node("Mul", ["cen", "cen"], ["sq"]),
        ob.node("ReduceMean", ["sq"], ["var"], axes=[2], keepdims=0),
        ob.node("Sqrt", ["var"], ["sd"]),
        ob.node("Squeeze", ["mu", "ax2"], ["mu2"]),
        ob.node("Concat", ["mu2", "sd"], ["stats"], axis=1),
        ob.node("MatMul", ["stats", "ew"], ["embs"]),
    ]
    inits.update({"ax2": np.array([2], np.int64),
                  "ew": (rng.standard_normal((4 * C, emb_dim)) * 0.03
                         ).astype(np.float32)})
    ob.write_model(path, nodes,
                   [("feats", F32, [None, None, 80])],
                   [("embs", F32, [None, emb_dim])], inits)
    return path
