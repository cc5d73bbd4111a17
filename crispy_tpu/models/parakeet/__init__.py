"""Parakeet (FastConformer) ASR in pure JAX.

The reference's recommended-first model family (parakeet-tdt-0.6b-v2/v3,
managers/model.rs:153-190; commands/models.rs:140-146) served through
transcribe-rs/ONNX. TPU-native implementation of the public architecture:

  encoder (FastConformer): mel [B, T, 80] → 8x conv2d subsampling (relu,
      depthwise-separable) → linear → x sqrt(d) → conformer blocks
      (half-step FFN · Transformer-XL relative-position attention with
      global content/position biases · GLU-depthwise-BN-silu conv module ·
      half-step FFN · LayerNorm), interleaved sin/cos relative encodings.
  CTC head: 1x1 conv to vocab+blank; greedy collapse decode.
  TDT head (token-and-duration transducer): LSTM prediction network +
      additive joint with separate token/duration logits; greedy decode
      advances time by the predicted duration (Xu et al., 2023).

Encoder and CTC verified against transformers' ParakeetForCTC with random
weights. TDT weights load from a documented flat schema (NeMo/ONNX export
mapping lands with real checkpoints; see models/onnx_import).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclass(frozen=True)
class ParakeetConfig:
    n_mels: int = 80
    hidden_size: int = 1024
    layers: int = 24
    heads: int = 8
    kv_heads: int = 8
    intermediate_size: int = 4096
    conv_kernel: int = 9
    sub_channels: int = 256
    sub_factor: int = 8
    vocab_size: int = 1025  # incl. blank (last id)
    # TDT decoder
    pred_hidden: int = 640
    joint_hidden: int = 640
    durations: Tuple[int, ...] = (0, 1, 2, 3, 4)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.heads

    @property
    def blank_id(self) -> int:
        return self.vocab_size - 1


CONFIGS = {
    "parakeet-tdt-0.6b": ParakeetConfig(hidden_size=1024, layers=24, heads=8,
                                        intermediate_size=4096, vocab_size=1025),
    "test-random": ParakeetConfig(hidden_size=64, layers=2, heads=2, kv_heads=2,
                                  intermediate_size=128, sub_channels=32,
                                  vocab_size=128, pred_hidden=32, joint_hidden=32),
}


def _ln(x, g, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) * g + b


def _linear(p, name, x):
    w = p[f"{name}.w"]
    y = jnp.einsum("...d,de->...e", x, w)
    b = p.get(f"{name}.b")
    return y if b is None else y + b


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _subsample(p, cfg: ParakeetConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, T, n_mels] → [B, T/8, d] via 3 stride-2 conv2d stages."""
    x = mel[..., None]  # NHWC: [B, T, M, 1]
    n_stages = int(np.log2(cfg.sub_factor))
    x = jax.nn.relu(lax.conv_general_dilated(
        x, p["sub.0.w"], (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["sub.0.b"])
    for i in range(1, n_stages):
        x = lax.conv_general_dilated(
            x, p[f"sub.{i}.dw.w"], (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=cfg.sub_channels) + p[f"sub.{i}.dw.b"]
        x = jax.nn.relu(lax.conv_general_dilated(
            x, p[f"sub.{i}.pw.w"], (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p[f"sub.{i}.pw.b"])
    # torch flattens channel-major: [B, T', C, M'] → [B, T', C*M']
    B, T, M, C = x.shape
    x = x.transpose(0, 1, 3, 2).reshape(B, T, C * M)
    return _linear(p, "sub.linear", x)


def _rel_pos_embed(cfg: ParakeetConfig, T: int) -> np.ndarray:
    """Interleaved sin/cos over positions T-1 .. -(T-1): [2T-1, d]."""
    d = cfg.hidden_size
    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2, dtype=np.float64) / d))
    pos = np.arange(T - 1, -T, -1, dtype=np.float64)
    fr = pos[:, None] * inv[None, :]
    emb = np.stack([np.sin(fr), np.cos(fr)], axis=-1).reshape(2 * T - 1, d)
    return emb.astype(np.float32)


def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Transformer-XL relative shift: [B, H, T, P] with P = 2T-1."""
    B, H, T, P = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(B, H, P + 1, T)[:, :, 1:, :]
    return x.reshape(B, H, T, P)


def _conformer_attn(p, cfg: ParakeetConfig, pre: str, x: jnp.ndarray,
                    pos_embed: jnp.ndarray) -> jnp.ndarray:
    B, T, _ = x.shape
    H, hd = cfg.heads, cfg.head_dim
    scale = hd ** -0.5

    def heads(t, n):
        return t.reshape(B, T, n, hd).transpose(0, 2, 1, 3)

    q = heads(_linear(p, f"{pre}.q", x), H)
    k = heads(_linear(p, f"{pre}.k", x), cfg.kv_heads)
    v = heads(_linear(p, f"{pre}.v", x), cfg.kv_heads)
    if cfg.kv_heads != H:
        rep = H // cfg.kv_heads
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    rel_k = _linear(p, f"{pre}.rel_k", pos_embed)  # [2T-1, H*hd]
    rel_k = rel_k.reshape(-1, H, hd)
    qu = q + p[f"{pre}.bias_u"][None, :, None, :]
    qv = q + p[f"{pre}.bias_v"][None, :, None, :]
    ac = jnp.einsum("bhtd,bhsd->bhts", qu, k) * scale
    bd = jnp.einsum("bhtd,phd->bhtp", qv, rel_k)
    bd = _rel_shift(bd)[..., :T] * scale
    w = jax.nn.softmax(ac + bd, axis=-1)
    o = jnp.einsum("bhts,bhsd->bhtd", w, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, T, H * hd)
    return _linear(p, f"{pre}.o", o)


def _conv_module(p, cfg: ParakeetConfig, pre: str, x: jnp.ndarray) -> jnp.ndarray:
    h = _linear(p, f"{pre}.pw1", x)  # [B, T, 2d]
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)  # GLU over the channel halves
    pad = (cfg.conv_kernel - 1) // 2
    h = lax.conv_general_dilated(
        h, p[f"{pre}.dw.w"], (1,), [(pad, pad)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=cfg.hidden_size) + p[f"{pre}.dw.b"]
    # BatchNorm in inference mode (running stats)
    h = (h - p[f"{pre}.bn.mean"]) * lax.rsqrt(p[f"{pre}.bn.var"] + 1e-5)
    h = h * p[f"{pre}.bn.g"] + p[f"{pre}.bn.b"]
    h = jax.nn.silu(h)
    return _linear(p, f"{pre}.pw2", h)


def _ff(p, pre, x):
    return _linear(p, f"{pre}.fc2", jax.nn.silu(_linear(p, f"{pre}.fc1", x)))


def encode(p, cfg: ParakeetConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, T, n_mels] → [B, T/8, d]."""
    x = _subsample(p, cfg, mel) * np.sqrt(cfg.hidden_size).astype(np.float32)
    T = x.shape[1]
    pos = jnp.asarray(_rel_pos_embed(cfg, T))
    for i in range(cfg.layers):
        pre = f"enc.{i}"
        x = x + 0.5 * _ff(p, f"{pre}.ff1",
                          _ln(x, p[f"{pre}.ln_ff1.g"], p[f"{pre}.ln_ff1.b"]))
        x = x + _conformer_attn(p, cfg, f"{pre}.attn",
                                _ln(x, p[f"{pre}.ln_att.g"], p[f"{pre}.ln_att.b"]), pos)
        x = x + _conv_module(p, cfg, f"{pre}.conv",
                             _ln(x, p[f"{pre}.ln_conv.g"], p[f"{pre}.ln_conv.b"]))
        x = x + 0.5 * _ff(p, f"{pre}.ff2",
                          _ln(x, p[f"{pre}.ln_ff2.g"], p[f"{pre}.ln_ff2.b"]))
        x = _ln(x, p[f"{pre}.ln_out.g"], p[f"{pre}.ln_out.b"])
    return x


# ---------------------------------------------------------------------------
# CTC
# ---------------------------------------------------------------------------

def ctc_logits(p, cfg: ParakeetConfig, mel: jnp.ndarray) -> jnp.ndarray:
    return _linear(p, "ctc", encode(p, cfg, mel))


def ctc_greedy(logits: np.ndarray, blank_id: int) -> List[List[int]]:
    """argmax → collapse repeats → drop blanks."""
    ids = np.asarray(logits).argmax(-1)
    out = []
    for row in np.atleast_2d(ids):
        toks, prev = [], -1
        for t in row:
            if t != prev and t != blank_id:
                toks.append(int(t))
            prev = t
        out.append(toks)
    return out


# ---------------------------------------------------------------------------
# TDT transducer (prediction LSTM + additive joint + duration head)
# ---------------------------------------------------------------------------

def _lstm_step(p, pre, x, h, c):
    gates = _linear(p, f"{pre}.ih", x) + _linear(p, f"{pre}.hh", h)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def _joint(p, cfg: ParakeetConfig, enc_t: jnp.ndarray, pred_h: jnp.ndarray):
    """Additive joint → (token logits [.., V], duration logits [.., D])."""
    j = jax.nn.relu(_linear(p, "joint.enc", enc_t) + _linear(p, "joint.pred", pred_h))
    out = _linear(p, "joint.out", j)  # [.., V + D]
    return out[..., : cfg.vocab_size], out[..., cfg.vocab_size:]


@functools.partial(jax.jit, static_argnames=("cfg", "max_symbols"))
def tdt_greedy_decode(p, cfg: ParakeetConfig, mel: jnp.ndarray, max_symbols: int = 256):
    """Batched greedy TDT decode: time advances by the predicted duration;
    the prediction LSTM advances only on non-blank emissions."""
    enc = encode(p, cfg, mel)  # [B, T, d]
    B, T, _ = enc.shape
    blank = cfg.blank_id
    durs = jnp.asarray(np.array(cfg.durations, np.int32))

    # iteration bound: every frame may emit up to ~max-symbols-per-frame
    # tokens plus one advancing blank — bounding by max_symbols alone
    # would stop mid-utterance on long chunks (T can exceed max_symbols)
    max_iters = T + max_symbols

    def cond(state):
        i, t, h, c, y, toks, n = state
        return jnp.logical_and(i < max_iters, jnp.any(t < T))

    def body(state):
        i, t, h, c, y, toks, n = state
        tc = jnp.minimum(t, T - 1)
        enc_t = jnp.take_along_axis(enc, tc[:, None, None], axis=1)[:, 0]
        tok_logits, dur_logits = _joint(p, cfg, enc_t, h)
        tok = jnp.argmax(tok_logits, axis=-1).astype(jnp.int32)
        dur = durs[jnp.argmax(dur_logits, axis=-1)]
        active = t < T
        emit = active & (tok != blank)
        # prediction network advances on emission
        emb = p["pred.emb"][jnp.where(emit, tok, 0)]
        h2, c2 = _lstm_step(p, "pred.lstm", emb, h, c)
        h = jnp.where(emit[:, None], h2, h)
        c = jnp.where(emit[:, None], c2, c)
        toks = toks.at[jnp.arange(B), jnp.minimum(n, max_symbols - 1)].set(
            jnp.where(emit, tok, blank))
        n = jnp.minimum(n + emit.astype(jnp.int32), max_symbols)
        # time advances by duration (>=1 forced on blank-with-0 to progress)
        step = jnp.where(active, jnp.maximum(dur, jnp.where(emit, 0, 1)), 0)
        t = t + step
        return i + 1, t, h, c, y, toks, n

    init = (
        jnp.int32(0), jnp.zeros(B, jnp.int32),
        jnp.zeros((B, cfg.pred_hidden), jnp.float32),
        jnp.zeros((B, cfg.pred_hidden), jnp.float32),
        jnp.int32(0),
        jnp.full((B, max_symbols), blank, jnp.int32),
        jnp.zeros(B, jnp.int32),
    )
    _, _, _, _, _, toks, n = lax.while_loop(cond, body, init)
    return toks, n


# ---------------------------------------------------------------------------
# Weights
# ---------------------------------------------------------------------------

def from_hf_ctc_state_dict(sd: Dict[str, np.ndarray]) -> Tuple[Dict[str, np.ndarray], ParakeetConfig]:
    """Map transformers ParakeetForCTC weights to our schema."""
    def get(name):
        for k in (name, f"model.{name}"):
            if k in sd:
                return np.asarray(sd[k]).astype(np.float32)
        raise KeyError(name)

    sub0 = get("encoder.subsampling.layers.0.weight")  # [C, 1, k, k]
    C = sub0.shape[0]
    lin = get("encoder.subsampling.linear.weight")
    d = lin.shape[0]
    n_layers = sum(1 for k in sd if k.endswith(".self_attn.q_proj.weight"))
    heads_bias = get("encoder.layers.0.self_attn.bias_u")
    H, hd = heads_bias.shape
    kv = get("encoder.layers.0.self_attn.k_proj.weight").shape[0] // hd
    ctc_w = get("ctc_head.weight")  # [V, d, 1]
    cfg = ParakeetConfig(
        hidden_size=d, layers=n_layers, heads=H, kv_heads=kv,
        intermediate_size=get("encoder.layers.0.feed_forward1.linear1.weight").shape[0],
        conv_kernel=get("encoder.layers.0.conv.depthwise_conv.weight").shape[-1],
        sub_channels=C, vocab_size=ctc_w.shape[0],
    )

    p: Dict[str, np.ndarray] = {
        # torch conv2d [out, in, kh, kw] → HWIO
        "sub.0.w": sub0.transpose(2, 3, 1, 0), "sub.0.b": get("encoder.subsampling.layers.0.bias"),
        "sub.linear.w": lin.T, "sub.linear.b": get("encoder.subsampling.linear.bias"),
        "ctc.w": ctc_w[:, :, 0].T, "ctc.b": get("ctc_head.bias"),
    }
    # remaining subsampling stages at module indices 2,3 / 5,6 (relu between)
    n_stages = int(np.log2(cfg.sub_factor))
    for i in range(1, n_stages):
        base = 3 * i - 1
        p[f"sub.{i}.dw.w"] = get(f"encoder.subsampling.layers.{base}.weight").transpose(2, 3, 1, 0)
        p[f"sub.{i}.dw.b"] = get(f"encoder.subsampling.layers.{base}.bias")
        p[f"sub.{i}.pw.w"] = get(f"encoder.subsampling.layers.{base + 1}.weight").transpose(2, 3, 1, 0)
        p[f"sub.{i}.pw.b"] = get(f"encoder.subsampling.layers.{base + 1}.bias")

    for i in range(n_layers):
        t = f"encoder.layers.{i}"
        o = f"enc.{i}"
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("o", "o_proj")):
            p[f"{o}.attn.{ours}.w"] = get(f"{t}.self_attn.{theirs}.weight").T
            p[f"{o}.attn.{ours}.b"] = get(f"{t}.self_attn.{theirs}.bias")
        p[f"{o}.attn.rel_k.w"] = get(f"{t}.self_attn.relative_k_proj.weight").T
        p[f"{o}.attn.bias_u"] = get(f"{t}.self_attn.bias_u")
        p[f"{o}.attn.bias_v"] = get(f"{t}.self_attn.bias_v")
        for ff, tff in (("ff1", "feed_forward1"), ("ff2", "feed_forward2")):
            p[f"{o}.{ff}.fc1.w"] = get(f"{t}.{tff}.linear1.weight").T
            p[f"{o}.{ff}.fc1.b"] = get(f"{t}.{tff}.linear1.bias")
            p[f"{o}.{ff}.fc2.w"] = get(f"{t}.{tff}.linear2.weight").T
            p[f"{o}.{ff}.fc2.b"] = get(f"{t}.{tff}.linear2.bias")
        p[f"{o}.conv.pw1.w"] = get(f"{t}.conv.pointwise_conv1.weight")[:, :, 0].T
        p[f"{o}.conv.pw1.b"] = get(f"{t}.conv.pointwise_conv1.bias")
        # torch depthwise conv1d [C, 1, k] → HIO [k, 1, C]
        p[f"{o}.conv.dw.w"] = get(f"{t}.conv.depthwise_conv.weight").transpose(2, 1, 0)
        p[f"{o}.conv.dw.b"] = get(f"{t}.conv.depthwise_conv.bias")
        p[f"{o}.conv.bn.g"] = get(f"{t}.conv.norm.weight")
        p[f"{o}.conv.bn.b"] = get(f"{t}.conv.norm.bias")
        p[f"{o}.conv.bn.mean"] = get(f"{t}.conv.norm.running_mean")
        p[f"{o}.conv.bn.var"] = get(f"{t}.conv.norm.running_var")
        p[f"{o}.conv.pw2.w"] = get(f"{t}.conv.pointwise_conv2.weight")[:, :, 0].T
        p[f"{o}.conv.pw2.b"] = get(f"{t}.conv.pointwise_conv2.bias")
        for ln, tln in (("ln_ff1", "norm_feed_forward1"), ("ln_att", "norm_self_att"),
                        ("ln_conv", "norm_conv"), ("ln_ff2", "norm_feed_forward2"),
                        ("ln_out", "norm_out")):
            p[f"{o}.{ln}.g"] = get(f"{t}.{tln}.weight")
            p[f"{o}.{ln}.b"] = get(f"{t}.{tln}.bias")
    return p, cfg


def init_random(cfg: ParakeetConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    """Random params for tests: encoder + CTC + TDT heads."""
    rng = np.random.default_rng(seed)

    def w(*shape):
        return (rng.standard_normal(shape) / np.sqrt(max(shape[0], 1))).astype(np.float32)

    d, C, it = cfg.hidden_size, cfg.sub_channels, cfg.intermediate_size
    mel_out = cfg.n_mels // cfg.sub_factor
    p = {
        "sub.0.w": w(3, 3, 1, C), "sub.0.b": np.zeros(C, np.float32),
        "sub.linear.w": w(C * mel_out, d), "sub.linear.b": np.zeros(d, np.float32),
        "ctc.w": w(d, cfg.vocab_size), "ctc.b": np.zeros(cfg.vocab_size, np.float32),
        "pred.emb": w(cfg.vocab_size, cfg.pred_hidden),
        "pred.lstm.ih.w": w(cfg.pred_hidden, 4 * cfg.pred_hidden),
        "pred.lstm.ih.b": np.zeros(4 * cfg.pred_hidden, np.float32),
        "pred.lstm.hh.w": w(cfg.pred_hidden, 4 * cfg.pred_hidden),
        "pred.lstm.hh.b": np.zeros(4 * cfg.pred_hidden, np.float32),
        "joint.enc.w": w(d, cfg.joint_hidden), "joint.enc.b": np.zeros(cfg.joint_hidden, np.float32),
        "joint.pred.w": w(cfg.pred_hidden, cfg.joint_hidden),
        "joint.pred.b": np.zeros(cfg.joint_hidden, np.float32),
        "joint.out.w": w(cfg.joint_hidden, cfg.vocab_size + len(cfg.durations)),
        "joint.out.b": np.zeros(cfg.vocab_size + len(cfg.durations), np.float32),
    }
    for i in range(1, int(np.log2(cfg.sub_factor))):
        p[f"sub.{i}.dw.w"] = w(3, 3, 1, C)
        p[f"sub.{i}.dw.b"] = np.zeros(C, np.float32)
        p[f"sub.{i}.pw.w"] = w(1, 1, C, C)
        p[f"sub.{i}.pw.b"] = np.zeros(C, np.float32)
    for i in range(cfg.layers):
        o = f"enc.{i}"
        for proj in ("q", "o"):
            p[f"{o}.attn.{proj}.w"] = w(d, d)
            p[f"{o}.attn.{proj}.b"] = np.zeros(d, np.float32)
        for proj in ("k", "v"):
            p[f"{o}.attn.{proj}.w"] = w(d, cfg.kv_heads * cfg.head_dim)
            p[f"{o}.attn.{proj}.b"] = np.zeros(cfg.kv_heads * cfg.head_dim, np.float32)
        p[f"{o}.attn.rel_k.w"] = w(d, d)
        p[f"{o}.attn.bias_u"] = np.zeros((cfg.heads, cfg.head_dim), np.float32)
        p[f"{o}.attn.bias_v"] = np.zeros((cfg.heads, cfg.head_dim), np.float32)
        for ff in ("ff1", "ff2"):
            p[f"{o}.{ff}.fc1.w"] = w(d, it)
            p[f"{o}.{ff}.fc1.b"] = np.zeros(it, np.float32)
            p[f"{o}.{ff}.fc2.w"] = w(it, d)
            p[f"{o}.{ff}.fc2.b"] = np.zeros(d, np.float32)
        p[f"{o}.conv.pw1.w"] = w(d, 2 * d)
        p[f"{o}.conv.pw1.b"] = np.zeros(2 * d, np.float32)
        p[f"{o}.conv.dw.w"] = w(cfg.conv_kernel, 1, d)
        p[f"{o}.conv.dw.b"] = np.zeros(d, np.float32)
        p[f"{o}.conv.bn.g"] = np.ones(d, np.float32)
        p[f"{o}.conv.bn.b"] = np.zeros(d, np.float32)
        p[f"{o}.conv.bn.mean"] = np.zeros(d, np.float32)
        p[f"{o}.conv.bn.var"] = np.ones(d, np.float32)
        p[f"{o}.conv.pw2.w"] = w(d, d)
        p[f"{o}.conv.pw2.b"] = np.zeros(d, np.float32)
        for ln in ("ln_ff1", "ln_att", "ln_conv", "ln_ff2", "ln_out"):
            p[f"{o}.{ln}.g"] = np.ones(d, np.float32)
            p[f"{o}.{ln}.b"] = np.zeros(d, np.float32)
    return p
