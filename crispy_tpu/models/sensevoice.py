"""SenseVoice-Small (SAN-M encoder + non-autoregressive CTC) in JAX.

The reference catalogs sense-voice-int8 (managers/model.rs, served via
transcribe-rs/ONNX). The public SenseVoice-Small recipe (FunASR family):

  frontend: 80-mel kaldi fbank → LFR stacking (m=7 frames concatenated
            every n=6) → per-dim CMVN → ×sqrt(d) scaling,
            with 4 prompt embeddings prepended (language, event, emotion,
            text-norm query tokens).
  encoder:  SAN-M blocks — self-attention whose value path carries an FSMN
            memory branch (depthwise conv over the value projections, added
            to the attention output) — first block maps the 560-d LFR input
            into the model width, then pre-LN blocks + final LN.
  head:     CTC over the multilingual SentencePiece vocabulary; decoding is
            a single non-autoregressive pass (argmax → collapse → deblank),
            dropping the prompt positions.

Sizes (layers/width/vocab) come from the real export's config; the
"test-random" config drives structural tests offline. Weight mapping lands
with real checkpoint files (models/spm decodes the vocabulary natively).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclass(frozen=True)
class SenseVoiceConfig:
    feat_dim: int = 80
    lfr_m: int = 7  # stacked frames
    lfr_n: int = 6  # stacking stride
    hidden: int = 512
    heads: int = 4
    ffn: int = 2048
    layers: int = 50
    fsmn_kernel: int = 11
    vocab_size: int = 25055
    n_prompt: int = 4  # language / event / emotion / textnorm queries
    blank_id: int = 0

    @property
    def input_dim(self) -> int:
        return self.feat_dim * self.lfr_m


CONFIGS = {
    "sense-voice-small": SenseVoiceConfig(),
    "test-random": SenseVoiceConfig(feat_dim=16, hidden=32, heads=2, ffn=64,
                                    layers=2, vocab_size=64),
}


def lfr(feats: jnp.ndarray, m: int = 7, n: int = 6) -> jnp.ndarray:
    """Low-frame-rate stacking with FunASR's left padding ((m-1)//2 copies
    of the first frame) — the single implementation shared with the
    ONNX-bundle path (dsp.asr_frontend.lfr), so both SenseVoice paths
    produce identical features for identical audio."""
    from ..dsp.asr_frontend import lfr as _lfr

    return _lfr(feats, m, n)


def sinusoidal_pe(T: int, depth: int) -> np.ndarray:
    """FunASR SinusoidalPositionEncoder: positions are 1-indexed;
    pe = [sin(pos*inv_ts) ‖ cos(pos*inv_ts)] at the INPUT width (560)."""
    positions = np.arange(1, T + 1, dtype=np.float64)[:, None]
    half = depth // 2
    log_inc = np.log(10000.0) / (half - 1)
    inv_ts = np.exp(np.arange(half, dtype=np.float64) * -log_inc)[None, :]
    scaled = positions * inv_ts
    pe = np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1)
    if pe.shape[1] < depth:  # odd depth: zero-pad the tail column
        pe = np.pad(pe, ((0, 0), (0, depth - pe.shape[1])))
    return pe.astype(np.float32)


def _ln(x, g, b, eps=1e-12):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) * g + b


def _sanm_attention(p, pre, x, cfg: SenseVoiceConfig):
    """Self-attention + FSMN memory on the value path.

    qkv from one fused projection; the memory branch is a depthwise conv
    over the (pre-head) value features with a residual, added to the
    attention output before the output projection's result."""
    B, T, _ = x.shape
    qkv = jnp.einsum("btd,de->bte", x, p[f"{pre}.qkv.w"]) + p[f"{pre}.qkv.b"]
    d = cfg.hidden
    q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]
    # FSMN memory: depthwise conv over v, residual (symmetric padding)
    fsmn = lax.conv_general_dilated(
        v, p[f"{pre}.fsmn.w"], (1,),
        [((cfg.fsmn_kernel - 1) // 2, (cfg.fsmn_kernel - 1) // 2)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=d)
    fsmn = v + fsmn

    hd = d // cfg.heads
    def heads(t):
        return t.reshape(B, T, cfg.heads, hd).swapaxes(1, 2)
    att = jnp.einsum("bhqd,bhkd->bhqk", heads(q), heads(k)) / np.sqrt(hd)
    att = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(att, axis=-1), heads(v))
    att = att.swapaxes(1, 2).reshape(B, T, d)
    # FunASR MultiHeadedAttentionSANM: fsmn memory is added AFTER the
    # output projection (att_outs + fsmn_memory), not before it
    out = jnp.einsum("btd,de->bte", att, p[f"{pre}.out.w"]) + p[f"{pre}.out.b"]
    return out + fsmn


def _block(p, pre, x, cfg: SenseVoiceConfig, residual_attn: bool):
    h = _ln(x, p[f"{pre}.ln1.g"], p[f"{pre}.ln1.b"])
    a = _sanm_attention(p, f"{pre}.attn", h, cfg)
    x = x + a if residual_attn else a  # first block changes width: no skip
    h = _ln(x, p[f"{pre}.ln2.g"], p[f"{pre}.ln2.b"])
    h = jax.nn.relu(jnp.einsum("btd,de->bte", h, p[f"{pre}.fc1.w"]) + p[f"{pre}.fc1.b"])
    return x + jnp.einsum("bte,ed->btd", h, p[f"{pre}.fc2.w"]) + p[f"{pre}.fc2.b"]


def encode(p, cfg: SenseVoiceConfig, feats: jnp.ndarray,
           prompt_ids: jnp.ndarray) -> jnp.ndarray:
    """fbank [B, T, feat_dim] + prompt ids [n_prompt] → [B, P+T', d].

    FunASR SenseVoiceSmall order: LFR → CMVN → concat the INPUT-width
    (560-d) query embeddings BEFORE the encoder → ×sqrt(d) scale →
    sinusoidal PE (1-indexed positions, input width) → encoders0
    (560→d, no attention residual) → pre-LN SAN-M blocks → after-norm.
    """
    x = lfr(feats, cfg.lfr_m, cfg.lfr_n)
    x = (x - p["cmvn.mean"]) * p["cmvn.istd"]
    prompt = p["embed"][prompt_ids][None].repeat(x.shape[0], axis=0)
    x = jnp.concatenate([prompt, x], axis=1)  # queries ride through enc.0
    x = x * np.sqrt(cfg.hidden).astype(np.float32)
    x = x + jnp.asarray(sinusoidal_pe(x.shape[1], cfg.input_dim))
    x = _block(p, "enc.0", x, cfg, residual_attn=False)  # 560 → d
    for i in range(1, cfg.layers):
        x = _block(p, f"enc.{i}", x, cfg, residual_attn=True)
    return _ln(x, p["enc.ln.g"], p["enc.ln.b"])


@functools.partial(jax.jit, static_argnames=("cfg",))
def ctc_logits(p, cfg: SenseVoiceConfig, feats: jnp.ndarray,
               prompt_ids: jnp.ndarray) -> jnp.ndarray:
    x = encode(p, cfg, feats, prompt_ids)
    return jnp.einsum("btd,dv->btv", x, p["ctc.w"]) + p["ctc.b"]


def ctc_greedy(logits: np.ndarray, cfg: SenseVoiceConfig) -> List[List[int]]:
    """argmax → drop prompt positions → collapse repeats → deblank."""
    ids = np.asarray(logits).argmax(-1)[:, cfg.n_prompt:]
    out = []
    for row in ids:
        toks, prev = [], -1
        for t in row:
            if t != prev and t != cfg.blank_id:
                toks.append(int(t))
            prev = t
        out.append(toks)
    return out


def init_random(cfg: SenseVoiceConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)

    def w(*shape):
        return (rng.standard_normal(shape) / np.sqrt(max(shape[0], 1))).astype(np.float32)

    d = cfg.hidden
    p: Dict[str, np.ndarray] = {
        "cmvn.mean": np.zeros(cfg.input_dim, np.float32),
        "cmvn.istd": np.ones(cfg.input_dim, np.float32),
        # query-embedding table at the INPUT width (FunASR: nn.Embedding
        # to input_size=560; prompts pass through encoders0 like speech)
        "embed": (rng.standard_normal((cfg.vocab_size, cfg.input_dim)) * 0.02
                  ).astype(np.float32),
        "enc.ln.g": np.ones(d, np.float32), "enc.ln.b": np.zeros(d, np.float32),
        "ctc.w": w(d, cfg.vocab_size), "ctc.b": np.zeros(cfg.vocab_size, np.float32),
    }
    for i in range(cfg.layers):
        pre = f"enc.{i}"
        in_d = cfg.input_dim if i == 0 else d
        p[f"{pre}.attn.qkv.w"] = w(in_d, 3 * d)
        p[f"{pre}.attn.qkv.b"] = np.zeros(3 * d, np.float32)
        p[f"{pre}.attn.fsmn.w"] = w(cfg.fsmn_kernel, 1, d)
        p[f"{pre}.attn.out.w"] = w(d, d)
        p[f"{pre}.attn.out.b"] = np.zeros(d, np.float32)
        p[f"{pre}.ln1.g"] = np.ones(in_d, np.float32)
        p[f"{pre}.ln1.b"] = np.zeros(in_d, np.float32)
        p[f"{pre}.ln2.g"] = np.ones(d, np.float32)
        p[f"{pre}.ln2.b"] = np.zeros(d, np.float32)
        p[f"{pre}.fc1.w"] = w(d, cfg.ffn)
        p[f"{pre}.fc1.b"] = np.zeros(cfg.ffn, np.float32)
        p[f"{pre}.fc2.w"] = w(cfg.ffn, d)
        p[f"{pre}.fc2.b"] = np.zeros(d, np.float32)
    return p
