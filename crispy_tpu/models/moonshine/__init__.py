"""Moonshine ASR in pure JAX (raw-waveform encoder-decoder).

The reference serves Moonshine through transcribe-rs/ONNX
(managers/transcription.rs:137: MoonshineModel(Base)); this is the
TPU-native implementation of the public architecture:

  encoder: raw 16 kHz audio → conv(127, s64, no bias)+tanh → groupnorm →
           conv(7, s3)+gelu → conv(3, s2)+gelu → pre-LN transformer with
           partial interleaved RoPE (rotary_dim = 0.9 * head_dim, pairs
           (2i, 2i+1) rotated by freq i), bias-free LayerNorms.
  decoder: token embedding → pre-LN blocks: causal RoPE self-attn,
           cross-attn, SwiGLU-style MLP (fc1 → chunk → silu(gate)*h → fc2),
           untied proj_out head. eos = 2, decoder_start = 1.

Weights load from HF checkpoints (safetensors/torch). Greedy decoding uses
a preallocated KV cache in a static-shape scan (same machinery shape as
models/whisper). Verified against transformers'
MoonshineForConditionalGeneration with random weights in tests.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclass(frozen=True)
class MoonshineConfig:
    vocab_size: int = 32768
    hidden_size: int = 288
    intermediate_size: int = 1152
    enc_layers: int = 6
    dec_layers: int = 6
    heads: int = 8
    partial_rotary_factor: float = 0.9
    rope_theta: float = 10000.0
    decoder_start: int = 1
    eos: int = 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.heads

    @property
    def rotary_dim(self) -> int:
        # default rope init: dim = head_dim * partial factor, floored even
        d = int(self.head_dim * self.partial_rotary_factor)
        return d - d % 2


CONFIGS = {
    "moonshine-tiny": MoonshineConfig(hidden_size=288, intermediate_size=1152,
                                      enc_layers=6, dec_layers=6, heads=8),
    "moonshine-base": MoonshineConfig(hidden_size=416, intermediate_size=1664,
                                      enc_layers=8, dec_layers=8, heads=8),
    "test-random": MoonshineConfig(vocab_size=207, hidden_size=64,
                                   intermediate_size=256, enc_layers=2,
                                   dec_layers=2, heads=2, decoder_start=205, eos=206),
}


def _rope_tables(cfg: MoonshineConfig, max_pos: int) -> Tuple[np.ndarray, np.ndarray]:
    """Interleaved partial-RoPE cos/sin: [max_pos, rotary_dim] with the
    repeat_interleave(2) layout (angle i on dims 2i, 2i+1)."""
    rd = cfg.rotary_dim
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, rd, 2, dtype=np.float64) / rd))
    freqs = np.arange(max_pos, dtype=np.float64)[:, None] * inv[None, :]  # [P, rd/2]
    # transformers builds cat(freqs, freqs) then takes the first half and
    # repeat_interleaves — net effect: angle i drives dims (2i, 2i+1).
    half = freqs[:, : rd // 2]
    cos = np.repeat(np.cos(half), 2, axis=1)
    sin = np.repeat(np.sin(half), 2, axis=1)
    return cos.astype(np.float32), sin.astype(np.float32)


def _rotate_half_interleaved(x: jnp.ndarray) -> jnp.ndarray:
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def _apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [..., T, head_dim]; cos/sin [T, rotary_dim] (broadcast over heads)."""
    rd = cos.shape[-1]
    xr, xp = x[..., :rd], x[..., rd:]
    out = xr * cos + _rotate_half_interleaved(xr) * sin
    return jnp.concatenate([out, xp], axis=-1)


def _ln(x, g, eps=1e-5):  # bias-free LayerNorm
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) * g


def _heads(x, n):
    *b, T, D = x.shape
    return x.reshape(*b, T, n, D // n).swapaxes(-3, -2)


def _merge(x):
    *b, H, T, hd = x.shape
    return x.swapaxes(-3, -2).reshape(*b, T, H * hd)


def _attn(q, k, v, scale, mask=None):
    logits = jnp.einsum("...hqd,...hkd->...hqk", q, k) * scale
    if mask is not None:
        logits = logits + mask
    return jnp.einsum("...hqk,...hkd->...hqd", jax.nn.softmax(logits, axis=-1), v)


def _proj(p, name, x):
    return jnp.einsum("...td,de->...te", x, p[f"{name}.w"])


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def encode(params, cfg: MoonshineConfig, audio: jnp.ndarray) -> jnp.ndarray:
    """audio [B, T] raw 16 kHz in [-1, 1] → features [B, T', d]."""
    x = audio[..., None]  # NHC
    x = jnp.tanh(lax.conv_general_dilated(
        x, params["enc.conv1.w"], (64,), "VALID", dimension_numbers=("NHC", "HIO", "NHC")))
    # GroupNorm(1 group) over (C, L) jointly per sample
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    x = (x - mu) * lax.rsqrt(var + 1e-5) * params["enc.gn.g"] + params["enc.gn.b"]
    x = jax.nn.gelu(lax.conv_general_dilated(
        x, params["enc.conv2.w"], (3,), "VALID", dimension_numbers=("NHC", "HIO", "NHC"))
        + params["enc.conv2.b"], approximate=False)
    x = jax.nn.gelu(lax.conv_general_dilated(
        x, params["enc.conv3.w"], (2,), "VALID", dimension_numbers=("NHC", "HIO", "NHC"))
        + params["enc.conv3.b"], approximate=False)

    T = x.shape[1]
    if T > params["rope_cos"].shape[0]:
        raise ValueError(
            f"audio too long: {T} encoder frames exceed the {params['rope_cos'].shape[0]}"
            "-position RoPE table (~64 s) — chunk the input (the pipeline "
            "transcribes 30 s chunks)")
    cos = params["rope_cos"][:T]
    sin = params["rope_sin"][:T]
    scale = cfg.head_dim ** -0.5
    for i in range(cfg.enc_layers):
        pre = f"enc.{i}"
        h = _ln(x, params[f"{pre}.ln1.g"])
        q = _apply_rope(_heads(_proj(params, f"{pre}.attn.q", h), cfg.heads), cos, sin)
        k = _apply_rope(_heads(_proj(params, f"{pre}.attn.k", h), cfg.heads), cos, sin)
        v = _heads(_proj(params, f"{pre}.attn.v", h), cfg.heads)
        x = x + _proj(params, f"{pre}.attn.o", _merge(_attn(q, k, v, scale)))
        h = _ln(x, params[f"{pre}.ln2.g"])
        h = jax.nn.gelu(jnp.einsum("...td,de->...te", h, params[f"{pre}.mlp.fc1.w"])
                        + params[f"{pre}.mlp.fc1.b"], approximate=False)
        x = x + jnp.einsum("...td,de->...te", h, params[f"{pre}.mlp.fc2.w"]) + params[f"{pre}.mlp.fc2.b"]
    return _ln(x, params["enc.ln.g"])


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _dec_mlp(params, pre, h):
    h = jnp.einsum("...td,de->...te", h, params[f"{pre}.mlp.fc1.w"]) + params[f"{pre}.mlp.fc1.b"]
    hidden, gate = jnp.split(h, 2, axis=-1)
    h = jax.nn.silu(gate) * hidden
    return jnp.einsum("...td,de->...te", h, params[f"{pre}.mlp.fc2.w"]) + params[f"{pre}.mlp.fc2.b"]


def decode_logits(params, cfg: MoonshineConfig, tokens: jnp.ndarray, audio_feats: jnp.ndarray):
    """Teacher-forced logits [B, T, V]."""
    B, T = tokens.shape
    x = params["dec.emb"][tokens]
    cos = params["rope_cos"][:T]
    sin = params["rope_sin"][:T]
    scale = cfg.head_dim ** -0.5
    mask = jnp.triu(jnp.full((T, T), -jnp.inf, jnp.float32), k=1)
    for i in range(cfg.dec_layers):
        pre = f"dec.{i}"
        h = _ln(x, params[f"{pre}.ln1.g"])
        q = _apply_rope(_heads(_proj(params, f"{pre}.attn.q", h), cfg.heads), cos, sin)
        k = _apply_rope(_heads(_proj(params, f"{pre}.attn.k", h), cfg.heads), cos, sin)
        v = _heads(_proj(params, f"{pre}.attn.v", h), cfg.heads)
        x = x + _proj(params, f"{pre}.attn.o", _merge(_attn(q, k, v, scale, mask)))
        h = _ln(x, params[f"{pre}.ln2.g"])
        q = _heads(_proj(params, f"{pre}.cross.q", h), cfg.heads)
        k = _heads(_proj(params, f"{pre}.cross.k", audio_feats), cfg.heads)
        v = _heads(_proj(params, f"{pre}.cross.v", audio_feats), cfg.heads)
        x = x + _proj(params, f"{pre}.cross.o", _merge(_attn(q, k, v, scale)))
        x = x + _dec_mlp(params, pre, _ln(x, params[f"{pre}.ln3.g"]))
    x = _ln(x, params["dec.ln.g"])
    return jnp.einsum("btd,vd->btv", x, params["proj_out.w"])


def _decode_step(params, cfg, tok, pos, self_k, self_v, cross_k, cross_v, max_len):
    x = params["dec.emb"][tok][:, None, :]
    cos = lax.dynamic_slice_in_dim(params["rope_cos"], pos, 1)
    sin = lax.dynamic_slice_in_dim(params["rope_sin"], pos, 1)
    scale = cfg.head_dim ** -0.5
    pos_mask = (jnp.arange(max_len) <= pos)[None, None, None, :]
    neg = jnp.float32(-1e30)
    for i in range(cfg.dec_layers):
        pre = f"dec.{i}"
        h = _ln(x, params[f"{pre}.ln1.g"])
        q = _apply_rope(_heads(_proj(params, f"{pre}.attn.q", h), cfg.heads), cos, sin)
        k = _apply_rope(_heads(_proj(params, f"{pre}.attn.k", h), cfg.heads), cos, sin)
        v = _heads(_proj(params, f"{pre}.attn.v", h), cfg.heads)
        self_k = self_k.at[i, :, :, pos, :].set(k[:, :, 0, :])
        self_v = self_v.at[i, :, :, pos, :].set(v[:, :, 0, :])
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, self_k[i]) * scale
        logits = jnp.where(pos_mask, logits, neg)
        o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, axis=-1), self_v[i])
        x = x + _proj(params, f"{pre}.attn.o", _merge(o))
        h = _ln(x, params[f"{pre}.ln2.g"])
        q = _heads(_proj(params, f"{pre}.cross.q", h), cfg.heads)
        o = _attn(q, cross_k[i], cross_v[i], scale)
        x = x + _proj(params, f"{pre}.cross.o", _merge(o))
        x = x + _dec_mlp(params, pre, _ln(x, params[f"{pre}.ln3.g"]))
    x = _ln(x, params["dec.ln.g"])
    return jnp.einsum("btd,vd->btv", x, params["proj_out.w"])[:, 0, :], self_k, self_v


@functools.partial(jax.jit, static_argnames=("cfg", "max_new"))
def greedy_decode(params, cfg: MoonshineConfig, audio: jnp.ndarray, max_new: int = 64):
    """audio [B, T] raw 16 kHz → (tokens [B, max_new], lengths [B])."""
    feats = encode(params, cfg, audio)
    B = feats.shape[0]
    hd = cfg.head_dim
    max_len = 1 + max_new
    self_k = jnp.zeros((cfg.dec_layers, B, cfg.heads, max_len, hd), jnp.float32)
    self_v = jnp.zeros_like(self_k)
    cross_k, cross_v = [], []
    for i in range(cfg.dec_layers):
        cross_k.append(_heads(_proj(params, f"dec.{i}.cross.k", feats), cfg.heads))
        cross_v.append(_heads(_proj(params, f"dec.{i}.cross.v", feats), cfg.heads))
    cross_k, cross_v = jnp.stack(cross_k), jnp.stack(cross_v)

    start = jnp.full((B,), cfg.decoder_start, jnp.int32)
    logits, self_k, self_v = _decode_step(
        params, cfg, start, jnp.int32(0), self_k, self_v, cross_k, cross_v, max_len)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def step(carry, i):
        tok, done, sk, sv = carry
        logits, sk, sv = _decode_step(params, cfg, tok, i + 1, sk, sv,
                                      cross_k, cross_v, max_len)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.eos, nxt)
        done = done | (nxt == cfg.eos)
        return (nxt, done, sk, sv), tok

    (last, _, _, _), toks = lax.scan(
        step, (first, first == cfg.eos, self_k, self_v), jnp.arange(max_new - 1))
    tokens = jnp.concatenate([jnp.moveaxis(toks, 0, 1), last[:, None]], axis=1)
    lengths = jnp.argmax(tokens == cfg.eos, axis=1)
    lengths = jnp.where(jnp.any(tokens == cfg.eos, axis=1), lengths, max_new)
    return tokens, lengths


# ---------------------------------------------------------------------------
# Weights
# ---------------------------------------------------------------------------

def from_hf_state_dict(sd: Dict[str, np.ndarray]) -> Tuple[Dict[str, np.ndarray], MoonshineConfig]:
    def get(name):
        for k in (name, f"model.{name}"):
            if k in sd:
                return np.asarray(sd[k]).astype(np.float32)
        raise KeyError(name)

    emb = get("decoder.embed_tokens.weight")
    d = emb.shape[1]
    n_enc = sum(1 for k in sd if k.endswith(".self_attn.q_proj.weight") and "encoder" in k)
    n_dec = sum(1 for k in sd if k.endswith(".self_attn.q_proj.weight") and "decoder" in k)
    # production checkpoints use 8 heads (head_dim 36/52); fall back to ~32-dim heads
    heads = {288: 8, 416: 8}.get(d, max(1, d // 32))
    cfg = MoonshineConfig(vocab_size=emb.shape[0], hidden_size=d,
                          intermediate_size=get("decoder.layers.0.mlp.fc2.weight").shape[1],
                          enc_layers=n_enc, dec_layers=n_dec, heads=heads)

    p: Dict[str, np.ndarray] = {
        # torch conv1d [out, in, k] → [k, in, out]
        "enc.conv1.w": get("encoder.conv1.weight").transpose(2, 1, 0),
        "enc.conv2.w": get("encoder.conv2.weight").transpose(2, 1, 0),
        "enc.conv2.b": get("encoder.conv2.bias"),
        "enc.conv3.w": get("encoder.conv3.weight").transpose(2, 1, 0),
        "enc.conv3.b": get("encoder.conv3.bias"),
        "enc.gn.g": get("encoder.groupnorm.weight"),
        "enc.gn.b": get("encoder.groupnorm.bias"),
        "enc.ln.g": get("encoder.layer_norm.weight"),
        "dec.emb": emb,
        "dec.ln.g": get("decoder.norm.weight"),
        "proj_out.w": np.asarray(sd["proj_out.weight"]).astype(np.float32),
    }
    for side, n, t_side in (("enc", n_enc, "encoder"), ("dec", n_dec, "decoder")):
        for i in range(n):
            t = f"{t_side}.layers.{i}"
            for ours, theirs in (("attn", "self_attn"),) + ((("cross", "encoder_attn"),) if side == "dec" else ()):
                for proj in ("q", "k", "v", "o"):
                    p[f"{side}.{i}.{ours}.{proj}.w"] = get(f"{t}.{theirs}.{proj}_proj.weight").T
            p[f"{side}.{i}.mlp.fc1.w"] = get(f"{t}.mlp.fc1.weight").T
            p[f"{side}.{i}.mlp.fc1.b"] = get(f"{t}.mlp.fc1.bias")
            p[f"{side}.{i}.mlp.fc2.w"] = get(f"{t}.mlp.fc2.weight").T
            p[f"{side}.{i}.mlp.fc2.b"] = get(f"{t}.mlp.fc2.bias")
            p[f"{side}.{i}.ln1.g"] = get(f"{t}.input_layernorm.weight")
            p[f"{side}.{i}.ln2.g"] = get(f"{t}.post_attention_layernorm.weight")
            if side == "dec":
                p[f"{side}.{i}.ln3.g"] = get(f"{t}.final_layernorm.weight")
    cos, sin = _rope_tables(cfg, 2048)
    p["rope_cos"], p["rope_sin"] = cos, sin
    return p, cfg


def init_random(cfg: MoonshineConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)

    def w(*shape):
        return (rng.standard_normal(shape) / np.sqrt(shape[0])).astype(np.float32)

    d, it = cfg.hidden_size, cfg.intermediate_size
    p = {
        "enc.conv1.w": w(127, 1, d), "enc.conv2.w": w(7, d, 2 * d),
        "enc.conv2.b": np.zeros(2 * d, np.float32),
        "enc.conv3.w": w(3, 2 * d, d), "enc.conv3.b": np.zeros(d, np.float32),
        "enc.gn.g": np.ones(d, np.float32), "enc.gn.b": np.zeros(d, np.float32),
        "enc.ln.g": np.ones(d, np.float32),
        "dec.emb": (rng.standard_normal((cfg.vocab_size, d)) * 0.02).astype(np.float32),
        "dec.ln.g": np.ones(d, np.float32),
        "proj_out.w": (rng.standard_normal((cfg.vocab_size, d)) * 0.02).astype(np.float32),
    }
    for side, n in (("enc", cfg.enc_layers), ("dec", cfg.dec_layers)):
        for i in range(n):
            for blk in ("attn",) + (("cross",) if side == "dec" else ()):
                for proj in ("q", "k", "v", "o"):
                    p[f"{side}.{i}.{blk}.{proj}.w"] = w(d, d)
            p[f"{side}.{i}.mlp.fc1.w"] = w(d, it * (2 if side == "dec" else 1))
            p[f"{side}.{i}.mlp.fc1.b"] = np.zeros(it * (2 if side == "dec" else 1), np.float32)
            p[f"{side}.{i}.mlp.fc2.w"] = w(it, d)
            p[f"{side}.{i}.mlp.fc2.b"] = np.zeros(d, np.float32)
            p[f"{side}.{i}.ln1.g"] = np.ones(d, np.float32)
            p[f"{side}.{i}.ln2.g"] = np.ones(d, np.float32)
            if side == "dec":
                p[f"{side}.{i}.ln3.g"] = np.ones(d, np.float32)
    cos, sin = _rope_tables(cfg, 2048)
    p["rope_cos"], p["rope_sin"] = cos, sin
    return p


class MoonshineModel:
    """Bundled Moonshine with the batched transcribe surface."""

    def __init__(self, params, cfg: MoonshineConfig, tokenizer=None, name="moonshine"):
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.name = name

    @staticmethod
    def from_hf(path, name: Optional[str] = None) -> "MoonshineModel":
        path = Path(path)
        st = path / "model.safetensors"
        if st.exists():
            from safetensors.numpy import load_file

            sd = load_file(st)
        else:
            import torch

            sd = {k: v.numpy() for k, v in torch.load(
                path / "pytorch_model.bin", map_location="cpu", weights_only=True).items()}
        params, cfg = from_hf_state_dict(sd)
        tok = None
        if (path / "tokenizer.json").exists():
            from tokenizers import Tokenizer

            tok = Tokenizer.from_file(str(path / "tokenizer.json"))
        return MoonshineModel(params, cfg, tok, name or path.name)

    @staticmethod
    def random(size="test-random", seed=0) -> "MoonshineModel":
        cfg = CONFIGS[size]
        return MoonshineModel(init_random(cfg, seed), cfg, None, f"random-{size}")

    def transcribe_chunks(self, audio_16k: np.ndarray, language: str = "en",
                          max_new: int = 224) -> List[str]:
        a = np.atleast_2d(np.asarray(audio_16k, np.float32))
        tokens, lengths = greedy_decode(self.params, self.cfg, jnp.asarray(a), max_new=max_new)
        tokens, lengths = np.asarray(tokens), np.asarray(lengths)
        out = []
        for b in range(a.shape[0]):
            ids = tokens[b, : lengths[b]].tolist()
            if self.tokenizer is not None:
                out.append(self.tokenizer.decode(ids))
            else:
                out.append(" ".join(map(str, ids)))
        return out
