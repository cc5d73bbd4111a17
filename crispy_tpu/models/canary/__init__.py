"""Canary ASR (FastConformer encoder + Transformer AED decoder) in JAX.

The reference catalogs canary-180m-flash and canary-1b-v2
(managers/model.rs:253-290, served via transcribe-rs/ONNX). NVIDIA's
published Canary recipe is a FastConformer encoder — the same module
verified against transformers in models/parakeet — with a pre-LN
Transformer decoder over sinusoidal positions and cross-attention, prompted
with task/language tokens and decoded greedily.

The encoder reuses models.parakeet.encode verbatim (shared FastConformer);
the decoder reuses the KV-cached greedy machinery proven in models/whisper.
Weight mapping from NeMo exports lands with real checkpoint files; random
init drives structural/cache-consistency tests until then.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..parakeet import ParakeetConfig, encode as conformer_encode
from ..parakeet import init_random as conformer_init


@dataclass(frozen=True)
class CanaryConfig:
    encoder: ParakeetConfig = ParakeetConfig()
    vocab_size: int = 5248
    dec_layers: int = 6
    dec_heads: int = 8
    dec_hidden: int = 1024
    dec_ffn: int = 4096
    max_len: int = 512
    bos: int = 1
    eos: int = 2


CONFIGS = {
    "canary-180m-flash": CanaryConfig(
        encoder=ParakeetConfig(hidden_size=512, layers=17, heads=8,
                               intermediate_size=2048, vocab_size=5248),
        vocab_size=5248, dec_layers=4, dec_heads=8, dec_hidden=512, dec_ffn=2048),
    "test-random": CanaryConfig(
        encoder=ParakeetConfig(hidden_size=64, layers=2, heads=2, kv_heads=2,
                               intermediate_size=128, sub_channels=32, vocab_size=64),
        vocab_size=64, dec_layers=2, dec_heads=2, dec_hidden=64, dec_ffn=128,
        bos=62, eos=63),
}


def _sinusoids(length: int, d: int) -> np.ndarray:
    pos = np.arange(length)[:, None]
    i = np.arange(d // 2)[None, :]
    ang = pos / (10000.0 ** (2 * i / d))
    out = np.zeros((length, d), np.float64)
    out[:, 0::2] = np.sin(ang)
    out[:, 1::2] = np.cos(ang)
    return out.astype(np.float32)


def _ln(x, g, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) * g + b


def _heads(x, n):
    *b, T, D = x.shape
    return x.reshape(*b, T, n, D // n).swapaxes(-3, -2)


def _merge(x):
    *b, H, T, hd = x.shape
    return x.swapaxes(-3, -2).reshape(*b, T, H * hd)


def _proj(p, name, x):
    return jnp.einsum("...td,de->...te", x, p[f"{name}.w"]) + p[f"{name}.b"]


def _attn(q, k, v, mask=None):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("...hqd,...hkd->...hqk", q, k) * scale
    if mask is not None:
        logits = logits + mask
    return jnp.einsum("...hqk,...hkd->...hqd", jax.nn.softmax(logits, axis=-1), v)


def encode(p, cfg: CanaryConfig, mel: jnp.ndarray) -> jnp.ndarray:
    feats = conformer_encode(p, cfg.encoder, mel)
    if cfg.encoder.hidden_size != cfg.dec_hidden:
        feats = _proj(p, "enc_proj", feats)
    return feats


def decode_logits(p, cfg: CanaryConfig, tokens: jnp.ndarray, feats: jnp.ndarray) -> jnp.ndarray:
    B, T = tokens.shape
    x = p["dec.emb"][tokens] * np.sqrt(cfg.dec_hidden) + p["dec.pos"][:T]
    mask = jnp.triu(jnp.full((T, T), -jnp.inf, jnp.float32), k=1)
    for i in range(cfg.dec_layers):
        pre = f"dec.{i}"
        h = _ln(x, p[f"{pre}.ln1.g"], p[f"{pre}.ln1.b"])
        q = _heads(_proj(p, f"{pre}.attn.q", h), cfg.dec_heads)
        k = _heads(_proj(p, f"{pre}.attn.k", h), cfg.dec_heads)
        v = _heads(_proj(p, f"{pre}.attn.v", h), cfg.dec_heads)
        x = x + _proj(p, f"{pre}.attn.o", _merge(_attn(q, k, v, mask)))
        h = _ln(x, p[f"{pre}.lnx.g"], p[f"{pre}.lnx.b"])
        q = _heads(_proj(p, f"{pre}.cross.q", h), cfg.dec_heads)
        k = _heads(_proj(p, f"{pre}.cross.k", feats), cfg.dec_heads)
        v = _heads(_proj(p, f"{pre}.cross.v", feats), cfg.dec_heads)
        x = x + _proj(p, f"{pre}.cross.o", _merge(_attn(q, k, v)))
        h = _ln(x, p[f"{pre}.ln2.g"], p[f"{pre}.ln2.b"])
        h = jax.nn.relu(_proj(p, f"{pre}.fc1", h))
        x = x + _proj(p, f"{pre}.fc2", h)
    x = _ln(x, p["dec.ln.g"], p["dec.ln.b"])
    return jnp.einsum("btd,vd->btv", x, p["dec.emb"])


def _decode_step(p, cfg: CanaryConfig, tok, pos, self_k, self_v, cross_k, cross_v, max_len):
    x = p["dec.emb"][tok][:, None, :] * np.sqrt(cfg.dec_hidden) \
        + lax.dynamic_slice_in_dim(p["dec.pos"], pos, 1)
    pos_mask = (jnp.arange(max_len) <= pos)[None, None, None, :]
    for i in range(cfg.dec_layers):
        pre = f"dec.{i}"
        h = _ln(x, p[f"{pre}.ln1.g"], p[f"{pre}.ln1.b"])
        q = _heads(_proj(p, f"{pre}.attn.q", h), cfg.dec_heads)
        k = _heads(_proj(p, f"{pre}.attn.k", h), cfg.dec_heads)[:, :, 0]
        v = _heads(_proj(p, f"{pre}.attn.v", h), cfg.dec_heads)[:, :, 0]
        self_k = self_k.at[i, :, :, pos, :].set(k)
        self_v = self_v.at[i, :, :, pos, :].set(v)
        scale = q.shape[-1] ** -0.5
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, self_k[i]) * scale
        logits = jnp.where(pos_mask, logits, jnp.float32(-1e30))
        o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, axis=-1), self_v[i])
        x = x + _proj(p, f"{pre}.attn.o", _merge(o))
        h = _ln(x, p[f"{pre}.lnx.g"], p[f"{pre}.lnx.b"])
        q = _heads(_proj(p, f"{pre}.cross.q", h), cfg.dec_heads)
        x = x + _proj(p, f"{pre}.cross.o", _merge(_attn(q, cross_k[i], cross_v[i])))
        h = _ln(x, p[f"{pre}.ln2.g"], p[f"{pre}.ln2.b"])
        x = x + _proj(p, f"{pre}.fc2", jax.nn.relu(_proj(p, f"{pre}.fc1", h)))
    x = _ln(x, p["dec.ln.g"], p["dec.ln.b"])
    return jnp.einsum("btd,vd->btv", x, p["dec.emb"])[:, 0], self_k, self_v


@functools.partial(jax.jit, static_argnames=("cfg", "max_new"))
def greedy_decode(p, cfg: CanaryConfig, mel: jnp.ndarray, max_new: int = 128,
                  prompt: jnp.ndarray = None):
    """Greedy AED decode; `prompt` [B, P] (NeMo canary's task prompt —
    bos, source lang, task, target lang, pnc) defaults to [bos]."""
    feats = encode(p, cfg, mel)
    B = feats.shape[0]
    hd = cfg.dec_hidden // cfg.dec_heads
    if prompt is None:
        prompt = jnp.full((B, 1), cfg.bos, jnp.int32)
    P = prompt.shape[1]
    max_len = P + max_new
    self_k = jnp.zeros((cfg.dec_layers, B, cfg.dec_heads, max_len, hd), jnp.float32)
    self_v = jnp.zeros_like(self_k)
    cross_k = jnp.stack([_heads(_proj(p, f"dec.{i}.cross.k", feats), cfg.dec_heads)
                         for i in range(cfg.dec_layers)])
    cross_v = jnp.stack([_heads(_proj(p, f"dec.{i}.cross.v", feats), cfg.dec_heads)
                         for i in range(cfg.dec_layers)])
    logits = None
    for p_i in range(P):  # prefill (P is small and static)
        logits, self_k, self_v = _decode_step(p, cfg, prompt[:, p_i], jnp.int32(p_i),
                                              self_k, self_v, cross_k, cross_v, max_len)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def step(carry, i):
        tok, done, sk, sv = carry
        logits, sk, sv = _decode_step(p, cfg, tok, P + i, sk, sv, cross_k, cross_v, max_len)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.eos, nxt)
        done = done | (nxt == cfg.eos)
        return (nxt, done, sk, sv), tok

    (last, _, _, _), toks = lax.scan(step, (first, first == cfg.eos, self_k, self_v),
                                     jnp.arange(max_new - 1))
    tokens = jnp.concatenate([jnp.moveaxis(toks, 0, 1), last[:, None]], axis=1)
    lengths = jnp.argmax(tokens == cfg.eos, axis=1)
    lengths = jnp.where(jnp.any(tokens == cfg.eos, axis=1), lengths, max_new)
    return tokens, lengths


def init_random(cfg: CanaryConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)

    def w(*shape):
        return (rng.standard_normal(shape) / np.sqrt(max(shape[0], 1))).astype(np.float32)

    p = conformer_init(cfg.encoder, seed)
    d = cfg.dec_hidden
    p["dec.emb"] = (rng.standard_normal((cfg.vocab_size, d)) * 0.02).astype(np.float32)
    p["dec.pos"] = _sinusoids(cfg.max_len, d)
    p["dec.ln.g"] = np.ones(d, np.float32)
    p["dec.ln.b"] = np.zeros(d, np.float32)
    if cfg.encoder.hidden_size != d:
        p["enc_proj.w"] = w(cfg.encoder.hidden_size, d)
        p["enc_proj.b"] = np.zeros(d, np.float32)
    for i in range(cfg.dec_layers):
        pre = f"dec.{i}"
        for blk in ("attn", "cross"):
            for proj in ("q", "k", "v", "o"):
                p[f"{pre}.{blk}.{proj}.w"] = w(d, d)
                p[f"{pre}.{blk}.{proj}.b"] = np.zeros(d, np.float32)
        p[f"{pre}.fc1.w"] = w(d, cfg.dec_ffn)
        p[f"{pre}.fc1.b"] = np.zeros(cfg.dec_ffn, np.float32)
        p[f"{pre}.fc2.w"] = w(cfg.dec_ffn, d)
        p[f"{pre}.fc2.b"] = np.zeros(d, np.float32)
        for ln in ("ln1", "lnx", "ln2"):
            p[f"{pre}.{ln}.g"] = np.ones(d, np.float32)
            p[f"{pre}.{ln}.b"] = np.zeros(d, np.float32)
    return p
