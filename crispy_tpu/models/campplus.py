"""CAM++ speaker-embedding network (WeSpeaker CAM++) in JAX.

The reference extracts speaker embeddings with WeSpeaker's CAM++ ONNX
(`wespeaker_en_voxceleb_CAM++.onnx`, managers/diarization.rs:40-75): kaldi
fbank features in, fixed-size embedding out, one small ONNX run per ≤4 s
chunk. This is the same architecture TPU-native, batched over all chunks
in ONE device dispatch:

  FCM front-end: 2-D convs over (freq, time) — conv3x3 + two residual
    stages (first block stride (2,1)) + conv3x3 stride (2,1), so 80 mel
    bins fold to 10 and channels×freq flatten into a 320-d frame vector.
  D-TDNN backbone: an initial TDNN (k=5, stride 2), then three densely
    connected blocks of (12, 24, 16) layers with growth 32: each layer is
    BN-ReLU → 1x1 bottleneck (128) → BN-ReLU → CAM conv (k=3, dilation
    1/2/2), output concatenated onto the running feature map; a transit
    layer (BN-ReLU → 1x1) halves channels between blocks.
  CAM (context-aware mask): the conv output is gated by
    sigmoid(W2·relu(W1·(global mean + 100-frame segment means))),
    pooling only over valid (unpadded) frames.
  Head: BN-ReLU → masked statistics pooling (mean‖std) → linear + BN.

Batch-norms are stored inference-folded (x·g + b). Variable-length chunks
batch via zero-padding plus a per-chunk valid-frame count; every pooled
statistic (CMN, CAM contexts, stats pooling) masks the padding and every
conv/BN stage re-zeroes the tail, so a padded batched run is exactly the
per-chunk result.

Weight import: `from_onnx` walks the exporter's initializer list in module
order against the architecture's parameter spec (shape-checked, BN
quartets folded) — the same shape-keyed approach as models.segmentation;
`init_random` drives structure tests offline.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..dsp.fbank import FRAME_LENGTH, FRAME_SHIFT, fbank

MAX_CHUNK_SECONDS = 4.0  # diarization.rs:315 — chunks arrive ≤4 s
_SR = 16000
_MAX_SAMPLES = int(MAX_CHUNK_SECONDS * _SR)
_SEG_LEN = 100  # CAM segment pooling window (frames after stride 2)


@dataclass(frozen=True)
class CamPPlusConfig:
    feat_dim: int = 80
    m_channels: int = 32  # FCM width
    fcm_blocks: int = 2  # residual blocks per FCM stage
    init_channels: int = 128
    growth: int = 32
    bn_channels: int = 128  # dense-layer bottleneck
    blocks: Tuple[Tuple[int, int, int], ...] = ((12, 3, 1), (24, 3, 2), (16, 3, 2))
    embedding_size: int = 512  # voxceleb CAM++ export


CONFIGS = {
    "wespeaker-voxceleb": CamPPlusConfig(),
    "test-random": CamPPlusConfig(
        feat_dim=16, m_channels=8, fcm_blocks=1, init_channels=16, growth=8,
        bn_channels=16, blocks=((2, 3, 1), (2, 3, 2)), embedding_size=32),
}


# ---------------------------------------------------------------------------
# Parameter spec: single source of truth for init, import, and forward
# ---------------------------------------------------------------------------

def param_spec(cfg: CamPPlusConfig) -> List[Tuple[str, str, tuple]]:
    """Ordered (name, kind, shape) list in torch module order.

    kinds: conv2d [kh,kw,I,O] · conv1d [k,I,O] (bias-free, BN follows) ·
    conv1d_b (with bias, the CAM gate MLP) · bn (folded scale/shift).
    """
    m = cfg.m_channels
    s: List[Tuple[str, str, tuple]] = [
        ("fcm.conv1", "conv2d", (3, 3, 1, m)), ("fcm.bn1", "bn", (m,)),
    ]
    for stage in (1, 2):
        for blk in range(cfg.fcm_blocks):
            pre = f"fcm.layer{stage}.{blk}"
            s += [(f"{pre}.conv1", "conv2d", (3, 3, m, m)), (f"{pre}.bn1", "bn", (m,)),
                  (f"{pre}.conv2", "conv2d", (3, 3, m, m)), (f"{pre}.bn2", "bn", (m,))]
            if blk == 0:  # stride-(2,1) entry block needs a projected shortcut
                s += [(f"{pre}.sc", "conv2d", (1, 1, m, m)), (f"{pre}.scbn", "bn", (m,))]
    s += [("fcm.conv2", "conv2d", (3, 3, m, m)), ("fcm.bn2", "bn", (m,))]

    c0 = m * (cfg.feat_dim // 8)  # three (2,1)-stride stages: 80 → 10
    s += [("tdnn.conv", "conv1d", (5, c0, cfg.init_channels)),
          ("tdnn.bn", "bn", (cfg.init_channels,))]
    ch = cfg.init_channels
    for bi, (n_layers, k, _d) in enumerate(cfg.blocks):
        for li in range(n_layers):
            pre = f"block{bi}.{li}"
            s += [(f"{pre}.bn1", "bn", (ch,)),
                  (f"{pre}.fc", "conv1d", (1, ch, cfg.bn_channels)),
                  (f"{pre}.bn2", "bn", (cfg.bn_channels,)),
                  (f"{pre}.cam.conv", "conv1d", (k, cfg.bn_channels, cfg.growth)),
                  (f"{pre}.cam.fc1", "conv1d_b", (1, cfg.bn_channels, cfg.bn_channels // 2)),
                  (f"{pre}.cam.fc2", "conv1d_b", (1, cfg.bn_channels // 2, cfg.growth))]
            ch += cfg.growth
        s += [(f"transit{bi}.bn", "bn", (ch,)),
              (f"transit{bi}.fc", "conv1d", (1, ch, ch // 2))]
        ch //= 2
    s += [("out.bn", "bn", (ch,)),
          ("emb.fc", "conv1d", (1, 2 * ch, cfg.embedding_size)),
          ("emb.bn", "bn", (cfg.embedding_size,))]
    return s


def init_random(cfg: CamPPlusConfig = CamPPlusConfig(), seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    params: Dict[str, np.ndarray] = {}
    for name, kind, shape in param_spec(cfg):
        if kind == "bn":
            params[f"{name}.g"] = np.ones(shape, np.float32)
            params[f"{name}.b"] = np.zeros(shape, np.float32)
        else:
            fan_in = int(np.prod(shape[:-1]))
            params[f"{name}.w"] = (
                rng.standard_normal(shape) / np.sqrt(fan_in)).astype(np.float32)
            if kind == "conv1d_b":
                params[f"{name}.b"] = np.zeros(shape[-1], np.float32)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _bn(p, name, x):
    return x * p[f"{name}.g"] + p[f"{name}.b"]


def _bnrelu(p, name, x):
    return jax.nn.relu(_bn(p, name, x))


def _conv2d(x, w, stride=(1, 1), pad=1):
    """[B, H, W, C] with torch-style symmetric padding."""
    return lax.conv_general_dilated(
        x, w, stride, [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv1d(x, w, stride=1, dilation=1):
    """[B, T, C], SAME-length torch padding d·(k−1)/2."""
    k = w.shape[0]
    pad = dilation * (k - 1) // 2
    return lax.conv_general_dilated(
        x, w, (stride,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"))


def _pointwise(p, name, x):
    return jnp.einsum("btc,ce->bte", x, p[f"{name}.w"][0]) + p[f"{name}.b"]


def _masked_mean(x, mask):
    """[B, T, C] mean over valid frames → [B, C]."""
    denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    return (x * mask[..., None]).sum(axis=1) / denom


def _seg_mean(x, mask):
    """CAM segment pooling: per-100-frame masked means, broadcast to [B, T, C]."""
    B, T, C = x.shape
    S = -(-T // _SEG_LEN)
    pad = S * _SEG_LEN - T
    xs = jnp.pad(x * mask[..., None], ((0, 0), (0, pad), (0, 0)))
    ms = jnp.pad(mask, ((0, 0), (0, pad)))
    num = xs.reshape(B, S, _SEG_LEN, C).sum(axis=2)
    den = jnp.maximum(ms.reshape(B, S, _SEG_LEN).sum(axis=2), 1.0)
    seg = num / den[..., None]  # [B, S, C]
    return jnp.repeat(seg, _SEG_LEN, axis=1)[:, :T]


def _cam_layer(p, pre, h, mask, dilation):
    """Context-aware-masked conv: conv output gated by pooled-context MLP."""
    y = _conv1d(h, p[f"{pre}.conv.w"], dilation=dilation)
    ctx = _masked_mean(h, mask)[:, None, :] + _seg_mean(h, mask)
    a = jax.nn.relu(_pointwise(p, f"{pre}.fc1", ctx))
    gate = jax.nn.sigmoid(_pointwise(p, f"{pre}.fc2", a))
    return y * gate


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(params, cfg: CamPPlusConfig, feats: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """[B, T, feat_dim] fbank + valid-frame counts → [B, embedding_size]."""
    p = params
    B, T, _F = feats.shape
    mask = (jnp.arange(T)[None, :] < n_valid[:, None]).astype(feats.dtype)
    # CMN over valid frames, then zero the padding so FCM convs see silence.
    mu = _masked_mean(feats, mask)
    x = (feats - mu[:, None, :]) * mask[..., None]

    # FCM over [B, freq, time, C]. Every stage re-applies the time mask:
    # convs smear the boundary one frame into the tail and the folded BN
    # bias makes padding nonzero, so without re-masking each conv pulls
    # tail garbage back into the valid frames — padded and unpadded runs
    # must instead be bit-identical.
    tm = mask[:, None, :, None]
    h = jnp.swapaxes(x, 1, 2)[..., None]
    h = _bnrelu(p, "fcm.bn1", _conv2d(h, p["fcm.conv1.w"])) * tm
    for stage in (1, 2):
        for blk in range(cfg.fcm_blocks):
            pre = f"fcm.layer{stage}.{blk}"
            st = (2, 1) if blk == 0 else (1, 1)
            r = _bnrelu(p, f"{pre}.bn1", _conv2d(h, p[f"{pre}.conv1.w"], st)) * tm
            r = _bn(p, f"{pre}.bn2", _conv2d(r, p[f"{pre}.conv2.w"]))
            sc = _bn(p, f"{pre}.scbn", _conv2d(h, p[f"{pre}.sc.w"], st, pad=0)) \
                if blk == 0 else h
            h = jax.nn.relu(r + sc) * tm
    h = _bnrelu(p, "fcm.bn2", _conv2d(h, p["fcm.conv2.w"], (2, 1))) * tm
    # [B, F', T, C] → [B, T, C·F'] (torch reshape order: channel-major)
    h = jnp.transpose(h, (0, 2, 3, 1)).reshape(B, T, -1)

    # Backbone
    h = _bnrelu(p, "tdnn.bn", _conv1d(h, p["tdnn.conv.w"], stride=2))
    n2 = jnp.maximum((n_valid - 1) // 2 + 1, 1)
    mask2 = (jnp.arange(h.shape[1])[None, :] < n2[:, None]).astype(h.dtype)
    h = h * mask2[..., None]
    m2 = mask2[..., None]
    for bi, (n_layers, _k, d) in enumerate(cfg.blocks):
        for li in range(n_layers):
            pre = f"block{bi}.{li}"
            b = _bnrelu(p, f"{pre}.bn1", h) * m2  # BN bias un-zeroes the tail
            b = _conv1d(b, p[f"{pre}.fc.w"])
            b = _bnrelu(p, f"{pre}.bn2", b) * m2
            y = _cam_layer(p, f"{pre}.cam", b, mask2, d) * m2
            h = jnp.concatenate([h, y], axis=-1)
        h = _conv1d(_bnrelu(p, f"transit{bi}.bn", h) * m2, p[f"transit{bi}.fc.w"])
    h = _bnrelu(p, "out.bn", h)

    # Masked statistics pooling → embedding
    mean = _masked_mean(h, mask2)
    sq = _masked_mean(h * h, mask2)
    std = jnp.sqrt(jnp.clip(sq - mean * mean, 1e-10))
    stats = jnp.concatenate([mean, std], axis=-1)
    emb = jnp.einsum("bc,ce->be", stats, p["emb.fc.w"][0])
    return emb * p["emb.bn.g"] + p["emb.bn.b"]


# ---------------------------------------------------------------------------
# Chunk embedding front (plugs into engine.diarization as embedding_fn)
# ---------------------------------------------------------------------------

class CamPPlusModel:
    """Callable: list of 16 kHz float chunks (≤4 s each) → [N, E] embeddings.

    All chunks batch into one padded forward (one device dispatch), unlike
    the reference's N sequential ONNX runs per transcription.
    """

    def __init__(self, params: Dict[str, np.ndarray],
                 cfg: CamPPlusConfig = CamPPlusConfig(), name: str = "campplus"):
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self.cfg = cfg
        self.name = name
        self._max_frames = 1 + (_MAX_SAMPLES - FRAME_LENGTH) // FRAME_SHIFT
        self._jit_slices: Dict = {}  # per-mesh, built on first from_device call

    def __call__(self, segments: Sequence[np.ndarray]) -> np.ndarray:
        n = len(segments)
        audio = np.zeros((n, _MAX_SAMPLES), np.float32)
        n_valid = np.zeros(n, np.int32)
        for i, seg in enumerate(segments):
            s = np.asarray(seg, np.float32)[:_MAX_SAMPLES]
            audio[i, :len(s)] = s
            n_valid[i] = max(0, 1 + (len(s) - FRAME_LENGTH) // FRAME_SHIFT)
        feats = fbank(jnp.asarray(audio), self.cfg.feat_dim)[:, :self._max_frames]
        out = forward(self.params, self.cfg, feats, jnp.asarray(n_valid))
        return np.asarray(out)

    def _slices_forward(self, mesh):
        def f(dev_i16, starts, n_valid):
            audio = jax.vmap(
                lambda s: lax.dynamic_slice(dev_i16, (s,), (_MAX_SAMPLES,)))(starts)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                audio = jax.lax.with_sharding_constraint(
                    audio, NamedSharding(mesh, PartitionSpec("data", None)))
            x = audio.astype(jnp.float32) * (1.0 / 32768.0)
            feats = fbank(x, self.cfg.feat_dim)[:, :self._max_frames]
            # frames past n_valid read neighboring audio instead of the host
            # path's zero padding; every pooled statistic and conv stage in
            # forward() masks them, so the valid rows are identical
            return forward(self.params, self.cfg, feats, n_valid)

        return f

    def from_device(self, dev_i16, ranges, mesh=None) -> np.ndarray:
        """One-upload path: [(sample_start, sample_end)] chunk ranges over a
        device-resident flat int16 recording → [N, E] embeddings, audio
        sliced on the device (no per-chunk host upload). Batch counts
        bucket to powers of two to bound compiled shapes; with a mesh the
        chunk batch shards over 'data'."""
        n = len(ranges)
        if n == 0:
            return np.zeros((0, self.cfg.embedding_size), np.float32)
        if mesh not in self._jit_slices:
            self._jit_slices[mesh] = jax.jit(self._slices_forward(mesh))
        npad = 1 << (n - 1).bit_length()
        starts = np.zeros(npad, np.int32)
        n_valid = np.zeros(npad, np.int32)
        for i, (a, b) in enumerate(ranges):
            starts[i] = a
            ln = min(int(b - a), _MAX_SAMPLES)
            n_valid[i] = max(0, 1 + (ln - FRAME_LENGTH) // FRAME_SHIFT)
        out = self._jit_slices[mesh](
            dev_i16, jnp.asarray(starts), jnp.asarray(n_valid))
        return np.asarray(out)[:n]


# ---------------------------------------------------------------------------
# Weight import (ONNX initializer walk, torch module order)
# ---------------------------------------------------------------------------

def from_initializers(inits: List[np.ndarray],
                      cfg: CamPPlusConfig = CamPPlusConfig()) -> Dict[str, np.ndarray]:
    """Fold a torch-export-ordered initializer list into folded-BN params.

    Expects, per param_spec order: conv2d [O,I,kh,kw]; conv1d [O,I,k];
    conv1d_b weight then bias [O]; bn as the (gamma, beta, mean, var)
    quartet. Shape-checked at every step; raises with the first mismatch so
    a real export's divergence is diagnosable.
    """
    params: Dict[str, np.ndarray] = {}
    i = 0

    def take(expect_shape, what):
        nonlocal i
        if i >= len(inits):
            raise ValueError(f"initializers exhausted at {what}")
        a = np.asarray(inits[i], np.float32)
        if tuple(a.shape) != tuple(expect_shape):
            raise ValueError(f"{what}: expected shape {tuple(expect_shape)}, "
                             f"got {a.shape} at initializer {i}")
        i += 1
        return a

    for name, kind, shape in param_spec(cfg):
        if kind == "bn":
            c = shape[0]
            gamma = take((c,), f"{name}.gamma")
            beta = take((c,), f"{name}.beta")
            mean = take((c,), f"{name}.mean")
            var = take((c,), f"{name}.var")
            scale = gamma / np.sqrt(var + 1e-5)
            params[f"{name}.g"] = scale
            params[f"{name}.b"] = beta - mean * scale
        elif kind == "conv2d":
            kh, kw, cin, cout = shape
            w = take((cout, cin, kh, kw), f"{name}.weight")
            params[f"{name}.w"] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
        else:  # conv1d / conv1d_b
            k, cin, cout = shape
            w = take((cout, cin, k), f"{name}.weight")
            params[f"{name}.w"] = np.ascontiguousarray(w.transpose(2, 1, 0))
            if kind == "conv1d_b":
                params[f"{name}.b"] = take((cout,), f"{name}.bias")
    if i != len(inits):
        raise ValueError(f"{len(inits) - i} trailing initializers unmapped "
                         f"(consumed {i})")
    return params


def from_onnx(path, cfg: CamPPlusConfig = CamPPlusConfig()) -> CamPPlusModel:
    """Load the distributed CAM++ ONNX via models.onnx_import."""
    from .onnx_import import load_onnx_weights

    weights = load_onnx_weights(path)
    params = from_initializers(list(weights.values()), cfg)
    return CamPPlusModel(params, cfg, name="campplus-onnx")
