"""Sharded RNNoise training step (DP x TP over a device mesh).

The reference consumes pre-trained RNNoise weights; this module owns the
training side so the framework can (re)train denoiser models natively:
the gain/VAD network trained with smooth activations (the tansig table is
an inference-time approximation), MSE on per-band gains + BCE on VAD —
the public RNNoise training objective family.

Sharding: batch over 'data'; each GRU's recurrent/input matrices over
'model' on the gate axis (z|r|h blocks each split across TP ranks), so the
per-step matmuls run as TP matmuls with XLA-inserted ICI collectives.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dsp.rnnoise import constants as C
from ..dsp.rnnoise.weights import RNNoiseModel, deterministic_test_model


def init_train_params(model: RNNoiseModel | None = None, seed: int = 0) -> Dict[str, jnp.ndarray]:
    """Float training parameters (optionally warm-started from a model)."""
    model = model or deterministic_test_model(seed)
    out: Dict[str, jnp.ndarray] = {}
    for lname in ("input_dense", "denoise_output", "vad_output"):
        layer = getattr(model, lname)
        out[f"{lname}.w"] = jnp.asarray(layer.w)
        out[f"{lname}.b"] = jnp.asarray(layer.b)
    for lname in ("vad_gru", "noise_gru", "denoise_gru"):
        g = getattr(model, lname)
        out[f"{lname}.w"] = jnp.asarray(g.w)
        out[f"{lname}.u"] = jnp.asarray(g.u)
        out[f"{lname}.b"] = jnp.asarray(g.b)
    return out


def _gru(params, prefix, h, x):
    w, u, b = params[f"{prefix}.w"], params[f"{prefix}.u"], params[f"{prefix}.b"]
    n = u.shape[0]
    pre = jnp.dot(x, w) + b
    rec = jnp.dot(h, u[:, : 2 * n])  # candidate block recomputed on h*r below
    z = jax.nn.sigmoid(pre[..., :n] + rec[..., :n])
    r = jax.nn.sigmoid(pre[..., n:2 * n] + rec[..., n:2 * n])
    cand = jax.nn.relu(pre[..., 2 * n:] + jnp.dot(h * r, u[:, 2 * n:]))
    return z * h + (1 - z) * cand


def forward(params, feats: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """feats [B, T, 42] → (gains [B, T, 22], vad [B, T]) with smooth acts."""
    B = feats.shape[0]

    def step(carry, f):
        vs, ns, ds = carry
        dense = jnp.tanh(jnp.dot(f, params["input_dense.w"]) + params["input_dense.b"])
        vs = _gru(params, "vad_gru", vs, dense)
        vad = jax.nn.sigmoid(jnp.dot(vs, params["vad_output.w"]) + params["vad_output.b"])[..., 0]
        ns = _gru(params, "noise_gru", ns, jnp.concatenate([dense, vs, f], axis=-1))
        ds = _gru(params, "denoise_gru", ds, jnp.concatenate([vs, ns, f], axis=-1))
        g = jax.nn.sigmoid(jnp.dot(ds, params["denoise_output.w"]) + params["denoise_output.b"])
        return (vs, ns, ds), (g, vad)

    init = (
        jnp.zeros((B, C.VAD_GRU_SIZE)),
        jnp.zeros((B, C.NOISE_GRU_SIZE)),
        jnp.zeros((B, C.DENOISE_GRU_SIZE)),
    )
    _, (gains, vad) = lax.scan(step, init, jnp.moveaxis(feats, 1, 0))
    return jnp.moveaxis(gains, 0, 1), jnp.moveaxis(vad, 0, 1)


def loss_fn(params, batch) -> jnp.ndarray:
    gains, vad = forward(params, batch["features"])
    # Perceptually-weighted gain loss (sqrt compression) + VAD BCE.
    g_loss = jnp.mean((jnp.sqrt(gains + 1e-8) - jnp.sqrt(batch["gains"] + 1e-8)) ** 2)
    v = jnp.clip(vad, 1e-6, 1 - 1e-6)
    v_loss = -jnp.mean(batch["vad"] * jnp.log(v) + (1 - batch["vad"]) * jnp.log(1 - v))
    return g_loss + 0.5 * v_loss


def make_train_step(mesh: Mesh, learning_rate: float = 1e-3):
    """Jitted DP x TP train step bound to `mesh`.

    Returns (step_fn, shard_params, shard_batch, optimizer) where step_fn:
    (params, opt_state, batch) → (params, opt_state, loss).
    """
    opt = optax.adam(learning_rate)

    tp = mesh.devices.shape[1] if len(mesh.devices.shape) > 1 else 1

    def param_spec(name: str, x) -> P:
        # GRU/dense matrices TP-shard on the output/gate axis when it divides.
        dim = np.shape(x)[-1] if x is not None else 0
        if dim % max(tp, 1) != 0 or tp == 1:
            return P()
        if name.endswith(".w") or name.endswith(".u"):
            return P(None, "model")
        if name.endswith(".b"):
            return P("model")
        return P()

    def shard_params(params):
        return {
            k: jax.device_put(v, NamedSharding(mesh, param_spec(k, v)))
            for k, v in params.items()
        }

    def shard_batch(batch):
        return {
            k: jax.device_put(v, NamedSharding(mesh, P("data") if np.ndim(v) == 1
                                               else P("data", *([None] * (np.ndim(v) - 1)))))
            for k, v in batch.items()
        }

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # Inputs arrive pre-sharded (shard_params / shard_batch); jit propagates
    # the shardings and inserts the DP psum / TP collectives.
    step_jit = jax.jit(step)
    return step_jit, shard_params, shard_batch, opt


def synthetic_batch(batch_size: int, n_frames: int, seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    return {
        "features": rng.standard_normal((batch_size, n_frames, C.NB_FEATURES)).astype(np.float32),
        "gains": rng.uniform(0, 1, (batch_size, n_frames, C.NB_BANDS)).astype(np.float32),
        "vad": (rng.uniform(0, 1, (batch_size, n_frames)) > 0.5).astype(np.float32),
    }
