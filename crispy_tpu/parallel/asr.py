"""Multi-chip ASR sharding: tensor-parallel Whisper over a device mesh.

Attention/MLP matrices shard on the head/feature axis over 'model'
(XLA inserts the ICI all-reduces at the out/fc2 projections); the batch
axis (streams x 30 s chunks) shards over 'data'. Embeddings and norms
replicate. This is the scaling story for the transcription pipeline:
long recordings become a sharded batch, per SURVEY §2.8.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def whisper_param_spec(name: str, x, tp: int) -> P:
    dim_out = np.shape(x)[-1] if np.ndim(x) else 0

    def ok(d):
        return d % max(tp, 1) == 0 and tp > 1

    # column-parallel: project into sharded head/feature space
    if any(name.endswith(s) for s in (".q.w", ".k.w", ".v.w", ".fc1.w")) and ok(dim_out):
        return P(None, "model")
    if any(name.endswith(s) for s in (".q.b", ".v.b", ".fc1.b")) and ok(np.shape(x)[0]):
        return P("model")
    # row-parallel: reduce back to the replicated residual stream
    if any(name.endswith(s) for s in (".out.w", ".fc2.w")) and ok(np.shape(x)[0]):
        return P("model", None)
    return P()


def shard_whisper(params: Dict[str, jnp.ndarray], mesh: Mesh) -> Dict[str, jnp.ndarray]:
    tp = mesh.devices.shape[1] if mesh.devices.ndim > 1 else 1
    return {
        k: jax.device_put(v, NamedSharding(mesh, whisper_param_spec(k, v, tp)))
        for k, v in params.items()
    }


def shard_batch(x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))
