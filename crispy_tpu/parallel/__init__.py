"""Mesh + sharding helpers for multi-chip execution.

The reference is a single-process desktop app (SURVEY.md §2.8); its
concurrency maps here to SPMD over a jax.sharding.Mesh: batch/stream axes
shard over 'data' (DP), wide model dimensions over 'model' (TP), with XLA
inserting the ICI collectives.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axes: Tuple[str, str] = ("data", "model"),
    model_parallel: Optional[int] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    model_parallel defaults to 2 when the device count is even (so TP paths
    compile with real collectives), else 1.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if model_parallel is None:
        model_parallel = 2 if n % 2 == 0 and n >= 2 else 1
    dp = n // model_parallel
    grid = np.array(devs[: dp * model_parallel]).reshape(dp, model_parallel)
    return Mesh(grid, axes)


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def model_sharding(mesh: Mesh, ndim: int, axis: int = -1) -> NamedSharding:
    spec = [None] * ndim
    spec[axis % ndim] = "model"
    return NamedSharding(mesh, P(*spec))
