"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(jax.sharding.Mesh / pjit / shard_map) are exercised without TPU hardware.
Must be set before JAX initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest

# Persist XLA compilations across pytest runs (single-core host: compiles
# dominate test wall time otherwise).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def data_root(tmp_path, monkeypatch):
    """Redirect the Crispy data root into a temp dir."""
    monkeypatch.setenv("CRISPY_DATA_DIR", str(tmp_path / "Crispy"))
    return tmp_path / "Crispy"
