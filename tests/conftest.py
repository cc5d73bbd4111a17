"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(jax.sharding.Mesh / pjit / shard_map) are exercised without TPU hardware.

The environment may pre-register a remote TPU proxy platform and point
JAX_PLATFORMS at it (slow network handshake at backend init) — tests force
the platform back to cpu *before* any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persist XLA compilations across pytest runs (single-core host: compiles
# dominate test wall time otherwise).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def data_root(tmp_path, monkeypatch):
    """Redirect the Crispy data root into a temp dir."""
    monkeypatch.setenv("CRISPY_DATA_DIR", str(tmp_path / "Crispy"))
    return tmp_path / "Crispy"
