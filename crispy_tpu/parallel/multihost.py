"""Multi-host (DCN) batch feeding over a global device mesh.

SURVEY.md §2.8/§5 prescribe the TPU-native replacement for the reference's
single-process concurrency at fleet scale: XLA collectives ride ICI within
a slice and DCN across hosts, with each host feeding its process-local
audio via ``jax.make_array_from_process_local_data`` (SURVEY.md:196,
399-402). The reference has no distributed analog — it is a single-process
desktop app (src-tauri/src/managers/*, one machine); this module is the
scaling story for serving the same pipelines from a fleet: every host
pushes the streams IT captures into a globally sharded batch, one jitted
program runs over the global mesh, and each host reads back only its own
shards.

No multi-host hardware is needed to exercise this: JAX supports
multi-process CPU meshes (gloo TCP collectives), so
``tests/test_multihost.py`` spawns real second processes and pins
sharded == unsharded across the process boundary. ``__graft_entry__``'s
``dryrun_multichip`` runs the same drill when ``JAX_NUM_PROCESSES`` is
set.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def initialize_from_env(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    platform: Optional[str] = None,
    local_device_count: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` for one crispy fleet process.

    Arguments default from ``CRISPY_COORDINATOR`` / ``CRISPY_NUM_PROCESSES``
    / ``CRISPY_PROCESS_ID``. Call before any JAX computation in the process.

    platform="cpu" is the hardware-free test path: it pins
    ``jax_platforms`` via config BEFORE the distributed handshake — merely
    setting the env var is NOT enough here, because backend init during the
    handshake can hand the default-platform choice to a pre-registered
    remote-TPU PJRT plugin (observed with the axon tunnel plugin: with only
    ``JAX_PLATFORMS=cpu`` in the env, ``jax.devices()`` after ``initialize``
    came back as the tunneled TPU) — and selects gloo TCP collectives +
    ``jax_num_cpu_devices`` so the CPU client joins the multi-process
    topology (``xla_force_host_platform_device_count`` is ignored on the
    distributed CPU client path).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("CRISPY_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("CRISPY_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("CRISPY_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if coordinator_address is None or num_processes is None or process_id is None:
        raise ValueError(
            "multihost init needs coordinator_address + num_processes + "
            "process_id (args or CRISPY_COORDINATOR / CRISPY_NUM_PROCESSES "
            "/ CRISPY_PROCESS_ID)")

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        if local_device_count:
            jax.config.update("jax_num_cpu_devices", int(local_device_count))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        cluster_detection_method="deactivate",
    )


def global_data_mesh(axes: Tuple[str, ...] = ("data",)):
    """One-axis mesh over EVERY device in the job (all hosts). Per-host
    stream batches shard along 'data'; XLA routes any cross-shard
    collective over ICI within a host/slice and DCN across."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()  # global: all processes' devices, stable order
    return Mesh(np.array(devs).reshape(len(devs)), axes)


def feed_process_local(mesh, local_batch: np.ndarray, axis: int = 0):
    """Host-local numpy batch → one global jax.Array sharded along `axis`.

    The DCN batch-feeding primitive (SURVEY.md:399-402): every process
    passes the rows IT holds; the result behaves as the concatenation over
    ``process_index`` order without any host ever materializing the global
    array. No data crosses hosts here — each host's rows land on its own
    local devices; only downstream collectives (if any) touch DCN.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    local_batch = np.asarray(local_batch)
    spec = [None] * local_batch.ndim
    spec[axis] = mesh.axis_names[0]
    global_shape = list(local_batch.shape)
    global_shape[axis] *= jax.process_count()
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(*spec)), local_batch, tuple(global_shape))


def feed_process_local_tree(mesh, tree, axis: int = 0):
    """``feed_process_local`` over every leaf of a pytree (e.g. the
    denoiser's per-stream state bundle)."""
    import jax

    return jax.tree.map(lambda x: feed_process_local(mesh, x, axis), tree)


def gather_local(arr, axis: int = 0) -> np.ndarray:
    """This process's addressable shards of a sharded array, assembled in
    global-index order along `axis` — the host-side read-back of "my rows"
    after a global step. The inverse of feed_process_local for the rows
    this host fed (when the sharding keeps rows on the host that fed
    them, which a 1-axis data mesh does)."""
    shards = sorted((s for s in arr.addressable_shards),
                    key=lambda s: s.index[axis].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=axis)
