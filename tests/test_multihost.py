"""Multi-host (DCN) batch feeding — SURVEY.md §2.8's one prescription with
a process boundary in it (SURVEY.md:196,399-402): multi-host batch sharding
via jax.distributed + jax.make_array_from_process_local_data.

The drill spawns TWO real OS processes, each owning 4 virtual CPU devices
(gloo TCP collectives = the CPU stand-in for DCN), forming one global
8-device mesh. Each rank feeds its process-local stream batch, runs the
shard_map denoise block and a whisper greedy-decode step over the global
mesh, and asserts its shards equal the unsharded single-device result —
sharded == unsharded across hosts, the same pin test_mesh_production
makes within one process.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "_multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(rank: int, nproc: int, port: int, outdir: Path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    # the workers pick their own device count; drop the parent's force flag
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "force_host_platform_device_count" not in f)
    return subprocess.Popen(
        [sys.executable, str(WORKER), str(rank), str(nproc), str(port),
         str(outdir)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def test_two_process_dcn_feeding(tmp_path):
    nproc = 2
    port = _free_port()
    procs = [_spawn(r, nproc, port, tmp_path) for r in range(nproc)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-4000:]}"
        assert f"[rank {r}] MULTIHOST_OK" in out
        ok = tmp_path / f"rank{r}.ok"
        assert ok.exists()
        assert "devices=8" in ok.read_text()
