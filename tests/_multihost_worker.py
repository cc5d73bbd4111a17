"""One rank of the multi-host (DCN) drill — run as a subprocess.

Usage: python _multihost_worker.py <process_id> <num_processes> <port> <outdir>

Each rank joins a 2-process CPU mesh (gloo collectives), feeds ITS slice of
a deterministic global stream batch via
``jax.make_array_from_process_local_data`` (SURVEY.md:399-402's DCN batch
feeding), runs ONE denoise-block step and ONE whisper greedy-decode step
over the GLOBAL mesh, reads back its own shards, and asserts they equal the
single-device unsharded computation of the same rows — sharded ==
unsharded across a real process boundary. Writes ``rank<id>.ok`` on
success; any assertion kills the rank and the parent test fails on the
exit code.
"""

import os
import sys
from pathlib import Path

import numpy as np

LOCAL_DEVICES = 4
STREAMS_PER_PROC = 4
FRAMES = 4
ASR_PER_PROC = 4  # batch must tile the 8-device global mesh


def main() -> None:
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], Path(sys.argv[4]))
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    from crispy_tpu.parallel import multihost as mh

    mh.initialize_from_env(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc,
        process_id=pid, platform="cpu", local_device_count=LOCAL_DEVICES)

    import jax
    import jax.numpy as jnp

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == LOCAL_DEVICES
    mesh = mh.global_data_mesh()
    assert mesh.devices.size == nproc * LOCAL_DEVICES

    from crispy_tpu.dsp.rnnoise import jax_pipeline as jp
    from crispy_tpu.dsp.rnnoise.weights import deterministic_test_model

    # ---- denoise block: global batch fed process-locally -------------------
    S_g = STREAMS_PER_PROC * nproc
    rng = np.random.default_rng(0)  # same seed every rank: global fixture
    full = (rng.standard_normal((S_g, FRAMES * 480)) * 0.3).astype(np.float32)
    lo, hi = pid * STREAMS_PER_PROC, (pid + 1) * STREAMS_PER_PROC
    params = jp.make_params(deterministic_test_model())

    state_full = jp.init_state(S_g)
    state_local = jax.tree.map(lambda x: np.asarray(x)[lo:hi], state_full)
    state_g = mh.feed_process_local_tree(mesh, state_local)
    block_g = mh.feed_process_local(mesh, full[lo:hi])

    step = jp.denoise_block_sharded(mesh, params, state_g)
    _, out_g, _ = step(params, state_g, block_g)
    mine = mh.gather_local(out_g)

    # unsharded truth for MY rows, one local device, fresh state. atol
    # matches test_mesh_production's sharded==unsharded pin (1e-3): the
    # denoiser's discrete near-tie branches (pitch-filter select, silence
    # gate) can flip under different fusion choices on noise-like input
    # (measured 3.2e-4 worst sample here) — same band PERF.md documents.
    _, ref, _ = jp.denoise_block(
        params, jp.init_state(STREAMS_PER_PROC), jnp.asarray(full[lo:hi]))
    np.testing.assert_allclose(mine, np.asarray(ref), atol=1e-3)

    # ---- one ASR step: whisper greedy decode over the global mesh ----------
    from crispy_tpu.models.whisper import WhisperModel
    from crispy_tpu.models.whisper.model import greedy_decode

    wm = WhisperModel.random("test-random", seed=0)
    B_g = ASR_PER_PROC * nproc
    mel_full = (rng.standard_normal((B_g, wm.cfg.n_mels, 3000)) * 0.5
                ).astype(np.float32)
    alo, ahi = pid * ASR_PER_PROC, (pid + 1) * ASR_PER_PROC
    mel_g = mh.feed_process_local(mesh, mel_full[alo:ahi])
    prompt_g = mh.feed_process_local(
        mesh, np.full((ASR_PER_PROC, 1), wm.cfg.sot, np.int32))
    toks_g, _ = greedy_decode(wm.params, wm.cfg, mel_g, prompt_g,
                              max_new=3, eot=wm.cfg.eot)
    my_toks = mh.gather_local(toks_g)

    ref_toks, _ = greedy_decode(
        wm.params, wm.cfg, jnp.asarray(mel_full[alo:ahi]),
        jnp.full((ASR_PER_PROC, 1), wm.cfg.sot, jnp.int32),
        max_new=3, eot=wm.cfg.eot)
    assert np.array_equal(my_toks, np.asarray(ref_toks)), (
        my_toks, np.asarray(ref_toks))

    outdir.mkdir(parents=True, exist_ok=True)
    (outdir / f"rank{pid}.ok").write_text(
        f"devices={mesh.devices.size} denoise={mine.shape} asr={my_toks.shape}")
    print(f"[rank {pid}] MULTIHOST_OK", flush=True)


if __name__ == "__main__":
    main()
