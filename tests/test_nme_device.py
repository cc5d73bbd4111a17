"""Device NME-SC vs the host-numpy oracle: partition parity.

The device core (engine/nme_device.py) must reproduce the host
implementation's clustering decisions on the reference's synthetic
fixtures and on randomized cluster layouts. Labels are compared as
partitions (first-appearance canonical relabeling) since numerical
tie-breaks inside k-means may permute raw ids.
"""

import numpy as np
import pytest

from crispy_tpu.engine import diarization as dz
from crispy_tpu.engine import nme_device


def canonical(labels):
    """Relabel by first appearance so partitions compare directly."""
    seen = {}
    out = []
    for v in np.asarray(labels).tolist():
        if v not in seen:
            seen[v] = len(seen)
        out.append(seen[v])
    return out


def cluster_emb(centers, per, dim=6):
    out = []
    for ci, c in enumerate(centers):
        for p in range(per):
            v = np.zeros(dim, np.float32)
            v[c] = 1.0
            v[dim - 1] += 0.01 * (ci + 1) + 0.001 * p
            out.append(v)
    return np.stack(out)


class TestDeviceParity:
    @pytest.mark.parametrize("k_true", [2, 3, 4])
    def test_synthetic_clusters(self, k_true):
        emb = cluster_emb(range(k_true), per=5)
        host = dz.nme_sc_host(emb, max_speakers=8)
        dev = nme_device.nme_sc_device(emb, max_speakers=8)
        assert canonical(dev) == canonical(host)
        assert len(set(dev.tolist())) == k_true

    def test_single_cluster_collapses(self):
        emb = cluster_emb([0], per=6)
        assert set(nme_device.nme_sc_device(emb, 8).tolist()) == {0}
        rng = np.random.default_rng(0)
        blob = np.zeros((8, 16), np.float32)
        blob[:, 0] = 1.0
        blob += 0.05 * rng.standard_normal((8, 16)).astype(np.float32)
        assert set(nme_device.nme_sc_device(blob, 8).tolist()) == {0}

    def test_max_speakers_bound(self):
        emb = cluster_emb(range(3), per=5)
        assert len(set(nme_device.nme_sc_device(emb, 2).tolist())) <= 2

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_randomized_gaussian_clusters(self, seed):
        rng = np.random.default_rng(seed)
        k = int(rng.integers(2, 5))
        dim = 24
        centers = rng.standard_normal((k, dim)).astype(np.float32) * 3.0
        pts = []
        for c in centers:
            m = int(rng.integers(6, 12))
            pts.append(c[None] + 0.1 * rng.standard_normal((m, dim)).astype(np.float32))
        emb = np.concatenate(pts)
        host = dz.nme_sc_host(emb, max_speakers=8)
        dev = nme_device.nme_sc_device(emb, max_speakers=8)
        assert canonical(dev) == canonical(host)

    def test_zero_norm_rows_isolated(self):
        """Zero embeddings are isolated nodes; host falls back to the raw
        criterion (never-connected graph) — device must agree."""
        emb = cluster_emb(range(2), per=4)
        emb[3] = 0.0
        host = dz.nme_sc_host(emb, max_speakers=4)
        dev = nme_device.nme_sc_device(emb, max_speakers=4)
        assert canonical(dev) == canonical(host)

    def test_bucket_padding_irrelevant(self):
        """n just below vs above a bucket edge must not change labels."""
        emb = cluster_emb(range(2), per=8)  # n=16, exact bucket
        d16 = nme_device.nme_sc_device(emb, 8)
        h16 = dz.nme_sc_host(emb, 8)
        assert canonical(d16) == canonical(h16)
        emb17 = np.concatenate([emb, emb[-1:] + 0.001])  # n=17 → bucket 32
        d17 = nme_device.nme_sc_device(emb17, 8)
        h17 = dz.nme_sc_host(emb17, 8)
        assert canonical(d17) == canonical(h17)

    def test_dispatcher_uses_device(self, monkeypatch):
        monkeypatch.delenv("CRISPY_NME", raising=False)
        calls = {}
        orig = nme_device.nme_sc_device

        def spy(emb, k, mesh=None):
            calls["hit"] = True
            return orig(emb, k, mesh=mesh)

        monkeypatch.setattr(nme_device, "nme_sc_device", spy)
        emb = cluster_emb(range(2), per=5)
        dz.nme_sc(emb, 4)
        assert calls.get("hit")

    def test_dispatcher_host_optout(self, monkeypatch):
        monkeypatch.setenv("CRISPY_NME", "host")

        def boom(emb, k):  # device path must not be touched
            raise AssertionError("device path used despite CRISPY_NME=host")

        monkeypatch.setattr(nme_device, "nme_sc_device", boom)
        emb = cluster_emb(range(2), per=5)
        labels = dz.nme_sc(emb, 4)
        assert len(set(labels.tolist())) == 2


class TestSubspaceSweep:
    """Large buckets (N ≥ 512) switch the p-sweep from full eigvalsh to
    subspace iteration for the bottom KMAX+1 eigenvalues. Partition
    equality vs the host oracle must hold across the switch."""

    def test_large_n_clusters_match_host(self):
        rng = np.random.default_rng(11)
        k_true = 5
        centers = rng.standard_normal((k_true, 24)).astype(np.float32) * 3.0
        n = 300  # bucket 512 → subspace path
        emb = (centers[rng.integers(0, k_true, n)]
               + 0.12 * rng.standard_normal((n, 24))).astype(np.float32)
        dev = nme_device.nme_sc_device(emb, 8)
        host = dz.nme_sc_host(emb, 8)
        assert canonical(dev) == canonical(host)

    def test_large_n_ritz_values_accurate(self):
        """The Ritz bottom eigenvalues that feed the eigengap must track
        f64 LAPACK truth: converged below the cluster cut, one-sided
        (upper-bound) and small at the cut edge."""
        import jax.numpy as jnp

        rng = np.random.default_rng(5)
        k_true = 4
        centers = rng.standard_normal((k_true, 16)).astype(np.float32) * 3.0
        n = 300
        emb = (centers[rng.integers(0, k_true, n)]
               + 0.1 * rng.standard_normal((n, 16))).astype(np.float32)

        N = nme_device._bucket(n)
        assert N >= nme_device._SUBSPACE_MIN_N
        # reproduce the core's affinity/prune/laplacian for one mid-sweep p
        norms = np.sqrt((emb ** 2).sum(1))
        normed = emb / np.maximum(norms, 1e-12)[:, None]
        aff = np.clip(normed @ normed.T, 0, 1)
        np.fill_diagonal(aff, 0.0)
        p = 10
        rank = np.argsort(np.argsort(-aff, axis=1, kind="stable"), axis=1)
        a = np.where(rank < p, aff, 0.0)
        a = np.maximum(a, a.T)
        apad = np.zeros((N, N), np.float32)
        apad[:n, :n] = a
        valid = np.arange(N) < n
        dinv = 1.0 / np.sqrt(np.maximum(apad.sum(1), 1e-9))
        lap = np.eye(N, dtype=np.float32) - dinv[:, None] * apad * dinv[None, :]
        lap[np.arange(N)[~valid], np.arange(N)[~valid]] = 3.0

        truth = np.linalg.eigvalsh(lap.astype(np.float64))[:10]
        # the core's _ritz IS this module-level function
        lam = np.asarray(nme_device.subspace_bottom(
            jnp.asarray(lap), 16)[0])[:10]
        err = lam - truth
        assert err.min() > -1e-3  # Ritz values upper-bound the truth
        assert np.abs(err).max() < 5e-2
