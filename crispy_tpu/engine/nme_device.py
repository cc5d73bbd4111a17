"""Device-side NME-SC spectral clustering.

TPU-first port of the host-numpy implementation in
`engine/diarization.py` (reference algorithm:
src-tauri/src/managers/diarization.rs:422-611, Park et al. 2019).
The whole pipeline — cosine affinity, top-p row pruning, the p-sweep of
pruned-Laplacian eigendecompositions, connectivity, spectral embedding,
deterministic farthest-point k-means, and the separation check — runs as
ONE jitted program per (bucketed) problem shape:

  * n is padded to a power-of-two bucket so recompiles are rare; padded
    rows are masked everywhere and their Laplacian diagonal is pushed to
    3.0 (> the 2.0 spectral ceiling of a normalized Laplacian) so they
    can never enter the smallest-k eigenvalues.
  * The p-sweep batches `jnp.linalg.eigvalsh` over p via `lax.map`
    (batch_size-chunked to bound the [p, n, n] working set) instead of
    the host's serial O(p_max) loop of `np.linalg.eigvalsh` calls.
  * Graph connectivity (the host BFS) becomes ⌈log2 n⌉ boolean matmul
    squarings of (A + I) — exact reachability, MXU-friendly.
  * The host's O(n²) pure-Python separation double-loop becomes three
    masked reductions.

Numerical parity: identical arithmetic order is not guaranteed (XLA
eigh vs LAPACK, fused reductions), so labels can differ from the host
oracle only where the host itself is tie-break sensitive; the test
suite asserts partition equality on the reference's synthetic fixtures.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_SWEEP_BATCH = 16  # p-chunk for lax.map: bounds the [batch, N, N] working set
# (measured on v5e at the 1024-bucket: bs=16 and full vmap both run the
# 64-p sweep ~3x faster than bs=8 — 2.45 s vs 7.2 s warm; beyond 16 only
# compile time grows)

# Above this bucket the p-sweep switches from full `eigvalsh` to subspace
# iteration for the bottom KMAX+1 eigenvalues (all the sweep consumes).
# Measured on v5e at N=1024, P=60: 1.86 s -> 75 ms, and MORE accurate on
# clustered spectra — f32 QDWH eigvalsh smears a 7-fold zero cluster by
# up to 1.8e-2 (vs f64 LAPACK truth) where the Ritz values stay ≤5e-3;
# the k-cut edge eigenvalue carries ~3e-2 one-sided Ritz bias, the same
# order as the QDWH error it replaces. Below the threshold full eigvalsh
# is cheap and keeps the small-n paths maximally boring.
_SUBSPACE_MIN_N = 512
_SUBSPACE_ITERS = 48
_SUBSPACE_MAX_DIM = 64  # fall back to eigvalsh when KMAX+2 exceeds this

# The FINAL speaker-count decision (eigengap at the chosen p*) re-runs the
# subspace iteration once at higher accuracy: the sweep's S=16/48-iter Ritz
# values carry up to ~2e-2 one-sided bias on adversarial near-window spectra
# (fine for the smooth ratio argmin over p, and measured flip-free for gap
# margins ≥1e-2), but the k decision itself deserves the tighter pass —
# S=32/96 iters is measured flip-free vs f64 LAPACK truth down to 1e-3 gap
# margins with worst Ritz error <1e-3 (tests/test_nme_eigengap.py). Cost:
# ONE extra iteration (≈4x a single sweep entry) vs P≈60 sweep entries.
_FINAL_SUB = 32
_FINAL_ITERS = 96


@functools.lru_cache(maxsize=8)
def _start_basis(N: int, S: int) -> np.ndarray:
    """Deterministic full-rank start basis for the subspace iteration; any
    fixed full-rank matrix works (the iteration forgets it at the
    geometric rate). Cached as numpy — a cached jnp constant created under
    one jit trace would leak that trace's tracer into later traces."""
    return np.random.default_rng(0).standard_normal((N, S)).astype(np.float32)


def subspace_bottom(L, s_sub: int, iters: int = _SUBSPACE_ITERS):
    """Bottom-s_sub eigenpairs of a padded normalized Laplacian by subspace
    iteration on M = 3I−L (the real block's spectrum lies in [0,2]; pad
    rows sit at exactly 3, so M sends them to 0, below every real mode).

    Returns (ascending bottom eigenvalues [s_sub], matching Ritz vectors
    [N, s_sub]). Ritz values upper-bound the true eigenvalues; the
    near-tie eigengap error bar is pinned by tests/test_nme_eigengap.py.
    """
    HI = jax.lax.Precision.HIGHEST
    N = L.shape[-1]
    V0 = jnp.asarray(_start_basis(N, s_sub))
    M = 3.0 * jnp.eye(N, dtype=jnp.float32) - L

    with jax.default_matmul_precision("float32"):
        def it(_, V):
            Q, _r = jnp.linalg.qr(jnp.matmul(M, V))
            return Q

        V = lax.fori_loop(0, iters, it, V0)
        T = jnp.matmul(V.T, jnp.matmul(M, V))
    mu, W = jnp.linalg.eigh(T)  # ascending in mu = 3 - lambda
    lam = (3.0 - mu)[::-1]  # ascending bottom eigenvalues of L
    vecs = jnp.matmul(V, W, precision=HI)[:, ::-1]
    return lam, vecs


def _bucket(n: int, lo: int = 8) -> int:
    """Power-of-two up to 256, then multiples of 256: eigh is O(N³), so
    coarse pow2 buckets would waste up to ~8× flops at hour-scale n."""
    b = lo
    while b < n and b < 256:
        b *= 2
    if b >= n:
        return b
    return -(-n // 256) * 256


def _p_cap(n: int) -> int:
    """Static upper bound of the sweep: p_max = min(n-1, max(⌊√n⌋,2)·2)
    (monotone in n, so the bucket's cap covers every real n it holds)."""
    return int(min(n - 1, max(int(np.sqrt(n)), 2) * 2))


@functools.lru_cache(maxsize=32)
def _build_core(N: int, P: int, KMAX: int, n_sq: int, mesh=None):
    """Jitted NME-SC core for bucketed shapes.

    N: padded point count; P: padded sweep length; KMAX: static center
    slots (≥ every runtime kmax); n_sq: reachability squaring count.
    mesh: optional jax.sharding.Mesh — the p-sweep (the O(P·N³) term) is
    embarrassingly parallel over p, so its batch axis shards over the
    mesh's 'data' axis and each chip eigendecomposes P/ndev Laplacians;
    everything after the sweep (one more eigh + k-means) is a single
    small problem and stays replicated.
    """
    HI = jax.lax.Precision.HIGHEST
    S_SUB = max(16, KMAX + 2)
    use_subspace = N >= _SUBSPACE_MIN_N and S_SUB <= _SUBSPACE_MAX_DIM

    def _ritz(L):
        return subspace_bottom(L, S_SUB)

    def _laplacian(a, valid):
        # a: pruned symmetric affinity with zero diagonal / zero pad rows.
        dinv = 1.0 / jnp.sqrt(jnp.maximum(jnp.sum(a, axis=1), 1e-9))
        na = dinv[:, None] * a * dinv[None, :]
        lap = jnp.eye(N, dtype=jnp.float32) - na  # diag(na)=0 by construction
        # pad nodes: eigenvalue 3.0, above the [0, 2] spectrum of the
        # real block, so sorted-ascending order keeps real values first
        pad_diag = jnp.eye(N, dtype=bool) & ~valid[:, None]
        return jnp.where(pad_diag, 3.0, lap)

    def _connected(a, valid):
        # reachability from node 0 via ⌈log2 N⌉ squarings of (A | I);
        # {0,1} float matmuls accumulate exactly (counts < 2^24)
        adj = (a > 0.0) | (jnp.eye(N, dtype=bool) & valid[:, None])
        m = adj.astype(jnp.float32)
        for _ in range(n_sq):
            m = (jnp.matmul(m, m) > 0.0).astype(jnp.float32)
        return jnp.all(jnp.where(valid, m[0] > 0.0, True))

    def _eigengap(ev, kmax):
        # ev ascending; host: argmax of ev[i]-ev[i-1] for i in 1..kmax,
        # first-max tie-break, k floor 1, gap floor 0
        idx = jnp.arange(1, KMAX + 1)
        gaps = ev[idx] - ev[idx - 1]
        gaps = jnp.where(idx <= kmax, gaps, -jnp.inf)
        bi = jnp.argmax(gaps)
        return jnp.maximum(idx[bi], 1), jnp.maximum(gaps[bi], 0.0)

    def _kmeans(points, k, valid):
        # deterministic farthest-point seeding + 50 Lloyd iterations
        # (host kmeans semantics; inactive centers masked to +inf)
        slots = jnp.arange(KMAX)

        centers0 = jnp.zeros((KMAX, KMAX), jnp.float32).at[0].set(points[0])

        def seed(c, centers):
            d = jnp.sum((points[:, None, :] - centers[None]) ** 2, axis=-1)
            dmin = jnp.min(jnp.where((slots < c)[None, :], d, jnp.inf), axis=1)
            nxt = jnp.argmax(jnp.where(valid, dmin, -1.0))
            new = jnp.where(c < k, points[nxt], centers[c])
            return centers.at[c].set(new)

        centers = lax.fori_loop(1, KMAX, seed, centers0)

        def lloyd(_, carry):
            centers, _labels = carry
            d = jnp.sum((points[:, None, :] - centers[None]) ** 2, axis=-1)
            d = jnp.where((slots < k)[None, :], d, jnp.inf)
            labels = jnp.argmin(d, axis=1)
            onehot = ((labels[:, None] == slots[None, :]) & valid[:, None])
            cnt = jnp.sum(onehot, axis=0).astype(jnp.float32)
            sums = jnp.matmul(onehot.T.astype(jnp.float32), points,
                              precision=HI)
            centers = jnp.where(cnt[:, None] > 0,
                                sums / jnp.maximum(cnt, 1.0)[:, None], centers)
            return centers, labels

        _, labels = lax.fori_loop(
            0, 50, lloyd, (centers, jnp.zeros(N, jnp.int32)))
        return labels

    @jax.jit
    def core(emb, n, kmax):
        ii = jnp.arange(N)
        valid = ii < n
        vmat = valid[:, None] & valid[None, :]

        norms = jnp.sqrt(jnp.sum(emb * emb, axis=1))
        normed = emb / jnp.maximum(norms, 1e-12)[:, None]
        aff = jnp.clip(jnp.matmul(normed, normed.T, precision=HI), 0.0, 1.0)
        keepable = (vmat & (norms > 0)[:, None] & (norms > 0)[None, :]
                    & (ii[:, None] != ii[None, :]))
        aff = jnp.where(keepable, aff, 0.0)

        # per-row descending stable rank (ties keep ascending index, the
        # host's stable sort); self/invalid keyed below every real value
        sort_key = jnp.where(keepable, aff, -1.0)
        order = jnp.argsort(-sort_key, axis=1, stable=True)
        rank = jnp.argsort(order, axis=1)  # rank of each column in its row
        keep_cap = n - 1

        def pruned(p):
            keep = jnp.minimum(p, keep_cap)
            a = jnp.where(rank < keep, aff, 0.0)
            return jnp.maximum(a, a.T)  # symmetrize by max

        def sweep(p):
            a = pruned(p)
            lap = _laplacian(a, valid)
            if use_subspace:
                ev = _ritz(lap)[0]  # bottom S_SUB ≥ KMAX+1, ascending
            else:
                ev = jnp.linalg.eigvalsh(lap)
            _k, gap = _eigengap(ev, kmax)
            ratio = (p.astype(jnp.float32) / n.astype(jnp.float32)) \
                / jnp.maximum(gap, 1e-6)
            return ratio, _connected(a, valid)

        ps = jnp.arange(1, P + 1)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            ps = lax.with_sharding_constraint(
                ps, NamedSharding(mesh, PartitionSpec("data")))
            ratios, conns = jax.vmap(sweep)(ps)
        else:
            ratios, conns = lax.map(sweep, ps, batch_size=_SWEEP_BATCH)

        # dynamic sweep bound for the real n
        p_max = jnp.minimum(
            n - 1, jnp.maximum(jnp.sqrt(n.astype(jnp.float32)).astype(jnp.int32),
                               2) * 2)
        p_ok = ps <= p_max
        # prefer connected graphs (host robustness rule); fall back to the
        # raw criterion when no p yields a connected graph
        any_conn = jnp.any(conns & p_ok)
        inf = jnp.float32(np.inf)
        r_final = jnp.where(any_conn,
                            jnp.where(p_ok & conns, ratios, inf),
                            jnp.where(p_ok, ratios, inf))
        pi = jnp.argmin(r_final)  # first min, like the host's strict '<'

        # spectral embedding at p* + the REFINED final k decision: the
        # host oracle derives k from a full-accuracy eigendecomposition of
        # the chosen Laplacian (diarization.py nme_sc_host), so the device
        # k comes from the high-accuracy pass too, not the sweep's cheap
        # Ritz values (near-tie error bar: tests/test_nme_eigengap.py)
        lap_star = _laplacian(pruned(ps[pi]), valid)
        if use_subspace:
            S_FIN = min(max(_FINAL_SUB, KMAX + 2), N)
            lam_star, evecs = subspace_bottom(lap_star, S_FIN, _FINAL_ITERS)
        else:
            lam_star, evecs = jnp.linalg.eigh(lap_star)
        k_star, _gap = _eigengap(lam_star, kmax)
        k = jnp.clip(k_star, 1, kmax)
        spec = evecs[:, :KMAX] * (jnp.arange(KMAX) < k)[None, :]
        rn = jnp.sqrt(jnp.sum(spec * spec, axis=1, keepdims=True))
        spec = jnp.where(rn > 1e-9, spec / jnp.maximum(rn, 1e-9), spec)

        labels = _kmeans(spec, k, valid)

        # separation validation: collapse to one speaker when the found
        # clusters aren't separated in affinity space (host: 0.9 factor)
        same = labels[:, None] == labels[None, :]
        triu = (ii[:, None] < ii[None, :]) & vmat
        w_sum = jnp.sum(jnp.where(same & triu, aff, 0.0))
        b_sum = jnp.sum(jnp.where(~same & triu, aff, 0.0))
        nw = jnp.sum((same & triu).astype(jnp.float32))
        nb = jnp.sum((~same & triu).astype(jnp.float32))
        sep_bad = ((nw > 0) & (nb > 0)
                   & (b_sum / jnp.maximum(nb, 1.0)
                      > 0.9 * (w_sum / jnp.maximum(nw, 1.0))))
        return jnp.where(sep_bad | (k <= 1), 0, labels)

    return core


def nme_sc_device(embeddings: np.ndarray, max_speakers: int,
                  mesh=None) -> np.ndarray:
    """Drop-in device replacement for `diarization.nme_sc` (n > 2).

    With a mesh the p-sweep shards over the 'data' axis (the sweep length
    pads to a device multiple; extra p values are masked by the dynamic
    p_max bound exactly like bucket padding already is)."""
    emb = np.asarray(embeddings, np.float32)
    n, d = emb.shape
    if n == 0:
        return np.zeros(0, np.int64)
    if n <= 2:
        return np.zeros(n, np.int64)
    kmax = max(1, min(max_speakers, n - 1))

    N = _bucket(n)
    Dp = -(-d // 64) * 64  # pad features to a lane multiple
    P = _p_cap(N)
    KMAX = int(min(max(kmax, 1), N - 1))
    n_sq = int(np.ceil(np.log2(max(N, 2))))

    if mesh is not None:
        ndev = int(np.prod(mesh.devices.shape))
        P = -(-P // ndev) * ndev
    emb_pad = np.zeros((N, Dp), np.float32)
    emb_pad[:n, :d] = emb
    core = _build_core(N, P, KMAX, n_sq, mesh)
    labels = core(jnp.asarray(emb_pad), jnp.int32(n), jnp.int32(kmax))
    return np.asarray(labels)[:n].astype(np.int64)
