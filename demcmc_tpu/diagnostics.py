"""Convergence diagnostics: split-R̂ and effective sample size.

The reference delegates these to MCMCChains.jl (used throughout its tests,
e.g. ``test/gaussian_tests.jl:42-44``); this framework implements them
natively.  Formulas follow Vehtari, Gelman, Simpson, Carpenter & Bürkner
(2021), "Rank-normalization, folding, and localization: An improved R̂" —
the same spec MCMCChains/Stan/ArviZ implement:

* :func:`split_rhat` — classic split-chain potential scale reduction.
* :func:`rank_normalized_rhat` — max of bulk (rank-normalized split-R̂) and
  tail (folded rank-normalized split-R̂).
* :func:`ess` — bulk ESS via Geyer's initial monotone positive sequence on
  split chains, autocovariance by FFT.

All run host-side on numpy float64 — diagnostics are O(draws), never the
hot path, and need the extra precision more than the TPU.
"""

from __future__ import annotations

import numpy as np
from scipy.special import ndtri  # available via jax's scipy dependency


def _split(x: np.ndarray) -> np.ndarray:
    """[N, C] -> [N//2, 2C]: split each chain in half."""
    n = (x.shape[0] // 2) * 2
    half = n // 2
    return np.concatenate([x[:half], x[half:n]], axis=1)


def _rhat_from_splits(x: np.ndarray) -> float:
    """Classic R̂ on already-split draws [n, m]."""
    n, m = x.shape
    if n < 2 or m < 2:
        return np.nan
    chain_means = x.mean(axis=0)
    chain_vars = x.var(axis=0, ddof=1)
    w = chain_vars.mean()
    b = n * chain_means.var(ddof=1)
    var_plus = (n - 1) / n * w + b / n
    if w <= 0:
        return 1.0 if var_plus <= 0 else np.inf
    return float(np.sqrt(var_plus / w))


def split_rhat(x) -> float:
    """Split-R̂ of draws ``[N, C]`` (N draws, C chains)."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    return _rhat_from_splits(_split(x))


def _rank_normalize(x: np.ndarray) -> np.ndarray:
    """Fractional ranks -> inverse-normal scores (Vehtari et al. eq. 14).

    Ties get AVERAGE ranks (the Stan/ArviZ convention): positional
    tie-breaking would give a constant (stuck) parameter artificial
    spread and report a pathological run as converged.
    """
    from scipy.stats import rankdata
    shape = x.shape
    flat = x.reshape(-1)
    ranks = rankdata(flat, method="average")
    z = ndtri((ranks - 3.0 / 8.0) / (flat.size - 2.0 * 3.0 / 8.0 + 1.0))
    return z.reshape(shape)


def rank_normalized_rhat(x) -> float:
    """max(bulk R̂, tail R̂) — the MCMCChains/Stan default ``rhat``."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    s = _split(x)
    bulk = _rhat_from_splits(_rank_normalize(s))
    folded = np.abs(s - np.median(s))
    tail = _rhat_from_splits(_rank_normalize(folded))
    return float(max(bulk, tail))


def _autocov_fft(x: np.ndarray) -> np.ndarray:
    """Biased autocovariance per chain via FFT.  x: [n, m] -> [n, m]."""
    n, m = x.shape
    xc = x - x.mean(axis=0, keepdims=True)
    size = 2 ** int(np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(xc, n=size, axis=0)
    acov = np.fft.irfft(f * np.conj(f), n=size, axis=0)[:n].real
    return acov / n


def ess(x) -> float:
    """Bulk-style ESS of draws ``[N, C]`` using split chains and Geyer's
    initial monotone positive sequence (Vehtari et al. §3.2; Stan's
    ``ess_bulk`` without the rank-normalization — see :func:`ess_bulk`)."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    s = _split(x)
    return _ess_from_splits(s)


def ess_bulk(x) -> float:
    """Rank-normalized bulk ESS (Stan / MCMCChains ``ess_bulk``)."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    s = _rank_normalize(_split(x))
    return _ess_from_splits(s)


def ess_tail(x) -> float:
    """Tail ESS (Stan / ArviZ ``ess_tail``, Vehtari et al. §4.3): the
    minimum of the ESS of the 5% and 95% quantile indicator functions —
    the resolution the chains have in the tails, which bulk ESS can
    overstate badly for sticky tails."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    q05, q95 = np.quantile(x, [0.05, 0.95])
    lo = _ess_from_splits(_split((x <= q05).astype(np.float64)))
    hi = _ess_from_splits(_split((x <= q95).astype(np.float64)))
    return float(min(lo, hi))


def _ess_from_splits(s: np.ndarray) -> float:
    n, m = s.shape
    if n < 4:
        return np.nan
    chain_vars = s.var(axis=0, ddof=1)
    w = chain_vars.mean()
    if w <= 0 or not np.isfinite(w):
        return np.nan
    b = n * s.mean(axis=0).var(ddof=1) if m > 1 else 0.0
    var_plus = (n - 1) / n * w + b / n

    acov = _autocov_fft(s)                       # [n, m]
    mean_acov = acov.mean(axis=1)
    rho = 1.0 - (w - mean_acov) / var_plus       # ρ̂_t, t = 0..n-1
    # Geyer: sum consecutive pairs while positive, enforce monotone decrease.
    max_t = (n - 2) if (n - 2) % 2 == 0 else (n - 3)
    pair = rho[:max_t + 2].reshape(-1, 2).sum(axis=1)
    pos = pair > 0
    k = int(np.argmin(pos)) if not pos.all() else len(pair)
    pair = np.minimum.accumulate(pair[:k]) if k > 0 else pair[:0]
    tau = -1.0 + 2.0 * pair.sum()
    tau = max(tau, 1.0 / np.log10(n * m + 10))   # Stan's lower clamp
    return float(n * m / tau)


def ess_device(x):
    """Device-resident mirror of :func:`ess` (split chains + Geyer initial
    monotone positive sequence, autocovariance by FFT) returning a scalar
    jnp array — used by throughput benchmarks to compute ESS/s WITHOUT
    shipping the trajectory to the host (the device→host tunnel is ~1-2
    MB/s here and would dominate the measurement).  Jit-compatible; tested
    equal to the numpy implementation in ``tests/test_diagnostics.py``.
    """
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    half = (x.shape[0] // 2 * 2) // 2
    if half < 4:                 # same degenerate contract as ess(): NaN
        return jnp.asarray(jnp.nan)
    s = jnp.concatenate([x[:half], x[half:2 * half]], axis=1)
    s = s.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    n, m = s.shape

    chain_vars = s.var(axis=0, ddof=1)
    w = chain_vars.mean()
    b = n * s.mean(axis=0).var(ddof=1) if m > 1 else 0.0
    var_plus = (n - 1) / n * w + b / n

    xc = s - s.mean(axis=0, keepdims=True)
    size = 2 ** int(np.ceil(np.log2(2 * n)))
    f = jnp.fft.rfft(xc, n=size, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=size, axis=0)[:n].real / n

    rho = 1.0 - (w - acov.mean(axis=1)) / var_plus
    max_t = (n - 2) if (n - 2) % 2 == 0 else (n - 3)
    pair = rho[:max_t + 2].reshape(-1, 2).sum(axis=1)
    pos = pair > 0
    # first non-positive pair index (length of the positive prefix)
    k = jnp.where(jnp.all(pos), pair.shape[0], jnp.argmin(pos))
    pair = jax.lax.cummin(pair)                  # monotone decrease
    tau = -1.0 + 2.0 * jnp.sum(
        jnp.where(jnp.arange(pair.shape[0]) < k, pair, 0.0))
    tau = jnp.maximum(tau, 1.0 / np.log10(n * m + 10))
    # degenerate chains (w <= 0 or non-finite): NaN, matching
    # _ess_from_splits' contract — a stuck sampler must not report a
    # large finite ESS to a benchmark
    ok = jnp.isfinite(w) & (w > 0)
    return jnp.where(ok, n * m / tau, jnp.nan)


def summary_stats(x) -> dict:
    """Posterior summary of draws [N, C]: mean/std/mcse/quantiles/rhat/ess."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    flat = x.reshape(-1)
    e = ess(x)
    return {
        "mean": float(flat.mean()),
        "std": float(flat.std(ddof=1)),
        "mcse": float(flat.std(ddof=1) / np.sqrt(e)) if e and np.isfinite(e) else np.nan,
        "q2.5": float(np.quantile(flat, 0.025)),
        "q50": float(np.quantile(flat, 0.5)),
        "q97.5": float(np.quantile(flat, 0.975)),
        "ess": e,
        "ess_bulk": ess_bulk(x),
        "ess_tail": ess_tail(x),
        "rhat": rank_normalized_rhat(x),
    }
