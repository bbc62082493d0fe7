"""Streaming convergence monitoring — live R̂ / rough ESS during a run.

The reference's only run-time observability is a ProgressMeter bar
(``src/main.jl:30``); convergence is assessed post-hoc via MCMCChains.
Here :class:`ConvergenceMonitor` consumes trajectory chunks as they come
off the device (``run_scan`` already transfers them for bundling, so
monitoring costs nothing on-device) and maintains per-parameter running
statistics:

* chain-level potential scale reduction R̂ (Gelman-Rubin between/within
  variance ratio over all chains — the streaming analogue of
  ``diagnostics.rhat``; NOT split-R̂, which needs the full trajectory
  and is still computed post-hoc by :func:`demcmc_tpu.diagnostics.rhat`)
* a rough ESS from the streaming lag-1 autocorrelation,
  ``N·(1-ρ₁)/(1+ρ₁)`` per chain, summed over chains.

``sample(..., progress=True)`` feeds post-burnin draws automatically and
shows ``max R̂`` live in the progress line.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ConvergenceMonitor"]


class ConvergenceMonitor:
    """Accumulates draws chunk-by-chunk; ``theta`` chunks are
    ``[T, C, d]`` (or the fused layout ``[T, d, 8, C/8]``, auto-detected
    by ``fused=True``)."""

    def __init__(self, fused: bool = False):
        self.fused = fused
        self.n = 0
        self._s1 = None      # [C, d] running sum
        self._s2 = None      # [C, d] running sum of squares
        self._sx1 = None     # [C, d] running sum of x_t * x_{t-1}
        self._prev = None    # [C, d] last draw of the previous chunk

    def update(self, theta_chunk) -> None:
        x = np.asarray(theta_chunk, np.float64)
        if self.fused:                       # [T, d, R, Cf] -> [T, C, d]
            T, d = x.shape[0], x.shape[1]
            x = np.swapaxes(x.reshape(T, d, -1), 1, 2)
        if x.shape[0] == 0:
            return
        if self._s1 is None:
            C, d = x.shape[1:]
            self._s1 = np.zeros((C, d))
            self._s2 = np.zeros((C, d))
            self._sx1 = np.zeros((C, d))
        self._s1 += x.sum(axis=0)
        self._s2 += (x * x).sum(axis=0)
        lagged = x[:-1] if self._prev is None else np.concatenate(
            [self._prev[None], x[:-1]], axis=0)
        self._sx1 += (x[-len(lagged):] * lagged).sum(axis=0)
        self._prev = x[-1]
        self.n += x.shape[0]

    def rhat(self):
        """Per-parameter chain-level R̂ (None until >= 4 draws)."""
        if self.n < 4:
            return None
        n = self.n
        mean = self._s1 / n                                   # [C, d]
        var = (self._s2 - n * mean * mean) / (n - 1)          # [C, d]
        W = var.mean(axis=0)                                  # [d]
        B_over_n = mean.var(axis=0, ddof=1)                   # [d]
        var_plus = (n - 1) / n * W + B_over_n
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.sqrt(var_plus / W)
        return r

    def max_rhat(self):
        r = self.rhat()
        return None if r is None else float(np.nanmax(r))

    def ess_rough(self):
        """Per-parameter rough ESS from streaming lag-1 autocorrelation,
        summed over chains (None until >= 4 draws)."""
        if self.n < 4:
            return None
        n = self.n
        mean = self._s1 / n
        var = (self._s2 - n * mean * mean) / n
        # autocovariance at lag 1 around the running mean
        cov1 = self._sx1 / (n - 1) - mean * mean
        with np.errstate(divide="ignore", invalid="ignore"):
            rho1 = np.clip(cov1 / var, -0.999, 0.999)
            per_chain = n * (1.0 - rho1) / (1.0 + rho1)
        return np.nansum(per_chain, axis=0)
