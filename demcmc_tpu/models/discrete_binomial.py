"""Discrete-parameter model: infer a binomial count N (integer) and rate p.

Reference: ``/root/reference/Examples/Discrete_Example.jl`` — the only
integer-parameter example; exercises the round-and-cast rule
(``src/utilities.jl:360-369``): proposals on integer leaves are computed
in float and snapped back, so chains stay integral.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln

from ..config import DE
from ..model import DEModel

NAMES = ("N", "p")
BOUNDS = ((0, 40), (0.0, 1.0))


def binomial_logpmf_continuous_n(k, N, p):
    """Binomial(N, p) log pmf with N allowed real (gammaln form); -inf
    when N < k."""
    Nf = jnp.asarray(N, jnp.result_type(float))
    lp = (gammaln(Nf + 1) - gammaln(k + 1.0) - gammaln(Nf - k + 1)
          + k * jnp.log(p) + (Nf - k) * jnp.log1p(-p))
    return jnp.where(Nf >= k, lp, -jnp.inf)


def make(key=0, true_n=10, true_p=0.6, n_obs=50, data=None, **de_kwargs):
    """Returns ``(model, de)`` like every other zoo model; the generating
    truth is whatever ``true_n``/``true_p`` you passed (defaults 10, 0.6).
    """
    if data is None:
        data = jnp.asarray(
            np.random.default_rng(key).binomial(true_n, true_p, size=n_obs))

    def loglike(data, N, p):
        return jnp.sum(binomial_logpmf_continuous_n(data, N, p))

    def loglike_batched(data, N, p):
        """Chains-last batched form for the fused TPU kernel (N arrives
        int32 from the round-and-cast rule, p float).  The observation
        sum folds through the UNIQUE observed counts: Σᵢ lgamma(N-kᵢ+1)
        groups into Σ_k count_k·lgamma(N-k+1) (≤ ~15 lgamma evaluations
        instead of 2·n_obs) and the θ-free terms fold to one constant at
        build time."""
        from scipy.special import gammaln as _sp_gammaln
        k_np = np.asarray(data)
        kvals, counts = np.unique(k_np, return_counts=True)
        n = float(k_np.size)
        Sk = float(k_np.sum())
        const = float(-np.sum(counts * _sp_gammaln(kvals + 1.0)))
        Nf = N.astype(p.dtype)
        lp = (n * gammaln(Nf + 1.0) + const
              + Sk * jnp.log(p) + (n * Nf - Sk) * jnp.log1p(-p))
        for kv, c in zip(kvals, counts):
            lp = lp - float(c) * gammaln(Nf - float(kv) + 1.0)
        return jnp.where(Nf >= float(kvals.max()), lp, -jnp.inf)

    def prior_loglike(N, p):
        return jnp.log(1.0 / 41.0)   # N ~ DiscreteUniform(0,40), p ~ U(0,1)

    def prior_loglike_batched(N, p):
        return jnp.full(p.shape, float(np.log(1.0 / 41.0)), p.dtype)

    def sample_prior(key):
        k1, k2 = jax.random.split(key)
        return [jax.random.randint(k1, (), 5, 30),
                jax.random.uniform(k2, minval=0.2, maxval=0.9)]

    model = DEModel(loglike=loglike, prior_loglike=prior_loglike,
                    sample_prior=sample_prior, names=NAMES, data=data,
                    loglike_batched=loglike_batched,
                    prior_loglike_batched=prior_loglike_batched)
    kw = dict(bounds=BOUNDS, Np=12, n_groups=4, burnin=1000, sigma=1.0,
              dtype=np.float64)
    kw.update(de_kwargs)
    de = DE(**kw)
    return model, de
