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

    def prior_loglike(N, p):
        return jnp.log(1.0 / 41.0)   # N ~ DiscreteUniform(0,40), p ~ U(0,1)

    def sample_prior(key):
        k1, k2 = jax.random.split(key)
        return [jax.random.randint(k1, (), 5, 30),
                jax.random.uniform(k2, minval=0.2, maxval=0.9)]

    model = DEModel(loglike=loglike, prior_loglike=prior_loglike,
                    sample_prior=sample_prior, names=NAMES, data=data)
    kw = dict(bounds=BOUNDS, Np=12, n_groups=4, burnin=1000, sigma=1.0,
              dtype=np.float64)
    kw.update(de_kwargs)
    de = DE(**kw)
    return model, de
