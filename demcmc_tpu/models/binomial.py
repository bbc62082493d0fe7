"""Binomial θ model with conjugate ground truth, plus the ABC variant.

Reference: ``/root/reference/test/binomial_tests.jl`` (exact likelihood,
conjugate Beta(k+1, N-k+1) oracle) and ``Examples/Binomial_ABC.jl``
(approximate likelihood from 10⁴ binomial simulations).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DE
from ..model import DEModel
from ..utils import dists

BOUNDS = ((0.0, 1.0),)
NAMES = ("theta",)


def prior_loglike(theta):
    return dists.beta_logpdf(theta, 1.0, 1.0)


def sample_prior(key):
    return [jax.random.beta(key, 1.0, 1.0)]


def loglike(data, theta):
    return dists.binomial_logpmf(data["k"], data["N"], theta)


def loglike_abc(data, theta, *, key=None, n_sim=10_000):
    """ABC likelihood: fraction of n_sim Binomial(N, θ) simulations hitting
    the observed k (reference ``Examples/Binomial_ABC.jl:16-23``).  One
    batched Bernoulli tensor per evaluation — the reference's 10⁴-iteration
    mapreduce becomes a single [n_sim, N] reduction.

    ``key`` defaults lazily (a module-level ``PRNGKey`` default would
    initialize the XLA backend at package import, breaking multi-host
    ``jax.distributed.initialize`` and post-import config changes)."""
    if key is None:
        key = jax.random.PRNGKey(123)
    draws = jax.random.bernoulli(key, theta, (n_sim, data["N"]))
    counts = jnp.sum(draws, axis=1)
    hit = jnp.mean((counts == data["k"]).astype(jnp.float32))
    return jnp.log(hit)


def make_model(N: int, k: int, abc: bool = False,
               fresh_noise: bool = False) -> DEModel:
    """``fresh_noise=True`` (ABC only) re-simulates with a fresh key every
    likelihood evaluation — pseudo-marginal mode, the reference example's
    global-RNG semantics (``Examples/Binomial_ABC.jl:16-23``)."""
    data = {"N": N, "k": k}
    return DEModel(loglike=loglike_abc if abc else loglike,
                   prior_loglike=prior_loglike,
                   sample_prior=sample_prior, names=NAMES, data=data,
                   stochastic=abc and fresh_noise)


def make(N=10, k=None, key=0, abc=False, fresh_noise=False, Np=4,
         burnin=1000, **de_kwargs):
    if k is None:
        k = int(jax.random.binomial(jax.random.PRNGKey(key), N, 0.5))
    model = make_model(N, k, abc=abc, fresh_noise=fresh_noise)
    de = DE(bounds=BOUNDS, burnin=burnin, Np=Np, **de_kwargs)
    return model, de


def conjugate_posterior(N: int, k: int):
    """Beta(k+1, N-k+1) moments — the closed-form oracle."""
    a, b = k + 1.0, N - k + 1.0
    mean = a / (a + b)
    var = a * b / ((a + b) ** 2 * (a + b + 1.0))
    return {"mean": mean, "std": var ** 0.5}
