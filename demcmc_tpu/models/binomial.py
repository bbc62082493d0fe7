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


def loglike_abc_batched(data, theta, *, noise=None, n_sim=10_000):
    """Chains-last pseudo-marginal ABC density for the fused TPU kernel
    (consumes the ``DEModel.noise_shape`` uniform panel): simulation
    counts are drawn by INVERSE-CDF over Binomial(N, θ) — one uniform
    per simulation instead of N Bernoullis — so counts are exactly
    Binomial(N, θ) distributed and the hit-frequency estimator has the
    same law as :func:`loglike_abc`'s (the pseudo-marginal chain targets
    the same posterior).  Simulations are transformed in chunks to keep
    in-kernel intermediates within the vector register file."""
    import numpy as np
    N = int(data["N"])
    k = data["k"]
    theta = jnp.asarray(theta)
    # CDF_j(θ) = Σ_{i<=j} C(N,i) θ^i (1-θ)^{N-i}, j = 0..N-1; integer
    # powers keep the boundary cases exact (θ=0 -> count 0, θ=1 -> N)
    from scipy.special import comb
    one_m = 1.0 - theta
    cdfs = []
    cdf = None
    for j in range(N):
        pmf_j = float(comb(N, j)) * theta ** j * one_m ** (N - j)
        cdf = pmf_j if cdf is None else cdf + pmf_j
        cdfs.append(cdf)
    n_sim_n = noise.shape[0]
    cs_elems = max(int(np.prod(noise.shape[1:])), 1)
    CH = max(1, (1 << 16) // cs_elems)          # ≤ 256 KiB f32 chunks
    hits = None
    for s0 in range(0, n_sim_n, CH):
        u = noise[s0:s0 + CH]                   # [CH, *cs]
        cnt = None
        for cj in cdfs:                         # count = Σ_j 1{u > CDF_j}
            ind = (u > cj).astype(theta.dtype)
            cnt = ind if cnt is None else cnt + ind
        h = jnp.sum((cnt == jnp.asarray(k, theta.dtype))
                    .astype(theta.dtype), axis=0)
        hits = h if hits is None else hits + h
    return jnp.log(hits / float(n_sim_n))


def prior_loglike_batched(theta):
    return jnp.zeros(theta.shape, theta.dtype)   # Beta(1,1) log pdf = 0


def make_model(N: int, k: int, abc: bool = False,
               fresh_noise: bool = False, n_sim: int = 10_000) -> DEModel:
    """``fresh_noise=True`` (ABC only) re-simulates with a fresh key every
    likelihood evaluation — pseudo-marginal mode, the reference example's
    global-RNG semantics (``Examples/Binomial_ABC.jl:16-23``).  That
    configuration also declares the fused-kernel noise panel
    (``noise_shape=(n_sim,)``) with the inverse-CDF batched density."""
    import functools
    data = {"N": N, "k": k}
    pm = abc and fresh_noise
    return DEModel(loglike=(functools.partial(loglike_abc, n_sim=n_sim)
                            if abc else loglike),
                   prior_loglike=prior_loglike,
                   sample_prior=sample_prior, names=NAMES, data=data,
                   stochastic=pm,
                   loglike_batched=(functools.partial(
                       loglike_abc_batched, n_sim=n_sim) if pm else None),
                   prior_loglike_batched=(prior_loglike_batched
                                          if pm else None),
                   noise_shape=(n_sim,) if pm else None)


def make(N=10, k=None, key=0, abc=False, fresh_noise=False, Np=4,
         burnin=1000, n_sim=10_000, **de_kwargs):
    if k is None:
        k = int(jax.random.binomial(jax.random.PRNGKey(key), N, 0.5))
    model = make_model(N, k, abc=abc, fresh_noise=fresh_noise,
                       n_sim=n_sim)
    de = DE(bounds=BOUNDS, burnin=burnin, Np=Np, **de_kwargs)
    return model, de


def conjugate_posterior(N: int, k: int):
    """Beta(k+1, N-k+1) moments — the closed-form oracle."""
    a, b = k + 1.0, N - k + 1.0
    mean = a / (a + b)
    var = a * b / ((a + b) ** 2 * (a + b + 1.0))
    return {"mean": mean, "std": var ** 0.5}
