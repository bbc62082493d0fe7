"""Lognormal Race (LNR) choice-RT model in JAX.

Reference: ``/root/reference/test/lognormal_race_tests.jl`` — params
(ν[4], τ) with accumulator sd σ = 1 fixed; priors ν ~ Normal(0,3),
τ ~ Uniform(0, min_rt).  Finishing time of accumulator i is
τ + LogNormal(ν_i, σ); the winner is observed:

    logp(c, rt) = logpdf_LN(rt-τ; ν_c, σ) + Σ_{j≠c} log(1 - CDF_LN(rt-τ; ν_j, σ))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.stats as jss

from ..config import DE
from ..model import DEModel
from ..utils import dists

NAMES = ("nu", "tau")


def lnr_logpdf(choice, rt, nu, tau, sigma=1.0):
    t = rt[:, None] - tau                                # [n, 1]
    valid = t[:, 0] > 0
    tsafe = jnp.where(t > 0, t, 1.0)
    z = (jnp.log(tsafe) - nu[None, :]) / sigma           # [n, n_acc]
    logpdf = (-jnp.log(tsafe) - jnp.log(sigma)
              - 0.5 * jnp.log(2 * jnp.pi) - 0.5 * z ** 2)
    logsurv = jss.norm.logcdf(-z)                        # log(1 - Φ(z))
    onehot = jax.nn.one_hot(choice, nu.shape[0], dtype=logpdf.dtype)
    ll = jnp.sum(onehot * logpdf + (1.0 - onehot) * logsurv, axis=1)
    return jnp.where(valid, ll, -jnp.inf)


def simulate(key, n, nu, tau, sigma=1.0):
    z = jax.random.normal(key, (n, len(nu)))
    times = tau + jnp.exp(jnp.asarray(nu) + sigma * z)
    return jnp.argmin(times, axis=1), jnp.min(times, axis=1)


def make(data=None, key=0, n_trials=100, Np=24, n_groups=4, burnin=2000,
         **de_kwargs):
    if data is None:
        choice, rt = simulate(jax.random.PRNGKey(key), n_trials,
                              jnp.array([-2.0, -2.0, -3.0, -3.0]), 0.5)
        data = (choice, rt)
    choice, rt = data
    min_rt = float(jnp.min(rt))
    n_acc = 4

    bounds = ((-jnp.inf, jnp.inf), (0.0, min_rt))

    def prior_loglike(nu, tau):
        return (jnp.sum(dists.normal_logpdf(nu, 0.0, 3.0))
                + dists.uniform_logpdf(tau, 0.0, min_rt))

    def sample_prior(key):
        k1, k2 = jax.random.split(key)
        return [3.0 * jax.random.normal(k1, (n_acc,)),
                jax.random.uniform(k2, minval=0.0, maxval=min_rt)]

    def loglike(data, nu, tau):
        choice, rt = data
        return jnp.sum(lnr_logpdf(choice, rt, nu, tau))

    model = DEModel(loglike=loglike, prior_loglike=prior_loglike,
                    sample_prior=sample_prior, names=NAMES, data=data)
    kw = dict(bounds=bounds, burnin=burnin, Np=Np, n_groups=n_groups)
    kw.update(de_kwargs)
    de = DE(**kw)
    return model, de
