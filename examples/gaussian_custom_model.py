"""Building a DEModel by hand (the reference's Gaussian_Example.jl shape):
user-supplied loglike / prior_loglike / sample_prior closures.

Run: python examples/gaussian_custom_model.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.scipy.stats as jss

import demcmc_tpu as dm

data = 0.5 + 1.2 * jax.random.normal(jax.random.PRNGKey(0), (50,))


def prior_loglike(mu, sigma):
    lp = jss.norm.logpdf(mu, 0.0, 1.0)
    lp += jnp.where(sigma > 0,
                    jnp.log(2.0) + jss.cauchy.logpdf(sigma), -jnp.inf)
    return lp


def sample_prior(key):
    k1, k2 = jax.random.split(key)
    mu = jax.random.normal(k1)
    sigma = jnp.abs(jax.random.cauchy(k2))
    return [mu, sigma]


def loglike(data, mu, sigma):
    return jnp.sum(jss.norm.logpdf(data, mu, sigma))


model = dm.DEModel(loglike=loglike, prior_loglike=prior_loglike,
                   sample_prior=sample_prior, names=("mu", "sigma"),
                   data=data)
de = dm.DE(bounds=((-jnp.inf, jnp.inf), (0.0, jnp.inf)),
           burnin=1000, Np=6)
chains = dm.sample(model, de, dm.MCMCThreads(), 2000, key=1, progress=True)
print(chains.summary())
