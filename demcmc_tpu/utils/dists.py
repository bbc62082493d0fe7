"""Log-density helpers for model building.

The reference's examples lean on Distributions.jl (Normal, truncated
Cauchy, Beta, Binomial, Uniform, MvNormal — e.g.
``/root/reference/Examples/Gaussian_Example.jl:11-16``).  ``jax.scipy.stats``
covers most; this module adds the missing pieces (truncation, samplers for
priors) so the model zoo reads like the reference examples.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import jax.scipy.stats as jss


def normal_logpdf(x, mu=0.0, sigma=1.0):
    return jss.norm.logpdf(x, mu, sigma)


def cauchy_logpdf(x, loc=0.0, scale=1.0):
    return jss.cauchy.logpdf(x, loc, scale)


def halfcauchy_logpdf(x, scale=1.0):
    """truncated(Cauchy(0, scale), 0, Inf) — the reference's favorite scale
    prior.  log 2 + Cauchy logpdf for x >= 0, -inf below."""
    # python-float constant (not jnp.log(2.0)): under x64 the latter
    # traces an f64 log op, which blocks the fused Pallas path (f32-only)
    lp = math.log(2.0) + jss.cauchy.logpdf(x, 0.0, scale)
    return jnp.where(x >= 0, lp, -jnp.inf)


def truncated_logpdf(logpdf_fn, cdf_fn, x, lo=-jnp.inf, hi=jnp.inf, **kw):
    """Generic truncation: logpdf(x) - log(cdf(hi) - cdf(lo)) inside, -inf
    outside (Distributions.jl ``truncated`` semantics)."""
    z = cdf_fn(hi, **kw) - cdf_fn(lo, **kw)
    lp = logpdf_fn(x, **kw) - jnp.log(z)
    return jnp.where((x >= lo) & (x <= hi), lp, -jnp.inf)


def uniform_logpdf(x, lo=0.0, hi=1.0):
    return jnp.where((x >= lo) & (x <= hi), -jnp.log(hi - lo), -jnp.inf)


def beta_logpdf(x, a=1.0, b=1.0):
    return jss.beta.logpdf(x, a, b)


def binomial_logpmf(k, n, p):
    return jss.binom.logpmf(k, n, p)


def mvnormal_logpdf(x, mean, cov):
    return jss.multivariate_normal.logpdf(x, mean, cov)


def lognormal_logpdf(x, mu=0.0, sigma=1.0):
    lp = (-jnp.log(x) - jnp.log(sigma) - 0.5 * jnp.log(2 * jnp.pi)
          - (jnp.log(x) - mu) ** 2 / (2 * sigma ** 2))
    return jnp.where(x > 0, lp, -jnp.inf)


def normal_cdf(x, mu=0.0, sigma=1.0):
    return jss.norm.cdf(x, mu, sigma)


def normal_logcdf(x, mu=0.0, sigma=1.0):
    return jss.norm.logcdf(x, mu, sigma)


# -- prior samplers ----------------------------------------------------------

def sample_halfcauchy(key, scale=1.0, shape=()):
    """|Cauchy(0, scale)| draw — matches truncated(Cauchy(0,1), 0, Inf)."""
    u = jax.random.uniform(key, shape, minval=0.5, maxval=1.0)
    return scale * jnp.tan(jnp.pi * (u - 0.5))


def sample_truncated_normal(key, mu, sigma, lo, hi, shape=()):
    u = jax.random.uniform(key, shape)
    a = jss.norm.cdf((lo - mu) / sigma)
    b = jss.norm.cdf((hi - mu) / sigma)
    # traced-safe inverse normal CDF via erfinv
    z = jnp.sqrt(2.0) * jax.lax.erf_inv(2.0 * (a + u * (b - a)) - 1.0)
    return mu + sigma * z
