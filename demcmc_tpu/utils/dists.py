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

# Abramowitz & Stegun 7.1.26 erfc approximation:
#   erfc(x) ~= exp(-x^2) * t * poly(t),  t = 1 / (1 + AS_ERFC_P * x)
# for x >= 0 (|abs err| < 1.5e-7).  The SINGLE source of these constants
# — consumed by models/lba.py (_Phi_phi) and the fused kernel's erfc
# override (ops/fused_step.py) so their accuracy claims stay in sync.
AS_ERFC_P = 0.3275911
AS_ERFC_COEFFS = (0.254829592, -0.284496736, 1.421413741,
                  -1.453152027, 1.061405429)


def as_erfc_poly(t):
    """The Horner polynomial t·(a1 + t·(a2 + ...)) of A&S 7.1.26 in the
    caller's dtype (coefficients enter as weak python floats)."""
    a1, a2, a3, a4, a5 = AS_ERFC_COEFFS
    return t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))


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
