"""High-dimensional MVN model — the snooker + resample stress test.

Reference: ``/root/reference/test/multivariate_normal_tests.jl`` — params
(μ[d], σ): priors μ_i ~ Normal(0,1), σ ~ truncated(Cauchy(0,1),0,Inf);
likelihood MvNormal(μ, σ²I) over [n_obs, d] data; sampler Np=3, n_groups=1,
theta_snooker=0.1, sample=resample, n_initial=(d+1)*4.

The likelihood is one [n_obs, d] reduction — a single fused VPU pass; with
``parallel.shard_data`` the observation axis shards over a ``data`` mesh
axis with an XLA-inserted psum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DE
from ..model import DEModel
from ..utils import dists

NAMES = ("mu", "sigma")
BOUNDS = ((-jnp.inf, jnp.inf), (0.0, jnp.inf))


def make(d=30, n_obs=100, key=0, data=None, **de_kwargs):
    if data is None:
        data = jax.random.normal(jax.random.PRNGKey(key), (n_obs, d))

    def prior_loglike(mu, sigma):
        return (jnp.sum(dists.normal_logpdf(mu, 0.0, 1.0))
                + dists.halfcauchy_logpdf(sigma))

    def sample_prior(key):
        k1, k2 = jax.random.split(key)
        return [jax.random.normal(k1, (d,)), dists.sample_halfcauchy(k2)]

    def loglike(data, mu, sigma):
        return jnp.sum(dists.normal_logpdf(data, mu, sigma))

    def loglike_batched(data, mu, sigma):
        """Chains-last batched form (mu ``[d, *cs]``, sigma ``[*cs]``)
        for the fused TPU kernel.  Like the Gaussian model, f32 data
        folds to CENTERED sufficient statistics (x̄ [d], Σ‖x−x̄‖²) at
        trace time — O(d) per chain instead of O(n_obs·d); f64 data
        takes the elementwise path (the f64 trace makes the fused build
        fall back to the XLA step, which is the f64 path anyway)."""
        x = np.asarray(data)
        if x.dtype == np.float64:
            xe = jnp.asarray(data).reshape(x.shape + (1,) * sigma.ndim)
            return jnp.sum(dists.normal_logpdf(xe, mu[None], sigma[None]),
                           axis=(0, 1))
        n = float(x.shape[0])
        xbar64 = x.astype(np.float64).mean(axis=0)              # [d]
        ss_tot = float(((x.astype(np.float64) - xbar64) ** 2).sum())
        xbar = np.asarray(xbar64, np.float32)
        dm_ = mu - xbar.reshape((d,) + (1,) * sigma.ndim)
        quad = ss_tot + n * jnp.sum(dm_ * dm_, axis=0)
        return (-0.5 * n * d * float(np.log(2.0 * np.pi))
                - n * d * jnp.log(sigma) - 0.5 * quad / (sigma * sigma))

    def prior_loglike_batched(mu, sigma):
        return (jnp.sum(dists.normal_logpdf(mu, 0.0, 1.0), axis=0)
                + dists.halfcauchy_logpdf(sigma))

    model = DEModel(loglike=loglike, prior_loglike=prior_loglike,
                    sample_prior=sample_prior, names=NAMES, data=data,
                    loglike_batched=loglike_batched,
                    prior_loglike_batched=prior_loglike_batched)
    kw = dict(bounds=BOUNDS, Np=3, n_groups=1, alpha=0.0, theta_snooker=0.1,
              sample="resample", n_initial=(d + 1) * 4, burnin=1000)
    kw.update(de_kwargs)
    de = DE(**kw)
    return model, de


def analytic_posterior(data, sigma=1.0):
    """Posterior of μ at fixed σ: N(0,1) prior × N(μ, σ²) likelihood."""
    data = np.asarray(data, dtype=np.float64)
    n = data.shape[0]
    prec = n / sigma ** 2 + 1.0
    mean = data.sum(axis=0) / sigma ** 2 / prec
    return {"mean": mean, "std": np.full(data.shape[1], prec ** -0.5)}
