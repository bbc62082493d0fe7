"""Gaussian (μ, σ) model — the reference's flagship example.

Reference: ``/root/reference/Examples/Gaussian_Example.jl`` and
``test/gaussian_tests.jl``: priors μ ~ Normal(0,1),
σ ~ truncated(Cauchy(0,1), 0, Inf); likelihood Normal(μ, σ) over the data;
bounds ((-Inf, Inf), (0, Inf)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DE
from ..model import DEModel
from ..utils import dists

BOUNDS = ((-jnp.inf, jnp.inf), (0.0, jnp.inf))
NAMES = ("mu", "sigma")


def prior_loglike(mu, sigma):
    return (dists.normal_logpdf(mu, 0.0, 1.0)
            + dists.halfcauchy_logpdf(sigma, 1.0))


def sample_prior(key):
    k1, k2 = jax.random.split(key)
    mu = jax.random.normal(k1)
    sigma = dists.sample_halfcauchy(k2)
    return [mu, sigma]


def loglike(data, mu, sigma):
    return jnp.sum(dists.normal_logpdf(data, mu, sigma))


def loglike_batched(data, mu, sigma):
    """Chains-last batched form (mu, sigma: any chain shape ``cs``) for
    the fused TPU kernel.  For f32 data the sum over observations is
    carried out through the sufficient statistics (n, Σx, Σx²) — the same
    Σᵢ log N(xᵢ; μ, σ) up to fp reassociation, but O(1) per chain instead
    of O(n_obs) (the statistics are folded to python floats at trace
    time, in f64).  f64 data takes the elementwise path so the trace
    carries f64 ops — the fused build detects those and falls back to the
    XLA step (the kernel is f32-only)."""
    x = np.asarray(data)
    if x.dtype == np.float64:
        xe = jnp.asarray(data).reshape(x.shape + (1,) * mu.ndim)
        return jnp.sum(dists.normal_logpdf(xe, mu[None], sigma[None]),
                       axis=0)
    n = float(x.shape[0])
    # CENTERED statistics (xbar, Σ(x-xbar)²), not (Σx, Σx²): the raw
    # second moment cancels catastrophically in f32 for non-centered data
    # (data ~ N(1000,1): s2 ≈ 5e7 with ulp ≈ 4 vs a true residual ≈ n),
    # while n·(μ-x̄)² + ss is shift-invariant and exact to f32 precision.
    # Statistics are taken along axis 0 only, so PACKED data (trailing
    # chain axes, sample_replicated_packed) folds to per-chain constants.
    xbar64 = x.astype(np.float64).mean(axis=0)
    ss = np.asarray(((x.astype(np.float64) - xbar64) ** 2).sum(axis=0),
                    np.float32)
    xbar = np.asarray(xbar64, np.float32)
    if xbar.ndim == 0:
        xbar, ss = float(xbar), float(ss)    # fold as python scalars
    dm_ = mu - xbar
    return (-0.5 * n * float(np.log(2.0 * np.pi)) - n * jnp.log(sigma)
            - 0.5 * (ss + n * dm_ * dm_) / (sigma * sigma))


def prior_loglike_batched(mu, sigma):
    return (dists.normal_logpdf(mu, 0.0, 1.0)
            + dists.halfcauchy_logpdf(sigma))


def make_model(data) -> DEModel:
    return DEModel(loglike=loglike, prior_loglike=prior_loglike,
                   sample_prior=sample_prior, names=NAMES, data=data,
                   loglike_batched=loglike_batched,
                   prior_loglike_batched=prior_loglike_batched)


def make(data=None, key=0, n_obs=50, true_mu=0.0, true_sigma=1.0,
         Np=6, n_groups=4, burnin=1000, **de_kwargs):
    """Build (model, de) matching the reference example configuration."""
    if data is None:
        data = true_mu + true_sigma * jax.random.normal(
            jax.random.PRNGKey(key), (n_obs,))
    model = make_model(data)
    de = DE(bounds=BOUNDS, burnin=burnin, Np=Np, n_groups=n_groups,
            **de_kwargs)
    return model, de


def posterior_grid(data, n_mu=301, n_sigma=301, mu_rng=None, sigma_rng=None):
    """Ground-truth posterior moments by 2-D quadrature — the oracle for
    statistical tests (plays the role of the reference's Turing NUTS
    comparison, ``test/gaussian_tests.jl:46-55``)."""
    import numpy as np
    data = np.asarray(data, dtype=np.float64)
    m, s = data.mean(), data.std()
    if mu_rng is None:
        mu_rng = (m - 6 * s / np.sqrt(len(data)), m + 6 * s / np.sqrt(len(data)))
    if sigma_rng is None:
        sigma_rng = (max(1e-3, s * 0.4), s * 2.5)
    mu = np.linspace(*mu_rng, n_mu)
    sg = np.linspace(*sigma_rng, n_sigma)
    MU, SG = np.meshgrid(mu, sg, indexing="ij")
    logp = (-0.5 * MU ** 2 - 0.5 * np.log(2 * np.pi)            # N(0,1) prior
            + np.log(2 / np.pi) - np.log1p(SG ** 2)             # half-Cauchy
            - len(data) * np.log(SG)
            - len(data) / 2 * np.log(2 * np.pi)
            - ((data[None, None, :] - MU[..., None]) ** 2).sum(-1)
            / (2 * SG ** 2))
    w = np.exp(logp - logp.max())
    w /= w.sum()
    stats = {}
    for name, v in (("mu", MU), ("sigma", SG)):
        mean = (w * v).sum()
        stats[name] = {"mean": mean,
                       "std": np.sqrt((w * (v - mean) ** 2).sum())}
    return stats
