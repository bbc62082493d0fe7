"""ABC model with a synthetic KDE likelihood.

Reference: ``/root/reference/Examples/KDE_Example.jl`` — the Gaussian (μ, σ)
model whose likelihood is a kernel density estimate over 10⁴ forward
simulations, evaluated at the observed data.  Simulation noise is driven by
a fixed key per likelihood evaluation (common random numbers), which keeps
the synthetic likelihood a deterministic function of θ — the JAX analogue
of the reference's global-RNG draws, and better behaved for MCMC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DE
from ..model import DEModel
from ..utils.kde import epanechnikov_logpdf
from .gaussian import BOUNDS, NAMES, prior_loglike, sample_prior


def make(data=None, key=0, n_obs=50, n_sim=10_000, sim_key=7,
         Np=6, n_groups=4, burnin=1000, use_pallas=None,
         fresh_noise=False, **de_kwargs):
    """``fresh_noise=True`` re-draws the simulation noise on EVERY
    likelihood evaluation (pseudo-marginal mode) — the reference example's
    semantics, where each call pulls fresh global-RNG draws
    (``Examples/KDE_Example.jl``, ``Examples/Binomial_ABC.jl:16-23``).
    The default keeps a fixed noise panel (common random numbers), which
    makes the synthetic likelihood deterministic in θ."""
    if data is None:
        data = jax.random.normal(jax.random.PRNGKey(key), (n_obs,))

    noise = jax.random.normal(jax.random.PRNGKey(sim_key), (n_sim,))

    if use_pallas is None:
        # The Pallas kernel streams the [n_eval, n_sim] kernel matrix
        # through VMEM tiles; the jnp fallback materializes it per chain
        # (measured 29x slower end-to-end on TPU at n_sim=2000).
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from ..ops.pallas_kde import kde_logpdf_pallas as kde_logpdf
    else:
        kde_logpdf = epanechnikov_logpdf

    if fresh_noise:
        def loglike(data, mu, sigma, key=None):
            simdata = mu + sigma * jax.random.normal(key, (n_sim,))
            return jnp.sum(kde_logpdf(data, simdata))
    else:
        def loglike(data, mu, sigma):
            simdata = mu + sigma * noise
            return jnp.sum(kde_logpdf(data, simdata))

    model = DEModel(loglike=loglike, prior_loglike=prior_loglike,
                    sample_prior=sample_prior, names=NAMES, data=data,
                    stochastic=fresh_noise)
    de = DE(bounds=BOUNDS, burnin=burnin, Np=Np, n_groups=n_groups,
            **de_kwargs)
    return model, de
