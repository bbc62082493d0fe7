"""Hierarchical Gaussian with group-level priors and block updating.

Reference: ``/root/reference/Examples/Hierarchical_Example.jl`` — params
(μβ0, σβ0, β0[1..S], σ); blocks update (hyper, subject) parameter sets in
turn; sampler uses snooker + resample.  The per-subject likelihood loop
becomes one [S, n_data] tensor reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DE
from ..model import DEModel
from ..utils import dists


def _always_block(de):
    return True


def _never_block(de):
    return False


def make(n_subj=20, n_data=50, key=0, data=None, blocking=True, **de_kwargs):
    names = ("mu_b0", "sigma_b0", "b0", "sigma")
    bounds = ((-jnp.inf, jnp.inf), (0.0, jnp.inf),
              (-jnp.inf, jnp.inf), (0.0, jnp.inf))

    if data is None:
        k = jax.random.PRNGKey(key)
        k1, k2 = jax.random.split(k)
        true_b0 = jax.random.normal(k1, (n_subj,))
        data = (1.0 + true_b0[:, None]
                + 0.5 * jax.random.normal(k2, (n_subj, n_data)))

    def prior_loglike(mu_b0, sigma_b0, b0, sigma):
        return (dists.normal_logpdf(mu_b0, 1.0, 1.0)
                + dists.halfcauchy_logpdf(sigma_b0)
                + jnp.sum(dists.normal_logpdf(b0, 0.0, sigma_b0))
                + dists.halfcauchy_logpdf(sigma))

    def sample_prior(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        mu_b0 = 1.0 + jax.random.normal(k1)
        sigma_b0 = dists.sample_halfcauchy(k2)
        sigma = dists.sample_halfcauchy(k3)
        b0 = sigma_b0 * jax.random.normal(k4, (n_subj,))
        return [mu_b0, sigma_b0, b0, sigma]

    def loglike(data, mu_b0, sigma_b0, b0, sigma):
        mu = mu_b0 + b0[:, None]
        return jnp.sum(dists.normal_logpdf(data, mu, sigma))

    model = DEModel(loglike=loglike, prior_loglike=prior_loglike,
                    sample_prior=sample_prior, names=names, data=data)

    # hyper block then subject block, like the reference example.
    # module-level blocking fn (not a fresh lambda per make()): DE hashes
    # strategy slots by identity, so per-call lambdas would defeat the
    # compiled-step cache and recompile on every make()+sample()
    blocks = None
    blocking_on = _never_block
    if blocking:
        import numpy as np
        blocks = [
            [True, True, np.zeros(n_subj, dtype=bool), True],
            [False, False, np.ones(n_subj, dtype=bool), False],
        ]
        blocking_on = _always_block

    kw = dict(bounds=bounds, Np=3, n_groups=2, theta_snooker=0.1,
              sample="resample", n_initial=(n_subj + 1) * 4,
              burnin=2000, blocks=blocks, blocking_on=blocking_on)
    kw.update(de_kwargs)
    de = DE(**kw)
    return model, de
