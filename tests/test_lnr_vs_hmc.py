"""Lognormal Race model: DE-MCMC vs an independent HMC oracle — the
analogue of `test/lognormal_race_tests.jl` (which compares against Turing
NUTS, rtol 5%).  Also validates the HMC oracle itself on the Gaussian
model against the quadrature ground truth first.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import demcmc_tpu as dm
from demcmc_tpu.models import gaussian, lnr
from demcmc_tpu.reference_samplers import hmc
from demcmc_tpu.sampler import make_spec


def test_hmc_oracle_matches_gaussian_quadrature():
    model, de = gaussian.make(key=5, n_obs=50)
    spec = make_spec(model, de)

    def logpost(q):
        return dm.compute_posterior(model, spec, de, q)

    init = jnp.array([[0.0, 1.0]] * 4)
    res = hmc(logpost, init, key=0, n_samples=1500, n_warmup=800)
    truth = gaussian.posterior_grid(np.asarray(model.data))
    assert res.accept_rate > 0.5
    assert abs(res.samples[:, :, 0].mean() - truth["mu"]["mean"]) < 0.02
    assert abs(res.samples[:, :, 1].mean() - truth["sigma"]["mean"]) < 0.02
    assert abs(res.samples[:, :, 0].std() - truth["mu"]["std"]) < 0.02


@pytest.mark.slow
def test_lnr_de_matches_hmc():
    model, de = lnr.make(key=0, n_trials=100, Np=24, n_groups=4,
                         burnin=2000)
    spec = make_spec(model, de)

    # DE-MCMC posterior
    chains = dm.sample(model, de, dm.MCMCThreads(), 6000, key=1)
    de_means = np.array([chains.data[:, i, :].mean()
                         for i in range(chains.n_params)])
    de_stds = np.array([chains.data[:, i, :].reshape(-1).std(ddof=1)
                        for i in range(chains.n_params)])

    # HMC oracle on the same posterior
    def logpost(q):
        return dm.compute_posterior(model, spec, de, q)

    min_rt = float(jnp.min(model.data[1]))
    init = jnp.concatenate(
        [jnp.tile(jnp.array([-2.0, -2.0, -3.0, -3.0]), (4, 1)),
         jnp.full((4, 1), 0.5 * min_rt)], axis=1)
    res = hmc(logpost, init, key=2, n_samples=3000, n_warmup=1500)
    hmc_means = res.samples.reshape(-1, spec.dim).mean(axis=0)
    hmc_stds = res.samples.reshape(-1, spec.dim).std(axis=0, ddof=1)

    assert res.accept_rate > 0.5
    # reference tolerance: rtol 0.05 on means/stds vs NUTS
    np.testing.assert_allclose(de_means, hmc_means, rtol=0.08, atol=0.03)
    np.testing.assert_allclose(de_stds, hmc_stds, rtol=0.25, atol=0.02)
