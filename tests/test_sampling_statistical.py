"""Statistical integration tests — the heart of the reference's test
strategy (SURVEY.md §4): posterior moments vs analytic ground truth.

* Gaussian (μ, σ) vs 2-D quadrature of the exact posterior — plays the
  role of the reference's Turing-NUTS comparison
  (`test/gaussian_tests.jl:39-59`, atol 0.01-ish).
* Binomial θ vs the conjugate Beta(k+1, N-k+1) closed form
  (`test/binomial_tests.jl:27-37`, rtol 0.02).
"""

import jax
import numpy as np
import pytest

import demcmc_tpu as dm
from demcmc_tpu.models import binomial, gaussian


@pytest.fixture(scope="module")
def gaussian_run():
    model, de = gaussian.make(key=5, n_obs=50, burnin=1000)
    chains = dm.sample(model, de, 4000, key=42)
    truth = gaussian.posterior_grid(np.asarray(model.data))
    return chains, truth


def test_gaussian_posterior_mean(gaussian_run):
    chains, truth = gaussian_run
    assert abs(chains.mean("mu") - truth["mu"]["mean"]) < 0.02
    assert abs(chains.mean("sigma") - truth["sigma"]["mean"]) < 0.02


def test_gaussian_posterior_std(gaussian_run):
    chains, truth = gaussian_run
    assert abs(chains.std("mu") - truth["mu"]["std"]) < 0.02
    assert abs(chains.std("sigma") - truth["sigma"]["std"]) < 0.02


def test_gaussian_rhat_converged(gaussian_run):
    chains, _ = gaussian_run
    assert abs(chains.rhat("mu") - 1.0) < 0.05
    assert abs(chains.rhat("sigma") - 1.0) < 0.05


def test_gaussian_ess_reasonable(gaussian_run):
    chains, _ = gaussian_run
    assert chains.ess("mu") > 500
    assert chains.ess("sigma") > 500


def test_gaussian_acceptance_rate_sane(gaussian_run):
    chains, _ = gaussian_run
    assert 0.1 < chains.acceptance.mean() < 0.95


def test_binomial_conjugate():
    N, k = 10, 6
    model, de = binomial.make(N=N, k=k, burnin=1000, Np=4)
    chains = dm.sample(model, de, 4000, key=7)
    truth = binomial.conjugate_posterior(N, k)
    theta = chains["theta"]
    assert abs(theta.mean() - truth["mean"]) / truth["mean"] < 0.03
    assert abs(theta.std(ddof=1) - truth["std"]) / truth["std"] < 0.06
    assert abs(chains.rhat("theta") - 1.0) < 0.02


def test_mcmcthreads_positional_accepted():
    # API parity: sample(model, de, MCMCThreads(), n_iter)
    model, de = binomial.make(N=10, k=5, burnin=100)
    chains = dm.sample(model, de, dm.MCMCThreads(), 200, key=1)
    assert len(chains) == 100


def test_fixed_and_variable_gamma_sample():
    model, de = gaussian.make(key=3, n_obs=30, burnin=500)
    truth = gaussian.posterior_grid(np.asarray(model.data))
    for proposal in (dm.fixed_gamma, dm.variable_gamma):
        dcfg = de.replace(generate_proposal=proposal)
        chains = dm.sample(model, dcfg, 2500, key=11)
        assert abs(chains.mean("mu") - truth["mu"]["mean"]) < 0.05
        assert abs(chains.mean("sigma") - truth["sigma"]["mean"]) < 0.07


def test_snooker_mixture_sample():
    model, de = gaussian.make(key=3, n_obs=30, burnin=500,
                              theta_snooker=0.1, Np=8)
    truth = gaussian.posterior_grid(np.asarray(model.data))
    chains = dm.sample(model, de, 2500, key=13)
    assert abs(chains.mean("mu") - truth["mu"]["mean"]) < 0.05
    assert abs(chains.mean("sigma") - truth["sigma"]["mean"]) < 0.07


def test_deterministic_same_key():
    model, de = binomial.make(N=10, k=5, burnin=100)
    c1 = dm.sample(model, de, 300, key=9)
    c2 = dm.sample(model, de, 300, key=9)
    np.testing.assert_array_equal(c1.data, c2.data)


def test_different_key_differs():
    model, de = binomial.make(N=10, k=5, burnin=100)
    c1 = dm.sample(model, de, 300, key=9)
    c2 = dm.sample(model, de, 300, key=10)
    assert not np.array_equal(c1.data, c2.data)
