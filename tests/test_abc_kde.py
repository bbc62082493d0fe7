"""ABC / synthetic-likelihood models: the KDE likelihood path end to end
(reference `Examples/KDE_Example.jl`, `Examples/Binomial_ABC.jl`) plus
Pallas-vs-jnp kernel agreement (interpret mode on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import demcmc_tpu as dm
from demcmc_tpu.models import abc_kde, binomial
from demcmc_tpu.ops.pallas_kde import kde_logpdf_pallas
from demcmc_tpu.utils.kde import (epanechnikov_logpdf, epanechnikov_pdf,
                                  silverman_bandwidth)


def test_epanechnikov_pdf_integrates_to_one():
    samples = jnp.asarray(np.random.default_rng(0).normal(size=500))
    xs = jnp.linspace(-5, 5, 2001)
    pdf = epanechnikov_pdf(xs, samples)
    integral = float(jnp.trapezoid(pdf, xs))
    assert abs(integral - 1.0) < 1e-3


def test_epanechnikov_matches_normal_density():
    samples = jnp.asarray(np.random.default_rng(1).normal(size=20_000))
    xs = jnp.linspace(-2, 2, 9)
    pdf = np.asarray(epanechnikov_pdf(xs, samples))
    truth = np.exp(-np.asarray(xs) ** 2 / 2) / np.sqrt(2 * np.pi)
    np.testing.assert_allclose(pdf, truth, rtol=0.1)


def test_silverman_bandwidth_positive_scalar():
    samples = jnp.asarray(np.random.default_rng(2).normal(size=100))
    h = float(silverman_bandwidth(samples))
    assert 0.1 < h < 1.0


def test_pallas_kernel_matches_jnp():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (37,))          # deliberately unaligned
    sim = jax.random.normal(jax.random.fold_in(key, 1), (1537,))
    ref = np.asarray(epanechnikov_logpdf(x, sim))
    out = np.asarray(kde_logpdf_pallas(x, sim))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_kde_floor_applied():
    x = jnp.array([100.0])                     # far outside support
    sim = jnp.zeros(100)
    lp = float(epanechnikov_logpdf(x, sim)[0])
    assert lp == pytest.approx(np.log(1e-10))


def test_abc_kde_sampling_recovers_location():
    model, de = abc_kde.make(key=3, n_obs=50, n_sim=2000, Np=6,
                             n_groups=4, burnin=400)
    chains = dm.sample(model, de, 1200, key=4)
    data = np.asarray(model.data, dtype=np.float64)
    assert abs(chains.mean("mu") - data.mean()) < 0.15
    assert abs(chains.mean("sigma") - data.std()) < 0.2


def test_binomial_abc_sampling():
    model, de = binomial.make(N=10, k=6, abc=True, Np=4, burnin=300)
    chains = dm.sample(model, de, 900, key=5)
    truth = binomial.conjugate_posterior(10, 6)
    # ABC likelihood is approximate: loose tolerance like the reference
    # example (which only eyeballs the posterior)
    assert abs(chains["theta"].mean() - truth["mean"]) < 0.1
