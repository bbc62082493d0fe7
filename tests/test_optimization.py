"""DE optimization — the analogue of `test/optimization_tests.jl`:
Rastrigin minimum to 1e-8 and Gaussian MLE to 1e-4 vs closed form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import demcmc_tpu as dm
from demcmc_tpu.models import rastrigin


def test_rastrigin_minimum():
    model, de = rastrigin.make(n_dim=2, Np=10, n_groups=4, dtype=jnp.float64)
    pop = dm.optimize(model, de, 10_000, key=0)
    theta, best = dm.get_optimal(de, model, pop)
    assert best == pytest.approx(0.0, abs=1e-8)
    np.testing.assert_allclose(theta["x"], np.zeros(2), atol=1e-5)


def test_gaussian_mle():
    rng = np.random.default_rng(3)
    data = jnp.asarray(rng.normal(2.0, 1.5, size=100), dtype=jnp.float64)

    def loglike(data, mu, sigma):
        return jnp.sum(jax.scipy.stats.norm.logpdf(data, mu, sigma))

    def sample_prior(key):
        k1, k2 = jax.random.split(key)
        return [jax.random.uniform(k1, minval=-5.0, maxval=5.0),
                jax.random.uniform(k2, minval=0.1, maxval=5.0)]

    model = dm.DEModel(loglike=loglike, sample_prior=sample_prior,
                       names=("mu", "sigma"), data=data)
    de = dm.DE(bounds=((-jnp.inf, jnp.inf), (1e-6, jnp.inf)),
               Np=12, n_groups=4, update_particle="maximize",
               evaluate_fitness="fun", dtype=np.float64)
    pop = dm.optimize(model, de, dm.MCMCThreads(), 8_000, key=1)
    theta, best = dm.get_optimal(de, model, pop)
    d = np.asarray(data, dtype=np.float64)
    assert theta["mu"] == pytest.approx(d.mean(), abs=1e-4)
    assert theta["sigma"] == pytest.approx(d.std(), abs=1e-4)  # MLE: ddof=0


def test_optimize_rejects_mh_config():
    model, de = rastrigin.make()
    bad = de.replace(update_particle="mh", evaluate_fitness="posterior")
    with pytest.raises(ValueError):
        dm.optimize(model, bad, 10)


def test_get_optimal_direction_minimize():
    model, de = rastrigin.make(n_dim=2, Np=6, n_groups=2)
    pop = dm.optimize(model, de, 200, key=0)
    _, best = dm.get_optimal(de, model, pop)
    assert best == pop.weight.min()


def test_population_shapes():
    model, de = rastrigin.make(n_dim=3, Np=5, n_groups=2)
    pop = dm.optimize(model, de, 100, key=0)
    assert pop.theta.shape == (10, 3)
    assert pop.weight.shape == (10,)
