"""Pseudo-marginal (fresh-noise) ABC mode: the likelihood re-simulates
with a fresh PRNG key on every evaluation, matching the reference ABC
examples' global-RNG semantics (``Examples/Binomial_ABC.jl:16-23``), while
the accepted particle's weight is carried unchanged — the pseudo-marginal
construction, which still targets the exact (synthetic) posterior.
"""

import jax
import jax.numpy as jnp
import numpy as np

import demcmc_tpu as dm
from demcmc_tpu import rng
from demcmc_tpu.models import abc_kde, binomial
from demcmc_tpu.ops import accept as accept_ops
from demcmc_tpu.sampler import init_state, make_spec


def test_stochastic_fitness_varies_with_key_and_is_deterministic():
    model, de = binomial.make(N=10, k=6, abc=True, fresh_noise=True)
    assert model.stochastic
    spec = make_spec(model, de)
    fitness = accept_ops.make_fitness(model, spec, de)
    theta = jnp.full((2, 4, 1), 0.55)
    k1, k2 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)
    w1a = np.asarray(fitness(theta, k1))
    w1b = np.asarray(fitness(theta, k1))
    w2 = np.asarray(fitness(theta, k2))
    np.testing.assert_array_equal(w1a, w1b)      # keyed => reproducible
    assert np.any(w1a != w2)                     # fresh noise per key
    # per-particle keys differ: same theta everywhere but weights vary
    assert np.unique(w1a).size > 1


def test_fixed_noise_model_not_stochastic():
    model, _ = binomial.make(N=10, k=6, abc=True, fresh_noise=False)
    assert not model.stochastic
    model2, _ = abc_kde.make(fresh_noise=False)
    assert not model2.stochastic


def test_binomial_abc_fresh_noise_recovers_posterior():
    model, de = binomial.make(N=10, k=6, abc=True, fresh_noise=True,
                              Np=4, burnin=300)
    chains = dm.sample(model, de, 900, key=5)
    truth = binomial.conjugate_posterior(10, 6)
    assert abs(chains["theta"].mean() - truth["mean"]) < 0.1
    assert abs(chains["theta"].std() - truth["std"]) < 0.07


def test_abc_kde_fresh_noise_recovers_location():
    model, de = abc_kde.make(key=3, n_obs=50, n_sim=1000, Np=6,
                             n_groups=4, burnin=400, fresh_noise=True)
    chains = dm.sample(model, de, 1200, key=4)
    data = np.asarray(model.data, dtype=np.float64)
    assert abs(chains.mean("mu") - data.mean()) < 0.2
    assert abs(chains.mean("sigma") - data.std()) < 0.25


def test_fresh_noise_weights_differ_across_iterations():
    # the same (mu, sigma) re-evaluated in different iterations must see
    # different noise: run two chains from identical states and check the
    # lp trajectory is not a deterministic function of theta alone
    model, de = binomial.make(N=10, k=6, abc=True, fresh_noise=True,
                              Np=4, burnin=10)
    spec = make_spec(model, de)
    st = init_state(model, de, spec, jax.random.PRNGKey(0))
    # same theta evaluated with iteration-keyed noise in sample(): collect
    # lp for a constant-theta population across two different base keys
    fitness = accept_ops.make_fitness(model, spec, de)
    theta = st.theta
    w_it1 = np.asarray(fitness(theta, rng.step_key(st.key, 1)))
    w_it2 = np.asarray(fitness(theta, rng.step_key(st.key, 2)))
    assert np.any(w_it1 != w_it2)
