"""Discrete-parameter support — the analogue of the reference's
`Examples/Discrete_Example.jl` (estimating a binomial N): integer leaves
stay integral through proposals (round-and-cast rule,
src/utilities.jl:360-369) and the posterior mass lands near the truth.
"""

import numpy as np

import demcmc_tpu as dm
from demcmc_tpu.models import discrete_binomial


def test_int_leaf_detected():
    model, de = discrete_binomial.make()
    spec = dm.make_spec(model, de)
    assert spec.is_int == (True, False)
    np.testing.assert_array_equal(spec.int_mask, [True, False])


def test_discrete_chain_values_integral():
    model, de = discrete_binomial.make()
    chains = dm.sample(model, de, 1500, key=2)
    N = chains["N"]
    np.testing.assert_array_equal(N, np.round(N))


def test_discrete_posterior_covers_truth():
    model, de = discrete_binomial.make()
    true_n, true_p = 10, 0.6
    chains = dm.sample(model, de, 3000, key=2)
    n_mode = np.bincount(chains["N"].astype(int).ravel()).argmax()
    assert abs(n_mode - true_n) <= 3
    # N and p are strongly anti-correlated along the ridge N*p = E[data];
    # the identified quantity is the product
    prod = (chains["N"] * chains["p"]).mean()
    data_mean = float(np.asarray(model.data).mean())
    assert abs(prod - data_mean) < 0.3
