"""Block updating — the analogue of `test/blocking_tests.jl`: two blocks
([μ], [σ]) updated in turn each iteration must still recover the posterior;
plus unit tests of the block-mask flattening and reset semantics.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import demcmc_tpu as dm
from demcmc_tpu.models import gaussian
from demcmc_tpu.sampler import flatten_block, make_spec


def test_blocked_gaussian_recovers_posterior():
    blocks = [[True, False], [False, True]]
    model, de = gaussian.make(key=5, n_obs=50, burnin=1000,
                              blocks=blocks, blocking_on=lambda de: True)
    chains = dm.sample(model, de, 4000, key=21)
    truth = gaussian.posterior_grid(np.asarray(model.data))
    assert abs(chains.mean("mu") - truth["mu"]["mean"]) < 0.05
    assert abs(chains.mean("sigma") - truth["sigma"]["mean"]) < 0.05
    assert abs(chains.rhat("mu") - 1.0) < 0.05


def test_flatten_block_scalar_and_array():
    spec = dm.ParamSpec.from_example(
        ("a", "v", "m"), [0.0, np.zeros(3), np.zeros((2, 2))], None)
    mask = flatten_block(spec, [True, [False, True, False],
                               [[True, False], [False, True]]])
    np.testing.assert_array_equal(
        mask, [True, False, True, False, True, False, False, True])


def test_flatten_block_broadcast_scalar_over_array():
    spec = dm.ParamSpec.from_example(("v",), [np.zeros(4)], None)
    mask = flatten_block(spec, [True])
    np.testing.assert_array_equal(mask, [True] * 4)


def test_flatten_block_shape_mismatch_raises():
    spec = dm.ParamSpec.from_example(("v",), [np.zeros(4)], None)
    with pytest.raises(ValueError):
        flatten_block(spec, [np.array([True, False])])


def test_block_reset_semantics():
    """Within a block update, non-block dims of the proposal must equal the
    current value (reference `reset!`, src/crossover.jl:336-352).

    Verified behaviorally: sample with block [True, False] only — σ can
    then never move from its initial value.
    """
    model, de = gaussian.make(key=5, n_obs=30, burnin=10,
                              discard_burnin=False, beta=0.0, alpha=0.0,
                              blocks=[[True, False]],
                              blocking_on=lambda de: True)
    chains = dm.sample(model, de, 100, key=2)
    sigma = chains["sigma"]
    # every chain's sigma is frozen at its initial draw
    assert np.all(sigma == sigma[0:1, :])
    mu = chains["mu"]
    assert np.any(mu != mu[0:1, :])


def test_blocking_on_gate_false_means_joint_update():
    model, de = gaussian.make(key=5, n_obs=30, burnin=10,
                              discard_burnin=False, beta=0.0, alpha=0.0,
                              blocks=[[True, False]],
                              blocking_on=lambda de: False)
    chains = dm.sample(model, de, 100, key=2)
    sigma = chains["sigma"]
    assert np.any(sigma != sigma[0:1, :])   # joint update moves sigma
