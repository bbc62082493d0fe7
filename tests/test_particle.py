"""Particle algebra — mirrors the reference's particle-operation tests
(`test/utility_tests.jl:161-199`) on the host-side compatibility type.
"""

import numpy as np
import pytest

from demcmc_tpu import Particle


def test_add_scalar():
    p = Particle(theta=[1.0, 2.0])
    np.testing.assert_allclose((p + 2).flatten(), [3, 4])


def test_mul_scalar():
    p = Particle(theta=[1.0, 2.0])
    np.testing.assert_allclose((p * 4).flatten(), [4, 8])


def test_add_particles():
    p1 = Particle(theta=[1.0, 2.0])
    p2 = Particle(theta=[1.0, 2.0])
    np.testing.assert_allclose((p1 + p2).flatten(), [2, 4])


def test_scalar_times_sum():
    p1 = Particle(theta=[1.0, 2.0])
    p2 = Particle(theta=[1.0, 2.0])
    np.testing.assert_allclose((3 * (p1 + p2)).flatten(), [6, 12])


def test_scaled_difference():
    p1 = Particle(theta=[1.0, 2.0])
    p2 = Particle(theta=[-2.0, 3.0])
    np.testing.assert_allclose((3 * (p1 - p2)).flatten(), [9, -3])


def test_de_formula():
    p1 = Particle(theta=[1.0, 2.0])
    p2 = Particle(theta=[-2.0, 3.0])
    p3 = Particle(theta=[-2.0, 3.0])
    np.testing.assert_allclose((3 * (p1 - p2) + p3).flatten(), [7, 0])


def test_distribution_operand_draws_fresh_noise():
    from scipy import stats
    p = Particle(theta=[1.0, 2.0])
    b = stats.uniform(loc=-0.1, scale=0.2)   # U(-0.1, 0.1)
    pr = p + b
    np.testing.assert_allclose(pr.flatten(), p.flatten(), atol=0.2)
    assert not np.allclose(pr.flatten(), p.flatten())


def test_heterogeneous_params():
    p1 = Particle(theta=[np.zeros((2, 2)), 1.0, np.arange(3.0)])
    p2 = p1 + 1
    np.testing.assert_allclose(p2.theta[0], np.ones((2, 2)))
    np.testing.assert_allclose(p2.theta[1], 2.0)
    np.testing.assert_allclose(p2.theta[2], [1, 2, 3])


def test_int_round_and_cast():
    p = Particle(theta=[np.int64(4), 1.0])
    q = p * 0.6
    assert q.theta[0].dtype == np.int64
    assert int(q.theta[0]) == 2          # round(2.4)
    np.testing.assert_allclose(q.theta[1], 0.6)


def test_population_particles():
    import jax.numpy as jnp
    import demcmc_tpu as dm
    from demcmc_tpu.models import rastrigin
    model, de = rastrigin.make(n_dim=2, Np=4, n_groups=2)
    pop = dm.optimize(model, de, 50, key=0)
    parts = pop.particles
    assert len(parts) == 8
    assert parts[0].id == 1
    theta, best = dm.get_optimal(de, model, pop)
    weights = [p.weight for p in parts]
    assert min(weights) == pytest.approx(best)
