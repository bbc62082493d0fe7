"""Auxiliary subsystems: ODE integrator accuracy, profiling helpers,
distributed wrappers.
"""

import numpy as np
import pytest

from demcmc_tpu.models import lotka_volterra
from demcmc_tpu.parallel import distributed
from demcmc_tpu.utils.profiling import StepTimer, annotate


def test_rk4_matches_scipy():
    from scipy.integrate import solve_ivp

    p = (1.5, 1.0, 3.0, 1.0)

    def f(t, u):
        x, y = u
        a, b, g, d = p
        return [(a - b * y) * x, (d * x - g) * y]

    ref = solve_ivp(f, (0.0, 10.0), [1.0, 1.0], rtol=1e-10, atol=1e-10,
                    dense_output=True)
    ts = np.arange(0, 10.0 + 1e-9, 0.1)
    truth = ref.sol(ts).T                       # [101, 2]
    ours = np.asarray(lotka_volterra.solve(np.asarray(p, np.float32)))
    # float32 RK4 at dt=0.02 on a stiff-ish oscillator: ~1e-3 accuracy,
    # far below the 0.5 observation noise of the inference problem
    assert ours.shape == truth.shape
    np.testing.assert_allclose(ours, truth, atol=5e-3)


def test_inverse_gamma_logpdf():
    from scipy.stats import invgamma
    x = np.array([0.5, 1.0, 3.0])
    ours = np.asarray(lotka_volterra.inverse_gamma_logpdf(x, 2.0, 3.0))
    truth = invgamma.logpdf(x, 2.0, scale=3.0)
    np.testing.assert_allclose(ours, truth, rtol=1e-5)
    assert lotka_volterra.inverse_gamma_logpdf(-1.0) == -np.inf


def test_step_timer():
    t = StepTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    s = t.summary()
    assert s["a"]["calls"] == 2
    assert s["b"]["calls"] == 1
    assert "a:" in repr(t)


def test_annotate_contextmanager():
    with annotate("unit-test-region"):
        x = sum(range(10))
    assert x == 45


def test_distributed_initialize_noop_single_host():
    # no cluster env vars set -> must be a no-op, not an error
    distributed.initialize()
    assert distributed.is_coordinator()


def test_global_chain_mesh():
    mesh = distributed.global_chain_mesh()
    assert mesh.axis_names == ("chains",)
    assert mesh.size >= 1
