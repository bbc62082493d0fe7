"""Burnin accounting and Chains container — the analogue of
`test/utility_tests.jl:2-40` (exact chain lengths with discard_burnin
true/false) plus Chains indexing/summary behavior.
"""

import numpy as np
import pytest

import demcmc_tpu as dm
from demcmc_tpu.models import binomial


def test_discard_burnin_length():
    n_iter, burnin = 300, 120
    model, de = binomial.make(N=10, k=5, burnin=burnin, discard_burnin=True)
    chains = dm.sample(model, de, n_iter, key=0)
    assert len(chains) == n_iter - burnin


def test_keep_burnin_length():
    n_iter, burnin = 300, 120
    model, de = binomial.make(N=10, k=5, burnin=burnin, discard_burnin=False)
    chains = dm.sample(model, de, n_iter, key=0)
    assert len(chains) == n_iter


def test_burnin_exceeds_niter_raises():
    model, de = binomial.make(N=10, k=5, burnin=500, discard_burnin=True)
    with pytest.raises(ValueError):
        dm.sample(model, de, 100, key=0)


def test_chains_shape_and_names():
    model, de = binomial.make(N=10, k=5, burnin=50)
    chains = dm.sample(model, de, 100, key=0)
    assert chains.n_chains == de.n_chains
    assert chains.n_params == 1
    assert chains.names == ["theta"]
    assert chains["theta"].shape == (50, de.n_chains)
    assert chains["acceptance"].shape == (50, de.n_chains)
    assert chains["lp"].shape == (50, de.n_chains)


def test_chains_unknown_name_raises():
    model, de = binomial.make(N=10, k=5, burnin=50)
    chains = dm.sample(model, de, 100, key=0)
    with pytest.raises(KeyError):
        chains["nope"]


def test_chains_lp_matches_logpost():
    # lp internal equals the current weight: recompute logpost at the
    # stored draws and compare
    from demcmc_tpu.ops.accept import compute_posterior
    from demcmc_tpu.sampler import make_spec
    import jax
    import jax.numpy as jnp

    model, de = binomial.make(N=10, k=5, burnin=50)
    chains = dm.sample(model, de, 100, key=0)
    spec = make_spec(model, de)
    theta = jnp.asarray(chains.data[:, 0, :])     # [Ns, C]
    lp = jax.vmap(jax.vmap(
        lambda t: compute_posterior(model, spec, de, t)))(
            theta[..., None])
    # sampler runs float32; the recompute here promotes to float64 under
    # the x64 test harness => tolerance is f32 round-off of a ~1e2 logpost
    np.testing.assert_allclose(np.asarray(lp), chains.lp, rtol=1e-3)


def test_chains_to_numpy_internals():
    model, de = binomial.make(N=10, k=5, burnin=50)
    chains = dm.sample(model, de, 100, key=0)
    arr = chains.to_numpy()
    assert arr.shape == (50, 3, de.n_chains)   # theta + acceptance + lp
    np.testing.assert_allclose(arr[:, 1, :], chains.acceptance)


def test_chains_group_indexing():
    from demcmc_tpu import Chains, ParamSpec
    spec = ParamSpec.from_example(("a", "b"), [0.0, np.zeros(3)], None)
    data = np.random.default_rng(0).standard_normal((10, 4, 2))
    ch = Chains(data, spec.flat_names(), np.zeros((10, 2)), np.zeros((10, 2)),
                param_names=spec.names)
    assert ch.group("b").shape == (10, 3, 2)
    assert ch["b[2]"].shape == (10, 2)
    with pytest.raises(KeyError):
        ch.group("c")


def test_summary_renders():
    model, de = binomial.make(N=10, k=5, burnin=50)
    chains = dm.sample(model, de, 150, key=0)
    s = chains.summary()
    assert "theta" in s and "rhat" in s


def test_build_step_and_scan_caching():
    """Repeated sampling with the same (model, de) must reuse one step
    function and one jitted scan (no per-call recompiles)."""
    from demcmc_tpu.sampler import build_step, make_spec

    model, de = binomial.make(N=10, k=5, burnin=10)
    spec = make_spec(model, de)
    s1 = build_step(model, de, spec)
    s2 = build_step(model, de, spec)
    assert s1 is s2
    dm.sample(model, de, 60, key=0)
    dm.sample(model, de, 60, key=1)
    cache = getattr(s1, "_scan_jit_cache", {})
    assert (1, True, 2) in cache       # (thin, collect, unroll)
    # a different DE config builds a distinct step
    s3 = build_step(model, de.replace(burnin=20), spec)
    assert s3 is not s1
