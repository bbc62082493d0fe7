"""Tests for sample_replicated — R independent runs as one vmapped program.

No reference analogue (MCMCThreads parallelizes the groups of ONE run);
this batches whole runs, the TPU-native shape for per-subject fits and
simulation-based calibration.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import demcmc_tpu as dm
from demcmc_tpu.models import gaussian


def _make_model(data):
    return gaussian.make_model(data)


def _de(**kw):
    kw.setdefault("Np", 4)
    kw.setdefault("n_groups", 4)
    kw.setdefault("burnin", 400)
    kw.setdefault("bounds", gaussian.BOUNDS)
    return dm.DE(**kw)


def test_replicated_matches_single_run_bitwise(monkeypatch):
    """Replication r == sample(make_model(datasets[r]), ..., key=keys[r])
    bitwise on the XLA step path."""
    monkeypatch.setenv("DEMCMC_FUSED", "off")
    rng_ = np.random.default_rng(0)
    datasets = jnp.asarray(rng_.normal(0.0, 1.0, (3, 40)), jnp.float32)
    de = _de(burnin=100)
    keys = [jax.random.PRNGKey(100 + r) for r in range(3)]
    reps = dm.sample_replicated(_make_model, de, 300, datasets, keys=keys)
    assert len(reps) == 3
    for r in range(3):
        solo = dm.sample(_make_model(datasets[r]), de, 300, key=keys[r])
        np.testing.assert_array_equal(reps[r].data, solo.data)


def test_replicated_recovers_per_dataset_posteriors():
    """Each replication converges on ITS dataset's posterior (shifted
    means are resolved per replication, not pooled)."""
    rng_ = np.random.default_rng(1)
    mus = np.array([-2.0, 0.0, 3.0])
    datasets = jnp.asarray(
        rng_.normal(mus[:, None], 1.0, (3, 80)), jnp.float32)
    de = _de(burnin=500)
    reps = dm.sample_replicated(_make_model, de, 1500, datasets, key=7)
    for r in range(3):
        want = gaussian.posterior_grid(np.asarray(datasets[r]))
        assert abs(reps[r].mean("mu") - want["mu"]["mean"]) < 0.1, r
        assert abs(reps[r].mean("sigma") - want["sigma"]["mean"]) < 0.1, r


def test_replicated_resample_history_path():
    """The DE-MCz history buffer (dynamic_update_slice in the carry)
    batches correctly under vmap."""
    def make_model(data):
        def loglike(data, mu):
            return -0.5 * jnp.sum((data - mu) ** 2)

        def prior_loglike(mu):
            return -0.5 * jnp.sum(mu ** 2)

        return dm.DEModel(
            loglike=loglike, prior_loglike=prior_loglike,
            sample_prior=lambda k: [jax.random.normal(k, (2,))],
            names=("mu",), data=data)

    rng_ = np.random.default_rng(2)
    mus = np.array([[-1.0, 1.0], [2.0, 0.0]])
    datasets = jnp.asarray(
        rng_.normal(mus[:, None, :], 1.0, (2, 30, 2)), jnp.float32)
    de = dm.DE(Np=3, n_groups=1, alpha=0.0, theta_snooker=0.3,
               sample="resample", n_initial=12, burnin=400,
               bounds=((-np.inf, np.inf),))
    reps = dm.sample_replicated(make_model, de, 1400, datasets, key=3)
    for r in range(2):
        post_mean = mus[r] * 30 / 31  # conjugate: n/(n+1) * xbar-ish
        got = reps[r].group("mu").mean(axis=(0, 2))
        xbar = np.asarray(datasets[r]).mean(axis=0)
        want = xbar * 30 / 31
        np.testing.assert_allclose(got, want, atol=0.2)


def test_replicated_thin_and_validation():
    rng_ = np.random.default_rng(3)
    datasets = jnp.asarray(rng_.normal(0, 1, (2, 20)), jnp.float32)
    de = _de(burnin=100)
    reps = dm.sample_replicated(_make_model, de, 300, datasets, key=1,
                                thin=2)
    assert len(reps[0]) == (300 - 100) // 2
    with pytest.raises(ValueError):
        dm.sample_replicated(_make_model, de, 301, datasets, key=1, thin=2)
    with pytest.raises(ValueError):
        dm.sample_replicated(_make_model, de, 300, datasets,
                             keys=[jax.random.PRNGKey(0)])


def test_optimize_replicated_per_dataset_mle():
    """Each replication's DE optimization finds ITS dataset's MLE
    (mean, uncorrected std), like the reference's maximize! test."""
    import jax.numpy as jnp
    from demcmc_tpu import get_optimal, optimize_replicated

    def make_model(data):
        def loglike(data, mu, sigma):
            return jnp.sum(
                -0.5 * jnp.log(2 * jnp.pi) - jnp.log(sigma)
                - 0.5 * ((data - mu) / sigma) ** 2)
        return dm.DEModel(loglike=loglike,
                          sample_prior=gaussian.sample_prior,
                          names=("mu", "sigma"), data=data)

    rng_ = np.random.default_rng(4)
    mus = np.array([-1.5, 2.0])
    datasets = jnp.asarray(rng_.normal(mus[:, None], 1.0, (2, 60)),
                           jnp.float32)
    de = dm.DE(bounds=gaussian.BOUNDS, n_groups=2, Np=12, burnin=0,
               update_particle="maximize", evaluate_fitness="fun")
    pops = optimize_replicated(make_model, de, 1500, datasets, key=2)
    for r in range(2):
        x = np.asarray(datasets[r], np.float64)
        theta, best = get_optimal(de, make_model(datasets[r]), pops[r])
        assert abs(float(theta["mu"]) - x.mean()) < 1e-3, r
        assert abs(float(theta["sigma"]) - x.std()) < 1e-3, r


def test_replicated_sharded_over_mesh_matches_unsharded():
    """mesh= shards the replication axis over 8 virtual devices; each
    replication's chains match the unsharded run."""
    from demcmc_tpu.parallel import chain_mesh

    rng_ = np.random.default_rng(5)
    datasets = jnp.asarray(
        rng_.normal([[-1.0], [0.0], [1.0], [2.0]] * 2, 1.0, (8, 40)),
        jnp.float32)
    de = _de(burnin=100)
    plain = dm.sample_replicated(_make_model, de, 300, datasets, key=9)
    mesh = chain_mesh(8)
    shard = dm.sample_replicated(_make_model, de, 300, datasets, key=9,
                                 mesh=mesh)
    for r in range(8):
        np.testing.assert_allclose(shard[r].data, plain[r].data,
                                   rtol=2e-5, atol=1e-5)
    with pytest.raises(ValueError):
        dm.sample_replicated(_make_model, de, 300,
                             datasets[:6], key=9, mesh=mesh)


def test_replicated_jit_cache_reuse_across_calls():
    """Repeated same-shape sample_replicated calls with the same
    make_model must reuse the memoized jit wrapper: no re-trace, no
    re-compile (VERDICT r3 weak item 8), and identical chains."""
    trace_calls = []

    def make_model(data):
        # count only calls under tracing (the vmapped program body);
        # _replicated_setup also calls make_model eagerly per call
        if isinstance(data, jax.core.Tracer):
            trace_calls.append(1)
        return gaussian.make_model(data)

    rng_ = np.random.default_rng(5)
    datasets = jnp.asarray(rng_.normal(0.0, 1.0, (2, 30)), jnp.float32)
    de = _de(burnin=50)
    r1 = dm.sample_replicated(make_model, de, 120, datasets, key=3)
    n_traces = len(trace_calls)
    assert n_traces >= 1
    r2 = dm.sample_replicated(make_model, de, 120, datasets, key=3)
    assert len(trace_calls) == n_traces, "second call re-traced"
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(a.data, b.data)
    # a DIFFERENT run signature must still build (and trace) fresh
    dm.sample_replicated(make_model, de, 240, datasets, key=3)
    assert len(trace_calls) > n_traces
