"""DE-MCz (resample-from-history) + snooker path — the analogue of
`test/multivariate_normal_tests.jl`: few chains (Np=3, one group) in d
dimensions can only work by sampling partners from past states.

Scaled down from the reference's 30-dim × 50k iterations to keep CPU CI
fast; the statistical assertions are proportionally looser but still fail
if the history sampling, snooker projection, or MH correction are wrong.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import demcmc_tpu as dm
from demcmc_tpu.models import mvnormal


@pytest.fixture(scope="module")
def mvn_run():
    d = 10
    model, de = mvnormal.make(d=d, n_obs=100, key=1, burnin=2000,
                              dtype=np.float64)
    chains = dm.sample(model, de, 12_000, key=3)
    data = np.asarray(model.data, dtype=np.float64)
    return chains, data, d


def test_mvn_sigma_recovered(mvn_run):
    chains, data, d = mvn_run
    # posterior for sigma concentrates near the sample sd (sigma_true = 1)
    assert abs(chains.mean("sigma") - 1.0) < 0.1


def test_mvn_mu_means(mvn_run):
    chains, data, d = mvn_run
    mu = chains.group("mu")              # [Ns, d, C]
    post_means = mu.mean(axis=(0, 2))
    truth = mvnormal.analytic_posterior(data)
    np.testing.assert_allclose(post_means, truth["mean"], atol=0.15)
    # posterior sd ~ 0.1 at n_obs=100 (reference asserts atol 0.01 at 50k
    # iters; we run 12k)
    post_sds = mu.std(axis=(0, 2), ddof=1)
    np.testing.assert_allclose(post_sds, truth["std"], atol=0.04)


def test_mvn_mean_correlation(mvn_run):
    chains, data, d = mvn_run
    mu = chains.group("mu").mean(axis=(0, 2))
    data_means = data.mean(axis=0)
    r = np.corrcoef(mu, data_means)[0, 1]
    assert r > 0.95  # reference: > 0.98 at 3x dims and 4x iterations


def test_resample_requires_n_initial():
    model, de = mvnormal.make(d=3, n_obs=20)
    bad = de.replace(n_initial=0)
    with pytest.raises(ValueError):
        dm.sample(model, bad, 100, key=0)


def test_resample_requires_np3():
    with pytest.raises(ValueError):
        dm.DE(Np=2, sample="resample", n_initial=10)


def test_resample_draws_without_replacement():
    """resample's (row, chain) draws are distinct within each n-tuple —
    matching the reference's StatsBase.sample(...; replace=false) over
    the flat index space (src/crossover.jl:113-124) — and each draw is
    marginally uniform."""
    from demcmc_tpu import rng as rng_mod
    from demcmc_tpu.ops import proposals
    draws = rng_mod.KeyDraws(jax.random.PRNGKey(0))
    # tiny flat space (2 rows x 3 chains = 6 pairs) maximizes collision
    # pressure; 3 draws per cell over 2000 cells
    row, chain = proposals.resample_flat_indices(
        draws, 3, jnp.asarray(2, jnp.int32), 3, (2000,))
    flat = np.asarray(row) * 3 + np.asarray(chain)    # [3, 2000]
    assert flat.min() >= 0 and flat.max() < 6
    assert (flat[0] != flat[1]).all()
    assert (flat[0] != flat[2]).all()
    assert (flat[1] != flat[2]).all()
    for k in range(3):                   # marginal uniformity per slot
        counts = np.bincount(flat[k], minlength=6)
        assert counts.min() > 2000 / 6 * 0.7
        assert counts.max() < 2000 / 6 * 1.3
    # replace=True really is with replacement (collisions appear)
    row_r, chain_r = proposals.resample_flat_indices(
        draws, 3, jnp.asarray(2, jnp.int32), 3, (2000,), replace=True)
    flat_r = np.asarray(row_r) * 3 + np.asarray(chain_r)
    assert (flat_r[0] == flat_r[1]).any()


def test_history_grows_and_fills():
    from demcmc_tpu.sampler import init_state, make_spec, build_step, \
        run_scan, _grow_history
    model, de = mvnormal.make(d=3, n_obs=20, n_initial=8, burnin=10)
    spec = make_spec(model, de)
    state = init_state(model, de, spec, 0)
    assert state.history.shape == (8, de.n_chains, spec.dim)
    assert int(state.iteration) == 9      # n_initial + 1, like de.iter
    state = _grow_history(state, 20)
    assert state.history.shape == (28, de.n_chains, spec.dim)
    step = build_step(model, de, spec)
    state, _ = run_scan(step, state, 20)
    h = np.asarray(state.history)
    assert np.all(h[:28] != 0, where=np.isfinite(h[:28]))
    # every stored row non-trivial: rows 8..27 written by the scan
    assert np.any(h[27] != 0)


def test_resample_vmem_budget_fallback(monkeypatch):
    """A resample run whose packed history exceeds the kernel's VMEM
    budget must FALL BACK to the XLA step (the accepts_history gate in
    sample) and produce bitwise the same chains as a forced-XLA run —
    not fault the device (observed on-chip: a ~37 MB history compiles
    but ABORTS at kernel load, hence RESAMPLE_HIST_VMEM=24 MiB)."""
    from demcmc_tpu.ops import fused_step

    n_iter = 40
    monkeypatch.setenv("DEMCMC_FUSED", "off")
    model, de = mvnormal.make(d=4, n_obs=30, key=2, burnin=20,
                              dtype=np.float32)
    want_xla = dm.sample(model, de, n_iter, key=5)

    monkeypatch.setenv("DEMCMC_FUSED", "interpret")
    monkeypatch.setattr(fused_step, "RESAMPLE_HIST_VMEM", 1)
    model2, de2 = mvnormal.make(d=4, n_obs=30, key=2, burnin=20,
                                dtype=np.float32)
    assert not fused_step.resample_hist_fits(
        de2, dm.sampler.make_spec(model2, de2), n_iter + de2.n_initial)
    got = dm.sample(model2, de2, n_iter, key=5)
    np.testing.assert_array_equal(got.data, want_xla.data)


def test_resample_super_k_respects_smem_budget(monkeypatch):
    """K must scale DOWN for word-heavy configs (sequential sweep at
    big Np): a max(16, ...) floor used to build launches whose flat
    index array exceeded the chip's 1 MB SMEM.  The env override is
    clamped to the same budget."""
    from demcmc_tpu.ops import fused_step

    de = dm.DE(bounds=((-10.0, 10.0), (0.0, 10.0)), n_groups=2, Np=64,
               theta_snooker=0.1, sample="resample", n_initial=8,
               sweep="sequential", burnin=10)
    words = fused_step.resample_idx_words(de)
    assert words == 5 * 64 * 128
    k = fused_step.resample_super_k(de)
    assert k == 1                       # over the SUPER_K word budget
    monkeypatch.setenv("DEMCMC_SUPER_K", "64")
    assert fused_step.resample_super_k(de) == 1    # env clamped
    # the flagship shape keeps its deep superstep
    monkeypatch.delenv("DEMCMC_SUPER_K")
    _, de_flag = mvnormal.make(d=30, n_obs=100, key=1, burnin=2000)
    assert fused_step.resample_super_k(de_flag) >= 64
