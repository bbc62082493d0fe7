"""Diagnostics (split-R̂, rank-normalized R̂, bulk ESS) correctness.

The reference delegates these to MCMCChains.jl; this framework implements
them natively (Vehtari et al. 2021), so they need their own ground-truth
tests: iid chains => R̂≈1 and ESS≈N·C; shifted chains => R̂ >> 1; AR(1)
chains => ESS ratio ≈ (1-ρ)/(1+ρ).
"""

import numpy as np
import pytest

from demcmc_tpu import diagnostics as dg


def _iid(n=2000, c=4, seed=0):
    return np.random.default_rng(seed).standard_normal((n, c))


def test_split_rhat_iid_near_one():
    x = _iid()
    r = dg.split_rhat(x)
    assert 0.99 < r < 1.01


def test_rank_normalized_rhat_iid_near_one():
    r = dg.rank_normalized_rhat(_iid())
    assert 0.99 < r < 1.02


def test_rhat_detects_shifted_chain():
    x = _iid()
    x[:, 0] += 5.0
    assert dg.split_rhat(x) > 1.5
    assert dg.rank_normalized_rhat(x) > 1.5


def test_rhat_detects_within_chain_trend():
    # split-R̂'s raison d'être: a trend visible only after splitting
    n, c = 2000, 4
    x = _iid(n, c) + np.linspace(0, 3, n)[:, None]
    assert dg.split_rhat(x) > 1.1


def test_ess_iid_close_to_sample_size():
    x = _iid(4000, 4)
    e = dg.ess(x)
    assert 0.8 * x.size < e < 1.25 * x.size


def test_ess_bulk_iid_close_to_sample_size():
    x = _iid(4000, 4)
    e = dg.ess_bulk(x)
    assert 0.8 * x.size < e < 1.25 * x.size


def test_ess_tail_iid_close_to_sample_size():
    x = _iid(4000, 4)
    e = dg.ess_tail(x)
    assert 0.7 * x.size < e < 1.3 * x.size


def test_ess_tail_detects_sticky_tails():
    """Bulk-fine but tail-sticky chains: overdispersed draws whose tail
    excursions are long runs.  Tail ESS must come out far below bulk."""
    rng = np.random.default_rng(5)
    n, c = 20000, 4
    x = rng.standard_normal((n, c))
    # rare LONG excursions deep into the tail (2 runs of 500 per chain):
    # ~5% of the mass, so bulk autocorrelation stays modest while the
    # q95-indicator flips in 500-long blocks
    for start in (3000, 13000):
        x[start:start + 500] = 4.0 + 0.1 * rng.standard_normal((500, c))
    tail = dg.ess_tail(x)
    assert tail < 0.5 * dg.ess_bulk(x)
    assert tail < 0.05 * x.size


@pytest.mark.parametrize("rho", [0.5, 0.9])
def test_ess_ar1_ratio(rho):
    rng = np.random.default_rng(1)
    n, c = 20000, 4
    x = np.zeros((n, c))
    eps = rng.standard_normal((n, c)) * np.sqrt(1 - rho ** 2)
    for t in range(1, n):
        x[t] = rho * x[t - 1] + eps[t]
    expected = n * c * (1 - rho) / (1 + rho)
    e = dg.ess(x)
    assert 0.6 * expected < e < 1.5 * expected


def test_ess_constant_chain_nan():
    x = np.ones((100, 4))
    assert np.isnan(dg.ess(x))


def test_rhat_single_short_chain_nan():
    assert np.isnan(dg.split_rhat(np.array([1.0, 2.0, 3.0])))


def test_summary_stats_keys():
    s = dg.summary_stats(_iid())
    for k in ("mean", "std", "mcse", "q2.5", "q50", "q97.5", "ess",
              "ess_tail", "rhat"):
        assert k in s
    assert abs(s["mean"]) < 0.1
    assert abs(s["std"] - 1.0) < 0.1


def test_split_rhat_hand_value():
    # 2 chains of 4 draws; hand-computed split-R̂ over the 4 half-chains
    x = np.array([[1.0, 2.0],
                  [2.0, 3.0],
                  [3.0, 4.0],
                  [4.0, 5.0]])
    s = np.array([[1.0, 3.0, 2.0, 4.0],
                  [2.0, 4.0, 3.0, 5.0]])  # [n=2, m=4] splits
    n, m = 2, 4
    w = s.var(axis=0, ddof=1).mean()
    b = n * s.mean(axis=0).var(ddof=1)
    expected = np.sqrt(((n - 1) / n * w + b / n) / w)
    np.testing.assert_allclose(dg.split_rhat(x), expected, rtol=1e-12)


def test_autocov_fft_matches_naive():
    """The FFT autocovariance must equal the direct O(n^2) sum."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((64, 3))
    acov = dg._autocov_fft(x)
    xc = x - x.mean(axis=0, keepdims=True)
    n = x.shape[0]
    naive = np.stack([
        [np.sum(xc[:n - t, m] * xc[t:, m]) / n for m in range(3)]
        for t in range(n)])
    np.testing.assert_allclose(acov, naive, atol=1e-10)


def test_ess_matches_naive_geyer():
    """End-to-end bulk-style ESS vs an independent direct implementation
    of split chains + Geyer initial monotone positive sequence."""
    rng = np.random.default_rng(7)
    n, c, rho = 1000, 4, 0.6
    x = np.zeros((n, c))
    eps = rng.standard_normal((n, c)) * np.sqrt(1 - rho ** 2)
    for t in range(1, n):
        x[t] = rho * x[t - 1] + eps[t]

    # independent implementation
    s = np.concatenate([x[:n // 2], x[n // 2:]], axis=1)   # split
    ns, m = s.shape
    chain_vars = s.var(axis=0, ddof=1)
    w = chain_vars.mean()
    b = ns * s.mean(axis=0).var(ddof=1)
    var_plus = (ns - 1) / ns * w + b / ns
    xc = s - s.mean(axis=0, keepdims=True)
    acov = np.stack([
        [np.sum(xc[:ns - t, j] * xc[t:, j]) / ns for j in range(m)]
        for t in range(ns)])
    rho_t = 1.0 - (w - acov.mean(axis=1)) / var_plus
    max_t = (ns - 2) if (ns - 2) % 2 == 0 else (ns - 3)
    pairs = rho_t[:max_t + 2].reshape(-1, 2).sum(axis=1)
    k = len(pairs)
    for i, p in enumerate(pairs):
        if p <= 0:
            k = i
            break
    pairs = np.minimum.accumulate(pairs[:k])
    tau = -1.0 + 2.0 * pairs.sum()
    tau = max(tau, 1.0 / np.log10(ns * m + 10))
    expected = ns * m / tau

    np.testing.assert_allclose(dg.ess(x), expected, rtol=1e-10)


def test_ess_device_matches_numpy():
    # jnp mirror used for on-device ESS/s benchmarks must agree with the
    # validated numpy implementation (x64 enabled in conftest)
    rng = np.random.default_rng(5)
    for shape in ((400, 8), (1000, 4), (250, 16)):
        x = rng.standard_normal(shape)
        # add autocorrelation so tau > 1
        for t in range(1, shape[0]):
            x[t] = 0.6 * x[t - 1] + np.sqrt(1 - 0.36) * x[t]
        ref = dg.ess(x)
        dev = float(dg.ess_device(x))
        np.testing.assert_allclose(dev, ref, rtol=1e-6)


# ---------------------------------------------------------------------------
# streaming convergence monitor (utils/monitor.py)
# ---------------------------------------------------------------------------

def test_monitor_rhat_matches_split_rhat():
    """Chunked streaming split-R̂ matches the post-hoc
    diagnostics.split_rhat to 1e-2 on an AR(1) fixture (the VERDICT r3
    acceptance criterion), on both stationary and trending chains."""
    from demcmc_tpu import diagnostics
    from demcmc_tpu.utils.monitor import ConvergenceMonitor
    rng = np.random.default_rng(0)
    T, C, d = 1200, 6, 3
    # AR(1) draws (rho=0.7) with per-chain offsets; param 2 gets a shared
    # within-chain TREND, which only a split statistic can flag
    x = np.empty((T, C, d))
    x[0] = rng.standard_normal((C, d))
    for t in range(1, T):
        x[t] = 0.7 * x[t - 1] + np.sqrt(1 - 0.49) * rng.standard_normal(
            (C, d))
    x += rng.normal(size=(1, C, 1)) * 0.2
    x[:, :, 2] += np.linspace(0.0, 3.0, T)[:, None]
    mon = ConvergenceMonitor()
    for lo in range(0, T, 137):                # uneven chunking
        mon.update(x[lo:lo + 137])
    got = mon.rhat()
    want = np.array([diagnostics.split_rhat(x[:, :, k]) for k in range(d)])
    np.testing.assert_allclose(got, want, atol=1e-2)
    # the trend is actually flagged (split-R̂ >> 1) even though every
    # chain drifts together (chain-level R̂ would sit near 1)
    assert got[2] > 1.15
    mean = x[:, :, 2].mean(axis=0)
    W = x[:, :, 2].var(axis=0, ddof=1).mean()
    chain_level = np.sqrt(((T - 1) / T * W + mean.var(ddof=1)) / W)
    assert chain_level < got[2] - 0.1


def test_monitor_bucket_merging_keeps_split_accuracy():
    """Long runs exceed _MAX_BUCKETS and merge pairwise; the split point
    stays within one bucket of n/2 and the statistic stays accurate."""
    from demcmc_tpu import diagnostics
    from demcmc_tpu.utils import monitor as monitor_mod
    rng = np.random.default_rng(3)
    T, C = 4 * monitor_mod._MAX_BUCKETS + 37, 4
    x = rng.standard_normal((T, C, 1)).cumsum(axis=0) * 0.01
    mon = monitor_mod.ConvergenceMonitor()
    for lo in range(0, T, 250):
        mon.update(x[lo:lo + 250])
    assert len(mon._bn) <= monitor_mod._MAX_BUCKETS + 1
    want = diagnostics.split_rhat(x[:, :, 0])
    np.testing.assert_allclose(mon.rhat()[0], want, atol=1e-2)


def test_monitor_ess_sane_on_iid_and_correlated():
    from demcmc_tpu.utils.monitor import ConvergenceMonitor
    rng = np.random.default_rng(1)
    T, C = 2000, 8
    iid = rng.standard_normal((T, C, 1))
    mon = ConvergenceMonitor()
    mon.update(iid)
    ess = mon.ess_rough()[0]
    assert 0.7 * T * C < ess < 1.3 * T * C     # iid: ESS ~ N
    # AR(1) with rho = 0.8 -> ESS ~ N * (1-rho)/(1+rho) ~ 0.111 N
    ar = np.empty((T, C, 1))
    ar[0] = rng.standard_normal((C, 1))
    for t in range(1, T):
        ar[t] = 0.8 * ar[t - 1] + np.sqrt(1 - 0.64) * rng.standard_normal(
            (C, 1))
    mon2 = ConvergenceMonitor()
    for lo in range(0, T, 300):
        mon2.update(ar[lo:lo + 300])
    ess2 = mon2.ess_rough()[0]
    assert 0.06 * T * C < ess2 < 0.2 * T * C


def test_monitor_ess_stream_matches_geyer_on_ar1():
    """The streaming bucket-mean Geyer ESS tracks the post-hoc
    diagnostics.ess to ~15% on AR(1) chains at two correlation levels
    (verdict r4 item 8) — where the lag-1 fallback is only 'rough'."""
    from demcmc_tpu import diagnostics
    from demcmc_tpu.utils.monitor import ConvergenceMonitor
    rng = np.random.default_rng(7)
    T, C = 8192, 4
    for rho in (0.5, 0.9):
        ar = np.empty((T, C, 1))
        ar[0] = rng.standard_normal((C, 1))
        sd = np.sqrt(1 - rho * rho)
        for t in range(1, T):
            ar[t] = rho * ar[t - 1] + sd * rng.standard_normal((C, 1))
        mon = ConvergenceMonitor()
        for lo in range(0, T, 500):
            mon.update(ar[lo:lo + 500])
        want = diagnostics.ess(ar[:, :, 0])
        got = mon.ess_stream()[0]
        assert abs(got - want) / want < 0.15, (rho, got, want)


def test_monitor_ess_stream_fallback_and_ar2():
    """Before 16 full buckets exist ess_stream delegates to the lag-1
    estimate; on an AR(2) chain (where lag-1 overstates ESS ~2x) the
    bucket-mean Geyer estimate stays within 20% of the post-hoc one."""
    from demcmc_tpu import diagnostics
    from demcmc_tpu.utils.monitor import ConvergenceMonitor
    rng = np.random.default_rng(3)
    mon = ConvergenceMonitor()
    mon.update(rng.standard_normal((8, 2, 1)))
    np.testing.assert_allclose(mon.ess_stream(), mon.ess_rough())
    # AR(2): x_t = a1 x_{t-1} + a2 x_{t-2} + e  (oscillatory memory)
    T, C = 8192, 4
    a1, a2 = 0.4, 0.35
    x = np.zeros((T, C, 1))
    x[0] = rng.standard_normal((C, 1))
    x[1] = rng.standard_normal((C, 1))
    for t in range(2, T):
        x[t] = (a1 * x[t - 1] + a2 * x[t - 2]
                + rng.standard_normal((C, 1)))
    mon2 = ConvergenceMonitor()
    for lo in range(0, T, 777):
        mon2.update(x[lo:lo + 777])
    want = diagnostics.ess(x[:, :, 0])
    got = mon2.ess_stream()[0]
    assert abs(got - want) / want < 0.2, (got, want)


def test_sample_stop_rhat_early_stop():
    """stop_rhat ends the run at a chunk boundary once streaming R̂max
    hits the target; the returned chains hold only the draws taken and
    are still a valid posterior sample."""
    import demcmc_tpu as dt
    from demcmc_tpu.models import gaussian
    model, de = gaussian.make(key=0, n_obs=30, n_groups=8, Np=6,
                              burnin=200)
    chains = dt.sample(model, de, 20000, key=5, stop_rhat=1.05)
    # a well-mixing 2-param Gaussian converges long before 19800 draws
    assert len(chains) < 19800 - 200
    assert len(chains) >= 50
    assert chains.monitor.max_rhat() <= 1.05
    # the early-stopped output is still a sane posterior sample
    assert abs(chains.mean("mu") - np.mean(model.data)) < 0.5
    # unreachable target -> runs to completion
    chains_full = dt.sample(model, de, 600, key=5, stop_rhat=1e-9)
    assert len(chains_full) == 600 - 200


def test_sample_monitor_end_to_end():
    """sample(monitor=True) attaches a converged monitor whose streaming
    R̂ agrees with the post-hoc split-R̂ to the expected tolerance."""
    import demcmc_tpu as dt
    from demcmc_tpu.models import gaussian
    model, de = gaussian.make(key=0, n_obs=30, n_groups=8, Np=6,
                              burnin=400)
    chains = dt.sample(model, de, 1600, key=3, monitor=True)
    mon = chains.monitor
    assert mon.n == 1200 * 1  # post-burnin draws
    r = mon.max_rhat()
    assert r is not None and 0.99 < r < 1.05
    ess = mon.ess_rough()
    assert np.all(ess > 50)


def test_ess_device_degenerate_returns_nan():
    """Constant chains (w=0) and too-few draws give NaN, matching the
    numpy ess() contract — not a large finite number."""
    import jax.numpy as jnp
    import demcmc_tpu.diagnostics as dg
    const = jnp.ones((500, 8))
    assert np.isnan(float(dg.ess_device(const)))
    tiny = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4)))
    assert np.isnan(float(dg.ess_device(tiny)))
