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
    for k in ("mean", "std", "mcse", "q2.5", "q50", "q97.5", "ess", "rhat"):
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
