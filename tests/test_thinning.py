"""Thinning: keep every thin-th draw, carry-only inner iterations.

No reference analogue (the reference stores every draw); validated
against the unthinned run: the retained draws must be EXACTLY the
unthinned trajectory's every-thin-th rows (the sampler's counter-based
RNG depends only on (key, iteration), so thinning cannot change the
chain — only which rows are stored).
"""

import numpy as np
import pytest

import demcmc_tpu as dm
from demcmc_tpu.models import binomial, gaussian


def test_thinned_matches_unthinned_rows():
    model, de = binomial.make(N=10, k=5, burnin=0, discard_burnin=False)
    full = dm.sample(model, de, 120, key=3)
    thinned = dm.sample(model, de, 120, key=3, thin=4)
    assert len(thinned) == 30
    np.testing.assert_array_equal(thinned.data, full.data[3::4])
    np.testing.assert_array_equal(thinned.lp, full.lp[3::4])


def test_thin_burnin_accounting():
    model, de = binomial.make(N=10, k=5, burnin=40, discard_burnin=True)
    chains = dm.sample(model, de, 200, key=1, thin=4)
    assert len(chains) == (200 - 40) // 4


def test_thin_requires_divisibility():
    model, de = binomial.make(N=10, k=5, burnin=30)
    with pytest.raises(ValueError):
        dm.sample(model, de, 100, key=0, thin=3)   # 100 % 3 != 0


def test_thin_burnin_divisibility():
    model, de = binomial.make(N=10, k=5, burnin=25, discard_burnin=True)
    with pytest.raises(ValueError):
        dm.sample(model, de, 100, key=0, thin=4)


def test_thinned_posterior_statistics():
    model, de = gaussian.make(key=5, n_obs=50, burnin=1000)
    chains = dm.sample(model, de, 4000, key=42, thin=5)
    truth = gaussian.posterior_grid(np.asarray(model.data))
    assert len(chains) == 600
    assert abs(chains.mean("mu") - truth["mu"]["mean"]) < 0.03
    assert abs(chains.mean("sigma") - truth["sigma"]["mean"]) < 0.03
