"""Hierarchical Gaussian (the analogue of
``Examples/Hierarchical_Example.jl``: snooker + resample + hyper/subject
blocks) validated statistically against the independent HMC oracle — the
block-masking + resample-history interaction is exactly where a masking
bug would hide, and the reference has no test for it at all.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import demcmc_tpu as dm
from demcmc_tpu.models import hierarchical
from demcmc_tpu.reference_samplers import hmc
from demcmc_tpu.sampler import make_spec


@pytest.mark.slow
def test_hierarchical_blocked_de_matches_hmc():
    n_subj = 8
    model, de = hierarchical.make(n_subj=n_subj, n_data=30, key=2,
                                  burnin=1500)
    spec = make_spec(model, de)
    assert de.blocks is not None and de.uses_resample and de.uses_snooker

    chains = dm.sample(model, de, 5000, key=1)
    de_mean = {n: float(chains.mean(n)) for n in ("mu_b0", "sigma_b0",
                                                  "sigma")}

    def logpost(q):
        return dm.compute_posterior(model, spec, de, q)

    # init inside the support: mu_b0=1, sigma_b0=1, b0=0, sigma=1
    init = jnp.tile(
        jnp.concatenate([jnp.array([1.0, 1.0]), jnp.zeros(n_subj),
                         jnp.array([1.0])]), (4, 1))
    res = hmc(logpost, init, key=3, n_samples=2500, n_warmup=1200)
    assert res.accept_rate > 0.5
    flat = res.samples.reshape(-1, spec.dim)
    hmc_mean = {"mu_b0": flat[:, 0].mean(),
                "sigma_b0": flat[:, 1].mean(),
                "sigma": flat[:, 2 + n_subj].mean()}

    for name in ("mu_b0", "sigma_b0", "sigma"):
        np.testing.assert_allclose(de_mean[name], hmc_mean[name],
                                   rtol=0.1, atol=0.05,
                                   err_msg=f"posterior mean of {name}")

    # subject effects: centered correctly on average
    b0_de = np.array([chains.mean(f"b0[{i + 1}]") for i in range(n_subj)])
    b0_hmc = flat[:, 2:2 + n_subj].mean(axis=0)
    np.testing.assert_allclose(b0_de, b0_hmc, atol=0.15)
