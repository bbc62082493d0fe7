"""Simulation-based calibration (Talts et al. 2018) of the DE-MCMC sampler.

For M simulated (θ*, data) pairs from the prior predictive, the rank of
θ* among L thinned posterior draws must be uniform on {0..L} if the
sampler targets the exact posterior.  This detects biases that moment
comparisons miss (the tests' conjugate/quadrature checks bound errors at
~2%; SBC catches systematically shifted or over/under-dispersed
posteriors at any scale).

Runs the 1-parameter binomial model (conjugate — so any miscalibration
is the sampler's fault, not the model's).  Prints a chi-square
goodness-of-fit summary; p > 0.01 passes.

Run (CPU, grant-free):
    JAX_PLATFORMS=cpu PYTHONPATH=/opt/venv/lib/python3.12/site-packages:. \
        python -S validation/sbc.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy import stats

import demcmc_tpu as dm
from demcmc_tpu.models import binomial

M = 48            # simulated datasets
N_TRIALS = 10
L = 31            # posterior draws used per dataset (thinned)
N_ITER = 600
BURNIN = 200


def sbc_snooker_resample(M=32, d=3, n_obs=20):
    """SBC of the snooker + resample (DE-MCz) path — validates the snooker
    MH volume correction ((d-1)·log ‖·‖ term) and the history sampling,
    the two most error-prone mechanisms.  Gaussian-mean model with KNOWN
    sigma=1 so the prior predictive is well-scaled; theta_snooker=0.5
    stresses the snooker path."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    ranks = []
    for i in range(M):
        mu_true = rng.normal(0.0, 1.0, size=d)
        data = rng.normal(mu_true, 1.0, size=(n_obs, d))

        def loglike(data, mu):
            return -0.5 * jnp.sum((data - mu) ** 2)

        def prior_loglike(mu):
            return -0.5 * jnp.sum(mu ** 2)

        model = dm.DEModel(
            loglike=loglike, prior_loglike=prior_loglike,
            sample_prior=lambda k: [jax.random.normal(k, (d,))],
            names=("mu",), data=jnp.asarray(data))
        de = dm.DE(Np=3, n_groups=1, alpha=0.0, theta_snooker=0.5,
                   sample="resample", n_initial=(d + 1) * 4,
                   burnin=400, bounds=((-np.inf, np.inf),))
        chains = dm.sample(model, de, 1400, key=1000 + i)
        mu_draws = chains.group("mu")            # [Ns, d, C]
        for j in range(d):
            draws = mu_draws[:, j, :].reshape(-1)
            idx = np.linspace(0, draws.size - 1, L).astype(int)
            ranks.append(int(np.sum(draws[idx] < mu_true[j])))
        print(f"\r[sbc-snooker] {i + 1}/{M}", end="", flush=True)
    print()
    return np.asarray(ranks)


def _chi2(ranks, label, B=8):
    Mtot = ranks.size
    edges = np.linspace(0, L + 1, B + 1)
    obs, _ = np.histogram(ranks, bins=edges)
    expected = Mtot / B
    chi2 = float(np.sum((obs - expected) ** 2 / expected))
    p = float(stats.chi2.sf(chi2, B - 1))
    print(f"[{label}] chi2({B - 1} dof) = {chi2:.2f}, p = {p:.3f} "
          f"({'PASS' if p > 0.01 else 'FAIL'})")
    return p


def main():
    rng = np.random.default_rng(20260817)
    ranks = []
    for i in range(M):
        theta_true = rng.beta(1.0, 1.0)
        k = int(rng.binomial(N_TRIALS, theta_true))
        model, de = binomial.make(N=N_TRIALS, k=k, burnin=BURNIN, Np=4)
        chains = dm.sample(model, de, N_ITER, key=i)
        draws = chains["theta"].reshape(-1)
        # L approximately-independent draws: stride across the pooled
        # chains (ESS per draw is high for this 1-d conjugate model)
        idx = np.linspace(0, draws.size - 1, L).astype(int)
        sub = draws[idx]
        ranks.append(int(np.sum(sub < theta_true)))
        print(f"\r[sbc] {i + 1}/{M}", end="", flush=True)
    print()

    ranks = np.asarray(ranks)
    p = _chi2(ranks, "binomial/default-path")
    p2 = _chi2(sbc_snooker_resample(), "snooker+resample")
    return min(p, p2)


if __name__ == "__main__":
    p = main()
    sys.exit(0 if p > 0.01 else 1)
