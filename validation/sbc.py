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
    # chi-square on B bins of the L+1 possible ranks
    B = 8
    edges = np.linspace(0, L + 1, B + 1)
    obs, _ = np.histogram(ranks, bins=edges)
    expected = M / B
    chi2 = float(np.sum((obs - expected) ** 2 / expected))
    p = float(stats.chi2.sf(chi2, B - 1))
    print(f"ranks: {sorted(ranks.tolist())}")
    print(f"chi2({B - 1} dof) = {chi2:.2f}, p = {p:.3f} "
          f"({'PASS' if p > 0.01 else 'FAIL'})")
    return p


if __name__ == "__main__":
    p = main()
    sys.exit(0 if p > 0.01 else 1)
