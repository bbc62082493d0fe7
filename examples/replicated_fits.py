"""Per-subject model fitting: R whole runs as ONE vmapped program.

The reference's workflow for fitting a model to many subjects is a Julia
loop — one full `sample` call per subject.  Here `sample_replicated`
batches every subject's entire run (init → iterations → trajectories)
into a single XLA program: on a TPU, 64 subjects cost barely more wall
clock than one, because each subject's small chain population alone
would leave most of the chip idle.

    JAX_PLATFORMS=cpu python examples/replicated_fits.py
"""

import numpy as np

import demcmc_tpu as dm
from demcmc_tpu.models import gaussian

R, N_OBS = 8, 60
rng = np.random.default_rng(0)
true_mu = rng.normal(0.0, 2.0, R)                  # per-subject effects
true_sigma = np.exp(rng.normal(0.0, 0.3, R))
datasets = np.asarray(
    rng.normal(true_mu[:, None], true_sigma[:, None], (R, N_OBS)),
    np.float32)

de = dm.DE(bounds=gaussian.BOUNDS, n_groups=4, Np=6, burnin=500)
fits = dm.sample_replicated(gaussian.make_model, de, 2000, datasets, key=1)

print(f"{'subject':>8} {'true mu':>9} {'est mu':>9} "
      f"{'true sd':>9} {'est sd':>9} {'rhat':>7}")
for r, chains in enumerate(fits):
    print(f"{r:>8} {true_mu[r]:>9.3f} {chains.mean('mu'):>9.3f} "
          f"{true_sigma[r]:>9.3f} {chains.mean('sigma'):>9.3f} "
          f"{max(chains.rhat('mu'), chains.rhat('sigma')):>7.3f}")
