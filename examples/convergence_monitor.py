"""Streaming convergence monitoring + auto-stop.

Run-time observability beyond the reference (whose only run-time output
is a ProgressMeter bar, ``src/main.jl:30``): ``monitor=True`` streams a
running chain-level R̂ and a rough lag-1 ESS from trajectory chunks as
they come off the device — at zero device cost — and ``stop_rhat=``
ends the run at the first chunk boundary where the post-burnin R̂max
reaches the target, so you pay for exactly as many iterations as the
problem needs.

    JAX_PLATFORMS=cpu python examples/convergence_monitor.py
"""

import numpy as np

import demcmc_tpu as dm
from demcmc_tpu.models import gaussian

model, de = gaussian.make(key=0, n_obs=50, n_groups=16, Np=6, burnin=500)

# Budget 50000 iterations, but stop as soon as R̂max <= 1.01.
chains = dm.sample(model, de, 50000, key=7, progress=True, stop_rhat=1.01)

mon = chains.monitor
print(f"\nstopped after {len(chains) + de.burnin} iterations "
      f"(budget was 50000)")
print(f"streaming R̂max  = {mon.max_rhat():.4f}")
print(f"rough ESS (mu, sigma) = {np.round(mon.ess_rough(), 1)}")
print()
print(chains.summary())

truth = gaussian.posterior_grid(np.asarray(model.data))
print("\nquadrature ground truth:")
for p in ("mu", "sigma"):
    print(f"  {p}: mean={truth[p]['mean']:.4f} std={truth[p]['std']:.4f}")
