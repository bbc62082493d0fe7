"""Gaussian (mu, sigma) example — reference Examples/Gaussian_Example.jl.

Run: python examples/gaussian.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import demcmc_tpu as dm
from demcmc_tpu.models import gaussian

model, de = gaussian.make(key=50514, n_obs=50, Np=6, burnin=1000)
chains = dm.sample(model, de, 2000, key=0, progress=True)
print(chains.summary())

truth = gaussian.posterior_grid(np.asarray(model.data))
print("\nquadrature ground truth:")
for name, s in truth.items():
    print(f"  {name}: mean={s['mean']:.4f} std={s['std']:.4f}")
