"""Synthetic (KDE) likelihood ABC — reference Examples/KDE_Example.jl:
Gaussian model whose likelihood is an Epanechnikov KDE over 10^4 forward
simulations.  `use_pallas=True` switches the KDE reduction to the fused
Pallas TPU kernel (ops/pallas_kde.py).

Run: python examples/kde_likelihood.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

import demcmc_tpu as dm
from demcmc_tpu.models import abc_kde

use_pallas = jax.default_backend() == "tpu"
model, de = abc_kde.make(key=0, n_obs=50, n_sim=10_000,
                         use_pallas=use_pallas, Np=6, burnin=1000)
chains = dm.sample(model, de, 2000, key=1, progress=True)
print(chains.summary())
