"""DE optimization — reference Examples/Optimize_Example.jl /
test/optimization_tests.jl: minimize Rastrigin, maximize a Gaussian
log-likelihood (MLE).

Run: python examples/optimize.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)   # Rastrigin to 1e-8 needs f64

import jax.numpy as jnp

import demcmc_tpu as dm
from demcmc_tpu.models import rastrigin

model, de = rastrigin.make(n_dim=2, Np=10, n_groups=4, dtype=jnp.float64)
pop = dm.optimize(model, de, 10_000, key=0, progress=True)
theta, best = dm.get_optimal(de, model, pop)
print("Rastrigin minimum:", best, "at x =", theta["x"])
