"""Lotka-Volterra ODE inference — reference
Examples/Predator_Prey_Example.jl: RK4 integrator under lax.scan, one ODE
solve per chain per step, all fused into a single tensor program.

Run: python examples/predator_prey.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import demcmc_tpu as dm
from demcmc_tpu.models import lotka_volterra

model, de = lotka_volterra.make(key=42)
chains = dm.sample(model, de, dm.MCMCThreads(), 3000, key=0, progress=True)
print(chains.summary())
print("truth: alpha=1.5 beta=1.0 gamma=3.0 delta=1.0 sigma=0.5")
