"""Hierarchical Gaussian with block updating — reference
Examples/Hierarchical_Example.jl: hyper-parameters and subject effects
updated in alternating blocks, with snooker + resample.

Run: python examples/hierarchical.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import demcmc_tpu as dm
from demcmc_tpu.models import hierarchical

model, de = hierarchical.make(n_subj=20, n_data=50, key=0)
chains = dm.sample(model, de, 6000, key=4, progress=True)
print(chains.summary())
