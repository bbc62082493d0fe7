"""Linear Ballistic Accumulator choice-RT model — reference
Examples/Run_LBA.jl, with the LBA density implemented natively in JAX.

Run: python examples/lba.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import demcmc_tpu as dm
from demcmc_tpu.models import lba

model, de = lba.make(key=0, n_trials=200)
chains = dm.sample(model, de, dm.MCMCThreads(), 4000, key=1, progress=True)
print(chains.summary())
print("truth: nu=[3.0, 2.0] A=0.8 k=0.2 tau=0.3")
