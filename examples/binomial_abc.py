"""Binomial with exact vs ABC (simulation-based) likelihood — reference
Examples/Binomial_ABC.jl.

Run: python examples/binomial_abc.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import demcmc_tpu as dm
from demcmc_tpu.models import binomial

N, k = 10, 6

for abc in (False, True):
    model, de = binomial.make(N=N, k=k, abc=abc, Np=4, burnin=1000)
    chains = dm.sample(model, de, 3000, key=3, progress=True)
    label = "ABC" if abc else "exact"
    print(f"[{label}] theta mean={chains.mean('theta'):.4f} "
          f"std={chains.std('theta'):.4f}")

truth = binomial.conjugate_posterior(N, k)
print(f"[conjugate Beta({k + 1},{N - k + 1})] mean={truth['mean']:.4f} "
      f"std={truth['std']:.4f}")
