"""Discrete (integer) parameter estimation — reference
Examples/Discrete_Example.jl: infer a binomial N jointly with p; integer
leaves follow the round-and-cast rule so chains stay integral.

Run: python examples/discrete_parameters.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import demcmc_tpu as dm
from demcmc_tpu.models import discrete_binomial

model, de = discrete_binomial.make(key=0)
true_n, true_p = 10, 0.6
chains = dm.sample(model, de, 3000, key=2, progress=True)
N = chains["N"].astype(int)
print("N posterior mode:", np.bincount(N.ravel()).argmax(), "truth:", true_n)
print("p posterior mean:", chains.mean("p"), "truth:", true_p)
# N and p are anti-correlated along the ridge N*p = E[data]; the product
# is the identified quantity:
print("E[N*p]:", (chains["N"] * chains["p"]).mean(),
      "data mean:", float(np.asarray(model.data).mean()))
assert np.array_equal(N, np.round(N))
