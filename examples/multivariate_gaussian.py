"""30-dim MVN with snooker + resample (DE-MCz) — reference
Examples/Multivariate_Guassian_Example.jl: Np=3 chains in one group can
only traverse 30 dimensions by sampling partners from the history of past
states.

Run: python examples/multivariate_gaussian.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import demcmc_tpu as dm
from demcmc_tpu.models import mvnormal

d = 30
model, de = mvnormal.make(d=d, n_obs=100, key=50514, burnin=5000)
chains = dm.sample(model, de, dm.MCMCThreads(), 50_000, key=0, progress=True)

mu = chains.group("mu")            # [draws, d, chains]
post_means = mu.mean(axis=(0, 2))
post_sds = mu.std(axis=(0, 2), ddof=1)
truth = mvnormal.analytic_posterior(np.asarray(model.data))
print("max |mean error|:", np.abs(post_means - truth["mean"]).max())
print("posterior sds ~", post_sds.mean(), "(analytic ~", truth["std"][0], ")")
print("cor(data means, post means):",
      np.corrcoef(post_means, np.asarray(model.data).mean(0))[0, 1])
