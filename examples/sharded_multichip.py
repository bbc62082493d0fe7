"""Device-sharded sampling — no reference analogue (the reference's only
parallelism is one CPU thread per group); here particle groups shard over
a `chains` device mesh and XLA inserts the collectives for migration.

Run on a multi-chip host, or fake 8 devices on CPU:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/sharded_multichip.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

import demcmc_tpu as dm
from demcmc_tpu.models import gaussian
from demcmc_tpu.parallel import chain_mesh

n_dev = len(jax.devices())
print(f"{n_dev} devices: {jax.devices()}")

model, de = gaussian.make(key=0, n_obs=50, n_groups=n_dev, Np=512,
                          burnin=500)
mesh = chain_mesh(n_dev)
chains = dm.sample(model, de, 2000, key=0, mesh=mesh, progress=True)
print(chains)
print("mu:", chains.mean("mu"), "sigma:", chains.mean("sigma"),
      "(total chains:", de.n_chains, ")")
