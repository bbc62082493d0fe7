"""Minimal TPU liveness probe: init backend, run one tiny op, exit."""
import time

import jax
import jax.numpy as jnp

t0 = time.time()
x = jnp.ones((8, 128)) + 1.0
jax.block_until_ready(x)
print(f"TPU alive: {jax.default_backend()} in {time.time() - t0:.1f}s",
      flush=True)
