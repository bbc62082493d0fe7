"""Counter-based RNG helpers.

The reference (DifferentialEvolutionMCMC.jl) uses Julia's sequential global
RNG, re-seeded per thread-task (``src/main.jl:169-172,193-197``).  That model
does not survive vectorization or device sharding, so this framework uses
JAX's counter-based keys exclusively: every random draw inside the sampler
derives from ``fold_in(base_key, iter)`` folded again with a static purpose
tag.  Same key => bit-identical chains, independent of device count or
sharding layout (tested in tests/test_sharding.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Static purpose tags. One tag per distinct random decision inside a step so
# draws never alias between subsystems.
MIGRATE_GATE = 0
MIGRATE_SIZE = 1
MIGRATE_PERM = 2
MIGRATE_PICK = 3
MUTATE_GATE = 4
MUTATE_NOISE = 5
SNOOKER_GATE = 6
SNOOKER_PARTNERS = 7
SNOOKER_GAMMA = 8
SNOOKER_NOISE = 9
CROSS_BASE = 10
CROSS_PARTNERS = 11
CROSS_GAMMA1 = 12
CROSS_GAMMA2 = 13
CROSS_NOISE = 14
RECOMBINE = 15
ACCEPT = 16
INIT_THETA = 17
BLOCK = 18
CUSTOM = 19


def key_for(base_key: jax.Array, iteration, tag: int) -> jax.Array:
    """Key for one purpose at one iteration: fold_in(fold_in(base, iter), tag)."""
    return jax.random.fold_in(jax.random.fold_in(base_key, iteration), tag)


def ensure_key(key) -> jax.Array:
    """Accept an int seed or a PRNG key and return a PRNG key."""
    if isinstance(key, int):
        return jax.random.PRNGKey(key)
    if key is None:
        return jax.random.PRNGKey(0)
    return key


def uniform(key, shape=(), lo=0.0, hi=1.0, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype=dtype, minval=lo, maxval=hi)
