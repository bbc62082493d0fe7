"""Mutation kernel: Gaussian jitter proposal.

Reference: ``/root/reference/src/mutation.jl:13-25`` — proposal = particle +
Normal(0, σ) per scalar.  Note the reference applies mutation to *all*
parameters even during block updates (``mutate_or_crossover!`` with a block
calls plain ``mutation!``, ``src/main.jl:199-207``); the step function
replicates that.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import rng


def mutate(key, theta, sigma: float):
    """θ' = θ + N(0, σ) elementwise over the population ``[G, Np, d]``."""
    noise = jax.random.normal(jax.random.fold_in(key, rng.MUTATE_NOISE),
                              theta.shape, theta.dtype)
    return theta + sigma * noise
