"""Mutation kernel: Gaussian jitter proposal.

Reference: ``/root/reference/src/mutation.jl:13-25`` — proposal = particle +
Normal(0, σ) per scalar.  Note the reference applies mutation to *all*
parameters even during block updates (``mutate_or_crossover!`` with a block
calls plain ``mutation!``, ``src/main.jl:199-207``); the step function
replicates that.
"""

from __future__ import annotations


from .. import rng


def mutate(draws, theta, sigma: float):
    """θ' = θ + N(0, σ) elementwise over the population ``[G, Np, d]``.

    ``draws`` is an ``rng.Pool``/``rng.KeyDraws`` source (or a PRNG key
    for backward compatibility)."""
    if not hasattr(draws, "normal"):
        draws = rng.KeyDraws(draws)
    return theta + sigma * draws.normal(theta.shape, theta.dtype)
