"""Migration: inter-group particle exchange.

Reference: ``/root/reference/src/migration.jl:11-91``.  With probability α
per iteration, a random-size subset of N ~ U{2..G} groups is chosen; in each
chosen group one particle is selected with probability inversely
proportional to its weight (softmax(-w)); the selected particles are then
circularly shifted across the chosen groups (group i receives group i-1's
particle, group 0 receives group N-1's).

TPU-native shape: random-size subsets are data-dependent, so the kernel
draws a full random permutation of the G groups, activates the first N
positions, and scatters with identity self-copies for inactive positions —
fixed shapes throughout, and the probability-α gate folds into the
participation mask (branchless: no ``lax.cond`` machinery in the scan
body).  When the group axis is sharded over a device mesh, the cross-group
gather/scatter compiles to XLA collectives (all-gather of one [d] particle
per group — tiny payload over ICI).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import rng


def migrate(draws, theta, weight, n_groups: int, fire=True):
    """One migration exchange.  ``theta [G,Np,d]``, ``weight [G,Np]``.

    ``fire`` (bool scalar, may be traced) folds the probability-α gate
    into the participation mask: when False the scatter degenerates to
    self-copies.  ``draws`` is an ``rng.Pool``/``rng.KeyDraws`` source (or
    a PRNG key for backward compatibility).
    """
    if not hasattr(draws, "randint"):
        draws = rng.KeyDraws(draws)
    G, Np, d = theta.shape

    # N ~ U{2..G} participating groups (reference select_groups,
    # src/migration.jl:31-35)
    n_active = draws.randint((), 2, n_groups + 1)
    # random permutation of groups via argsort of uniforms (one [G] sort)
    perm = jnp.argsort(draws.uniform((G,)))

    # Per-group victim ∝ softmax(-weight) via Gumbel-max (reference
    # select_particle, src/migration.jl:64-70).  -inf weights become +inf
    # logits → such particles are picked first, matching the reference's
    # NaN fallback of "take the worst particle".
    gum = draws.gumbel((G, Np))
    pidx = jnp.argmax(-weight + gum, axis=1)             # [G]

    pos = jnp.arange(G)
    active = (pos < n_active) & fire
    src_pos = jnp.where(active, (pos - 1) % n_active, pos)
    dst_group = perm[pos]
    src_group = perm[src_pos]

    sel_theta = theta[jnp.arange(G), pidx]               # [G, d]
    sel_w = weight[jnp.arange(G), pidx]                  # [G]

    new_theta = theta.at[dst_group, pidx[dst_group]].set(sel_theta[src_group])
    new_weight = weight.at[dst_group, pidx[dst_group]].set(sel_w[src_group])
    return new_theta, new_weight


def maybe_migrate(draws, theta, weight, alpha: float, n_groups: int):
    """Gate migration on a single Bernoulli(α) draw per iteration
    (reference ``rand() <= de.α``, ``src/main.jl:85``), branchless."""
    if alpha <= 0.0 or n_groups < 2:
        return theta, weight
    if not hasattr(draws, "uniform"):
        draws = rng.KeyDraws(draws)
    gate = draws.uniform(())
    return migrate(draws, theta, weight, n_groups, fire=gate <= alpha)
