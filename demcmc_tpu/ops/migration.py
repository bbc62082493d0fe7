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
fixed shapes throughout.  When the group axis is sharded over a device
mesh, the cross-group gather/scatter compiles to XLA collectives
(all-gather of one [d] particle per group — tiny payload over ICI).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import rng


def migrate(key, theta, weight, n_groups: int):
    """One migration exchange.  ``theta [G,Np,d]``, ``weight [G,Np]``.

    Returns the shifted (theta, weight).  The probability-α gate lives in
    the step function, not here.
    """
    G, Np, d = theta.shape
    k_size = jax.random.fold_in(key, rng.MIGRATE_SIZE)
    k_perm = jax.random.fold_in(key, rng.MIGRATE_PERM)
    k_pick = jax.random.fold_in(key, rng.MIGRATE_PICK)

    # N ~ U{2..G} participating groups (reference select_groups,
    # src/migration.jl:31-35)
    n_active = jax.random.randint(k_size, (), 2, n_groups + 1)
    perm = jax.random.permutation(k_perm, n_groups)

    # Per-group victim ∝ softmax(-weight) via Gumbel-max (reference
    # select_particle, src/migration.jl:64-70).  -inf weights become +inf
    # logits → such particles are picked first, matching the reference's
    # NaN fallback of "take the worst particle".
    gum = jax.random.gumbel(k_pick, (G, Np))
    pidx = jnp.argmax(-weight + gum, axis=1)             # [G]

    pos = jnp.arange(G)
    active = pos < n_active
    src_pos = jnp.where(active, (pos - 1) % n_active, pos)
    dst_group = perm[pos]
    src_group = perm[src_pos]

    sel_theta = theta[jnp.arange(G), pidx]               # [G, d]
    sel_w = weight[jnp.arange(G), pidx]                  # [G]

    new_theta = theta.at[dst_group, pidx[dst_group]].set(sel_theta[src_group])
    new_weight = weight.at[dst_group, pidx[dst_group]].set(sel_w[src_group])
    return new_theta, new_weight


def maybe_migrate(key, theta, weight, alpha: float, n_groups: int):
    """Gate migration on a single Bernoulli(α) draw per iteration
    (reference ``rand() <= de.α``, ``src/main.jl:85``)."""
    if alpha <= 0.0 or n_groups < 2:
        return theta, weight
    gate = jax.random.uniform(jax.random.fold_in(key, rng.MIGRATE_GATE), ())
    return jax.lax.cond(
        gate <= alpha,
        lambda t, w: migrate(key, t, w, n_groups),
        lambda t, w: (t, w),
        theta, weight)
