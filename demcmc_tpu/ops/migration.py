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
    dt = theta.dtype

    # N ~ U{2..G} participating groups (reference select_groups,
    # src/migration.jl:31-35)
    n_active = draws.randint((), 2, n_groups + 1)

    # Random permutation WITHOUT a sort: rank each group by an iid
    # uniform (ties broken by index — a strict total order, so ranks are
    # always a permutation).  A TPU argsort lowers to a ~log²G-stage
    # bitonic network of micro-kernels; this [G, G] comparison + row-sum
    # is one fused elementwise+reduce.
    u = draws.uniform((G,))
    idx = jnp.arange(G)
    less = ((u[None, :] < u[:, None])
            | ((u[None, :] == u[:, None]) & (idx[None, :] < idx[:, None])))
    rank = jnp.sum(less.astype(jnp.int32), axis=1)       # [G] in 0..G-1

    # Per-group victim ∝ softmax(-weight) via Gumbel-max (reference
    # select_particle, src/migration.jl:64-70).  -inf weights become +inf
    # logits → such particles are picked first, matching the reference's
    # NaN fallback of "take the worst particle".
    gum = draws.gumbel((G, Np))
    pidx = jnp.argmax(-weight + gum, axis=1)             # [G]

    # Everything below is gather/scatter-free: group g (rank r) receives
    # the victim of the group ranked (r-1) mod n_active when both are
    # among the first n_active ranks, else its own (identity).
    active = (rank < n_active) & fire
    src_rank = jnp.where(active, (rank - 1) % n_active, rank)
    # route matrix R[g, h] = 1 iff rank[h] == src_rank[g]
    route = (rank[None, :] == src_rank[:, None]).astype(dt)   # [G, G]

    victim = jax.nn.one_hot(pidx, Np, dtype=dt)          # [G, Np]
    vmask = victim > 0.5
    sel_theta = jnp.einsum("gp,gpd->gd", victim, theta)  # [G, d]  (MXU)
    # weights can be -inf: matmul would produce 0·inf = NaN, so weight
    # routing uses where/max selects instead of dots.
    sel_w = jnp.sum(jnp.where(vmask, weight, 0.0), axis=1)       # [G]
    routed_theta = route @ sel_theta                     # [G, d]  (MXU)
    routed_w = jnp.max(jnp.where(route > 0.5, sel_w[None, :], -jnp.inf),
                       axis=1)                           # [G]

    new_theta = jnp.where(vmask[..., None],
                          routed_theta[:, None, :], theta)
    new_weight = jnp.where(vmask, routed_w[:, None], weight)
    return new_theta, new_weight


def _migrate_values(draws, theta, weight, n_groups: int):
    """The exchange reduced to its tiny outputs: ``(routed_theta [G, d],
    routed_w [G], vmask [G, Np])`` — application to the full population
    happens OUTSIDE the cond (see maybe_migrate)."""
    G, Np, d = theta.shape
    dt = theta.dtype
    n_active = draws.randint((), 2, n_groups + 1)
    u = draws.uniform((G,))
    idx = jnp.arange(G)
    less = ((u[None, :] < u[:, None])
            | ((u[None, :] == u[:, None]) & (idx[None, :] < idx[:, None])))
    rank = jnp.sum(less.astype(jnp.int32), axis=1)
    gum = draws.gumbel((G, Np))
    pidx = jnp.argmax(-weight + gum, axis=1)
    active = rank < n_active
    src_rank = jnp.where(active, (rank - 1) % n_active, rank)
    route = (rank[None, :] == src_rank[:, None]).astype(dt)
    victim = jax.nn.one_hot(pidx, Np, dtype=dt)
    vmask = victim > 0.5
    sel_theta = jnp.einsum("gp,gpd->gd", victim, theta)
    sel_w = jnp.sum(jnp.where(vmask, weight, 0.0), axis=1)
    routed_theta = route @ sel_theta
    routed_w = jnp.max(jnp.where(route > 0.5, sel_w[None, :], -jnp.inf),
                       axis=1)
    return routed_theta, routed_w, vmask


def maybe_migrate(draws, theta, weight, alpha: float, n_groups: int):
    """Gate migration on a single Bernoulli(α) draw per iteration
    (reference ``rand() <= de.α``, ``src/main.jl:85``).

    Uses ``lax.cond`` over the exchange's TINY outputs ([G, d] routed
    particles + [G, Np] victim mask) rather than the full population —
    cond branches must materialize their outputs, and carrying
    ``theta``/``weight`` through the cond cost a full-population copy
    every iteration.  The masked application outside the cond is two
    cheap fused selects; the skip branch's all-False mask makes it an
    identity.
    """
    if alpha <= 0.0 or n_groups < 2:
        return theta, weight
    if not hasattr(draws, "uniform"):
        draws = rng.KeyDraws(draws)
    G, Np, d = theta.shape
    gate = draws.uniform(())
    routed_t, routed_w, vmask = jax.lax.cond(
        gate <= alpha,
        lambda: _migrate_values(draws, theta, weight, n_groups),
        lambda: (jnp.zeros((G, d), theta.dtype),
                 jnp.zeros((G,), weight.dtype),
                 jnp.zeros((G, Np), bool)))
    theta = jnp.where(vmask[..., None], routed_t[:, None, :], theta)
    weight = jnp.where(vmask, routed_w[:, None], weight)
    return theta, weight
