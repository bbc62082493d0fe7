"""Migration: inter-group particle exchange.

Reference: ``/root/reference/src/migration.jl:11-91``.  With probability α
per iteration, a random-size subset of N ~ U{2..G} groups is chosen; in each
chosen group one particle is selected with probability inversely
proportional to its weight (softmax(-w)); the selected particles are then
circularly shifted across the chosen groups (group i receives group i-1's
particle, group 0 receives group N-1's).

TPU-native shape: random-size subsets are data-dependent, so the kernel
draws a full random permutation of the G groups, activates the first N
positions, and routes with identity self-copies for inactive positions —
fixed shapes throughout, and the probability-α gate rides a ``lax.cond``
over the exchange's tiny outputs (see :func:`maybe_migrate`).  When the
group axis is sharded over a device mesh, the cross-group gather compiles
to XLA collectives (all-gather of one [d] particle per group — tiny
payload over ICI).

Two routing implementations, chosen by G at trace time:

* ``G <= _SMALL_G``: sort-free [G, G] rank matrix + one-hot matmul routing
  — at small G everything is kernel-count bound and the MXU matmul beats
  the scalar-core gather path.  Contractions run at ``Precision.HIGHEST``
  (the TPU default is bf16, which would replace migrated particles with
  bf16-rounded copies and break the weight == logpost(theta) invariant).
* ``G > _SMALL_G``: O(G log G) index routing — argsort-based permutation,
  scatter-built inverse, and plain row gathers.  The [G, G] matrices are
  O(G²) HBM traffic (67 MB at G=4096, 17 GB at G=65536) and are the scale
  cliff the payload (one particle per group, ``migration.jl:84-91``) never
  justifies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import rng

# Above this group count, [G, G] rank/route matrices cost more in HBM
# traffic than index gathers cost in scalar-core serialization.
_SMALL_G = 1024


def _rank_and_perm(draws, G: int):
    """A uniform random permutation of the G groups as ``(rank, perm)``
    with ``perm[rank[g]] == g`` (reference ``select_groups``,
    ``src/migration.jl:31-35`` draws the subset; here the full permutation
    is drawn and the first N ranks participate)."""
    u = draws.uniform((G,))
    idx = jnp.arange(G)
    if G <= _SMALL_G:
        # Sort-free: rank by pairwise comparison (ties broken by index — a
        # strict total order, so ranks are always a permutation).  A TPU
        # argsort lowers to a ~log²G-stage bitonic network of micro-kernels;
        # this [G, G] comparison + row-sum is one fused elementwise+reduce.
        less = ((u[None, :] < u[:, None])
                | ((u[None, :] == u[:, None]) & (idx[None, :] < idx[:, None])))
        rank = jnp.sum(less.astype(jnp.int32), axis=1)   # [G] in 0..G-1
        perm = jnp.zeros((G,), jnp.int32).at[rank].set(idx.astype(jnp.int32))
    else:
        perm = jnp.argsort(u).astype(jnp.int32)          # perm[r] = group
        rank = jnp.zeros((G,), jnp.int32).at[perm].set(idx.astype(jnp.int32))
    return rank, perm


def _select_victims(draws, theta, weight):
    """Per-group victim ∝ softmax(-weight) via Gumbel-max (reference
    ``select_particle``, ``src/migration.jl:64-70``).  -inf weights become
    +inf logits → such particles are picked first, matching the reference's
    NaN fallback of "take the worst particle".  Returns
    ``(sel_theta [G, d], sel_w [G], vmask [G, Np])``."""
    G, Np, d = theta.shape
    dt = theta.dtype
    gum = draws.gumbel((G, Np))
    pidx = jnp.argmax(-weight + gum, axis=1)             # [G]
    vmask = jax.nn.one_hot(pidx, Np, dtype=dt) > 0.5     # [G, Np]
    if G <= _SMALL_G:
        sel_theta = jax.lax.dot_general(
            vmask.astype(dt)[:, None, :], theta,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=dt,
            precision=jax.lax.Precision.HIGHEST)[:, 0, :]   # [G, d] (MXU)
    else:
        sel_theta = theta[jnp.arange(G), pidx]           # [G, d] row gather
    # weights can be -inf: a matmul would produce 0·inf = NaN, so weight
    # selection uses where/sum of finite-masked values.
    sel_w = jnp.sum(jnp.where(vmask, weight, 0.0), axis=1)      # [G]
    return sel_theta, sel_w, vmask


def _migrate_values(draws, theta, weight, n_groups: int):
    """The exchange reduced to its tiny outputs: ``(routed_theta [G, d],
    routed_w [G], vmask [G, Np])`` — application to the full population
    happens OUTSIDE the cond (see maybe_migrate)."""
    G, Np, d = theta.shape
    dt = theta.dtype
    n_active = draws.randint((), 2, n_groups + 1)        # N ~ U{2..G}
    rank, perm = _rank_and_perm(draws, G)
    sel_theta, sel_w, vmask = _select_victims(draws, theta, weight)

    # Group g (rank r) receives the victim of the group ranked
    # (r-1) mod n_active when both are among the first n_active ranks,
    # else its own (identity) — the reference's circshift
    # (src/migration.jl:84-91) over the participating subset.
    active = rank < n_active
    src_rank = jnp.where(active, (rank - 1) % n_active, rank)
    if G <= _SMALL_G:
        # route matrix R[g, h] = 1 iff rank[h] == src_rank[g]
        route = (rank[None, :] == src_rank[:, None])
        routed_theta = jax.lax.dot_general(
            route.astype(dt), sel_theta,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=dt,
            precision=jax.lax.Precision.HIGHEST)         # [G, d] (MXU)
        routed_w = jnp.max(jnp.where(route, sel_w[None, :], -jnp.inf),
                           axis=1)                       # [G]
    else:
        src_group = perm[src_rank]                       # [G] index gather
        routed_theta = sel_theta[src_group]              # [G, d] row gather
        routed_w = sel_w[src_group]
    return routed_theta, routed_w, vmask


def migrate(draws, theta, weight, n_groups: int, fire=True):
    """One migration exchange.  ``theta [G,Np,d]``, ``weight [G,Np]``.

    ``fire`` (bool scalar, may be traced) gates application: when False
    the update degenerates to self-copies.  ``draws`` is an
    ``rng.Pool``/``rng.KeyDraws`` source (or a PRNG key for backward
    compatibility).
    """
    if not hasattr(draws, "randint"):
        draws = rng.KeyDraws(draws)
    routed_t, routed_w, vmask = _migrate_values(draws, theta, weight,
                                                n_groups)
    if isinstance(draws, rng.KeyDraws):
        # pins the MIG_EVENT_NS aliasing argument (rng.py): coalesced
        # boundary replays fold event keys at MIG_EVENT_NS under the
        # SAME base key KeyDraws folds its draw indices — safe only
        # while an exchange's draw count stays far below it (advice r4)
        assert draws.i < rng.MIG_EVENT_NS // 8, (
            "migrate() draw count approaches MIG_EVENT_NS; event keys "
            "in mig_multi would alias draw keys")
    vmask = vmask & fire
    new_theta = jnp.where(vmask[..., None], routed_t[:, None, :], theta)
    new_weight = jnp.where(vmask, routed_w[:, None], weight)
    return new_theta, new_weight


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
