"""Batched proposal kernels.

Reference: ``/root/reference/src/crossover.jl`` (DE + snooker proposals,
partner sampling, recombination).  The reference builds proposals one
particle at a time with Particle arithmetic; here every strategy is one
tensor expression over the full population ``[G, Np, d]`` so XLA fuses
proposal generation, noise, recombination and rounding into a single
kernel feeding the fitness evaluation.

Semantic deltas vs the reference (see SURVEY.md §3.5), both MCMC-valid:

* Synchronous within-group updates: every particle proposes from the
  iteration-start population (ter Braak 2006) instead of the reference's
  sequential in-place sweep (``src/crossover.jl:12-17``).
* ``resample`` partner draws are independent uniform (with-replacement)
  over (past-iteration, chain) pairs; the reference samples without
  replacement (``src/crossover.jl:113-124``) — collision probability is
  O(n²/(iter·C)) and vanishes after a handful of iterations.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .. import rng


@dataclass
class ProposalContext:
    """Everything a proposal strategy may read (the batched analogue of the
    reference's ``(de, Pt, group)`` arguments)."""

    de: Any                      # DE config (static)
    spec: Any                    # ParamSpec (static)
    theta: jnp.ndarray           # [G, Np, d] current population
    weight: jnp.ndarray          # [G, Np] current log posterior / objective
    iteration: jnp.ndarray       # scalar int32, 1-based, includes n_initial
    history: Optional[jnp.ndarray]  # [H, C, d] past states ('resample' mode)

    @property
    def dim(self) -> int:
        return self.theta.shape[-1]

    def partners(self, key, n: int, exclude_self: bool):
        """Draw ``n`` partner populations ``[n, G, Np, d]`` via the ``sample``
        strategy slot (``sample_current`` or ``resample``)."""
        return self.de.sample(self, key, n, exclude_self)


# ---------------------------------------------------------------------------
# Partner-sampling strategies (the reference's `sample` slot,
# src/crossover.jl:103-140)
# ---------------------------------------------------------------------------

def _distinct_indices(key, G: int, Np: int, n: int, exclude_self: bool):
    """Uniform without-replacement index draws, O(1) per draw.

    Returns ``[n, G, Np]`` int32 indices into the particle axis: for each
    (group, target-particle) cell, ``n`` distinct uniform indices from the
    group, excluding the target itself when ``exclude_self``.

    Uses the classic shift trick instead of argsort-of-uniforms (which
    costs an O(Np log Np) sort per particle): draw the k-th index from a
    range shrunk by k, then bump it past each earlier pick — exactly
    uniform over ordered without-replacement tuples.  Supports n <= 3
    (all the sampler ever needs: 2 DE partners, 3 snooker particles).
    """
    m = Np - 1 if exclude_self else Np      # candidate pool size
    if n > 3:
        raise NotImplementedError("n > 3 partner draws")
    if m < n:
        raise ValueError(f"need {n} distinct partners from {m} candidates "
                         f"(Np={Np}, exclude_self={exclude_self})")
    shape = (G, Np)
    ks = jax.random.split(key, n)
    picks = []
    a = jax.random.randint(ks[0], shape, 0, m)
    picks.append(a)
    if n >= 2:
        b = jax.random.randint(ks[1], shape, 0, m - 1)
        b = b + (b >= a)
        picks.append(b)
    if n >= 3:
        c = jax.random.randint(ks[2], shape, 0, m - 2)
        lo = jnp.minimum(a, b)
        hi = jnp.maximum(a, b)
        c = c + (c >= lo)
        c = c + (c >= hi)
        picks.append(c)
    idx = jnp.stack(picks)                   # [n, G, Np] in 0..m-1
    if exclude_self:
        self_idx = jnp.arange(Np, dtype=idx.dtype)[None, None, :]
        idx = idx + (idx >= self_idx)        # skip the target's own slot
    return idx


def sample_current(ctx: ProposalContext, key, n: int, exclude_self: bool):
    """Distinct partners from the *current* group, optionally excluding the
    target particle (reference ``sample``, ``src/crossover.jl:138-140``) —
    a fixed-shape replacement for ``setdiff`` +
    ``StatsBase.sample(...; replace=false)``.  Returns ``[n, G, Np, d]``.
    """
    theta = ctx.theta
    G, Np, d = theta.shape
    idx = _distinct_indices(key, G, Np, n, exclude_self)   # [n, G, Np]
    return _gather_partners(theta, idx)


def _gather_partners(theta, idx):
    """theta [G, Np, d], idx [n, G, Np] -> [n, G, Np, d]."""
    G = theta.shape[0]
    g = jnp.arange(G)[None, :, None]
    return theta[g, idx]


def resample(ctx: ProposalContext, key, n: int, exclude_self: bool):
    """DE-MCz partners: uniform draws from the history of past states of
    *all* chains (ter Braak & Vrugt 2008; reference ``resample``,
    ``src/crossover.jl:113-124``).  Row range is the ``iter-1`` stored rows
    (prior-seeded ``n_initial`` rows included).  Returns ``[n, G, Np, d]``.
    """
    if ctx.history is None:
        raise ValueError("sample=resample requires a history buffer; "
                         "set n_initial > 0 (typically 10x the parameter "
                         "count) on the DE config")
    H, C, d = ctx.history.shape
    G, Np = ctx.theta.shape[:2]
    count = jnp.maximum(ctx.iteration - 1, 1)          # rows available
    r = jax.random.randint(key, (n, G, Np), 0, count * C)
    row, chain = r // C, r % C
    return ctx.history[row, chain]                     # [n, G, Np, d]


# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------

def select_base(key, theta, weight):
    """Per-particle base vector θb drawn ∝ softmax(weight) over the group
    (reference ``select_base``, ``src/crossover.jl:282-289``), via
    Gumbel-max so ``-inf`` weights get probability zero without NaNs.
    Returns ``[G, Np, d]``.
    """
    G, Np, d = theta.shape
    gum = jax.random.gumbel(key, (G, Np, Np))
    scores = weight[:, None, :] + gum                  # [G, Np(target), Np]
    idx = jnp.argmax(scores, axis=-1)                  # [G, Np]
    return jax.vmap(lambda t, i: t[i])(theta, idx)


def recombination(key, theta, prop, kappa: float):
    """With probability (1-κ) per scalar, reset the proposal component to the
    current value (reference ``recombination!``, ``src/crossover.jl:301-321``).
    No-op at the default κ=1."""
    if kappa >= 1.0:
        return prop
    keep = jax.random.uniform(key, prop.shape) > (1.0 - kappa)
    return jnp.where(keep, prop, theta)


def _noise(key, shape, eps: float, dtype):
    return jax.random.uniform(key, shape, dtype=dtype,
                              minval=-eps, maxval=eps)


def _round_ints(spec, x):
    """Final round-and-snap for integer parameters (reference rounds inside
    each ``*′``/``+′`` op, ``src/utilities.jl:360-369``; rounding once at the
    end has the same support — documented delta)."""
    if not spec.has_int:
        return x
    return jnp.where(jnp.asarray(spec.int_mask), jnp.round(x), x)


# ---------------------------------------------------------------------------
# DE proposal strategies (the `generate_proposal` slot)
# ---------------------------------------------------------------------------

def random_gamma(ctx: ProposalContext, key):
    """Default two-mode DE proposal (Turner et al. 2012; reference
    ``random_gamma``, ``src/crossover.jl:154-172``)::

        θ' = θt + γ₁(θm − θn) + γ₂(θb − θt) + b,
        γ₁, γ₂ ~ U(0.5, 1),  γ₂ = 0 after burnin,  b ~ U(-ϵ, ϵ) per scalar,

    with θb drawn ∝ softmax(weights) and m, n distinct non-self partners.
    """
    de, theta = ctx.de, ctx.theta
    G, Np, d = theta.shape
    kb = jax.random.fold_in(key, rng.CROSS_BASE)
    kp = jax.random.fold_in(key, rng.CROSS_PARTNERS)
    k1 = jax.random.fold_in(key, rng.CROSS_GAMMA1)
    k2 = jax.random.fold_in(key, rng.CROSS_GAMMA2)
    kn = jax.random.fold_in(key, rng.CROSS_NOISE)
    kr = jax.random.fold_in(key, rng.RECOMBINE)

    base = select_base(kb, theta, ctx.weight)
    pm, pn = ctx.partners(kp, 2, exclude_self=True)
    g1 = jax.random.uniform(k1, (G, Np, 1), theta.dtype, 0.5, 1.0)
    g2 = jax.random.uniform(k2, (G, Np, 1), theta.dtype, 0.5, 1.0)
    # γ₂ = 0 after burnin; `iteration` includes the n_initial offset exactly
    # like the reference (`de.iter > de.burnin`, src/crossover.jl:164 with
    # src/main.jl:34).
    g2 = jnp.where(ctx.iteration > de.burnin, 0.0, g2)
    prop = (theta + g1 * (pm - pn) + g2 * (base - theta)
            + _noise(kn, theta.shape, de.epsilon, theta.dtype))
    return recombination(kr, theta, prop, de.kappa)


def fixed_gamma(ctx: ProposalContext, key):
    """θ' = θt + 2.38(θm − θn) + b (reference ``fixed_gamma``,
    ``src/crossover.jl:186-199``)."""
    return _plain_de(ctx, key, 2.38)


def variable_gamma(ctx: ProposalContext, key):
    """θ' = θt + 2.38/√(2d)·(θm − θn) + b with d the total scalar parameter
    count (reference ``variable_gamma``, ``src/crossover.jl:213-226``)."""
    return _plain_de(ctx, key, 2.38 / jnp.sqrt(2.0 * ctx.dim))


def _plain_de(ctx, key, gamma):
    de, theta = ctx.de, ctx.theta
    kp = jax.random.fold_in(key, rng.CROSS_PARTNERS)
    kn = jax.random.fold_in(key, rng.CROSS_NOISE)
    kr = jax.random.fold_in(key, rng.RECOMBINE)
    pm, pn = ctx.partners(kp, 2, exclude_self=True)
    prop = theta + gamma * (pm - pn) + _noise(kn, theta.shape, de.epsilon,
                                              theta.dtype)
    return recombination(kr, theta, prop, de.kappa)


# ---------------------------------------------------------------------------
# Snooker update
# ---------------------------------------------------------------------------

def project(p1, p2, axis=-1, eps=0.0):
    """Projection of p1 onto p2 along the parameter axis (reference
    ``project``, ``src/utilities.jl:239-246``): ((p1·p2)/(p2·p2))·p2."""
    num = jnp.sum(p1 * p2, axis=axis, keepdims=True)
    den = jnp.sum(p2 * p2, axis=axis, keepdims=True)
    return num / (den + eps) * p2


def snooker(ctx: ProposalContext, key):
    """Snooker proposal along the line θt − z (ter Braak & Vrugt 2008;
    reference ``snooker_update!``, ``src/crossover.jl:239-257``).

    Draws (Pz, Pm, Pn) without replacement from the full group *including*
    the target (or from history under ``resample``), projects Pm and Pn onto
    Pd = θt − z, and proposes θ' = θt + γ(Pr1 − Pr2) + b with γ ~ U(1.2, 2.2).

    Returns ``(proposal [G,Np,d], z [G,Np,d], degenerate [G,Np])`` where
    ``degenerate`` marks Pz == θt draws (zero difference vector).  The
    reference lets those produce NaN weights that happen to be rejected
    (SURVEY.md §3.5.2); here the proposal is masked to θt and the caller
    forces the MH adjustment to -inf — an explicit, NaN-free reject.
    """
    de, theta = ctx.de, ctx.theta
    G, Np, d = theta.shape
    kp = jax.random.fold_in(key, rng.SNOOKER_PARTNERS)
    kg = jax.random.fold_in(key, rng.SNOOKER_GAMMA)
    kn = jax.random.fold_in(key, rng.SNOOKER_NOISE)
    kr = jax.random.fold_in(key, rng.RECOMBINE + 100)

    pz, pm, pn = ctx.partners(kp, 3, exclude_self=False)
    pd = theta - pz
    den = jnp.sum(pd * pd, axis=-1)                      # [G, Np]
    degenerate = den <= jnp.finfo(theta.dtype).tiny
    safe_pd = jnp.where(degenerate[..., None], 1.0, pd)
    r1 = project(pm, safe_pd)
    r2 = project(pn, safe_pd)
    gamma = jax.random.uniform(kg, (G, Np, 1), theta.dtype, 1.2, 2.2)
    prop = (theta + gamma * (r1 - r2)
            + _noise(kn, theta.shape, de.epsilon, theta.dtype))
    prop = recombination(kr, theta, prop, de.kappa)
    prop = jnp.where(degenerate[..., None], theta, prop)
    return prop, pz, degenerate


def snooker_log_adj(theta, prop, z, dim: int, degenerate):
    """Snooker MH correction (reference ``adjust_loglike``,
    ``src/crossover.jl:268-273``): (d−1)·(log‖θ'−z‖ − log‖θt−z‖),
    computed on the post-block-reset proposal like the reference
    (``src/crossover.jl:84-87``).  Degenerate draws get -inf (hard reject).
    """
    a1 = jnp.sqrt(jnp.sum((prop - z) ** 2, axis=-1))
    a2 = jnp.sqrt(jnp.sum((theta - z) ** 2, axis=-1))
    log_adj = (dim - 1) * (jnp.log(a1) - jnp.log(a2))
    return jnp.where(degenerate, -jnp.inf, log_adj)
