"""Batched proposal kernels.

Reference: ``/root/reference/src/crossover.jl`` (DE + snooker proposals,
partner sampling, recombination).  The reference builds proposals one
particle at a time with Particle arithmetic; here every strategy is one
tensor expression over the full population ``[G, Np, d]`` so XLA fuses
proposal generation, noise, recombination and rounding into a single
kernel feeding the fitness evaluation.

All randomness is pulled from a ``draws`` source (:class:`demcmc_tpu.rng.Pool`
in the fused step: ONE threefry invocation per iteration, sliced by static
offsets — per-call ``jax.random`` kernels were the dominant per-step cost
at small populations).  Custom strategy callables still receive a PRNG key
and may use ``jax.random`` directly.

Semantic delta vs the reference (see SURVEY.md §3.5), MCMC-valid:

* Synchronous within-group updates: every particle proposes from the
  iteration-start population (ter Braak 2006) instead of the reference's
  sequential in-place sweep (``src/crossover.jl:12-17``).

(``resample`` partner draws match the reference exactly since round 4:
without replacement over the flat (past-iteration, chain) space,
``src/crossover.jl:113-124`` — see :func:`resample_flat_indices`.)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

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
    draws: Any = None            # rng.Pool / rng.KeyDraws random source
    key: Any = None              # PRNG key for CUSTOM strategy callables
    # next_key() counter in a shared one-element list: dataclasses.replace
    # copies the REFERENCE, so counts survive context copies (_with_draws)
    # and increments write back to every copy.
    _key_count: list = field(default_factory=lambda: [0])

    @property
    def dim(self) -> int:
        return self.theta.shape[-1]

    def next_key(self):
        """A fresh PRNG key for custom strategy code — distinct per call
        within the step (derived by a trace-time counter from ``key``),
        on a tagged subkey stream so it never aliases ``KeyDraws(key)``'s
        ``fold_in(key, i)`` draws."""
        if self.key is None:
            raise ValueError(
                "ProposalContext.key is not set — custom strategy slots "
                "need a PRNG key; construct the context with key=...")
        self._key_count[0] += 1
        return jax.random.fold_in(
            jax.random.fold_in(self.key, rng.NEXT_KEY), self._key_count[0])

    def partner_indices_or_values(self, n: int, exclude_self: bool,
                                  replace: bool = False):
        """Either ``('idx', [n, G, Np] indices)`` into the current
        population (sample_current — lets the caller fuse gathers) or
        ``('val', [n, G, Np, d] vectors)`` (resample / custom slots)."""
        slot = self.de.sample
        if slot is sample_current:
            G, Np = self.theta.shape[:2]
            return "idx", _distinct_indices(self.draws, G, Np, n,
                                            exclude_self, replace)
        if slot is resample:
            return "val", resample(self, None, n, exclude_self, replace)
        # custom slot: forward `replace` when the slot's signature takes a
        # fifth positional (the reference slot signature carries it,
        # src/crossover.jl:138-140); older 4-arg slots keep working
        if _slot_takes_replace(slot):
            return "val", slot(self, self.next_key(), n, exclude_self,
                               replace)
        return "val", slot(self, self.next_key(), n, exclude_self)

    def partners(self, n: int, exclude_self: bool, replace: bool = False):
        """``n`` partner populations ``[n, G, Np, d]`` via the ``sample``
        strategy slot (``sample_current`` or ``resample``)."""
        kind, v = self.partner_indices_or_values(n, exclude_self, replace)
        if kind == "idx":
            return _gather_partners(self.theta, v)
        return v


# ---------------------------------------------------------------------------
# Partner-sampling strategies (the reference's `sample` slot,
# src/crossover.jl:103-140)
# ---------------------------------------------------------------------------

def _slot_takes_replace(slot) -> bool:
    """True when a custom ``sample`` slot accepts a fifth positional
    (``replace``) — checked host-side once per trace."""
    import inspect
    try:
        params = inspect.signature(slot).parameters.values()
    except (TypeError, ValueError):
        return False
    n_pos = sum(p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
                for p in params)
    has_var = any(p.kind == p.VAR_POSITIONAL for p in params)
    return has_var or n_pos >= 5


def _distinct_indices(draws, G: int, Np: int, n: int, exclude_self: bool,
                      replace: bool = False):
    """Uniform index draws, O(1) per draw, without replacement by default.

    Returns ``[n, G, Np]`` int32 indices into the particle axis: for each
    (group, target-particle) cell, ``n`` uniform indices from the group,
    excluding the target itself when ``exclude_self``.  ``replace=True``
    gives independent draws (the reference ``sample`` slot's ``replace``
    argument, ``src/crossover.jl:138-140``).

    Without replacement uses the classic shift trick instead of
    argsort-of-uniforms (which costs an O(Np log Np) sort per particle):
    draw the k-th index from a range shrunk by k, then bump it past each
    earlier pick in ascending order — exactly uniform over ordered
    without-replacement tuples, for arbitrary n.
    """
    m = Np - 1 if exclude_self else Np      # candidate pool size
    shape = (G, Np)
    if replace:
        idx = jnp.stack([draws.randint(shape, 0, m) for _ in range(n)])
    else:
        if m < n:
            raise ValueError(
                f"need {n} distinct partners from {m} candidates "
                f"(Np={Np}, exclude_self={exclude_self})")
        picks = []
        sorted_picks = None                  # [k, G, Np], ascending per cell
        for k in range(n):
            a = draws.randint(shape, 0, m - k)
            if k:
                # bump past earlier picks smallest-first: each pass maps the
                # draw into the gap structure left by the previous picks
                for j in range(k):
                    a = a + (a >= sorted_picks[j])
            picks.append(a)
            if k + 1 < n:                    # keep the sorted set current
                if sorted_picks is None:
                    sorted_picks = a[None]
                else:
                    # elementwise insertion (min/max bubble) — stays on the
                    # VPU and fuses, unlike a lane-axis jnp.sort
                    out, cur = [], a
                    for j in range(k):
                        s = sorted_picks[j]
                        out.append(jnp.minimum(cur, s))
                        cur = jnp.maximum(cur, s)
                    out.append(cur)
                    sorted_picks = jnp.stack(out)
        idx = jnp.stack(picks)               # [n, G, Np] in 0..m-1
    if exclude_self:
        self_idx = jnp.arange(Np, dtype=idx.dtype)[None, None, :]
        idx = idx + (idx >= self_idx)        # skip the target's own slot
    return idx


def _gather_partners(theta, idx):
    """theta [G, Np, d], idx [n, G, Np] -> [n, G, Np, d].

    For small groups the gather is done as a one-hot batched matmul —
    TPU gathers serialize on the scalar core while a [G, n·Np, Np] ×
    [G, Np, d] contraction rides the MXU in one kernel.
    """
    n, G, Np = idx.shape
    d = theta.shape[-1]
    if Np <= 128:
        onehot = jax.nn.one_hot(idx, Np, dtype=theta.dtype)  # [n, G, Np, Np]
        lhs = jnp.moveaxis(onehot, 0, 1).reshape(G, n * Np, Np)
        # HIGHEST precision: the default TPU matmul precision is bf16,
        # which would replace gathered partners with bf16-rounded copies
        # (exact gather semantics require full-precision one-hot dots).
        out = jax.lax.dot_general(
            lhs, theta, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=theta.dtype,
            precision=jax.lax.Precision.HIGHEST)             # [G, n·Np, d]
        return jnp.moveaxis(out.reshape(G, n, Np, d), 1, 0)
    g = jnp.arange(G)[None, :, None]
    return theta[g, idx]


def sample_current(ctx: ProposalContext, key, n: int, exclude_self: bool,
                   replace: bool = False):
    """Partners from the *current* group, optionally excluding the target
    particle (reference ``sample``, ``src/crossover.jl:138-140``) — a
    fixed-shape replacement for ``setdiff`` + ``StatsBase.sample``.
    ``replace`` mirrors the reference slot argument (the built-in proposals
    always pass False).  Returns ``[n, G, Np, d]``.

    ``key`` is accepted for strategy-slot signature compatibility; draws
    come from ``ctx.draws`` (or from the key if no draw source is set).
    """
    theta = ctx.theta
    G, Np, d = theta.shape
    draws = ctx.draws if ctx.draws is not None else rng.KeyDraws(key)
    idx = _distinct_indices(draws, G, Np, n, exclude_self, replace)
    return _gather_partners(theta, idx)


def distinct_flat_draws(draw_fn, n: int):
    """``n`` DISTINCT uniform draws over a flat index space via the O(1)
    shift trick (shared with :func:`_distinct_indices`'s in-group form):
    ``draw_fn(k)`` must return a uniform draw over ``span - k`` (any
    integer dtype supporting ``>=``/min/max — uint32 for resample's flat
    (rows·chains) space).  Draw k bumps past each earlier pick in
    ascending order, giving exactly uniform ordered without-replacement
    tuples.  Returns a list of ``n`` arrays."""
    picks = []
    sorted_picks = None
    for k in range(n):
        a = draw_fn(k)
        if k:
            for j in range(k):
                a = a + (a >= sorted_picks[j]).astype(a.dtype)
        picks.append(a)
        if k + 1 < n:
            if sorted_picks is None:
                sorted_picks = [a]
            else:
                out, cur = [], a
                for j in range(k):
                    s = sorted_picks[j]
                    out.append(jnp.minimum(cur, s))
                    cur = jnp.maximum(cur, s)
                out.append(cur)
                sorted_picks = out
    return picks


def resample_flat_indices(draws, n: int, count, C: int, shape,
                          replace: bool = False):
    """The resample strategy's (row, chain) index draws: uniform over the
    flat ``count·C`` space of (past-iteration, chain) pairs, WITHOUT
    replacement by default — matching the reference's
    ``sample(CartesianIndices(...), n; replace)``
    (``src/crossover.jl:113-124``).  The flat space is addressed in
    uint32 (a history buffer with ≥ 2³² entries cannot exist — it would
    not fit in HBM), so no int32 overflow at 65k chains × 32k rows.
    Returns ``(row [n,*shape] int32, chain [n,*shape] int32)``.  Shared
    by the XLA path and the fused kernel's index precomputation."""
    span = count.astype(jnp.uint32) * jnp.uint32(C)
    if replace:
        flats = [draws.randuint(shape, span) for _ in range(n)]
    else:
        flats = distinct_flat_draws(
            lambda k: draws.randuint(shape, span - jnp.uint32(k)), n)
    flat = jnp.stack(flats)                            # [n, *shape] uint32
    row = (flat // jnp.uint32(C)).astype(jnp.int32)
    chain = (flat % jnp.uint32(C)).astype(jnp.int32)
    return row, chain


def resample(ctx: ProposalContext, key, n: int, exclude_self: bool,
             replace: bool = False):
    """DE-MCz partners: uniform draws from the history of past states of
    *all* chains (ter Braak & Vrugt 2008; reference ``resample``,
    ``src/crossover.jl:113-124``).  Row range is the ``iter-1`` stored rows
    (prior-seeded ``n_initial`` rows included).  Returns ``[n, G, Np, d]``.

    Like the reference's ``StatsBase.sample(...; replace)`` over the flat
    (past-iteration, chain) index space, the n draws are WITHOUT
    replacement unless ``replace=True`` (the built-in proposals always
    pass False) — see :func:`resample_flat_indices`.
    """
    if ctx.history is None:
        raise ValueError("sample=resample requires a history buffer; "
                         "set n_initial > 0 (typically 10x the parameter "
                         "count) on the DE config")
    H, C, d = ctx.history.shape
    G, Np = ctx.theta.shape[:2]
    draws = ctx.draws if ctx.draws is not None else rng.KeyDraws(key)
    count = jnp.maximum(ctx.iteration - 1, 1)          # rows available
    row, chain = resample_flat_indices(draws, n, count, C, (G, Np),
                                       replace)
    return ctx.history[row, chain]                     # [n, G, Np, d]


# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------

def select_base_idx(draws, weight, Np: int):
    """Per-particle base index drawn ∝ softmax(weight) over the group
    (reference ``select_base``, ``src/crossover.jl:282-289``), by
    inverse-CDF over the group's softmax: one uniform per target instead
    of Gumbel-max's Np gumbels per target (which cost 2·G·Np² log evals
    per iteration — measured ~15% of the whole Gaussian step).

    ``-inf`` weights get exactly zero mass.  Degenerate all ``-inf``
    groups resolve to index 0 (the reference falls back to raw weights
    there, ``src/crossover.jl:286`` — an arbitrary choice either way).
    Returns ``[G, Np]`` indices.
    """
    G = weight.shape[0]
    m = jnp.max(weight, axis=1, keepdims=True)
    e = jnp.exp(weight - jnp.where(jnp.isfinite(m), m, 0.0))  # -inf -> 0
    q = jnp.cumsum(e, axis=1)                          # [G, Np] CDF
    # clamp u away from exactly 0: u=0 (prob 2^-24/draw from the pool)
    # would select index 0 even when its softmax mass is exactly zero
    # (a -inf-weight particle), contradicting the zero-mass guarantee.
    u = jnp.maximum(draws.uniform((G, Np), dtype=e.dtype),
                    jnp.finfo(weight.dtype).tiny) * q[:, -1:]
    idx = jnp.sum(q[:, None, :] < u[:, :, None], axis=-1)
    return jnp.minimum(idx, Np - 1)


def select_base(key, theta, weight):
    """Materialized ``select_base_idx`` from a PRNG key: ``[G, Np, d]``."""
    idx = select_base_idx(rng.KeyDraws(key), weight, theta.shape[1])
    return _gather_partners(theta, idx[None])[0]


def recombination(draws, theta, prop, kappa: float):
    """With probability (1-κ) per scalar, reset the proposal component to the
    current value (reference ``recombination!``, ``src/crossover.jl:301-321``).
    No-op at the default κ=1.  ``draws`` may also be a PRNG key."""
    if kappa >= 1.0:
        return prop
    if not hasattr(draws, "uniform"):
        draws = rng.KeyDraws(draws)
    keep = draws.uniform(prop.shape) > (1.0 - kappa)
    return jnp.where(keep, prop, theta)


def _noise(draws, shape, eps: float, dtype):
    if eps == 0.0:
        return 0.0
    return draws.uniform(shape, -eps, eps, dtype)


# ---------------------------------------------------------------------------
# DE proposal strategies (the `generate_proposal` slot)
# ---------------------------------------------------------------------------

def random_gamma(ctx: ProposalContext, key=None):
    """Default two-mode DE proposal (Turner et al. 2012; reference
    ``random_gamma``, ``src/crossover.jl:154-172``)::

        θ' = θt + γ₁(θm − θn) + γ₂(θb − θt) + b,
        γ₁, γ₂ ~ U(0.5, 1),  γ₂ = 0 after burnin,  b ~ U(-ϵ, ϵ) per scalar,

    with θb drawn ∝ softmax(weights) and m, n distinct non-self partners.
    The base vector and both partners are materialized by ONE fused
    one-hot matmul when partners come from the current population.
    """
    de, theta = ctx.de, ctx.theta
    G, Np, d = theta.shape
    draws = ctx.draws if ctx.draws is not None else rng.KeyDraws(key)
    ctx = _with_draws(ctx, draws)

    bidx = select_base_idx(draws, ctx.weight, Np)
    kind, pv = ctx.partner_indices_or_values(2, exclude_self=True)
    if kind == "idx":
        idx = jnp.concatenate([bidx[None], pv])            # [3, G, Np]
        base, pm, pn = _gather_partners(theta, idx)
    else:
        base = _gather_partners(theta, bidx[None])[0]
        pm, pn = pv
    g1 = draws.uniform((G, Np, 1), 0.5, 1.0, theta.dtype)
    g2 = draws.uniform((G, Np, 1), 0.5, 1.0, theta.dtype)
    # γ₂ = 0 after burnin; `iteration` includes the n_initial offset exactly
    # like the reference (`de.iter > de.burnin`, src/crossover.jl:164 with
    # src/main.jl:34).
    g2 = jnp.where(ctx.iteration > de.burnin, 0.0, g2)
    prop = (theta + g1 * (pm - pn) + g2 * (base - theta)
            + _noise(draws, theta.shape, de.epsilon, theta.dtype))
    return recombination(draws, theta, prop, de.kappa)


def fixed_gamma(ctx: ProposalContext, key=None):
    """θ' = θt + 2.38(θm − θn) + b (reference ``fixed_gamma``,
    ``src/crossover.jl:186-199``)."""
    return _plain_de(ctx, key, 2.38)


def variable_gamma(ctx: ProposalContext, key=None):
    """θ' = θt + 2.38/√(2d)·(θm − θn) + b with d the total scalar parameter
    count (reference ``variable_gamma``, ``src/crossover.jl:213-226``)."""
    return _plain_de(ctx, key, 2.38 / jnp.sqrt(2.0 * ctx.dim))


def _with_draws(ctx, draws):
    if ctx.draws is draws:
        return ctx
    from dataclasses import replace
    return replace(ctx, draws=draws)


def _plain_de(ctx, key, gamma):
    de, theta = ctx.de, ctx.theta
    draws = ctx.draws if ctx.draws is not None else rng.KeyDraws(key)
    ctx = _with_draws(ctx, draws)
    pm, pn = ctx.partners(2, exclude_self=True)
    prop = theta + gamma * (pm - pn) + _noise(draws, theta.shape,
                                              de.epsilon, theta.dtype)
    return recombination(draws, theta, prop, de.kappa)


# ---------------------------------------------------------------------------
# Snooker update
# ---------------------------------------------------------------------------

def project(p1, p2, axis=-1, eps=0.0):
    """Projection of p1 onto p2 along the parameter axis (reference
    ``project``, ``src/utilities.jl:239-246``): ((p1·p2)/(p2·p2))·p2."""
    num = jnp.sum(p1 * p2, axis=axis, keepdims=True)
    den = jnp.sum(p2 * p2, axis=axis, keepdims=True)
    return num / (den + eps) * p2


def snooker(ctx: ProposalContext, key=None):
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
    draws = ctx.draws if ctx.draws is not None else rng.KeyDraws(key)
    ctx = _with_draws(ctx, draws)

    pz, pm, pn = ctx.partners(3, exclude_self=False)
    pd = theta - pz
    den = jnp.sum(pd * pd, axis=-1)                      # [G, Np]
    degenerate = den <= jnp.finfo(theta.dtype).tiny
    safe_pd = jnp.where(degenerate[..., None], 1.0, pd)
    r1 = project(pm, safe_pd)
    r2 = project(pn, safe_pd)
    gamma = draws.uniform((G, Np, 1), 1.2, 2.2, theta.dtype)
    prop = (theta + gamma * (r1 - r2)
            + _noise(draws, theta.shape, de.epsilon, theta.dtype))
    prop = recombination(draws, theta, prop, de.kappa)
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
