"""Fitness evaluation and acceptance rules.

Reference: ``/root/reference/src/utilities.jl:44-120,190-226``.  Both are
batched masked updates here — no per-particle control flow, so the whole
accept step fuses with the proposal kernel under XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Fitness (the `evaluate_fitness` slot)
# ---------------------------------------------------------------------------

def in_bounds(spec, x):
    """All scalars inside their (lo, hi) bounds (reference ``in_bounds``,
    ``src/utilities.jl:70-78``).  ``x`` is flat ``[..., d]``."""
    lo = jnp.asarray(spec.lo, dtype=x.dtype)
    hi = jnp.asarray(spec.hi, dtype=x.dtype)
    return jnp.all((x >= lo) & (x <= hi), axis=-1)


def compute_posterior(model, spec, de, x):
    """Posterior log density of one flat parameter vector; ``-inf`` when out
    of bounds or non-finite (reference ``compute_posterior!``,
    ``src/utilities.jl:92-99``).  The reference skips the user functions for
    out-of-bounds proposals; under jit both branches evaluate, so any NaNs
    the user code produces out of bounds are masked away here.
    """
    lp = model.log_prior_flat(spec, x) + model.log_like_flat(spec, x)
    ok = in_bounds(spec, x) & ~jnp.isnan(lp)
    return jnp.where(ok, lp, -jnp.inf)


def evaluate_fun(model, spec, de, x):
    """Objective-only fitness for optimization (reference ``evaluate_fun!``,
    ``src/utilities.jl:113-120``): out-of-bounds (or NaN) scores -inf when
    maximizing, +inf when minimizing."""
    val = model.log_like_flat(spec, x)
    bad = jnp.inf if de.is_minimize else -jnp.inf
    ok = in_bounds(spec, x) & ~jnp.isnan(val)
    return jnp.where(ok, val, bad)


def make_fitness(model, spec, de):
    """Batched fitness: ``[G, Np, d] -> [G, Np]`` via double vmap."""
    slot = de.evaluate_fitness
    if slot in ("posterior", compute_posterior):
        fn = lambda x: compute_posterior(model, spec, de, x)
    elif slot in ("fun", evaluate_fun):
        fn = lambda x: evaluate_fun(model, spec, de, x)
    else:
        fn = lambda x: slot(model, spec, de, x)
    return jax.vmap(jax.vmap(fn))


# ---------------------------------------------------------------------------
# Acceptance (the `update_particle` slot)
# ---------------------------------------------------------------------------

def mh_update(key, w_cur, w_prop, log_adj):
    """Metropolis-Hastings accept mask (reference ``accept`` + ``mh_update!``,
    ``src/utilities.jl:55-58,201-210``), in log space so ``exp`` never
    overflows: accept iff log u ≤ w' − w + log_adj.  NaN deltas (e.g. both
    weights -inf) compare false → reject, matching the reference's
    ``rand() <= NaN === false`` behavior.

    ``key`` may be a PRNG key or an ``rng.Pool``/``rng.KeyDraws`` source.
    """
    if hasattr(key, "uniform"):
        u = key.uniform(w_cur.shape)
    else:
        u = jax.random.uniform(key, w_cur.shape, dtype=jnp.float32)
    u = jnp.maximum(u, jnp.finfo(jnp.float32).tiny)
    return jnp.log(u) <= (w_prop - w_cur + log_adj)


def maximize(key, w_cur, w_prop, log_adj):
    """Greedy replace-if-better (reference ``maximize!``,
    ``src/utilities.jl:212-218``)."""
    return w_prop > w_cur


def minimize(key, w_cur, w_prop, log_adj):
    """Greedy replace-if-worse... er, smaller (reference ``minimize!``,
    ``src/utilities.jl:220-226``)."""
    return w_prop < w_cur


# API-compat alias: the reference exports a (stale) `greedy_update!`
# (src/DifferentialEvolutionMCMC.jl:17) whose real implementation is
# maximize!/minimize!.
greedy_update = maximize


def make_update(de):
    slot = de.update_particle
    if slot in ("mh", mh_update):
        return mh_update
    if slot in ("maximize", maximize):
        return maximize
    if slot in ("minimize", minimize):
        return minimize
    return slot


def apply_accept(theta, weight, prop, w_prop, acc):
    """Masked population update: where accepted, take the proposal."""
    theta = jnp.where(acc[..., None], prop, theta)
    weight = jnp.where(acc, w_prop, weight)
    return theta, weight
