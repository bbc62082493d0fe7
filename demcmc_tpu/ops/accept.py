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


def compute_posterior(model, spec, de, x, key=None):
    """Posterior log density of one flat parameter vector; ``-inf`` when out
    of bounds or non-finite (reference ``compute_posterior!``,
    ``src/utilities.jl:92-99``).  The reference skips the user functions for
    out-of-bounds proposals; under jit both branches evaluate, so any NaNs
    the user code produces out of bounds are masked away here.

    ``key`` is the per-evaluation PRNG key for stochastic
    (pseudo-marginal) likelihoods; ``None`` for deterministic models.
    """
    lp = model.log_prior_flat(spec, x) + model.log_like_flat(spec, x, key)
    ok = in_bounds(spec, x) & ~jnp.isnan(lp)
    return jnp.where(ok, lp, -jnp.inf)


def evaluate_fun(model, spec, de, x, key=None):
    """Objective-only fitness for optimization (reference ``evaluate_fun!``,
    ``src/utilities.jl:113-120``): out-of-bounds (or NaN) scores -inf when
    maximizing, +inf when minimizing."""
    val = model.log_like_flat(spec, x, key)
    bad = jnp.inf if de.is_minimize else -jnp.inf
    ok = in_bounds(spec, x) & ~jnp.isnan(val)
    return jnp.where(ok, val, bad)


def make_fitness(model, spec, de):
    """Batched fitness ``[G, Np, d] -> [G, Np]`` via double vmap.

    Returns ``fitness(x, eval_key=None)``.  For ``model.stochastic``,
    ``eval_key`` is split into one key per (group, particle) cell and
    passed to the per-vector fitness (custom ``evaluate_fitness`` slots
    then receive it as a 5th argument); deterministic models ignore it.
    """
    slot = de.evaluate_fitness
    stochastic = getattr(model, "stochastic", False)
    if slot in ("posterior", compute_posterior):
        fn = lambda x, k: compute_posterior(model, spec, de, x, k)
    elif slot in ("fun", evaluate_fun):
        fn = lambda x, k: evaluate_fun(model, spec, de, x, k)
    elif stochastic:
        fn = lambda x, k: slot(model, spec, de, x, k)
    else:
        fn = lambda x, k: slot(model, spec, de, x)

    if not stochastic:
        plain = jax.vmap(jax.vmap(lambda x: fn(x, None)))

        def fitness(x, eval_key=None):
            return plain(x)
        return fitness

    batched = jax.vmap(jax.vmap(fn))

    def fitness(x, eval_key=None):
        if eval_key is None:
            raise ValueError("stochastic model requires an eval_key")
        G, Np = x.shape[:2]
        keys = jax.random.split(eval_key, G * Np)
        keys = keys.reshape((G, Np) + keys.shape[1:])
        return batched(x, keys)
    return fitness


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
    dt = (w_cur.dtype if jnp.issubdtype(w_cur.dtype, jnp.floating)
          else jnp.float32)
    if hasattr(key, "uniform"):
        u = key.uniform(w_cur.shape, dtype=dt)
    else:
        u = jax.random.uniform(key, w_cur.shape, dtype=dt)
    u = jnp.maximum(u, jnp.finfo(dt).tiny)
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
