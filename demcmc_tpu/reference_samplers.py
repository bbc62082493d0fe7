"""Independent gradient-based sampler used as a TEST ORACLE.

The reference validates its statistical tests against Turing's NUTS
(``/root/reference/test/gaussian_tests.jl:46-55``,
``test/lognormal_race_tests.jl``).  No external PPL is available in this
environment, so this module provides a self-contained HMC with
dual-averaging step-size adaptation (Hoffman & Gelman 2014, Algorithm 5's
adaptation around static-trajectory HMC) — an algorithmically *independent*
sampler (gradient-based, not population-based), so agreement between it
and the DE-MCMC sampler is strong evidence both are correct.

Not part of the performance surface; used by tests and available to users
as a convenience cross-check.
"""

from __future__ import annotations

import warnings
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import rng as _rng


class HMCResult(NamedTuple):
    samples: np.ndarray     # [n_samples, n_chains, d]
    accept_rate: float
    step_size: float


def hmc(logpost: Callable, init: jnp.ndarray, key,
        n_samples: int = 2000, n_warmup: int = 1000,
        n_leapfrog: int = 32, target_accept: float = 0.8) -> HMCResult:
    """Sample with static-trajectory HMC + dual-averaging step size.

    Parameters
    ----------
    logpost : ``f(theta [d]) -> scalar`` log density (JAX-differentiable;
        use -inf outside the support).
    init : ``[n_chains, d]`` initial positions (must have finite logpost).
    """
    if not jax.config.jax_enable_x64:
        warnings.warn(
            "reference_samplers.hmc wants float64; enable it with "
            "jax.config.update('jax_enable_x64', True) — running in "
            "float32 degrades step-size adaptation accuracy")
    init = jnp.asarray(init, jnp.float64)
    C, d = init.shape
    grad = jax.grad(lambda q: logpost(q).astype(jnp.float64))
    vval = jax.vmap(logpost)
    vgrad = jax.vmap(grad)

    def leapfrog(q, p, eps):
        p = p + 0.5 * eps * vgrad(q)
        def body(_, qp):
            q, p = qp
            q = q + eps * p
            p = p + eps * vgrad(q)
            return q, p
        q, p = jax.lax.fori_loop(0, n_leapfrog - 1, body, (q, p))
        q = q + eps * p
        p = p + 0.5 * eps * vgrad(q)
        return q, p

    def hmc_step(q, logp_q, key, eps):
        """One proposal; carries the current log density (no re-eval)."""
        k1, k2 = jax.random.split(key)
        p0 = jax.random.normal(k1, q.shape, q.dtype)
        h0 = logp_q - 0.5 * jnp.sum(p0 * p0, axis=1)
        q1, p1 = leapfrog(q, p0, eps)
        logp_q1 = vval(q1)
        h1 = logp_q1 - 0.5 * jnp.sum(p1 * p1, axis=1)
        log_acc = jnp.where(jnp.isnan(h1), -jnp.inf, h1 - h0)
        # clamp u away from 0: log(0) = -inf would "accept" even a
        # divergent (-inf) proposal and NaN-poison the chain
        u = jnp.maximum(jax.random.uniform(k2, (C,), q.dtype),
                        jnp.finfo(q.dtype).tiny)
        acc = jnp.log(u) <= log_acc
        q = jnp.where(acc[:, None], q1, q)
        logp_q = jnp.where(acc, logp_q1, logp_q)
        p_acc = jnp.mean(jnp.exp(jnp.minimum(log_acc, 0.0)))
        return q, logp_q, acc, p_acc

    # -- warmup with dual averaging (Nesterov 2009 / NUTS paper §3.2) -----
    mu = jnp.log(10 * 0.1)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def warm_body(carry, i):
        q, logp_q, key, log_eps, log_eps_bar, h_bar = carry
        key, sub = jax.random.split(key)
        q, logp_q, _, p_acc = hmc_step(q, logp_q, sub, jnp.exp(log_eps))
        m = i + 1.0
        h_bar = (1 - 1 / (m + t0)) * h_bar + (target_accept - p_acc) / (m + t0)
        log_eps = mu - jnp.sqrt(m) / gamma * h_bar
        w = m ** (-kappa)
        log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
        return (q, logp_q, key, log_eps, log_eps_bar, h_bar), None

    key = _rng.ensure_key(key)
    k_warm, k_draw = jax.random.split(key)
    carry = (init, vval(init), k_warm, jnp.log(0.1), jnp.log(0.1), 0.0)
    (q, logp_q, _, _, log_eps_bar, _), _ = jax.lax.scan(
        warm_body, carry, jnp.arange(n_warmup, dtype=jnp.float64))
    eps = jnp.exp(log_eps_bar)

    # -- sampling ---------------------------------------------------------
    def draw_body(carry, _):
        q, logp_q, key = carry
        key, sub = jax.random.split(key)
        q, logp_q, acc, _ = hmc_step(q, logp_q, sub, eps)
        return (q, logp_q, key), (q, acc)

    (_, _, _), (samples, accs) = jax.lax.scan(
        draw_body, (q, logp_q, k_draw), None, length=n_samples)
    return HMCResult(samples=np.asarray(samples),
                     accept_rate=float(jnp.mean(accs)),
                     step_size=float(eps))
