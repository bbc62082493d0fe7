"""Custom strategy slots — the reference's extension mechanism
(function-valued `generate_proposal` / `update_particle` /
`evaluate_fitness` / `sample` / `blocking_on`, src/structs.jl:71-76):
user-supplied callables must compose with the fused step.
"""

import jax
import jax.numpy as jnp
import numpy as np

import demcmc_tpu as dm
from demcmc_tpu.models import binomial, gaussian
from demcmc_tpu.ops import proposals as prop_ops


def _truth(model):
    return gaussian.posterior_grid(np.asarray(model.data))


def test_custom_generate_proposal():
    """A plain random-walk proposal instead of DE — still a valid MH
    chain.  (Init must be bounded: a ±0.15 walk can't descend from the
    half-Cauchy prior's occasional σ≈10² draws within the run.)"""

    def random_walk(ctx, key):
        noise = 0.15 * jax.random.normal(key, ctx.theta.shape,
                                         ctx.theta.dtype)
        return ctx.theta + noise

    model, de = gaussian.make(key=5, n_obs=50, burnin=1000,
                              generate_proposal=random_walk)
    model.sample_prior = lambda k: [
        jax.random.normal(jax.random.fold_in(k, 0)),
        jax.random.uniform(jax.random.fold_in(k, 1), minval=0.5,
                           maxval=2.0)]
    chains = dm.sample(model, de, 4000, key=1)
    truth = _truth(model)
    assert abs(chains.mean("mu") - truth["mu"]["mean"]) < 0.05
    assert abs(chains.mean("sigma") - truth["sigma"]["mean"]) < 0.07


def test_custom_sample_slot():
    """Custom partner source receiving (ctx, key, n, exclude_self)."""
    calls = []

    def my_partners(ctx, key, n, exclude_self):
        calls.append(n)
        return prop_ops.sample_current(ctx, key, n, exclude_self)

    model, de = gaussian.make(key=5, n_obs=30, burnin=300,
                              sample=my_partners)
    chains = dm.sample(model, de, 1200, key=2)
    truth = _truth(model)
    assert calls, "custom sample slot was never invoked"
    assert abs(chains.mean("mu") - truth["mu"]["mean"]) < 0.08


def test_custom_evaluate_fitness_tempering():
    """Tempered posterior (T=2): the posterior should widen measurably."""

    def tempered(model, spec, de, x):
        from demcmc_tpu.ops.accept import compute_posterior
        return 0.5 * compute_posterior(model, spec, de, x)

    model, de = gaussian.make(key=5, n_obs=50, burnin=1000)
    cold = dm.sample(model, de, 3000, key=3)
    hot = dm.sample(model, de.replace(evaluate_fitness=tempered), 3000,
                    key=3)
    assert hot.std("mu") > 1.25 * cold.std("mu")


def test_custom_update_particle():
    """A custom acceptance rule (always-accept) must be honored."""

    def always(key, w_cur, w_prop, log_adj):
        return jnp.ones(w_cur.shape, bool)

    model, de = binomial.make(N=10, k=5, burnin=10, discard_burnin=False,
                              update_particle=always)
    chains = dm.sample(model, de, 100, key=4)
    assert chains.acceptance.mean() == 1.0


def test_traced_blocking_on():
    """blocking_on returning a TRACED bool (alternate iterations) takes
    the lax.cond path of the step."""
    blocks = [[True, False], [False, True]]
    model, de = gaussian.make(
        key=5, n_obs=50, burnin=800, blocks=blocks,
        blocking_on=lambda v: (v.iter % 2) == 0)
    chains = dm.sample(model, de, 3000, key=5)
    truth = _truth(model)
    assert abs(chains.mean("mu") - truth["mu"]["mean"]) < 0.06
    assert abs(chains.mean("sigma") - truth["sigma"]["mean"]) < 0.08


def test_next_key_distinct_across_context_copies():
    """Counter must survive dataclasses.replace copies (shared holder) so
    successive strategy calls never reuse a key."""
    from dataclasses import replace
    ctx = prop_ops.ProposalContext(
        de=None, spec=None, theta=jnp.zeros((1, 4, 2)),
        weight=jnp.zeros((1, 4)), iteration=jnp.asarray(1), history=None,
        key=jax.random.PRNGKey(0))
    k1 = ctx.next_key()
    copy = replace(ctx, theta=jnp.ones((1, 4, 2)))
    k2 = copy.next_key()
    k3 = ctx.next_key()
    ks = [np.asarray(k) for k in (k1, k2, k3)]
    assert not np.array_equal(ks[0], ks[1])
    assert not np.array_equal(ks[1], ks[2])
    assert not np.array_equal(ks[0], ks[2])


def test_next_key_does_not_alias_keydraws():
    from demcmc_tpu import rng as _rng
    key = jax.random.PRNGKey(7)
    ctx = prop_ops.ProposalContext(
        de=None, spec=None, theta=jnp.zeros((1, 4, 2)),
        weight=jnp.zeros((1, 4)), iteration=jnp.asarray(1), history=None,
        key=key)
    kd = _rng.KeyDraws(key)
    kd_keys = [np.asarray(kd._next()) for _ in range(4)]
    for _ in range(4):
        nk = np.asarray(ctx.next_key())
        assert not any(np.array_equal(nk, k) for k in kd_keys)


def test_next_key_without_key_raises():
    import pytest as _pytest
    ctx = prop_ops.ProposalContext(
        de=None, spec=None, theta=jnp.zeros((1, 4, 2)),
        weight=jnp.zeros((1, 4)), iteration=jnp.asarray(1), history=None)
    with _pytest.raises(ValueError):
        ctx.next_key()


def test_empty_blocks_rejected():
    import pytest as _pytest
    with _pytest.raises(ValueError):
        dm.DE(Np=4, blocks=[])
