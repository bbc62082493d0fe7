"""Unit tests for the proposal / acceptance kernels against hand-computed
values — the analogue of the reference's `test/utility_tests.jl`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from demcmc_tpu import DE, DEModel, ParamSpec
from demcmc_tpu.ops import accept as accept_ops
from demcmc_tpu.ops import mutation as mutation_ops
from demcmc_tpu.ops import proposals as prop_ops
from demcmc_tpu import rng


def _ctx(theta, weight, de=None, iteration=1, history=None):
    if de is None:
        de = DE(Np=theta.shape[1], n_groups=theta.shape[0], alpha=0.0)
    return prop_ops.ProposalContext(de=de, spec=None, theta=jnp.asarray(theta),
                                    weight=jnp.asarray(weight),
                                    iteration=jnp.asarray(iteration),
                                    history=history)


# ---------------------------------------------------------------------------
# project — reference hand value test/utility_tests.jl:71-93
# ---------------------------------------------------------------------------

def test_project_hand_value():
    x1 = jnp.array([-1.0, 4.0])
    x2 = jnp.array([2.0, 7.0])
    np.testing.assert_allclose(prop_ops.project(x1, x2),
                               [52 / 53, 182 / 53], rtol=1e-12)


def test_project_batched():
    # same value through the batched [G, Np, d] path
    p1 = jnp.broadcast_to(jnp.array([-1.0, 4.0]), (2, 3, 2))
    p2 = jnp.broadcast_to(jnp.array([2.0, 7.0]), (2, 3, 2))
    out = prop_ops.project(p1, p2)
    np.testing.assert_allclose(out[1, 2], [52 / 53, 182 / 53], rtol=1e-12)


# ---------------------------------------------------------------------------
# partner sampling (sample_current) — distinct, non-self
# ---------------------------------------------------------------------------

def test_sample_current_excludes_self_and_distinct():
    G, Np, d = 2, 6, 1
    theta = jnp.arange(G * Np, dtype=jnp.float64).reshape(G, Np, d)
    ctx = _ctx(theta, jnp.zeros((G, Np)))
    for seed in range(20):
        pm, pn = prop_ops.sample_current(
            ctx, jax.random.PRNGKey(seed), 2, exclude_self=True)
        own = theta[..., 0]
        assert not np.any(np.asarray(pm[..., 0]) == np.asarray(own))
        assert not np.any(np.asarray(pn[..., 0]) == np.asarray(own))
        assert not np.any(np.asarray(pm[..., 0]) == np.asarray(pn[..., 0]))


def test_sample_current_include_self_allowed():
    G, Np, d = 1, 4, 1
    theta = jnp.arange(Np, dtype=jnp.float64).reshape(G, Np, d)
    ctx = _ctx(theta, jnp.zeros((G, Np)))
    hit_self = False
    for seed in range(50):
        (pz,) = prop_ops.sample_current(
            ctx, jax.random.PRNGKey(seed), 1, exclude_self=False)
        if np.any(np.asarray(pz[..., 0]) == np.arange(Np)):
            hit_self = True
            break
    assert hit_self  # snooker draws from the full group including self


def test_sample_current_partners_within_group():
    G, Np, d = 3, 4, 1
    theta = jnp.arange(G * Np, dtype=jnp.float64).reshape(G, Np, d)
    ctx = _ctx(theta, jnp.zeros((G, Np)))
    pm, pn = prop_ops.sample_current(
        ctx, jax.random.PRNGKey(3), 2, exclude_self=True)
    for g in range(G):
        lo, hi = g * Np, (g + 1) * Np
        assert np.all((np.asarray(pm[g, :, 0]) >= lo)
                      & (np.asarray(pm[g, :, 0]) < hi))


def test_distinct_indices_uniform_pairs():
    # the O(1) shift-trick sampler must be exactly uniform over ordered
    # without-replacement pairs, excluding self
    G, Np, n = 1, 5, 2
    counts = np.zeros((Np, Np, Np))   # [target, a, b]
    trials = 3000
    for seed in range(trials):
        idx = prop_ops._distinct_indices(rng.KeyDraws(jax.random.PRNGKey(seed)),
                                         G, Np, n, exclude_self=True)
        a, b = np.asarray(idx[0][0]), np.asarray(idx[1][0])
        for t in range(Np):
            counts[t, a[t], b[t]] += 1
    for t in range(Np):
        assert counts[t, t, :].sum() == 0      # self never drawn
        assert counts[t, :, t].sum() == 0
        assert np.all(np.diagonal(counts[t]) == 0)   # a != b
        # 12 valid ordered pairs, each ~ trials/12
        valid = counts[t][counts[t] > 0]
        assert valid.size == (Np - 1) * (Np - 2)
        expected = trials / valid.size
        assert np.all(np.abs(valid - expected) < 5 * np.sqrt(expected))


def test_distinct_indices_uniform_triples_with_self():
    G, Np, n = 1, 4, 3
    seen = {}
    trials = 4000
    for seed in range(trials):
        idx = prop_ops._distinct_indices(rng.KeyDraws(jax.random.PRNGKey(seed)),
                                         G, Np, n, exclude_self=False)
        trip = tuple(int(x[0, 0]) for x in idx)
        assert len(set(trip)) == 3             # distinct
        seen[trip] = seen.get(trip, 0) + 1
    assert len(seen) == Np * (Np - 1) * (Np - 2)   # all 24 ordered triples
    expected = trials / len(seen)
    for v in seen.values():
        assert abs(v - expected) < 6 * np.sqrt(expected)


def test_distinct_indices_too_few_candidates_raises():
    with pytest.raises(ValueError):
        prop_ops._distinct_indices(rng.KeyDraws(jax.random.PRNGKey(0)), 1, 3, 3,
                                   exclude_self=True)


# ---------------------------------------------------------------------------
# select_base — softmax(weights) categorical; -inf weights excluded
# ---------------------------------------------------------------------------

def test_select_base_never_picks_minus_inf():
    G, Np, d = 1, 4, 1
    theta = jnp.arange(Np, dtype=jnp.float64).reshape(G, Np, d)
    weight = jnp.array([[0.0, -jnp.inf, 0.0, -jnp.inf]])
    for seed in range(30):
        base = prop_ops.select_base(jax.random.PRNGKey(seed), theta, weight)
        vals = np.asarray(base[0, :, 0])
        assert np.all(np.isin(vals, [0.0, 2.0]))


def test_select_base_prefers_high_weight():
    G, Np, d = 1, 3, 1
    theta = jnp.arange(Np, dtype=jnp.float64).reshape(G, Np, d)
    weight = jnp.array([[0.0, 20.0, 0.0]])  # softmax ≈ delta on index 1
    picks = [np.asarray(prop_ops.select_base(
        jax.random.PRNGKey(s), theta, weight))[0, :, 0] for s in range(10)]
    assert np.mean(np.concatenate(picks) == 1.0) > 0.95


# ---------------------------------------------------------------------------
# recombination — κ keep-mask (reference src/crossover.jl:301-321)
# ---------------------------------------------------------------------------

def test_recombination_noop_at_kappa_one():
    prop = jnp.ones((2, 3, 4))
    theta = jnp.zeros((2, 3, 4))
    out = prop_ops.recombination(jax.random.PRNGKey(0), theta, prop, 1.0)
    np.testing.assert_array_equal(out, prop)


def test_recombination_rate():
    kappa = 0.3
    prop = jnp.ones((100, 10, 10))
    theta = jnp.zeros_like(prop)
    out = prop_ops.recombination(jax.random.PRNGKey(1), theta, prop, kappa)
    frac_kept = float(jnp.mean(out))
    assert abs(frac_kept - kappa) < 0.02


# ---------------------------------------------------------------------------
# snooker — degenerate Pz == Pt handled without NaN (SURVEY.md §3.5.2)
# ---------------------------------------------------------------------------

def test_snooker_no_nan_when_all_identical():
    G, Np, d = 1, 4, 3
    theta = jnp.ones((G, Np, d))  # every draw gives Pz == Pt
    ctx = _ctx(theta, jnp.zeros((G, Np)))
    prop, z, degen = prop_ops.snooker(ctx, jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(prop)))
    assert np.all(np.asarray(degen))
    adj = prop_ops.snooker_log_adj(theta, prop, z, d, degen)
    assert np.all(np.asarray(adj) == -np.inf)  # hard reject


def test_snooker_log_adj_value():
    # (d-1) * (log||θ'-z|| - log||θ-z||) on a hand-built configuration
    d = 3
    theta = jnp.zeros((1, 1, d))
    prop = jnp.full((1, 1, d), 3.0)   # ||θ'-z|| = 2√3 with z = ones
    z = jnp.ones((1, 1, d))           # ||θ-z|| = √3
    degen = jnp.zeros((1, 1), bool)
    adj = prop_ops.snooker_log_adj(theta, prop, z, d, degen)
    np.testing.assert_allclose(float(adj[0, 0]), (d - 1) * np.log(2.0),
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# DE proposal γ₂ burnin schedule (reference src/crossover.jl:164)
# ---------------------------------------------------------------------------

def test_random_gamma_mode_switch_after_burnin():
    G, Np, d = 1, 8, 2
    key = jax.random.PRNGKey(0)
    theta = jax.random.normal(key, (G, Np, d), dtype=jnp.float64)
    de = DE(Np=Np, n_groups=G, alpha=0.0, burnin=10, epsilon=0.0)
    # weights strongly favor particle 0 => base ≈ theta[0]
    weight = jnp.zeros((G, Np)).at[0, 0].set(50.0)
    ctx_pre = _ctx(theta, weight, de, iteration=5)
    ctx_post = _ctx(theta, weight, de, iteration=11)
    kp = jax.random.PRNGKey(7)
    prop_pre = prop_ops.random_gamma(ctx_pre, kp)
    prop_post = prop_ops.random_gamma(ctx_post, kp)
    # post-burnin proposal drops the γ₂(θb − θt) attractor term; with the
    # same key the partner/noise draws agree so the difference is exactly
    # that term — they must differ pre vs post.
    assert not np.allclose(np.asarray(prop_pre), np.asarray(prop_post))
    # and the post-burnin one equals θt + γ₁(θm−θn): verify it is invariant
    # to the weights (base no longer enters)
    ctx_post2 = _ctx(theta, jnp.zeros((G, Np)), de, iteration=11)
    prop_post2 = prop_ops.random_gamma(ctx_post2, kp)
    np.testing.assert_allclose(np.asarray(prop_post), np.asarray(prop_post2))


def test_fixed_and_variable_gamma():
    G, Np, d = 1, 5, 4
    theta = jax.random.normal(jax.random.PRNGKey(1), (G, Np, d),
                              dtype=jnp.float64)
    de = DE(Np=Np, n_groups=G, alpha=0.0, epsilon=0.0)
    ctx = _ctx(theta, jnp.zeros((G, Np)), de)
    key = jax.random.PRNGKey(2)
    pf = prop_ops.fixed_gamma(ctx, key)
    pv = prop_ops.variable_gamma(ctx, key)
    # same partners (same key) => proposals related by the γ ratio
    diff_f = np.asarray(pf) - np.asarray(theta)
    diff_v = np.asarray(pv) - np.asarray(theta)
    ratio = (2.38 / np.sqrt(2 * d)) / 2.38
    np.testing.assert_allclose(diff_v, diff_f * ratio, rtol=1e-6)


# ---------------------------------------------------------------------------
# acceptance rules
# ---------------------------------------------------------------------------

def test_mh_update_deterministic_extremes():
    key = jax.random.PRNGKey(0)
    w_cur = jnp.zeros((2, 3))
    acc = accept_ops.mh_update(key, w_cur, w_cur + 100.0, jnp.zeros((2, 3)))
    assert np.all(np.asarray(acc))
    rej = accept_ops.mh_update(key, w_cur, w_cur - 100.0, jnp.zeros((2, 3)))
    assert not np.any(np.asarray(rej))


def test_mh_update_nan_delta_rejects():
    # both weights -inf => delta NaN => reject (reference: rand() <= NaN
    # is false, src/utilities.jl:55-58)
    key = jax.random.PRNGKey(0)
    w = jnp.full((1, 4), -jnp.inf)
    acc = accept_ops.mh_update(key, w, w, jnp.zeros((1, 4)))
    assert not np.any(np.asarray(acc))


def test_greedy_updates():
    key = jax.random.PRNGKey(0)
    w_cur = jnp.array([[1.0, 2.0]])
    w_prop = jnp.array([[2.0, 1.0]])
    zero = jnp.zeros_like(w_cur)
    np.testing.assert_array_equal(
        np.asarray(accept_ops.maximize(key, w_cur, w_prop, zero)),
        [[True, False]])
    np.testing.assert_array_equal(
        np.asarray(accept_ops.minimize(key, w_cur, w_prop, zero)),
        [[False, True]])


def test_apply_accept_masked():
    theta = jnp.zeros((1, 2, 3))
    prop = jnp.ones_like(theta)
    w = jnp.zeros((1, 2))
    wp = jnp.ones_like(w)
    acc = jnp.array([[True, False]])
    t2, w2 = accept_ops.apply_accept(theta, w, prop, wp, acc)
    np.testing.assert_array_equal(np.asarray(t2[0, 0]), np.ones(3))
    np.testing.assert_array_equal(np.asarray(t2[0, 1]), np.zeros(3))
    np.testing.assert_array_equal(np.asarray(w2), [[1.0, 0.0]])


# ---------------------------------------------------------------------------
# bounds / fitness
# ---------------------------------------------------------------------------

def _toy_model_spec():
    model = DEModel(
        loglike=lambda data, a, b: -0.5 * (a ** 2 + jnp.sum(b ** 2)),
        prior_loglike=lambda a, b: 0.0,
        sample_prior=lambda key: [jnp.float64(0.0), jnp.zeros(2)],
        names=("a", "b"))
    spec = ParamSpec.from_example(
        ("a", "b"), [np.float64(0.0), np.zeros(2)],
        ((0.0, 1.0), (-np.inf, np.inf)))
    return model, spec


def test_in_bounds_elementwise():
    _, spec = _toy_model_spec()
    ok = accept_ops.in_bounds(spec, jnp.array([0.5, -100.0, 100.0]))
    assert bool(ok)
    bad = accept_ops.in_bounds(spec, jnp.array([1.5, 0.0, 0.0]))
    assert not bool(bad)


def test_compute_posterior_out_of_bounds_minus_inf():
    model, spec = _toy_model_spec()
    de = DE(Np=4)
    w_in = accept_ops.compute_posterior(model, spec, de,
                                        jnp.array([0.5, 1.0, 1.0]))
    np.testing.assert_allclose(float(w_in), -0.5 * (0.25 + 2.0))
    w_out = accept_ops.compute_posterior(model, spec, de,
                                         jnp.array([-0.5, 1.0, 1.0]))
    assert float(w_out) == -np.inf


def test_evaluate_fun_direction_sentinels():
    model, spec = _toy_model_spec()
    de_max = DE(Np=4, update_particle="maximize", evaluate_fitness="fun")
    de_min = DE(Np=4, update_particle="minimize", evaluate_fitness="fun")
    x_bad = jnp.array([2.0, 0.0, 0.0])
    assert float(accept_ops.evaluate_fun(model, spec, de_max, x_bad)) == -np.inf
    assert float(accept_ops.evaluate_fun(model, spec, de_min, x_bad)) == np.inf


def test_mutation_statistics():
    theta = jnp.zeros((4, 8, 16))
    out = mutation_ops.mutate(jax.random.PRNGKey(0), theta, 0.05)
    noise = np.asarray(out)
    assert abs(noise.mean()) < 0.01
    assert abs(noise.std() - 0.05) < 0.01
