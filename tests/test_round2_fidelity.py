"""Round-2 fidelity features: arbitrary-n / with-replacement partner
draws (reference ``sample`` slot signature, ``src/crossover.jl:113-140``),
f64 pool draws, strict kwargs, DE equality/cache, and the large-G index
routing path of migration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import demcmc_tpu as dm
from demcmc_tpu import rng
from demcmc_tpu.models import gaussian
from demcmc_tpu.ops import migration
from demcmc_tpu.ops import proposals as prop_ops
from demcmc_tpu.sampler import build_step


# ---------------------------------------------------------------------------
# partner sampling: arbitrary n, replace flag
# ---------------------------------------------------------------------------

def test_distinct_indices_n5_distinct_and_in_range():
    G, Np, n = 3, 8, 5
    for seed in range(50):
        idx = prop_ops._distinct_indices(
            rng.KeyDraws(jax.random.PRNGKey(seed)), G, Np, n,
            exclude_self=True)
        a = np.asarray(idx)                      # [n, G, Np]
        assert a.shape == (n, G, Np)
        for g in range(G):
            for t in range(Np):
                picks = a[:, g, t]
                assert len(set(picks.tolist())) == n       # distinct
                assert np.all((picks >= 0) & (picks < Np))
                assert t not in picks                       # self excluded


def test_distinct_indices_n4_uniform_joint():
    # exact uniformity over ordered without-replacement 4-tuples from 5
    G, Np, n = 1, 5, 4
    seen = {}
    trials = 3000
    for seed in range(trials):
        idx = prop_ops._distinct_indices(
            rng.KeyDraws(jax.random.PRNGKey(seed)), G, Np, n,
            exclude_self=False)
        a = np.asarray(idx)[:, 0, :]             # [n, Np]
        for t in range(Np):
            tup = tuple(int(x) for x in a[:, t])
            assert len(set(tup)) == n
            seen[tup] = seen.get(tup, 0) + 1
    assert len(seen) == 5 * 4 * 3 * 2            # all 120 ordered tuples
    expected = trials * Np / len(seen)
    for v in seen.values():
        assert abs(v - expected) < 6 * np.sqrt(expected)


def test_replace_draws_can_repeat_and_are_uniform():
    G, Np, n = 1, 4, 3
    counts = np.zeros(Np)
    repeats = 0
    trials = 2000
    for seed in range(trials):
        idx = prop_ops._distinct_indices(
            rng.KeyDraws(jax.random.PRNGKey(seed)), G, Np, n,
            exclude_self=False, replace=True)
        a = np.asarray(idx)[:, 0, :]             # [n, Np]
        for t in range(Np):
            tup = a[:, t]
            if len(set(tup.tolist())) < n:
                repeats += 1
            for x in tup:
                counts[x] += 1
    assert repeats > 0                           # with replacement
    expected = counts.sum() / Np
    assert np.all(np.abs(counts - expected) < 6 * np.sqrt(expected))


def test_replace_still_excludes_self():
    G, Np, n = 2, 5, 4
    for seed in range(30):
        idx = prop_ops._distinct_indices(
            rng.KeyDraws(jax.random.PRNGKey(seed)), G, Np, n,
            exclude_self=True, replace=True)
        a = np.asarray(idx)
        for t in range(Np):
            assert t not in a[:, :, t]


def test_custom_strategy_four_partners_samples():
    # a DE-best/2-style custom proposal using 4 partners (the reference
    # allows this through the sample slot; round 1 raised
    # NotImplementedError for n > 3)
    def de_rand_2(ctx, key):
        p = ctx.partners(4, exclude_self=True)   # [4, G, Np, d]
        gamma = 2.38 / jnp.sqrt(2 * 2 * ctx.spec.dim)
        return (ctx.theta + gamma * ((p[0] - p[1]) + (p[2] - p[3]))
                + 0.001 * jax.random.normal(key, ctx.theta.shape,
                                            ctx.theta.dtype))

    model, de = gaussian.make(key=0, n_obs=25, burnin=200, Np=8,
                              n_groups=2, generate_proposal=de_rand_2)
    chains = dm.sample(model, de, 800, key=1)
    assert abs(chains.mean("mu") - float(jnp.mean(model.data))) < 0.5
    assert chains.acceptance.mean() > 0.05


# ---------------------------------------------------------------------------
# f64 pool draws (two words/element)
# ---------------------------------------------------------------------------

def test_pool_f64_uniform_exceeds_24bit_resolution():
    pool = rng.Pool(jax.random.PRNGKey(0), 64, 32)
    u = np.asarray(pool.uniform((64, 16), dtype=jnp.float64))
    assert u.dtype == np.float64
    assert np.all((u >= 0.0) & (u < 1.0))
    # sub-2^-24 structure present: scaling by 2^24 leaves fractional parts
    frac = (u * 2.0 ** 24) % 1.0
    assert np.count_nonzero(frac) > u.size * 0.9
    assert abs(u.mean() - 0.5) < 0.02


def test_pool_f64_uniform_deterministic_and_distinct_from_f32():
    p1 = rng.Pool(jax.random.PRNGKey(7), 8, 16)
    p2 = rng.Pool(jax.random.PRNGKey(7), 8, 16)
    a = np.asarray(p1.uniform((8, 4), dtype=jnp.float64))
    b = np.asarray(p2.uniform((8, 4), dtype=jnp.float64))
    np.testing.assert_array_equal(a, b)
    # f64 consumes two words per element
    assert p1.offset == 8


def test_pool_randint_x64_range_and_determinism():
    assert jax.config.jax_enable_x64
    p1 = rng.Pool(jax.random.PRNGKey(3), 16, 8)
    p2 = rng.Pool(jax.random.PRNGKey(3), 16, 8)
    a = np.asarray(p1.randint((16,), 2, 1000))
    b = np.asarray(p2.randint((16,), 2, 1000))
    np.testing.assert_array_equal(a, b)
    assert np.all((a >= 2) & (a < 1000))
    assert p1.offset == 2                        # two words per draw


def test_counting_draws_mirrors_pool_f64():
    c = rng.CountingDraws(8)
    c.uniform((8, 4), dtype=jnp.float64)
    c.normal((8, 2), dtype=jnp.float64)
    c.randint((8,), 0, 10)
    pool = rng.Pool(jax.random.PRNGKey(0), 8, c.words)
    pool.uniform((8, 4), dtype=jnp.float64)
    pool.normal((8, 2), dtype=jnp.float64)
    pool.randint((8,), 0, 10)
    assert pool.offset == c.words


# ---------------------------------------------------------------------------
# strict kwargs (reference errors on unknown kwargs via Julia dispatch)
# ---------------------------------------------------------------------------

def test_sample_rejects_unknown_kwargs():
    model, de = gaussian.make(key=0, n_obs=10, burnin=10)
    with pytest.raises(TypeError):
        dm.sample(model, de, 20, progres=True)


def test_optimize_rejects_unknown_kwargs():
    from demcmc_tpu.models import rastrigin
    model, de = rastrigin.make(n_dim=2, Np=8, n_groups=2)
    with pytest.raises(TypeError):
        dm.optimize(model, de, 20, progess=True)


# ---------------------------------------------------------------------------
# DE equality / step-cache key (ADVICE round-1 medium finding)
# ---------------------------------------------------------------------------

def test_equal_DEs_with_ndarray_blocks_share_cache():
    blocks = [np.array([True, False]), np.array([False, True])]
    model, de1 = gaussian.make(key=0, n_obs=10, burnin=10,
                               blocks=[np.array(b) for b in blocks])
    de2 = de1.replace(blocks=[np.array(b) for b in blocks])
    assert de1 == de2 and hash(de1) == hash(de2)
    assert de1 is not de2
    from demcmc_tpu.sampler import make_spec
    spec = make_spec(model, de1)
    s1 = build_step(model, de1, spec)
    s2 = build_step(model, de2, spec)            # must not raise, must hit
    assert s1 is s2


# ---------------------------------------------------------------------------
# migration: large-G index routing path == small-G matmul path, bitwise
# ---------------------------------------------------------------------------

def _force_path(monkeypatch, small_g):
    monkeypatch.setattr(migration, "_SMALL_G", small_g)


def test_migration_paths_bitwise_equal(monkeypatch):
    G, Np, d = 16, 4, 3
    key = jax.random.PRNGKey(0)
    theta = jax.random.normal(key, (G, Np, d), dtype=jnp.float32)
    weight = jax.random.normal(jax.random.fold_in(key, 1), (G, Np),
                               dtype=jnp.float32)
    for seed in range(20):
        k = jax.random.PRNGKey(seed)
        _force_path(monkeypatch, 1024)
        t_small, w_small = migration.migrate(k, theta, weight, G)
        _force_path(monkeypatch, 0)
        t_large, w_large = migration.migrate(k, theta, weight, G)
        np.testing.assert_array_equal(np.asarray(t_small),
                                      np.asarray(t_large))
        np.testing.assert_array_equal(np.asarray(w_small),
                                      np.asarray(w_large))


def test_migration_index_path_multiset_and_weight_follow(monkeypatch):
    _force_path(monkeypatch, 0)                  # force index routing
    G, Np, d = 9, 3, 2
    key = jax.random.PRNGKey(2)
    theta = jax.random.normal(key, (G, Np, d), dtype=jnp.float64)
    weight = jax.random.normal(jax.random.fold_in(key, 1), (G, Np),
                               dtype=jnp.float64)
    lookup = {tuple(np.round(np.asarray(theta[g, p]), 10)):
              float(weight[g, p]) for g in range(G) for p in range(Np)}
    for seed in range(10):
        t2, w2 = migration.migrate(jax.random.PRNGKey(seed), theta,
                                   weight, G)
        a = np.sort(np.asarray(theta).reshape(-1, d), axis=0)
        b = np.sort(np.asarray(t2).reshape(-1, d), axis=0)
        np.testing.assert_allclose(a, b)
        for g in range(G):
            for p in range(Np):
                kk = tuple(np.round(np.asarray(t2[g, p]), 10))
                np.testing.assert_allclose(float(w2[g, p]), lookup[kk])
