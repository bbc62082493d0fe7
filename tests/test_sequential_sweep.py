"""Sequential (reference-exact in-place) within-group sweeps — DE.sweep.

The reference updates particles one at a time IN PLACE
(``src/crossover.jl:12-17``); rounds 1-3 of this framework updated the
whole group synchronously, documenting it as an equally valid MCMC.
That claim is WRONG at small group sizes: a fully synchronous ensemble
update is not exactly invariant (the same reason emcee uses red-black
half-ensemble moves), and the stationary distribution narrows by
O(1/Np²) — measured on the conjugate binomial as ~-7% posterior sd at
Np=3 and ~-1.6% at Np=4 (reproduced below and in a standalone numpy
experiment independent of this codebase).  Round 4 adds the sequential
sweep as Np masked sub-sweeps (exactly the reference's semantics: each
particle's partners/base see earlier particles' accepts) and resolves
``sweep='auto'`` to it for Np <= 4.
"""

import numpy as np
import pytest

import jax

import demcmc_tpu as dm
from demcmc_tpu.models import binomial, gaussian
from demcmc_tpu.sampler import (_grow_history, build_step, init_state,
                                make_spec, run_scan)

F32_DATA = np.asarray(
    np.random.default_rng(3).normal(0.0, 1.0, 50), np.float32)


@pytest.fixture()
def interpret(monkeypatch):
    monkeypatch.setenv("DEMCMC_FUSED", "interpret")


def test_auto_resolution():
    assert dm.DE(Np=3, sample="resample", n_initial=8).sequential_sweep
    assert dm.DE(Np=4).sequential_sweep
    assert not dm.DE(Np=5).sequential_sweep
    assert not dm.DE(Np=4, sweep="sync").sequential_sweep
    assert dm.DE(Np=16, sweep="sequential").sequential_sweep
    with pytest.raises(ValueError):
        dm.DE(Np=4, sweep="parallel")


@pytest.mark.slow
def test_sequential_fixes_small_np_bias():
    """Np=3 conjugate binomial: sequential is exact where synchronous is
    measurably narrow — the empirical basis of the 'auto' default."""
    truth = binomial.conjugate_posterior(10, 5)
    stds = {}
    for sweep in ("sequential", "sync"):
        model, de = binomial.make(N=10, k=5, Np=3, n_groups=4,
                                  burnin=1500, sweep=sweep)
        ch = dm.sample(model, de, 20000, key=8)
        stds[sweep] = float(ch.data.reshape(len(ch), -1).std(ddof=1))
    assert abs(stds["sequential"] - truth["std"]) < 0.002, stds
    # the synchronous bias is real and reproducible (~ -0.005 at Np=3)
    assert stds["sync"] < truth["std"] - 0.003, stds


def test_sequential_determinism_and_resume():
    model, de = binomial.make(N=10, k=6, Np=3, n_groups=4, burnin=20,
                              discard_burnin=False)
    assert de.sequential_sweep
    c1 = dm.sample(model, de, 80, key=5)
    c2 = dm.sample(model, de, 80, key=5)
    assert np.array_equal(c1.data, c2.data)
    _, st = dm.sample(model, de, 40, key=5, return_state=True)
    tail = dm.sample(model, de, 40, key=5, state=st)
    assert np.array_equal(c1.data[-len(tail):], tail.data)


def test_sequential_blocked_and_snooker_run():
    """Sequential sweeps compose with blocks (outer) and snooker."""
    model, de = gaussian.make(data=F32_DATA, Np=4, n_groups=4, burnin=50,
                              blocking_on=True, theta_snooker=0.2,
                              blocks=[[True, False], [False, True]])
    assert de.sequential_sweep
    ch = dm.sample(model, de, 200, key=3)
    assert np.isfinite(ch.lp).all()
    assert 0.05 < ch.acceptance.mean() < 0.95


# ---------------------------------------------------------------------------
# fused kernel path
# ---------------------------------------------------------------------------

def test_fused_sequential_statistical(interpret):
    model, de = gaussian.make(data=F32_DATA, Np=4, n_groups=32,
                              burnin=200)
    assert de.sequential_sweep
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    assert getattr(step, "fused", False)
    ch = dm.sample(model, de, 800, key=13)
    ref = gaussian.posterior_grid(F32_DATA)
    m = ch.data.mean(axis=(0, 2))
    assert abs(m[0] - ref["mu"]["mean"]) < 0.05
    assert abs(m[1] - ref["sigma"]["mean"]) < 0.05


def test_fused_sequential_superstep_bitwise(interpret, monkeypatch):
    monkeypatch.setenv("DEMCMC_SUPER_K", "4")
    model, de = gaussian.make(data=F32_DATA, Np=4, n_groups=32,
                              burnin=50, alpha=0.3)
    assert de.sequential_sweep
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    st1 = step.to_fused(init_state(model, de, spec, 0))
    sup_bak = step.get_superstep
    step.get_superstep = lambda: None           # force singles
    _, ys_single = run_scan(step, st1, 12)
    step.get_superstep = sup_bak
    step._scan_jit_cache.clear()
    st2 = step.to_fused(init_state(model, de, spec, 0))
    _, ys_super = run_scan(step, st2, 12)
    np.testing.assert_array_equal(np.asarray(ys_single.theta),
                                  np.asarray(ys_super.theta))
    np.testing.assert_array_equal(np.asarray(ys_single.accept),
                                  np.asarray(ys_super.accept))


def test_fused_sequential_resample_mechanics(interpret):
    """Sequential + resample (the reference's FLAGSHIP MVN shape, Np=3):
    per-member history tuples (member-major SMEM slots) and the
    store_samples! row write stay exact."""
    model, de = gaussian.make(data=F32_DATA, Np=3, n_groups=1, alpha=0.0,
                              sample="resample", n_initial=20, burnin=5,
                              theta_snooker=0.3)
    assert de.sequential_sweep and de.uses_resample
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    assert getattr(step, "resample_fused", False)
    st = step.to_fused(_grow_history(init_state(model, de, spec, 0), 12))
    st, ys = run_scan(step, st, 12)
    su = step.from_fused(st)
    h = np.asarray(su.history)
    traj = np.swapaxes(np.asarray(ys.theta), 1, 2)
    np.testing.assert_array_equal(h[20:32], traj)
    assert np.isfinite(np.asarray(ys.lp)).all()
