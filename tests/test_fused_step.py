"""Tests for the whole-step fused Pallas kernel (``ops/fused_step.py``).

On CPU the kernel runs under the Mosaic TPU interpreter
(``DEMCMC_FUSED=interpret``) with threefry bits fed in as a kernel input;
the real TPU path differs only in sourcing bits from the hardware PRNG
(same consuming logic), so everything except the bit source is exercised
here.  Reference semantics under test: the micro-stack of
``src/crossover.jl:12-99`` + ``src/utilities.jl:92-99,201-210``.
"""

import warnings

import numpy as np
import pytest

import jax

from demcmc_tpu import DE, sample
from demcmc_tpu.models import gaussian
from demcmc_tpu.ops import fused_step
from demcmc_tpu.sampler import build_step, make_spec

F32_DATA = np.asarray(
    np.random.default_rng(3).normal(0.0, 1.0, 50), np.float32)


def _make(**kw):
    kw.setdefault("Np", 4)
    kw.setdefault("n_groups", 32)
    kw.setdefault("burnin", 500)
    # these tests exercise the SYNCHRONOUS sweep machinery (the large-
    # population default); Np=4 would auto-resolve to the sequential
    # sweep, which has its own dedicated tests below at 1/4 the
    # interpret-mode cost here
    kw.setdefault("sweep", "sync")
    return gaussian.make(data=F32_DATA, **kw)


@pytest.fixture()
def interpret(monkeypatch):
    monkeypatch.setenv("DEMCMC_FUSED", "interpret")


_fused_2500 = []


def _fused_gauss_2500():
    """One 2500-iteration fused run shared by the oracle and fused-vs-XLA
    statistical tests (interpret-mode sampling dominates suite runtime)."""
    if not _fused_2500:
        model, de = _make()
        _fused_2500.append(sample(model, de, 2500, key=11))
    return _fused_2500[0]


def test_supported_predicate(interpret):
    model, de = _make()
    spec = make_spec(model, de)
    assert fused_step.supported(model, de, spec)
    # snooker MIXING (theta_snooker > 0) is supported in-kernel
    ms, ds = _make(theta_snooker=0.1)
    assert fused_step.supported(ms, ds, make_spec(ms, ds))
    # constant-True blocking runs the block sweeps in-kernel
    mb, db = _make(blocking_on=True, blocks=[[True, False], [False, True]])
    assert fused_step.supported(mb, db, make_spec(mb, db))
    # each exclusion individually
    for bad in (dict(generate_proposal="snooker"),
                dict(sample="resample"),
                dict(blocking_on=lambda de: de.iteration % 2 == 0,
                     blocks=[[True, False], [False, True]]),  # dynamic
                dict(Np=2),                      # < 3 partners impossible
                dict(Np=5, n_groups=25),         # C % 128 != 0
                dict(dtype=np.float64)):
        m2, d2 = _make(**bad)
        assert not fused_step.supported(m2, d2, make_spec(m2, d2)), bad


def test_build_step_picks_fused(interpret):
    model, de = _make()
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    assert getattr(step, "fused", False)
    # and the same model+config cached
    assert build_step(model, de, spec) is step


@pytest.mark.slow
def test_gaussian_posterior_matches_oracle(interpret):
    chains = _fused_gauss_2500()
    ref = gaussian.posterior_grid(F32_DATA)
    means = chains.data.mean(axis=(0, 2))
    stds = chains.data.std(axis=(0, 2))
    assert abs(means[0] - ref["mu"]["mean"]) < 0.02
    assert abs(means[1] - ref["sigma"]["mean"]) < 0.02
    assert abs(stds[0] - ref["mu"]["std"]) < 0.02
    assert abs(stds[1] - ref["sigma"]["std"]) < 0.02
    assert 0.2 < chains.acceptance.mean() < 0.9


@pytest.mark.slow
def test_migration_path_statistical(interpret):
    model, de = _make(alpha=1.0, burnin=300)     # migrate EVERY iteration
    chains = sample(model, de, 1500, key=7)
    ref = gaussian.posterior_grid(F32_DATA)
    means = chains.data.mean(axis=(0, 2))
    assert abs(means[0] - ref["mu"]["mean"]) < 0.03
    assert abs(means[1] - ref["sigma"]["mean"]) < 0.03


def test_knob_branches(interpret):
    # epsilon-noise + recombination + mutation branches all active
    model, de = _make(epsilon=0.001, kappa=0.9, beta=0.01,
                      burnin=300)
    chains = sample(model, de, 1200, key=13)
    ref = gaussian.posterior_grid(F32_DATA)
    means = chains.data.mean(axis=(0, 2))
    assert abs(means[0] - ref["mu"]["mean"]) < 0.04
    assert abs(means[1] - ref["sigma"]["mean"]) < 0.04


@pytest.mark.slow
def test_fixed_and_variable_gamma(interpret):
    """Pure-DE modes (no γ₂ base attraction) leave heavy-tail outlier
    chains decaying slowly at these lengths, so compare MEDIANS (robust;
    the XLA path shows the same mean inflation at this config)."""
    from demcmc_tpu import fixed_gamma, variable_gamma
    for gp in (fixed_gamma, variable_gamma):
        model, de = _make(generate_proposal=gp, burnin=300)
        chains = sample(model, de, 1200, key=17)
        ref = gaussian.posterior_grid(F32_DATA)
        med = np.median(chains.data, axis=(0, 2))
        assert abs(med[0] - ref["mu"]["mean"]) < 0.05, gp.__name__
        assert abs(med[1] - ref["sigma"]["mean"]) < 0.06, gp.__name__


@pytest.mark.slow
def test_snooker_statistical(interpret):
    """The in-kernel snooker branch (θsnooker=0.3, so ~30% of all moves
    carry the (d−1)-log-norm MH correction) must leave the posterior
    intact — a wrong correction visibly biases σ at these lengths."""
    model, de = _make(theta_snooker=0.3, burnin=400)
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    assert getattr(step, "fused", False)
    chains = sample(model, de, 2000, key=29)
    ref = gaussian.posterior_grid(F32_DATA)
    means = chains.data.mean(axis=(0, 2))
    stds = chains.data.std(axis=(0, 2))
    assert abs(means[0] - ref["mu"]["mean"]) < 0.03
    assert abs(means[1] - ref["sigma"]["mean"]) < 0.03
    assert abs(stds[0] - ref["mu"]["std"]) < 0.03
    assert abs(stds[1] - ref["sigma"]["std"]) < 0.03


def test_determinism(interpret):
    model, de = _make(burnin=100, alpha=0.3)
    c1 = sample(model, de, 300, key=5)
    c2 = sample(model, de, 300, key=5)
    assert np.array_equal(c1.data, c2.data)


def test_resume_bitwise(interpret):
    model, de = _make(burnin=100, alpha=0.3, discard_burnin=False)
    full = sample(model, de, 400, key=9)
    _, st = sample(model, de, 200, key=9, return_state=True)
    tail = sample(model, de, 200, key=9, state=st)
    assert np.array_equal(full.data[-len(tail):], tail.data)


@pytest.mark.slow
def test_fused_matches_xla_statistically(interpret, monkeypatch):
    """Fused and XLA paths use different RNG streams but must target the
    same posterior."""
    fused = _fused_gauss_2500()
    monkeypatch.setenv("DEMCMC_FUSED", "off")
    model2, de2 = _make(burnin=500)
    xla = sample(model2, de2, 2500, key=21)
    np.testing.assert_allclose(fused.data.mean(axis=(0, 2)),
                               xla.data.mean(axis=(0, 2)), atol=0.03)
    np.testing.assert_allclose(fused.data.std(axis=(0, 2)),
                               xla.data.std(axis=(0, 2)), atol=0.03)


# ---------------------------------------------------------------------------
# fused resample (DE-MCz) path — reference src/crossover.jl:103-140 via the
# padded [d, 8, 128] layout + in-kernel history (ops/fused_step.py)
# ---------------------------------------------------------------------------

def _make_resample(**kw):
    kw.setdefault("Np", 4)
    kw.setdefault("n_groups", 1)
    kw.setdefault("alpha", 0.0)
    kw.setdefault("sample", "resample")
    kw.setdefault("n_initial", 20)
    kw.setdefault("burnin", 100)
    kw.setdefault("theta_snooker", 0.3)
    kw.setdefault("sweep", "sync")    # see _make; sequential below
    return gaussian.make(data=F32_DATA, **kw)


def test_resample_supported_predicate(interpret):
    model, de = _make_resample()
    assert fused_step.supported(model, de, make_spec(model, de))
    # C in (128, 1024] takes the WIDE single-row layout since round 5
    mw, dw = _make_resample(Np=64, n_groups=3)      # C = 192
    assert fused_step.supported(mw, dw, make_spec(mw, dw))
    assert fused_step.resample_layout(dw) == (192, 1, 256)
    # blocked resample sweeps fuse since round 5 (per-block draw sets)
    mb, db = _make_resample(blocking_on=True,
                            blocks=[[True, False], [False, True]])
    assert fused_step.supported(mb, db, make_spec(mb, db))
    # ...and so does multi-group resample WITH migration (round 5)
    mm, dm = _make_resample(n_groups=4, Np=4, alpha=0.1)
    assert fused_step.supported(mm, dm, make_spec(mm, dm))
    for bad in (dict(Np=64, n_groups=17),           # C > 1024 (wide max)
                dict(n_initial=0),
                dict(update_particle="maximize",
                     evaluate_fitness="fun")):      # optimization mode
        m2, d2 = _make_resample(**bad)
        assert not fused_step.supported(m2, d2, make_spec(m2, d2)), bad


def test_resample_history_written_in_kernel(interpret):
    """store_samples! semantics (utilities.jl:161-180): every stored
    trajectory row lands in the packed history exactly, and the
    n_initial prior-seed rows survive the fused run untouched."""
    from demcmc_tpu.sampler import _grow_history, init_state, run_scan
    model, de = _make_resample(burnin=5)
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    assert getattr(step, "resample_fused", False)
    state = step.to_fused(
        _grow_history(init_state(model, de, spec, 0), 12))
    state, ys = run_scan(step, state, 12)
    su = step.from_fused(state)
    h = np.asarray(su.history)
    traj = np.swapaxes(np.asarray(ys.theta), 1, 2)       # [T, C, d]
    ni = de.n_initial
    np.testing.assert_array_equal(h[ni:ni + 12], traj)
    seed = np.asarray(init_state(model, de, spec, 0).history)
    np.testing.assert_array_equal(h[:ni], seed)


def test_resample_superstep_and_thin_bitwise(interpret, monkeypatch):
    """K-superstep and emit='last' thin launches are bitwise identical
    to K single launches — including the per-iteration SMEM partner
    indices (folded per iteration, not per launch)."""
    from demcmc_tpu.sampler import _grow_history, init_state, run_scan
    model, de = _make_resample(burnin=5)
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    st = step.to_fused(_grow_history(init_state(model, de, spec, 0), 18))
    _, ys1 = run_scan(step, st, 18, progress_chunks=1)

    monkeypatch.setenv("DEMCMC_SUPER_K", "6")
    model2, de2 = _make_resample(burnin=5)
    step2 = build_step(model2, de2, spec)
    assert step2.superstep_k == 6
    st2 = step2.to_fused(
        _grow_history(init_state(model2, de2, spec, 0), 12))
    _, ys2 = run_scan(step2, st2, 12, progress_chunks=1)
    np.testing.assert_array_equal(np.asarray(ys1.theta[:12]),
                                  np.asarray(ys2.theta))
    np.testing.assert_array_equal(np.asarray(ys1.accept[:12]),
                                  np.asarray(ys2.accept))

    # thin=3 with SUPER_K=6 -> thin-SUPERSTEP launches of m=2 stored
    # draws (strided emit) + a single-draw remainder: 15 iters = 5
    # stored = 2 supers + 1 thin_step
    st3 = step2.to_fused(
        _grow_history(init_state(model2, de2, spec, 0), 15))
    _, ys3 = run_scan(step2, st3, 15, thin=3)
    np.testing.assert_array_equal(np.asarray(ys3.theta),
                                  np.asarray(ys1.theta[2:15:3]))
    np.testing.assert_array_equal(np.asarray(ys3.accept),
                                  np.asarray(ys1.accept[2:15:3]))


def test_resample_wide_superstep_and_thin_bitwise(interpret, monkeypatch):
    """WIDE-layout (C > 128) resample: K-superstep and thin launches
    are bitwise identical to single launches.  This is the exactness
    check for the wide window path — a K > 1 launch resolves partner
    draws that hit rows written EARLIER IN THE SAME LAUNCH through the
    in-kernel one-hot-gemm window gather, while the K=1 run resolves
    every draw through the XLA pre-gather; bitwise equality proves the
    two engines agree."""
    from demcmc_tpu.sampler import _grow_history, init_state, run_scan
    model, de = _make_resample(burnin=5, Np=4, n_groups=64)   # C = 256
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    assert fused_step.resample_layout(de) == (256, 1, 256)
    st = step.to_fused(_grow_history(init_state(model, de, spec, 0), 18))
    _, ys1 = run_scan(step, st, 18, progress_chunks=1)
    assert np.all(np.isfinite(np.asarray(ys1.lp)))

    monkeypatch.setenv("DEMCMC_SUPER_K", "6")
    model2, de2 = _make_resample(burnin=5, Np=4, n_groups=64)
    step2 = build_step(model2, de2, spec)
    assert step2.superstep_k == 6
    st2 = step2.to_fused(
        _grow_history(init_state(model2, de2, spec, 0), 12))
    _, ys2 = run_scan(step2, st2, 12, progress_chunks=1)
    np.testing.assert_array_equal(np.asarray(ys1.theta[:12]),
                                  np.asarray(ys2.theta))
    np.testing.assert_array_equal(np.asarray(ys1.accept[:12]),
                                  np.asarray(ys2.accept))

    st3 = step2.to_fused(
        _grow_history(init_state(model2, de2, spec, 0), 15))
    _, ys3 = run_scan(step2, st3, 15, thin=3)
    np.testing.assert_array_equal(np.asarray(ys3.theta),
                                  np.asarray(ys1.theta[2:15:3]))


def test_resample_wide_matches_xla(interpret, monkeypatch):
    """The wide fused DE-MCz path samples the same posterior as the XLA
    reference step at the same config (different PRNG streams —
    statistical agreement on moments)."""
    model, de = _make_resample(Np=3, n_groups=64, burnin=300,
                               n_initial=30)          # C = 192, wide
    fused = sample(model, de, 1300, key=7)
    monkeypatch.setenv("DEMCMC_FUSED", "off")
    model2, de2 = _make_resample(Np=3, n_groups=64, burnin=300,
                                 n_initial=30)
    ref = sample(model2, de2, 1300, key=7)
    for i in range(2):
        fm = float(fused.data[:, i, :].mean())
        rm = float(ref.data[:, i, :].mean())
        fs = float(fused.data[:, i, :].std())
        rs = float(ref.data[:, i, :].std())
        assert abs(fm - rm) < 0.08, (i, fm, rm)
        assert abs(fs - rs) < 0.08, (i, fs, rs)
    assert abs(float(fused.acceptance.mean())
               - float(ref.acceptance.mean())) < 0.1


def test_post_burnin_split_bitwise(interpret, monkeypatch):
    """The post-burnin kernel variant (predicated γ₂-burnin region
    statically dropped; run_scan switches at the boundary) is BITWISE
    identical to running the full kernel throughout — the dead u_b/g2
    draws keep the stream aligned (r5)."""
    model, de = _make(n_groups=8, burnin=37, discard_burnin=False,
                      theta_snooker=0.1)
    full = sample(model, de, 90, key=4)
    monkeypatch.setenv("DEMCMC_POST_SPLIT", "0")
    model2, de2 = _make(n_groups=8, burnin=37, discard_burnin=False,
                        theta_snooker=0.1)
    ref = sample(model2, de2, 90, key=4)
    np.testing.assert_array_equal(full.data, ref.data)
    # resume AFTER burnin starts directly on the post kernel
    monkeypatch.delenv("DEMCMC_POST_SPLIT")
    _, st = sample(model, de, 60, key=4, return_state=True)
    tail = sample(model, de, 30, key=4, state=st)
    np.testing.assert_array_equal(ref.data[-30:], tail.data)


def test_resample_stream_bitwise_vs_vmem(interpret, monkeypatch):
    """The HBM-streaming history engine (XLA pre-gather + VMEM write
    window; verdict r4 item 1) is BITWISE identical to the in-VMEM
    engine where both fit — single steps, supersteps, and the packed
    history itself — including launches whose partner draws hit rows
    written earlier in the SAME launch (the window path)."""
    from demcmc_tpu.sampler import _grow_history, init_state, run_scan

    def run(mode, n, thin=1, super_k=None):
        monkeypatch.setenv("DEMCMC_RESAMPLE_STREAM", mode)
        if super_k is not None:
            monkeypatch.setenv("DEMCMC_SUPER_K", str(super_k))
        model, de = _make_resample(burnin=5)
        spec = make_spec(model, de)
        step = build_step(model, de, spec)
        assert getattr(step, "resample_fused", False)
        st = step.to_fused(
            _grow_history(init_state(model, de, spec, 0), n))
        st, ys = run_scan(step, st, n, thin=thin)
        return (np.asarray(ys.theta), np.asarray(ys.accept),
                np.asarray(step.from_fused(st).history))

    # single-step launches (K=1: every partner row predates the launch)
    t0, a0, h0 = run("0", 14)
    t1, a1, h1 = run("1", 14)
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(a0, a1)
    np.testing.assert_array_equal(h0, h1)
    # superstep launches (K=6: late iterations draw partners from rows
    # written by earlier grid steps -> exercises the window overlay)
    t2, a2, h2 = run("0", 18, super_k=6)
    t3, a3, h3 = run("1", 18, super_k=6)
    np.testing.assert_array_equal(t2, t3)
    np.testing.assert_array_equal(h2, h3)
    # thin path (emit='last' / strided) under streaming
    t4, _, _ = run("0", 12, thin=3, super_k=6)
    t5, _, _ = run("1", 12, thin=3, super_k=6)
    np.testing.assert_array_equal(t4, t5)


def test_resample_resume_bitwise(interpret):
    """Resume is bitwise on the real chains, from BOTH state layouts:
    the unpacked [H, C, d] state sample() returns, and a raw
    fused-layout state (padded population + packed history slabs, what
    a mid-run checkpoint holds) — unpack -> grow -> repack is an exact
    round trip and the partner-index stream is iteration-keyed."""
    from demcmc_tpu.sampler import _grow_history, init_state, run_scan
    model, de = _make_resample(burnin=10, discard_burnin=False)
    full = sample(model, de, 60, key=9)
    _, st = sample(model, de, 30, key=9, return_state=True)
    assert st.fire is None                  # sample returns XLA layout
    tail = sample(model, de, 30, key=9, state=st)
    assert np.array_equal(full.data[-len(tail):], tail.data)
    # raw packed-layout resume (the checkpoint_every mid-run format)
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    st_p = step.to_fused(
        _grow_history(init_state(model, de, spec, 9), 30))
    st_p, _ = run_scan(step, st_p, 30)
    assert st_p.fire is not None and st_p.history.shape[-1] == 128
    tail2 = sample(model, de, 30, key=9, state=st_p)
    assert np.array_equal(full.data[-len(tail2):], tail2.data)


def test_resample_migration_resume_bitwise(interpret):
    """Packed-layout resume with MIGRATION on (multi-group resample,
    round 5) is bitwise too: the checkpointed look-ahead gate must
    survive the unpack -> grow -> repack round trip (to_fused's
    redrawn gate comes from a different stream)."""
    from demcmc_tpu.sampler import _grow_history, init_state, run_scan
    model, de = _make_resample(burnin=10, discard_burnin=False,
                               n_groups=4, Np=4, alpha=0.4)
    full = sample(model, de, 60, key=9)
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    assert getattr(step, "fused", False)
    st_p = step.to_fused(
        _grow_history(init_state(model, de, spec, 9), 30))
    st_p, _ = run_scan(step, st_p, 30)
    assert st_p.fire is not None
    tail = sample(model, de, 30, key=9, state=st_p)
    assert np.array_equal(full.data[-len(tail):], tail.data)


@pytest.mark.slow
def test_resample_fused_matches_oracle(interpret):
    """The fused DE-MCz path targets the right posterior (quadrature
    oracle, the role NUTS plays in multivariate_normal_tests.jl)."""
    model, de = _make_resample(Np=6, n_initial=40, burnin=500)
    chains = sample(model, de, 2500, key=11)
    ref = gaussian.posterior_grid(F32_DATA)
    means = chains.data.mean(axis=(0, 2))
    stds = chains.data.std(axis=(0, 2))
    assert abs(means[0] - ref["mu"]["mean"]) < 0.05
    assert abs(means[1] - ref["sigma"]["mean"]) < 0.05
    assert abs(stds[0] - ref["mu"]["std"]) < 0.05
    assert abs(stds[1] - ref["sigma"]["std"]) < 0.05
    assert 0.1 < chains.acceptance.mean() < 0.9


def test_lgamma_override_accuracy():
    """The in-kernel lgamma replacement (shift-up + Stirling) tracks
    scipy's float64 gammaln to f32 precision over the zoo's range."""
    from scipy.special import gammaln
    x = np.concatenate([np.linspace(0.05, 2, 200),
                        np.linspace(2, 50, 300),
                        np.linspace(50, 5000, 200),
                        # the fixed 8-term shift overflowed the f32
                        # product here and returned -inf (review r4)
                        np.geomspace(5e3, 1e6, 100)]).astype(np.float32)
    got = np.asarray(fused_step._lgamma32(jax.numpy.asarray(x)))
    want = gammaln(x.astype(np.float64))
    assert np.isfinite(got).all()
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1.0)
    assert rel.max() < 1e-5


def test_fused_discrete_binomial_matches_xla(interpret, monkeypatch):
    """Integer-parameter (round-and-cast, utilities.jl:360-369) models
    fuse: chains stay integral and the posterior matches the XLA step."""
    from demcmc_tpu.models import discrete_binomial
    model, de = discrete_binomial.make(key=0, n_obs=60, Np=8, n_groups=16,
                                       burnin=300, dtype=np.float32)
    spec = make_spec(model, de)
    assert spec.has_int and fused_step.supported(model, de, spec)
    step = build_step(model, de, spec)
    assert getattr(step, "fused", False)
    ch = sample(model, de, 900, key=3)
    N = ch.group("N")
    assert np.all(N == np.round(N))          # in-kernel integer snap
    monkeypatch.setenv("DEMCMC_FUSED", "off")
    m2, d2 = discrete_binomial.make(key=0, n_obs=60, Np=8, n_groups=16,
                                    burnin=300, dtype=np.float32)
    ch2 = sample(m2, d2, 900, key=3)
    assert abs(N.mean() - ch2.group("N").mean()) < 1.0
    assert abs(ch.mean("p") - ch2.mean("p")) < 0.05


@pytest.mark.slow
def test_fused_pseudo_marginal_matches_conjugate(interpret):
    """Stochastic (pseudo-marginal) models with a declared noise panel
    fuse: fresh in-kernel uniforms drive the inverse-CDF simulation and
    the chain still targets the exact conjugate posterior (the
    Andrieu-Roberts guarantee)."""
    from demcmc_tpu.models import binomial
    model, de = binomial.make(N=10, k=6, abc=True, fresh_noise=True,
                              n_sim=400, Np=8, n_groups=16, burnin=300)
    spec = make_spec(model, de)
    assert model.stochastic and fused_step.supported(model, de, spec)
    step = build_step(model, de, spec)
    assert getattr(step, "fused", False)
    ch = sample(model, de, 1200, key=7)
    truth = binomial.conjugate_posterior(10, 6)
    assert abs(ch.mean("theta") - truth["mean"]) < 0.03
    assert abs(float(ch.data.std()) - truth["std"]) < 0.03
    assert 0.2 < ch.acceptance.mean() < 0.95


def test_fused_stochastic_requires_noise_panel(interpret):
    """Without DEModel.noise_shape a stochastic model stays on the XLA
    path (its density draws from a key, not replayable in-kernel)."""
    from demcmc_tpu.models import abc_kde
    model, de = abc_kde.make(key=3, n_obs=50, n_sim=200, Np=8,
                             n_groups=16, burnin=100, fresh_noise=True)
    spec = make_spec(model, de)
    assert model.stochastic and model.noise_shape is None
    assert not fused_step.supported(model, de, spec)


def test_f64_model_falls_back(interpret):
    """x64 data traces f64 ops: the fused build must refuse and fall back
    to the XLA step rather than produce a wrong-dtype kernel."""
    data64 = np.asarray(F32_DATA, np.float64)
    model, de = _make()
    model = gaussian.make_model(jax.numpy.asarray(data64))
    spec = make_spec(model, de)
    if not fused_step.supported(model, de, spec):
        pytest.skip("f64 refused statically")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        step = build_step(model, de, spec)
    assert not getattr(step, "fused", False)
    assert any("fused step unavailable" in str(x.message) for x in w)


# ---------------------------------------------------------------------------
# in-kernel migration: exactness against a numpy oracle of the reference
# semantics (src/migration.jl:11-91), and superstep bitwise equivalence
# ---------------------------------------------------------------------------

def _np_migration_oracle(theta, w, u, n_act, gum):
    """Reference migration in numpy: ranks of ``u`` (ties by index) pick
    the first ``n_act`` groups; victim per group = argmax(gum - w)
    (first index on ties); rank r's victim slot receives the victim of
    rank (r-1) mod n_act.  theta [G,Np,d], w [G,Np], u [G], gum [G,Np]."""
    G, Np, d = theta.shape
    order = np.lexsort((np.arange(G), u))     # u asc, ties by index
    rank = np.empty(G, int)
    rank[order] = np.arange(G)
    s = gum - w
    vid = np.argmax(s, axis=1)                # first max index
    new_theta, new_w = theta.copy(), w.copy()
    for g in range(G):
        r = rank[g]
        if r >= n_act:
            continue
        src_g = order[(r - 1) % n_act]
        new_theta[g, vid[g]] = theta[src_g, vid[src_g]]
        new_w[g, vid[g]] = w[src_g, vid[src_g]]
    return new_theta, new_w


def _pack(x, d, R, Cf):
    return np.ascontiguousarray(x.reshape(-1, d).T.reshape(d, R, Cf))


def _run_mig_kernel(theta, w, u, n_act, gum, interpret=True,
                    variant="onehot"):
    G, Np, d = theta.shape
    C = G * Np
    R, Cf = 8, C // 8
    Gr = Cf // Np
    t3 = _pack(theta.astype(np.float32), d, R, Cf)
    w3 = w.astype(np.float32).reshape(R, Cf)
    # the kernel ranks group g by its LEADER lane's per-chain uniform:
    # scatter u[g] to (row g // Gr, lane (g % Gr)·Np) and poison every
    # other lane — a compaction accidentally reading non-leader lanes
    # would be unmissable
    u_row = np.full((R, Cf), 777.0, np.float32)
    gs = np.arange(G)
    u_row[gs // Gr, (gs % Gr) * Np] = u.astype(np.float32)
    kern = fused_step.build_migration_kernel(G, Np, d, interpret=interpret,
                                             variant=variant)
    nt, nw = jax.jit(kern)(t3, w3, u_row,
                           np.float32(n_act).reshape(1, 1),
                           gum.astype(np.float32).reshape(R, Cf))
    nt = np.asarray(nt).reshape(d, C).T.reshape(G, Np, d)
    return nt, np.asarray(nw).reshape(G, Np)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_in_kernel_migration_matches_oracle(interpret, seed):
    """The in-kernel migration must be EXACTLY the reference permutation:
    bitwise-equal particle copies (one-hot matmuls at HIGHEST precision),
    correct rank cycle, correct Gumbel-max victims, -inf weights ride
    along unchanged."""
    rng_ = np.random.default_rng(seed)
    G, Np, d = 32, 4, 3
    theta = (rng_.standard_normal((G, Np, d)) * 1e3
             + rng_.random((G, Np, d)) * 1e-4).astype(np.float32)
    w = rng_.standard_normal((G, Np)).astype(np.float32)
    w[rng_.random((G, Np)) < 0.1] = -np.inf   # -inf weights in play
    u = rng_.random(G).astype(np.float32)
    gum = rng_.gumbel(size=(G, Np)).astype(np.float32)
    n_act = int(rng_.integers(2, G + 1))

    got_t, got_w = _run_mig_kernel(theta, w, u, n_act, gum)
    want_t, want_w = _np_migration_oracle(theta, w, u, n_act, gum)
    np.testing.assert_array_equal(got_t, want_t)
    np.testing.assert_array_equal(got_w, want_w)


def test_in_kernel_migration_multiset(interpret):
    """Population multiset is preserved (migration only permutes)."""
    rng_ = np.random.default_rng(7)
    G, Np, d = 64, 8, 2
    theta = rng_.standard_normal((G, Np, d)).astype(np.float32)
    w = rng_.standard_normal((G, Np)).astype(np.float32)
    u = rng_.random(G).astype(np.float32)
    gum = rng_.gumbel(size=(G, Np)).astype(np.float32)
    got_t, got_w = _run_mig_kernel(theta, w, u, G, gum)
    flat_in = np.concatenate([theta.reshape(-1, d), w.reshape(-1, 1)], 1)
    flat_out = np.concatenate([got_t.reshape(-1, d), got_w.reshape(-1, 1)],
                              1)
    order_in = np.lexsort(flat_in.T)
    order_out = np.lexsort(flat_out.T)
    np.testing.assert_array_equal(flat_in[order_in], flat_out[order_out])


@pytest.mark.parametrize("seed,G,Np", [(0, 64, 4), (1, 1024, 4),
                                       (2, 128, 6), (3, 2048, 16),
                                       (4, 4096, 3),
                                       (5, 24, 8), (6, 192, 4),
                                       (7, 320, 5)])
def test_sorted_migration_matches_oracle(interpret, seed, G, Np):
    """The bitonic rank-network migration (the default in-kernel
    variant) computes EXACTLY the reference permutation — same oracle
    as the one-hot variant — including ±inf weights (select-only
    transport carries any bit pattern; +inf covers min-mode
    optimization scores) and non-power-of-two Np.  G=1024/Np=4 and
    G=2048/Np=16 take the compact geometry (gemm compress/widen since
    round 5) with the UNROLLED network, G=4096/Np=3 the compact
    geometry with the LOOP-ROLLED network (dynamic rotates — the
    production path for the 65k-chain configs), the others the
    strided one.  G ∈ {24, 192, 320} have NON-power-of-two Gr = G//8
    (3, 24, 40): the compact lattice pads to the next power of two with
    +inf-keyed virtual elements (universal in-kernel migration, round
    4) — bitexactness here proves pads never mix with real groups."""
    rng_ = np.random.default_rng(seed)
    d = 3
    theta = (rng_.standard_normal((G, Np, d)) * 1e3
             + rng_.random((G, Np, d)) * 1e-4).astype(np.float32)
    w = rng_.standard_normal((G, Np)).astype(np.float32)
    w[rng_.random((G, Np)) < 0.1] = -np.inf
    w[rng_.random((G, Np)) < 0.05] = np.inf
    u = rng_.random(G).astype(np.float32)
    gum = rng_.gumbel(size=(G, Np)).astype(np.float32)
    n_act = int(rng_.integers(2, G + 1))

    got_t, got_w = _run_mig_kernel(theta, w, u, n_act, gum,
                                   variant="sorted")
    want_t, want_w = _np_migration_oracle(theta, w, u, n_act, gum)
    np.testing.assert_array_equal(got_t, want_t)
    np.testing.assert_array_equal(got_w, want_w)


def test_sorted_gemm_matches_barrel_geometry(interpret):
    """Where Gr % 128 == 0 the compact compress/widen run as exact
    one-hot MXU gemms (the round-5 default — ±inf weights ride 0/1
    flag columns through the dots); results must be IDENTICAL to the
    barrel-shift geometry (``force_barrel=True``).  (1024, 4) is the
    plain power-of-two case, (3072, 3) composes the gemm with the
    padded non-power-of-two lattice (Gr=384)."""
    rng_ = np.random.default_rng(11)
    for G, Np in [(1024, 4), (3072, 3)]:
        d, R = 3, 8
        C = G * Np
        Cf = C // R
        t3 = rng_.standard_normal((d, R, Cf)).astype(np.float32)
        w = rng_.standard_normal((R, Cf)).astype(np.float32)
        w.flat[rng_.choice(w.size, 20, replace=False)] = -np.inf
        w.flat[rng_.choice(w.size, 10, replace=False)] = np.inf
        u = rng_.random((R, Cf)).astype(np.float32)
        na = np.array([[5.0]], np.float32)
        gum = rng_.gumbel(size=(R, Cf)).astype(np.float32)
        args = (t3, w, u, na, gum)
        k_gemm = fused_step.build_migration_kernel(
            G, Np, d, interpret=True, variant="sorted")
        k_barrel = fused_step.build_migration_kernel(
            G, Np, d, interpret=True, variant="sorted", force_barrel=True)
        nt1, nw1 = jax.jit(k_gemm)(*args)
        nt2, nw2 = jax.jit(k_barrel)(*args)
        np.testing.assert_array_equal(np.asarray(nt1), np.asarray(nt2))
        np.testing.assert_array_equal(np.asarray(nw1), np.asarray(nw2))
        assert not np.array_equal(np.asarray(nt1), t3)   # moved


def test_mig_ik_size_cutoff_routes_coalesced(interpret, monkeypatch):
    """Above ``MIG_IK_MAX_G`` (the measured kernel-size cliff, G=8192
    on v5e) single-device α > 0 configs route migration through the
    COALESCED XLA exchange — keeping the K-superstep — while
    α >= MIG_IK_MIN_ALPHA stays in-kernel (cheaper fired events win the
    unfired penalty back; α is static).  Exercised at a small patched
    cutoff; the coalesced run must also sample correctly."""
    monkeypatch.setenv("DEMCMC_MIG_IK_MAX_G", "8")
    recorded = []
    orig = fused_step.build_fused_step

    def rec(model, de, spec, **kw):
        recorded.append(kw.get("mig_in_kernel"))
        return orig(model, de, spec, **kw)

    monkeypatch.setattr(fused_step, "build_fused_step", rec)

    # low α, G=32 > patched cutoff: coalesced (mig_in_kernel=False)
    model, de = _make(alpha=0.01, burnin=100)
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    assert getattr(step, "fused", False)
    assert recorded and recorded[0] is False
    assert step.get_superstep() is not None          # superstep kept
    c = sample(model, de, 300, key=3)
    assert np.all(np.isfinite(c.data))

    # high α: in-kernel wins the crossover despite G > cutoff
    recorded.clear()
    model2, de2 = _make(alpha=0.2, burnin=100)
    build_step(model2, de2, make_spec(model2, de2))
    assert recorded and recorded[0] is True


def test_mig_variants_bitwise_equal_end_to_end(interpret, monkeypatch):
    """The sorted (default) and one-hot (fallback) in-kernel variants
    must produce BITWISE identical chains — both consume the same draws
    and implement the same permutation, so the whole trajectory
    matches."""
    model, de = _make(alpha=0.5, burnin=100)
    c1 = sample(model, de, 320, key=9)                # sorted (default)
    monkeypatch.setattr(fused_step, "mig_sorted_ok",
                        lambda G, Np: False)          # force one-hot
    model2, de2 = _make(alpha=0.5, burnin=100)
    c2 = sample(model2, de2, 320, key=9)
    assert np.array_equal(c1.data, c2.data)
    assert np.array_equal(c1.acceptance, c2.acceptance)


def test_onehot_mig_superstep_bitwise(interpret, monkeypatch):
    """The one-hot fallback variant (non-power-of-two layouts) also
    keeps the K-superstep: a SUPER_K-iteration launch is bitwise
    identical to single steps.  (The sorted default's superstep is
    covered by test_superstep_bitwise_equals_single_steps.)"""
    monkeypatch.setattr(fused_step, "mig_sorted_ok", lambda G, Np: False)
    model, de = _make(burnin=100, alpha=0.3)
    c1 = sample(model, de, 320, key=5)
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    assert step.get_superstep() is not None
    step.get_superstep = lambda: None       # force single-step scans
    step._scan_jit_cache.clear()
    c2 = sample(model, de, 320, key=5)
    assert np.array_equal(c1.data, c2.data)
    assert np.array_equal(c1.acceptance, c2.acceptance)


def test_big_g_migration_gate_styles_bitwise_equal(interpret, monkeypatch):
    """For G > MIG_MAX_G the XLA migration may ride a lax.cond OR run
    branchless (mask-applied); the two must be bitwise identical — the
    on-chip choice between them is purely a perf measurement
    (validation/mig_gate_bench.py).  (The sorted in-kernel variant is
    disabled here so the XLA fallback paths actually run.)"""
    monkeypatch.setattr(fused_step, "MIG_MAX_G", 16)
    monkeypatch.setattr(fused_step, "mig_sorted_ok", lambda G, Np: False)
    monkeypatch.setenv("DEMCMC_MIG_GATE", "cond")
    model, de = _make(alpha=0.5, burnin=100)      # G=32 > patched max
    c1 = sample(model, de, 300, key=5)
    monkeypatch.setenv("DEMCMC_MIG_GATE", "branchless")
    model2, de2 = _make(alpha=0.5, burnin=100)
    c2 = sample(model2, de2, 300, key=5)
    assert np.array_equal(c1.data, c2.data)
    assert np.array_equal(c1.acceptance, c2.acceptance)


def test_superstep_bitwise_equals_single_steps(interpret):
    """A SUPER_K-iteration kernel launch must be bitwise identical to
    SUPER_K single-iteration launches (per-iteration PRNG seeding)."""
    model, de = _make(burnin=100, alpha=0.3)
    c1 = sample(model, de, 320, key=5)
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    assert step.get_superstep() is not None
    step.get_superstep = lambda: None       # force single-step scans
    step._scan_jit_cache.clear()
    c2 = sample(model, de, 320, key=5)
    assert np.array_equal(c1.data, c2.data)
    assert np.array_equal(c1.acceptance, c2.acceptance)


def test_fused_blocked_untouched_dims_frozen(interpret):
    """A single block covering only mu (beta=0, eps inside the block
    machinery still applies to mu) must leave sigma EXACTLY at its
    initial per-chain value — the reset! mask reverts non-block dims
    every iteration (crossover.jl:336-352)."""
    from demcmc_tpu.sampler import init_state

    model, de = _make(blocking_on=True, blocks=[[True, False]],
                      beta=0.0, alpha=0.0,    # mutation AND migration off:
                      burnin=10,              # both legitimately move
                      discard_burnin=False)   # whole particles across dims
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    assert getattr(step, "fused", False)
    state0 = init_state(model, de, spec, key=4)
    sigma0 = np.asarray(state0.theta)[:, :, 1].reshape(-1)   # [C]
    c = sample(model, de, 60, key=4)
    i_mu, i_sig = c.names.index("mu"), c.names.index("sigma")
    sig = c.data[:, i_sig, :]                                # [Ns, C]
    # every stored draw of sigma equals the initial population value
    assert np.array_equal(sig, np.broadcast_to(sigma0, sig.shape))
    # while mu actually moved
    mu = c.data[:, i_mu, :]
    assert not np.array_equal(mu[0], mu[-1])


@pytest.mark.slow
def test_fused_blocked_posterior_matches_oracle(interpret):
    """Blocked fused sampling (2 identity blocks, the reference's
    blocking_tests.jl:47-75 shape) recovers the Gaussian posterior."""
    from demcmc_tpu.models import gaussian as gmod

    model, de = _make(blocking_on=True,
                      blocks=[[True, False], [False, True]],
                      burnin=500)
    c = sample(model, de, 2500, key=13)
    ref = gmod.posterior_grid(np.asarray(model.data, np.float64))
    assert abs(c.mean("mu") - ref["mu"]["mean"]) < 0.03
    assert abs(c.mean("sigma") - ref["sigma"]["mean"]) < 0.03
    assert abs(c.std("mu") - ref["mu"]["std"]) < 0.02
    assert abs(c.std("sigma") - ref["sigma"]["std"]) < 0.02


def test_resample_migration_fused_matches_xla(interpret, monkeypatch):
    """Multi-group resample with migration (alpha > 0) runs the fused
    kernel since round 5 — real groups are the row-0 prefix of the
    nominal migration grid, pad groups rank last.  Statistical match vs
    the XLA step at the same config (different PRNG streams)."""
    model, de = _make_resample(Np=4, n_groups=8, alpha=0.3,
                               n_initial=30, burnin=300)
    spec = make_spec(model, de)
    assert fused_step.supported(model, de, spec)
    step = build_step(model, de, spec)
    assert getattr(step, "fused", False)
    fused = sample(model, de, 1300, key=7)
    monkeypatch.setenv("DEMCMC_FUSED", "off")
    model2, de2 = _make_resample(Np=4, n_groups=8, alpha=0.3,
                                 n_initial=30, burnin=300)
    ref = sample(model2, de2, 1300, key=7)
    for i in range(2):
        assert abs(float(fused.data[:, i, :].mean())
                   - float(ref.data[:, i, :].mean())) < 0.08, i
        assert abs(float(fused.data[:, i, :].std())
                   - float(ref.data[:, i, :].std())) < 0.08, i
    assert abs(float(fused.acceptance.mean())
               - float(ref.acceptance.mean())) < 0.1


def test_resample_wide_migration_smoke(interpret):
    """WIDE resample + migration composes too (nominal grid G=1024 ->
    sorted gemm-compact variant): short run stays finite with sane
    acceptance."""
    model, de = _make_resample(Np=4, n_groups=64, alpha=0.3,
                               n_initial=30, burnin=60)   # C = 256
    spec = make_spec(model, de)
    assert fused_step.supported(model, de, spec)
    step = build_step(model, de, spec)
    assert getattr(step, "fused", False)
    c = sample(model, de, 150, key=3)
    assert np.all(np.isfinite(c.data))
    assert 0.05 < float(c.acceptance.mean()) < 0.95


def test_resample_blocked_untouched_dims_frozen(interpret):
    """Blocked RESAMPLE sweeps run in-kernel since round 5 (per-block
    partner-draw sets).  A single block covering only mu must leave
    sigma exactly at its initial value — reset! semantics over the
    history-partner proposal."""
    from demcmc_tpu.sampler import init_state

    model, de = _make_resample(blocking_on=True, blocks=[[True, False]],
                               beta=0.0, burnin=10,
                               discard_burnin=False)
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    assert getattr(step, "fused", False)
    state0 = init_state(model, de, spec, key=4)
    sigma0 = np.asarray(state0.theta)[:, :, 1].reshape(-1)
    c = sample(model, de, 60, key=4)
    sig = c.data[:, c.names.index("sigma"), :]
    assert np.array_equal(sig, np.broadcast_to(sigma0, sig.shape))
    mu = c.data[:, c.names.index("mu"), :]
    assert not np.array_equal(mu[0], mu[-1])


@pytest.mark.slow
def test_resample_blocked_posterior_matches_oracle(interpret):
    """Blocked + resample + snooker (all three compose in the
    reference: blocking_tests.jl shape with the de.sample slot) targets
    the right posterior on the fused path."""
    model, de = _make_resample(Np=6, n_initial=40, burnin=500,
                               blocking_on=True,
                               blocks=[[True, False], [False, True]])
    chains = sample(model, de, 2500, key=11)
    ref = gaussian.posterior_grid(F32_DATA)
    means = chains.data.mean(axis=(0, 2))
    stds = chains.data.std(axis=(0, 2))
    assert abs(means[0] - ref["mu"]["mean"]) < 0.05
    assert abs(means[1] - ref["sigma"]["mean"]) < 0.05
    assert abs(stds[0] - ref["mu"]["std"]) < 0.05
    assert abs(stds[1] - ref["sigma"]["std"]) < 0.05
    assert 0.1 < chains.acceptance.mean() < 0.9


@pytest.mark.slow
def test_packed_replications_match_oracles(interpret):
    """sample_replicated_packed: R runs as ONE fused population.  Each
    replication's posterior must match ITS OWN dataset's quadrature
    oracle — cross-replication data leakage (wrong chain/data packing)
    or PRNG coupling would show immediately."""
    from demcmc_tpu.models import gaussian as gmod
    from demcmc_tpu.sampler import sample_replicated_packed

    rng_ = np.random.default_rng(9)
    # well-separated replication means so a packing mixup is unmissable
    mus = np.array([-3.0, 0.0, 4.0])
    datasets = np.stack([
        rng_.normal(m, 1.0, 40).astype(np.float32) for m in mus])
    de = gmod.DE(bounds=gmod.BOUNDS, Np=4, n_groups=16, burnin=500,
                 alpha=0.0)
    reps = sample_replicated_packed(gmod.make_model, de, 2000,
                                    datasets, key=3)
    assert len(reps) == 3
    for r, chains in enumerate(reps):
        ref = gmod.posterior_grid(np.asarray(datasets[r], np.float64))
        assert abs(chains.mean("mu") - ref["mu"]["mean"]) < 0.05, r
        assert abs(chains.mean("sigma") - ref["sigma"]["mean"]) < 0.05, r


@pytest.mark.slow
def test_packed_replications_alpha_replication_local(interpret):
    """alpha > 0 packed runs migrate REPLICATION-LOCALLY (verdict r4
    item 5): each replication's posterior still matches ITS OWN
    dataset's quadrature oracle at the reference's default migration
    rate — a cross-replication exchange would drag the well-separated
    means toward each other, and a broken replay law would bias the
    spread."""
    from demcmc_tpu.models import gaussian as gmod
    from demcmc_tpu.sampler import sample_replicated_packed

    rng_ = np.random.default_rng(4)
    mus = np.array([-4.0, 3.0])
    datasets = np.stack([
        rng_.normal(m, 1.0, 40).astype(np.float32) for m in mus])
    de = gmod.DE(bounds=gmod.BOUNDS, Np=4, n_groups=8, burnin=400,
                 alpha=0.1)
    reps = sample_replicated_packed(gmod.make_model, de, 1600,
                                    datasets, key=6)
    for r, chains in enumerate(reps):
        ref = gmod.posterior_grid(np.asarray(datasets[r], np.float64))
        assert abs(chains.mean("mu") - ref["mu"]["mean"]) < 0.06, r
        assert abs(chains.std("mu") - ref["mu"]["std"]) < 0.04, r
        assert abs(chains.mean("sigma") - ref["sigma"]["mean"]) < 0.06, r


def test_packed_replication_migration_stays_local(interpret):
    """Migration at alpha=1 (an exchange EVERY iteration) never moves a
    particle across replications: with well-separated datasets (mu at
    -5 vs +5), a cross-replication exchange would plant a wrong-region
    particle directly into the trajectory (migration bypasses MH), so
    every post-burnin mu draw staying in its own region pins the
    block-diagonal law."""
    from demcmc_tpu import DE
    from demcmc_tpu.models import gaussian as gmod
    from demcmc_tpu.sampler import sample_replicated_packed

    rng_ = np.random.default_rng(1)
    datasets = np.stack([rng_.normal(m, 0.5, 40).astype(np.float32)
                         for m in (-5.0, 5.0)])
    de = DE(bounds=gmod.BOUNDS, Np=4, n_groups=4, burnin=80,
            alpha=1.0)
    reps = sample_replicated_packed(gmod.make_model, de, 200,
                                    datasets, key=2)
    mu0 = reps[0].group("mu")
    mu1 = reps[1].group("mu")
    assert mu0.max() < 0.0, mu0.max()
    assert mu1.min() > 0.0, mu1.min()


def test_fused_optimize_rastrigin_min(interpret):
    """Greedy minimize + evaluate_fun fuse (utilities.jl:113-120,220-226):
    f32 Rastrigin reaches the 0 optimum through the kernel path."""
    from demcmc_tpu.models import rastrigin
    from demcmc_tpu.optimize import get_optimal, optimize

    model, de = rastrigin.make(n_dim=2, Np=4, n_groups=32,
                               dtype=np.float32)
    spec = make_spec(model, de)
    assert fused_step.supported(model, de, spec)
    step = build_step(model, de, spec)
    assert getattr(step, "fused", False)
    pop = optimize(model, de, 800, key=3)
    _, best = get_optimal(de, model, pop)
    assert best < 1e-3
    assert np.isfinite(pop.weight).all()


def test_fused_optimize_superstep_bitwise(interpret):
    """alpha=0 optimization takes the collect=False superstep (one
    launch per K iterations, trajectories discarded) — final population
    must equal the single-step path to the bit."""
    from demcmc_tpu.models import rastrigin
    from demcmc_tpu.optimize import optimize

    model, de = rastrigin.make(n_dim=2, Np=4, n_groups=32,
                               dtype=np.float32, alpha=0.0)
    pop1 = optimize(model, de, 64, key=3)
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    assert step.get_superstep() is not None
    step.get_superstep = lambda: None       # force single-step scans
    step._scan_jit_cache.clear()
    pop2 = optimize(model, de, 64, key=3)
    np.testing.assert_array_equal(pop1.theta, pop2.theta)
    np.testing.assert_array_equal(pop1.weight, pop2.weight)


def test_fused_optimize_gaussian_mle_max(interpret):
    """Greedy maximize MLE through the kernel: recovers mean/std(ddof=0)
    of the data (the reference's optimization_tests.jl:46-103 check, at
    f32-appropriate tolerance)."""
    from demcmc_tpu.optimize import get_optimal, optimize

    model, de = _make(Np=4, n_groups=32, update_particle="maximize",
                      evaluate_fitness="fun")
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    assert getattr(step, "fused", False)
    pop = optimize(model, de, 600, key=2)
    theta, _ = get_optimal(de, model, pop)
    assert abs(float(theta["mu"]) - F32_DATA.mean()) < 5e-3
    assert abs(float(theta["sigma"]) - F32_DATA.std()) < 5e-3


def test_thin_superstep_bitwise_equals_inner_scan(interpret):
    """thin > 1 on the fused path takes ONE emit='last' kernel launch
    per stored draw; chains must equal the launch-per-iteration inner
    scan bitwise (same per-iteration PRNG seeding, last-iteration
    trajectory values)."""
    model, de = _make(burnin=100, alpha=0.3, discard_burnin=False)
    c1 = sample(model, de, 320, key=5, thin=4)
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    assert step.get_thin_step(4) is not None
    step.get_thin_step = lambda t: None     # force the inner-scan path
    step._scan_jit_cache.clear()
    c2 = sample(model, de, 320, key=5, thin=4)
    assert np.array_equal(c1.data, c2.data)
    assert np.array_equal(c1.acceptance, c2.acceptance)
    assert np.array_equal(c1.lp, c2.lp)


def test_superstep_k_env_override_bitwise(interpret, monkeypatch):
    """DEMCMC_SUPER_K=16 (the on-chip K-scan knob) must stay bitwise
    identical to the default K=8 supersteps — any K is just a different
    launch batching of the same per-iteration PRNG stream."""
    model, de = _make(burnin=100, alpha=0.3)
    c1 = sample(model, de, 320, key=5)
    monkeypatch.setenv("DEMCMC_SUPER_K", "16")
    model2, de2 = _make(burnin=100, alpha=0.3)   # fresh step cache
    spec2 = make_spec(model2, de2)
    step2 = build_step(model2, de2, spec2)
    assert step2.get_superstep() is not None
    assert step2.superstep_k == 16
    c2 = sample(model2, de2, 320, key=5)
    assert np.array_equal(c1.data, c2.data)
    assert np.array_equal(c1.acceptance, c2.acceptance)


@pytest.mark.tpu
@pytest.mark.parametrize("variant,G,Np", [
    ("onehot", 32, 4),        # [G, G] one-hot matrices
    ("sorted", 32, 4),        # strided UNROLLED network
    ("sorted", 1024, 4),      # compact-unrolled (barrel-compress/widen)
    ("sorted", 4096, 3),      # compact LOOP-ROLLED (dynamic rotates) —
    #                           the production path for 65k-chain configs
    ("sorted", 192, 4),       # padded-compact (non-power-of-two Gr=24)
    ("sorted", 320, 5),       # padded-compact (Gr=40 -> 64)
])
def test_in_kernel_migration_bitexact_on_tpu(variant, G, Np):
    """On-chip run of the oracle test over EVERY migration geometry:
    catches MXU rounding (the one-hot contractions must be exact at
    Precision.HIGHEST on real hardware) and real-lowering divergence of
    the sorted rank network — the compact barrel-compress/scatter-widen
    path, the loop-rolled dynamic-rotate network, and the round-4
    padded-compact lattice are exactly the construct classes the
    probe_mosaic scripts show can diverge or crash under real Mosaic
    lowering (ADVICE r3)."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU")
    rng_ = np.random.default_rng(3)
    d = 3
    theta = (rng_.standard_normal((G, Np, d)) * 1e3
             + rng_.random((G, Np, d)) * 1e-4).astype(np.float32)
    w = rng_.standard_normal((G, Np)).astype(np.float32)
    u = rng_.random(G).astype(np.float32)
    gum = rng_.gumbel(size=(G, Np)).astype(np.float32)
    n_act = min(17, G)
    got_t, got_w = _run_mig_kernel(theta, w, u, n_act, gum,
                                   interpret=False, variant=variant)
    want_t, want_w = _np_migration_oracle(theta, w, u, n_act, gum)
    np.testing.assert_array_equal(got_t, want_t)
    np.testing.assert_array_equal(got_w, want_w)


def test_gaussian_batched_density_shift_invariant():
    """The folded sufficient-statistics density must agree with the
    elementwise sum for NON-CENTERED data (raw second moments cancel
    catastrophically in f32 at data ~ N(1000, 1); the centered folding
    must not)."""
    rng_ = np.random.default_rng(0)
    for loc in (0.0, 1000.0, -5000.0):
        data = np.asarray(rng_.normal(loc, 1.0, 50), np.float32)
        mu = np.asarray(loc + rng_.normal(0, 1, (8, 16)), np.float32)
        sigma = np.asarray(np.exp(rng_.normal(0, 0.2, (8, 16))), np.float32)
        got = np.asarray(gaussian.loglike_batched(data, mu, sigma))
        want = np.stack([
            [float(gaussian.loglike(np.asarray(data, np.float64),
                                    float(mu[i, j]), float(sigma[i, j])))
             for j in range(16)] for i in range(8)])
        # f32 density vs f64 oracle: a few f32 ulps at |logp| ~ 200
        # (pre-fix errors at loc=1000 were O(1-2) — MH-delta scale)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=0.02)


def test_mig_gate_env_in_step_cache_key(interpret, monkeypatch):
    """A DEMCMC_MIG_GATE change between calls on the SAME model must
    rebuild the step — the big-G gate style is baked into the wrapped
    step, so it lives in build_step's cache key (like DEMCMC_SUPER_K).
    (mig_sorted_ok is disabled so the big-G XLA gate path is actually
    built — with the sorted default this test would otherwise pass
    vacuously through the in-kernel path.)"""
    monkeypatch.setattr(fused_step, "MIG_MAX_G", 16)
    monkeypatch.setattr(fused_step, "mig_sorted_ok", lambda G, Np: False)
    monkeypatch.setenv("DEMCMC_MIG_GATE", "cond")
    model, de = _make(alpha=0.5, burnin=100)      # G=32 > patched max
    spec = make_spec(model, de)
    s1 = build_step(model, de, spec)
    assert s1 is build_step(model, de, spec)      # stable within a style
    monkeypatch.setenv("DEMCMC_MIG_GATE", "branchless")
    assert build_step(model, de, spec) is not s1


def test_non_threefry_prng_impl_falls_back(interpret):
    """A non-threefry default PRNG impl (e.g. partitionable rbg) must
    reject the fused path — the kernel's (key, iteration) seeding and the
    sharded wrapper's wrap_key_data assume 2-word threefry key data."""
    model, de = _make()
    spec = make_spec(model, de)
    assert fused_step.supported(model, de, spec)
    try:
        jax.config.update("jax_default_prng_impl", "rbg")
        assert not fused_step.supported(model, de, spec)
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")


def test_raw_key_rejects_foreign_key_width():
    """An explicitly-passed 4-word (rbg) key must raise a clear error on
    the fused path instead of being silently truncated to 2 words."""
    from demcmc_tpu.sampler import _raw_key
    with pytest.raises(ValueError, match="threefry"):
        _raw_key(jax.random.key(0, impl="rbg"))
