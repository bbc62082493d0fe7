"""On-chip check of the fused resample (DE-MCz) path.

Three gates, in order of strictness:

1. the kernel COMPILES on the real Mosaic pipeline (the interpret-mode
   tests cannot prove this: dynamic rolls, ref middle-index loads, SMEM
   scalar indexing and ANY<->VMEM DMAs all have chip-only failure modes);
2. the history mechanics are EXACT on chip: every emitted trajectory row
   equals its history row, prior-seed rows survive (a pure mechanical
   invariant, independent of the PRNG source);
3. the posterior matches the quadrature oracle, and the flagship MVN
   configuration (multivariate_normal_tests.jl:49-69 shape) runs at
   fused speed — the per-iteration wall time is printed.

Run ALONE on the TPU (one process; see .claude/skills/verify/SKILL.md).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

import demcmc_tpu as dm
from demcmc_tpu.models import gaussian, mvnormal
from demcmc_tpu.sampler import (_grow_history, build_step, init_state,
                                make_spec, run_scan)


def check_mechanics():
    f32 = np.asarray(np.random.default_rng(3).normal(0, 1, 50), np.float32)
    model, de = gaussian.make(data=f32, Np=4, n_groups=1, alpha=0.0,
                              sample="resample", n_initial=20, burnin=5,
                              theta_snooker=0.3)
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    assert getattr(step, "resample_fused", False), "fused path not taken"
    state = step.to_fused(_grow_history(init_state(model, de, spec, 0), 64))
    t0 = time.perf_counter()
    state, ys = run_scan(step, state, 64)
    print(f"[mechanics] 64 iters ran in {time.perf_counter() - t0:.1f}s "
          "(includes compile)")
    su = step.from_fused(state)
    h = np.asarray(su.history)
    traj = np.swapaxes(np.asarray(ys.theta), 1, 2)
    ni = de.n_initial
    assert np.array_equal(h[ni:ni + 64], traj), "history != trajectory"
    seed = np.asarray(init_state(model, de, spec, 0).history)
    assert np.array_equal(h[:ni], seed), "seed rows clobbered"
    assert np.isfinite(np.asarray(ys.lp)).all(), "non-finite lp"
    print("[mechanics] PASS: on-chip history rows bitexact vs trajectory")


def check_posterior():
    f32 = np.asarray(np.random.default_rng(3).normal(0, 1, 50), np.float32)
    model, de = gaussian.make(data=f32, Np=6, n_groups=1, alpha=0.0,
                              sample="resample", n_initial=40, burnin=500,
                              theta_snooker=0.3)
    chains = dm.sample(model, de, 6000, key=11)
    ref = gaussian.posterior_grid(f32)
    m = chains.data.mean(axis=(0, 2))
    s = chains.data.std(axis=(0, 2))
    print(f"[posterior] mu {m[0]:+.4f} (truth {ref['mu']['mean']:+.4f}) "
          f"sigma {m[1]:.4f} (truth {ref['sigma']['mean']:.4f}) "
          f"std_mu {s[0]:.4f} ({ref['mu']['std']:.4f}) "
          f"std_sig {s[1]:.4f} ({ref['sigma']['std']:.4f}) "
          f"acc {chains.acceptance.mean():.2f}")
    assert abs(m[0] - ref["mu"]["mean"]) < 0.04
    assert abs(m[1] - ref["sigma"]["mean"]) < 0.04
    assert abs(s[0] - ref["mu"]["std"]) < 0.04
    assert abs(s[1] - ref["sigma"]["std"]) < 0.04
    print("[posterior] PASS")


def time_flagship():
    """The reference's hardest config shape: 30-dim MVN, Np=3, G=1,
    snooker 0.1, resample, n_initial=(d+1)*4 — 50k iterations."""
    model, de = mvnormal.make(d=30, n_obs=100, key=1, burnin=2000)
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    fused = getattr(step, "resample_fused", False)
    print(f"[flagship] fused={fused} super_k={getattr(step, 'superstep_k', 0)}")
    n_iter = 50_000
    state = step.to_fused(_grow_history(init_state(model, de, spec, 1),
                                        n_iter)) if fused else \
        _grow_history(init_state(model, de, spec, 1), n_iter)
    # one long timed run (thin keeps the tunnel transfer small)
    t0 = time.perf_counter()
    state, ys = run_scan(step, state, n_iter, thin=10)
    wall = time.perf_counter() - t0
    print(f"[flagship] 50k iterations (thin=10) in {wall:.2f}s "
          f"(includes compile); per-iter {wall / n_iter * 1e6:.2f} us "
          "(upper bound)")
    # re-run timed without compile
    state2 = step.to_fused(_grow_history(init_state(model, de, spec, 2),
                                         n_iter)) if fused else \
        _grow_history(init_state(model, de, spec, 2), n_iter)
    t0 = time.perf_counter()
    state2, ys2 = run_scan(step, state2, n_iter, thin=10)
    wall2 = time.perf_counter() - t0
    assert wall2 > 0.025, "phantom timing (async dispatch leak?)"
    print(f"[flagship] warm 50k iterations in {wall2:.2f}s = "
          f"{wall2 / n_iter * 1e6:.2f} us/iter, "
          f"{n_iter * de.n_chains / wall2:,.0f} chain-steps/s")
    # posterior sanity at spec-like tolerances
    data = np.asarray(model.data, np.float64)
    truth = mvnormal.analytic_posterior(data)
    mu = np.swapaxes(np.asarray(ys2.theta), 1, 2)[:, :, :30]
    post = mu[len(mu) // 2:]
    means = post.mean(axis=(0, 1))
    sds = post.std(axis=(0, 1))
    print(f"[flagship] max |mean err| {np.abs(means - truth['mean']).max():.3f} "
          f"(ref atol 0.3); max |sd err| {np.abs(sds - truth['std']).max():.3f} "
          f"(ref atol 0.01); "
          f"cor {np.corrcoef(means, data.mean(axis=0))[0, 1]:.4f} (ref > 0.98)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    check_mechanics()
    check_posterior()
    time_flagship()
