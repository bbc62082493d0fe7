"""At-spec parity runs: the reference's OWN test configs at the
reference's OWN tolerances, unscaled.

Reference rows reproduced here (cited by file:line):

* 30-dim MVN — ``test/multivariate_normal_tests.jl:49-69``: Np=3,
  n_groups=1, θsnooker=0.1, sample=resample, n_initial=(30+1)*4,
  burnin=5000, 50k iterations; asserts all |sd−0.1| < 0.01,
  all |mean| < 0.3, |std(means)−0.1| < 0.01, cor(data means, post
  means) > 0.98.
* LNR vs NUTS — ``test/lognormal_race_tests.jl:40-66``: Np=24,
  n_groups=4, burnin=2000, 5000 iterations; asserts rhat within 0.05 of
  1 and means/stds within rtol 0.05 of a NUTS run (here: the repo's HMC
  oracle, ``demcmc_tpu/reference_samplers.py``).
* Blocked Gaussian — ``test/blocking_tests.jl:47-75``: μ~N(0,10) prior,
  1000 obs, identity 2-blocks with blocking_on ≡ true, Np=6, burnin=1000,
  2000 iterations; asserts means within atol 0.1 of (0, 1) and rhat
  within 0.01 of 1.

Writes ``PARITY_RESULTS.md`` at the repo root with every measured number
and exits nonzero if any reference assertion fails.  Run serially (this
image's TPU grant is exclusive):

    python validation/parity_at_spec.py            # TPU (axon default)
    DEMCMC_TEST_PLATFORM=cpu python validation/parity_at_spec.py
"""

from __future__ import annotations

import datetime
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_platform = os.environ.get("DEMCMC_TEST_PLATFORM")
if _platform:
    jax.config.update("jax_platforms", _platform)

import jax.numpy as jnp
import numpy as np

import demcmc_tpu as dm
from demcmc_tpu import DE, DEModel
from demcmc_tpu.diagnostics import split_rhat
from demcmc_tpu.models import lnr, mvnormal
from demcmc_tpu.reference_samplers import hmc
from demcmc_tpu.sampler import make_spec
from demcmc_tpu.utils import dists

RESULTS = []


def record(section, checks, elapsed, extra=""):
    ok = all(passed for _, passed, _ in checks)
    RESULTS.append((section, ok, checks, elapsed, extra))
    status = "PASS" if ok else "FAIL"
    print(f"[{status}] {section} ({elapsed:.1f}s)")
    for name, passed, detail in checks:
        print(f"    {'ok ' if passed else 'FAIL'} {name}: {detail}")
    return ok


def run_mvn():
    """30-dim MVN at the reference's exact spec."""
    d, n_obs, n_iter = 30, 100, 50_000
    t0 = time.perf_counter()
    model, de = mvnormal.make(d=d, n_obs=n_obs, key=1, burnin=5000)
    assert de.Np == 3 and de.n_groups == 1 and de.n_initial == (d + 1) * 4
    chains = dm.sample(model, de, n_iter, key=3)
    elapsed = time.perf_counter() - t0

    mu = chains.group("mu")                       # [Ns, d, C]
    means = mu.mean(axis=(0, 2))
    sds = mu.reshape(mu.shape[0], d, -1).std(axis=(0, 2), ddof=1)
    data_means = np.asarray(model.data, np.float64).mean(axis=0)
    r = np.corrcoef(means, data_means)[0, 1]
    sd_of_means = means.std(ddof=1)

    checks = [
        ("all |sd - 0.1| < 0.01 (ref :65)",
         bool(np.all(np.abs(sds - 0.1) < 0.01)),
         f"max dev {np.abs(sds - 0.1).max():.4f}"),
        ("all |mean| < 0.3 (ref :66)",
         bool(np.all(np.abs(means) < 0.3)),
         f"max |mean| {np.abs(means).max():.3f}"),
        ("|std(means) - 0.1| < 0.01 (ref :67)",
         bool(abs(sd_of_means - 0.1) < 0.01),
         f"std(means) {sd_of_means:.4f}"),
        ("cor(data means, post means) > 0.98 (ref :69)",
         bool(r > 0.98), f"cor {r:.4f}"),
    ]
    return record(
        "30-dim MVN, Np=3, resample+snooker, 50k iters "
        "(multivariate_normal_tests.jl:49-69)", checks, elapsed,
        f"n_chains=3, draws kept={mu.shape[0]}")


def run_lnr():
    """LNR vs the HMC oracle at the reference's spec (NUTS stand-in)."""
    t0 = time.perf_counter()
    model, de = lnr.make(key=0, n_trials=100, Np=24, n_groups=4,
                         burnin=2000)
    chains = dm.sample(model, de, dm.MCMCThreads(), 5000, key=1)
    spec = make_spec(model, de)
    de_means = chains.data.mean(axis=(0, 2))
    de_stds = chains.data.reshape(len(chains), spec.dim, -1) \
                         .std(axis=(0, 2), ddof=1)
    rhat = np.array([split_rhat(chains.data[:, i, :])
                     for i in range(spec.dim)])

    def logpost(q):
        return dm.compute_posterior(model, spec, de, q)

    min_rt = float(jnp.min(model.data[1]))
    init = jnp.concatenate(
        [jnp.tile(jnp.array([-2.0, -2.0, -3.0, -3.0]), (4, 1)),
         jnp.full((4, 1), 0.5 * min_rt)], axis=1)
    res = hmc(logpost, init, key=2, n_samples=6000, n_warmup=2000)
    hmc_means = np.asarray(res.samples.reshape(-1, spec.dim).mean(axis=0))
    hmc_stds = np.asarray(
        res.samples.reshape(-1, spec.dim).std(axis=0, ddof=1))
    elapsed = time.perf_counter() - t0

    rel_m = np.abs(de_means - hmc_means) / np.abs(hmc_means)
    rel_s = np.abs(de_stds - hmc_stds) / np.abs(hmc_stds)
    checks = [
        ("all |rhat - 1| < 0.05 (ref :64)",
         bool(np.all(np.abs(rhat - 1.0) < 0.05)),
         f"max rhat {rhat.max():.4f}"),
        ("means rtol 0.05 vs NUTS-oracle (ref :65)",
         bool(np.all(rel_m < 0.05)), f"max rel {rel_m.max():.4f}"),
        ("stds rtol 0.05 vs NUTS-oracle (ref :66)",
         bool(np.all(rel_s < 0.05)), f"max rel {rel_s.max():.4f}"),
    ]
    return record(
        "LNR (4 accumulators), Np=24 x 4 groups, 5k iters vs HMC oracle "
        "(lognormal_race_tests.jl:40-66)", checks, elapsed,
        f"HMC accept {res.accept_rate:.2f}; de_means {de_means.round(3)}; "
        f"hmc_means {hmc_means.round(3)}")


def run_blocked_gaussian():
    """Blocked Gaussian at the reference's spec."""
    t0 = time.perf_counter()
    data = jax.random.normal(jax.random.PRNGKey(58122), (1000,))

    def prior_loglike(mu, sigma):
        return (dists.normal_logpdf(mu, 0.0, 10.0)
                + dists.halfcauchy_logpdf(sigma))

    def sample_prior(key):
        k1, k2 = jax.random.split(key)
        return [10.0 * jax.random.normal(k1), dists.sample_halfcauchy(k2)]

    def loglike(data, mu, sigma):
        return jnp.sum(dists.normal_logpdf(data, mu, sigma))

    model = DEModel(loglike=loglike, prior_loglike=prior_loglike,
                    sample_prior=sample_prior, names=("mu", "sigma"),
                    data=data)
    de = DE(bounds=((-jnp.inf, jnp.inf), (0.0, jnp.inf)), burnin=1000,
            Np=6, blocking_on=True,
            blocks=[[True, False], [False, True]])
    chains = dm.sample(model, de, 2000, key=4)
    elapsed = time.perf_counter() - t0

    means = chains.data.mean(axis=(0, 2))
    rhat = np.array([split_rhat(chains.data[:, i, :])
                     for i in range(2)])
    checks = [
        ("mu within 0.1 of 0 (ref :62)",
         bool(abs(means[0]) < 0.1), f"mu {means[0]:.4f}"),
        ("sigma within 0.1 of 1 (ref :63)",
         bool(abs(means[1] - 1.0) < 0.1), f"sigma {means[1]:.4f}"),
        ("rhat(mu) within 0.01 of 1 (ref :64)",
         bool(abs(rhat[0] - 1.0) < 0.01), f"rhat {rhat[0]:.4f}"),
        ("rhat(sigma) within 0.01 of 1 (ref :65)",
         bool(abs(rhat[1] - 1.0) < 0.01), f"rhat {rhat[1]:.4f}"),
    ]
    return record(
        "Blocked Gaussian (identity 2-blocks), 1000 obs, 2k iters "
        "(blocking_tests.jl:47-75)", checks, elapsed)


def write_md(path):
    lines = [
        "# At-spec parity results",
        "",
        "The reference's own test configurations run UNSCALED at the "
        "reference's own tolerances (VERDICT round 1, item 3).  Each "
        "section lists every reference assertion with the measured value.",
        "",
        f"- date: {datetime.date.today().isoformat()}",
        f"- platform: {jax.devices()[0].platform} "
        f"({len(jax.devices())} device(s))",
        f"- dtype: float32 population / float64 host statistics",
        "",
    ]
    for section, ok, checks, elapsed, extra in RESULTS:
        lines.append(f"## {'PASS' if ok else 'FAIL'} — {section}")
        lines.append("")
        lines.append(f"runtime: {elapsed:.1f}s" + (f"; {extra}" if extra
                                                  else ""))
        lines.append("")
        for name, passed, detail in checks:
            lines.append(f"- {'PASS' if passed else 'FAIL'} {name} — "
                         f"{detail}")
        lines.append("")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}")


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    runners = {"mvn": run_mvn, "lnr": run_lnr,
               "blocked": run_blocked_gaussian}
    ok = True
    for name, fn in runners.items():
        if only and name != only:
            continue
        ok = fn() and ok
    write_md(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PARITY_RESULTS.md"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
