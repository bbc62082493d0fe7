"""On-chip validation of the round-4 fused DISCRETE and PSEUDO-MARGINAL
paths (both were SBC/CPU-validated only; this runs them on the real
chip through the whole-step Pallas kernel).

* Discrete binomial (integer N, round-and-cast ``utilities.jl:360-369``
  + the in-kernel masked-shift lgamma): the fused posterior must agree
  with the XLA step's posterior on the same config (both runs on-chip,
  same key — the streams differ across paths, so the comparison is
  statistical), chains must stay integral, and the posterior mode must
  sit at the generating truth.
* Pseudo-marginal ABC binomial (fresh uniform noise panel per density
  evaluation, ``Examples/Binomial_ABC.jl:16-23``): the hit-frequency
  estimator is unbiased, so the posterior must match the conjugate
  Beta(k+1, N-k+1) oracle (Andrieu-Roberts).

Run ALONE on the TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import demcmc_tpu as dm
from demcmc_tpu.models import binomial, discrete_binomial

ok = True


def check(name, cond, detail):
    global ok
    ok &= bool(cond)
    print(f"[{'PASS' if cond else 'FAIL'}] {name}: {detail}", flush=True)


def run_discrete():
    t0 = time.perf_counter()
    model, de = discrete_binomial.make(key=0, true_n=10, true_p=0.6,
                                       n_obs=60, Np=8, n_groups=16,
                                       burnin=500)
    from demcmc_tpu.ops import fused_step
    from demcmc_tpu.sampler import make_spec
    spec = make_spec(model, de)
    assert fused_step.supported(model, de, spec), "must fuse"
    c_fused = dm.sample(model, de, 3000, key=4)

    model2, de2 = discrete_binomial.make(key=0, true_n=10, true_p=0.6,
                                         n_obs=60, Np=8, n_groups=16,
                                         burnin=500)
    os.environ["DEMCMC_FUSED"] = "off"       # force the XLA step
    try:
        c_xla = dm.sample(model2, de2, 3000, key=4)
    finally:
        os.environ.pop("DEMCMC_FUSED", None)

    n_f = c_fused.group("N")
    check("discrete: fused chains integral",
          np.array_equal(n_f, np.round(n_f)), "all draws integer-valued")
    mf, mx = c_fused.mean("N"), c_xla.mean("N")
    check("discrete: fused vs XLA posterior mean(N)",
          abs(mf - mx) < 0.5, f"{mf:.3f} vs {mx:.3f} (atol 0.5)")
    pf, px = c_fused.mean("p"), c_xla.mean("p")
    check("discrete: fused vs XLA posterior mean(p)",
          abs(pf - px) < 0.05, f"{pf:.4f} vs {px:.4f} (atol 0.05)")
    # N*p is the identified product; the truth is 10*0.6 = 6
    check("discrete: N*p near truth", abs(mf * pf - 6.0) < 0.6,
          f"{mf * pf:.3f} vs 6.0 (atol 0.6)")
    print(f"  discrete: {time.perf_counter() - t0:.1f}s")


def run_pseudo_marginal():
    t0 = time.perf_counter()
    N, key = 10, 7
    model, de = binomial.make(N=N, key=key, abc=True, fresh_noise=True,
                              Np=8, n_groups=8, burnin=1000,
                              n_sim=10_000)
    k = model.data["k"]
    from demcmc_tpu.ops import fused_step
    from demcmc_tpu.sampler import make_spec
    assert fused_step.supported(model, de, make_spec(model, de)), \
        "pseudo-marginal config must fuse"
    chains = dm.sample(model, de, 6000, key=9)
    truth = binomial.conjugate_posterior(N, k)
    m, sd = chains.mean("theta"), float(np.std(chains.group("theta")))
    check("pseudo-marginal: mean vs Beta conjugate",
          abs(m - truth["mean"]) < 0.02,
          f"{m:.4f} vs {truth['mean']:.4f} (atol 0.02)")
    check("pseudo-marginal: sd vs Beta conjugate",
          abs(sd - truth["std"]) < 0.02,
          f"{sd:.4f} vs {truth['std']:.4f} (atol 0.02)")
    print(f"  pseudo-marginal: {time.perf_counter() - t0:.1f}s")


def main():
    print("devices:", jax.devices())
    run_discrete()
    run_pseudo_marginal()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
