"""Round-3 on-chip validation batch (one process, run ALONE):

1. At-scale posterior correctness THROUGH the new migration path:
   65,536 chains (G=4096 — sorted in-kernel migration, loop-rolled
   bitonic, K=16 superstep), Gaussian with alpha=0.1 AND snooker 0.1,
   2000 iterations; posterior mean/sd of both parameters vs quadrature
   ground truth.
2. Same at 16k chains (G=1024 — compact unrolled sorted variant).
3. Migration fires at the configured rate (accept bookkeeping sanity).
"""
import numpy as np
import jax

from demcmc_tpu import sample
from demcmc_tpu.models import gaussian


def run(n_groups, label, n_iter=2000):
    model, de = gaussian.make(key=0, n_obs=50, n_groups=n_groups, Np=16,
                              burnin=500, alpha=0.1, theta_snooker=0.1)
    chains = sample(model, de, n_iter, key=3, thin=10)
    ref = gaussian.posterior_grid(np.asarray(model.data, np.float64))
    mu_m, sg_m = chains.mean("mu"), chains.mean("sigma")
    mu_s = chains.data[:, 0].std()
    sg_s = chains.data[:, 1].std()
    print(f"[{label}] mu {mu_m:.4f} (truth {ref['mu']['mean']:.4f})  "
          f"sigma {sg_m:.4f} (truth {ref['sigma']['mean']:.4f})  "
          f"sd(mu) {mu_s:.4f}/{ref['mu']['std']:.4f}  "
          f"sd(sigma) {sg_s:.4f}/{ref['sigma']['std']:.4f}  "
          f"acc {chains.acceptance.mean():.3f}", flush=True)
    ok = (abs(mu_m - ref["mu"]["mean"]) < 0.02
          and abs(sg_m - ref["sigma"]["mean"]) < 0.02
          and abs(mu_s - ref["mu"]["std"]) < 0.02
          and abs(sg_s - ref["sigma"]["std"]) < 0.02)
    print(f"[{label}] {'PASS' if ok else 'FAIL'}", flush=True)
    return ok


def main():
    print("backend:", jax.default_backend(), flush=True)
    ok = run(4096, "65k chains, sorted-loop migration + snooker")
    ok &= run(1024, "16k chains, sorted-unrolled migration + snooker")
    print("ALL PASS" if ok else "FAILURES", flush=True)


if __name__ == "__main__":
    main()
