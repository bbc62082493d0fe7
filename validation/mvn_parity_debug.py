"""Debug the on-chip MVN at-spec failure: same config as parity run_mvn
but with acceptance/sd printed, at several scan decompositions."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

import demcmc_tpu as dm
from demcmc_tpu.models import mvnormal
from demcmc_tpu.sampler import (_grow_history, build_step, init_state,
                                make_spec, run_scan)


def report(tag, ys_theta, acc, burn_drop):
    mu = ys_theta[burn_drop:, :30]              # [T, d, C]
    sds = mu.std(axis=(0, 2), ddof=1)
    print(f"[{tag}] acc={acc:.3f} max|sd-0.1|={np.abs(sds - 0.1).max():.4f}"
          f" sd[:4]={np.round(sds[:4], 4)}", flush=True)


def via_sample(n_iter, key, burnin):
    model, de = mvnormal.make(d=30, n_obs=100, key=1, burnin=burnin)
    ch = dm.sample(model, de, n_iter, key=key)
    mu = ch.group("mu")
    sds = mu.std(axis=(0, 2), ddof=1)
    print(f"[sample n={n_iter} key={key}] acc={ch.acceptance.mean():.3f} "
          f"max|sd-0.1|={np.abs(sds - 0.1).max():.4f}", flush=True)


def via_scan(n_iter, key, burnin, thin=1):
    model, de = mvnormal.make(d=30, n_obs=100, key=1, burnin=burnin)
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    st = step.to_fused(_grow_history(init_state(model, de, spec, key),
                                     n_iter))
    st, ys = run_scan(step, st, n_iter, thin=thin)
    th = np.swapaxes(np.asarray(ys.theta), 1, 2)   # [T, C, d] ->? verify
    acc = float(np.asarray(ys.accept).mean())
    mu = np.asarray(ys.theta)                       # [T, d, C]
    report(f"scan n={n_iter} thin={thin} key={key}", mu,
           acc, burnin // thin)


if __name__ == "__main__":
    print(jax.devices())
    via_scan(20_000, 3, 2000, thin=10)   # the flagship-check shape
    via_scan(19_968, 3, 2000, thin=1)    # pure supersteps (78 x 256)
    via_scan(20_000, 3, 2000, thin=1)    # supersteps + 32 singles
    via_sample(20_000, 3, 2000)          # the parity shape (short)
