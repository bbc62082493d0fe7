"""On-chip validation of the HBM-streaming resample history engine
(verdict r4 item 1).

Three checks on the real TPU:
1. BITWISE A/B: the flagship MVN config at a length where both engines
   fit — trajectories and final packed history must match exactly
   (the streaming engine fetches identical values, so any divergence
   is a bug).
2. LONG RUN: 100k iterations (packed history ~37 MB — past the 24 MiB
   in-VMEM ceiling that used to force the ~100x-slower XLA step).
   Reports warm wall/per-iter rate and posterior quality vs the
   reference tolerances (multivariate_normal_tests.jl: mean atol 0.1,
   sd atol 0.01 at 50k draws).
3. SPEED: per-iteration cost of stream vs vmem at the 50k config.

Run ALONE (TPU grant):  python validation/resample_stream_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    import demcmc_tpu as dm
    from demcmc_tpu.models import mvnormal

    assert jax.default_backend() == "tpu", jax.default_backend()

    def run(mode, n_iter, thin=1, key=0):
        os.environ["DEMCMC_RESAMPLE_STREAM"] = mode
        model, de = mvnormal.make(d=30, n_obs=100, key=50514,
                                  burnin=0, discard_burnin=False)
        t0 = time.time()
        chains = dm.sample(model, de, n_iter, key=key, thin=thin)
        wall = time.time() - t0
        return chains, wall

    # ---- 1. bitwise A/B at 4000 iterations (both engines fit) ------
    ca, _ = run("0", 4000)
    cb, _ = run("1", 4000)
    bitwise = np.array_equal(ca.data, cb.data)
    print(f"[A/B 4000it] bitwise equal: {bitwise}")
    assert bitwise, "stream engine diverged from vmem engine on-chip"

    # ---- 3. warm speed at the 50k flagship --------------------------
    # one model per mode, sampled twice: the second run reuses the
    # cached step + compiled kernels, so it measures device time
    for mode in ("0", "1"):
        os.environ["DEMCMC_RESAMPLE_STREAM"] = mode
        model, de = mvnormal.make(d=30, n_obs=100, key=50514,
                                  burnin=0, discard_burnin=False)
        dm.sample(model, de, 50_000, key=7, thin=10)    # compile+warm
        t0 = time.time()
        dm.sample(model, de, 50_000, key=7, thin=10)
        wall = time.time() - t0
        name = {"0": "vmem  ", "1": "stream"}[mode]
        print(f"[50k thin=10] {name}: {wall:.2f} s "
              f"({wall / 50e3 * 1e6:.2f} us/iter)")

    # ---- 2. the 100k run the old ceiling rejected -------------------
    os.environ["DEMCMC_RESAMPLE_STREAM"] = "auto"
    model, de = mvnormal.make(d=30, n_obs=100, key=1, burnin=5000)
    t0 = time.time()
    chains = dm.sample(model, de, 100_000, key=3, thin=10)
    wall = time.time() - t0
    t0 = time.time()
    dm.sample(model, de, 100_000, key=3, thin=10)
    wall2 = time.time() - t0
    print(f"[100k thin=10] auto(stream): cold {wall:.1f} s, warm "
          f"{wall2:.2f} s ({wall2 / 100e3 * 1e6:.2f} us/iter)")
    # the reference's own assertions (multivariate_normal_tests.jl:65-69)
    mu = chains.group("mu")                              # [Ns, d, C]
    means = mu.mean(axis=(0, 2))
    sds = mu.reshape(mu.shape[0], 30, -1).std(axis=(0, 2), ddof=1)
    data_means = np.asarray(model.data, np.float64).mean(axis=0)
    r = np.corrcoef(means, data_means)[0, 1]
    print(f"[100k posterior] max|sd-0.1| {np.abs(sds - 0.1).max():.4f} "
          f"(ref atol 0.01), max|mean| {np.abs(means).max():.3f} "
          f"(ref < 0.3), cor {r:.4f} (ref > 0.98)")
    assert np.all(np.abs(sds - 0.1) < 0.01)
    assert np.all(np.abs(means) < 0.3) and r > 0.98
    print("OK")


if __name__ == "__main__":
    main()
