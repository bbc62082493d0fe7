"""Direct (single-program) per-step timing for the sorted-migration
configs: one long scan per config, per-step = best(t)/n_iter with the
~31 ms tunnel dispatch amortized below 2%.  The two-length slope fit
produced garbage on sort-containing kernels (compile-to-compile
scheduling variance between the two programs); this measures ONE
program, like bench.py.

Run ALONE on the real TPU.
"""
import time

import jax
import jax.numpy as jnp

from demcmc_tpu.models import gaussian
from demcmc_tpu.ops import fused_step as fused_mod
from demcmc_tpu.sampler import build_step, init_state, make_spec


def direct(n_groups, alpha, label, theta_snooker=0.0, n_iter=100_000,
           reps=3):
    model, de = gaussian.make(key=0, n_obs=50, n_groups=n_groups, Np=16,
                              burnin=100, alpha=alpha,
                              theta_snooker=theta_snooker)
    C = n_groups * 16
    spec = make_spec(model, de)
    state = init_state(model, de, spec, key=0)
    step = build_step(model, de, spec)
    assert getattr(step, "fused", False)
    state = step.to_fused(state)
    sup = step.get_superstep()
    if sup is not None:
        K = step.superstep_k
        fn, n_launch = sup, n_iter // K
    else:
        K = 1
        fn, n_launch = step, n_iter

    @jax.jit
    def run(s, dummy):
        s, _ = jax.lax.scan(lambda c, _: (fn(c)[0], None), s, None,
                            length=dummy.shape[0])
        return s

    n = jnp.zeros(n_launch, jnp.int8)
    s = run(state, n)
    jax.block_until_ready(s)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        s = run(s, n)
        jax.block_until_ready(s)
        best = min(best, time.perf_counter() - t0)
    per = best / (n_launch * K) * 1e6
    print(f"{label:52s} per-step {per:7.3f} us  "
          f"({C / per:8.1f}M chain-steps/s)  [K={K}]", flush=True)
    return per


def main():
    print("backend:", jax.default_backend(), flush=True)
    direct(4096, 0.0, "65k a=0 floor")
    direct(4096, 0.001, "65k a=0.001 (region overhead probe)")
    direct(4096, 0.1, "65k a=0.1")
    direct(4096, 0.1, "65k a=0.1+snooker (bench cfg)", theta_snooker=0.1)
    direct(1024, 0.1, "16k a=0.1", n_iter=200_000)
    direct(256, 0.1, "4k a=0.1", n_iter=400_000)


if __name__ == "__main__":
    main()
