"""G=8192 (131k chains) unfired-migration penalty probe (verdict r4
item 7).  Direct single-program per-step timings like
mig_direct_bench.py; run ALONE on the real TPU.

Round-4 baseline (NOTES.md): a=0 floor 31.7 us/step, a=0.001 ~62.5
(the unfired penalty under test), a=0.1 84.5, +snooker 86.8.
"""
import time

import jax
import jax.numpy as jnp

from demcmc_tpu.models import gaussian
from demcmc_tpu.sampler import build_step, init_state, make_spec


def direct(n_groups, alpha, label, theta_snooker=0.0, n_iter=20_000,
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
    t0 = time.perf_counter()
    s = run(state, n)
    jax.block_until_ready(s)
    print(f"  [compile+first {time.perf_counter() - t0:.1f}s]",
          flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        s = run(s, n)
        jax.block_until_ready(s)
        best = min(best, time.perf_counter() - t0)
    per = best / (n_launch * K) * 1e6
    print(f"{label:48s} per-step {per:7.3f} us  "
          f"({C / per:8.1f}M chain-steps/s)  [K={K}]", flush=True)
    return per


def main():
    print("backend:", jax.default_backend(), flush=True)
    direct(8192, 0.0, "131k a=0 floor")
    direct(8192, 0.001, "131k a=0.001 (unfired penalty probe)")
    direct(8192, 0.1, "131k a=0.1")
    direct(8192, 0.1, "131k a=0.1+snooker (bench cfg)",
           theta_snooker=0.1)


if __name__ == "__main__":
    main()
