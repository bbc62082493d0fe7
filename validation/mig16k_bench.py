"""Scratch: why is the 16k-chain (G=1024) config slower per-chain than
both 4k (G=256) and 65k (G=4096)?

Hypothesis: G=1024 sits AT the MIG_MAX_G boundary, so migration runs
in-kernel — and the unconditional per-iteration rank draw
(``take_flat(G)`` = a [1024, 128] prng block, column 0 kept) plus the
[G, G] rank/route machinery stop paying at this G.

Slope-fits the fused Gaussian step at 16k chains under three regimes:
  a) alpha=0          (no migration at all — the floor)
  b) alpha=0.1 in-kernel (MIG_MAX_G default: G=1024 qualifies)
  c) alpha=0.1 XLA cond  (MIG_MAX_G patched below G)
Run ALONE on the real TPU:  python validation/mig16k_bench.py
"""
import time

import jax
import jax.numpy as jnp

from demcmc_tpu.models import gaussian
from demcmc_tpu.ops import fused_step as fused_mod
from demcmc_tpu.sampler import build_step, init_state, make_spec


def slope_time(step, state, sup, K, L1=1500, L2=7500, reps=4):
    if sup is not None:
        fn, ln1, ln2 = sup, L1 // K, L2 // K
    else:
        fn, ln1, ln2 = step, L1, L2

    def timed(n_launch):
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
        return best

    t1, t2 = timed(ln1), timed(ln2)
    return (t2 - t1) / (L2 - L1) * 1e6


def bench(label, alpha, max_g=None):
    if max_g is not None:
        old = fused_mod.MIG_MAX_G
        fused_mod.MIG_MAX_G = max_g
    try:
        model, de = gaussian.make(key=0, n_obs=50, n_groups=1024, Np=16,
                                  burnin=100, alpha=alpha)
        spec = make_spec(model, de)
        state = init_state(model, de, spec, key=0)
        step = build_step(model, de, spec)
        assert getattr(step, "fused", False)
        state = step.to_fused(state)
        sup = step.get_superstep()
        K = step.superstep_k if sup is not None else 1
        per = slope_time(step, state, sup, K)
        print(f"{label:44s} per-step {per:7.2f} us  "
              f"({16384 / per * 1e6 / 1e6:7.1f}M chain-steps/s)"
              f"  [superstep K={K if sup is not None else 1}]",
              flush=True)
    finally:
        if max_g is not None:
            fused_mod.MIG_MAX_G = old


def main():
    print("backend:", jax.default_backend(), flush=True)
    bench("16k chains alpha=0 (floor)", 0.0)
    bench("16k chains alpha=0.1 in-kernel (G=1024)", 0.1)
    bench("16k chains alpha=0.1 XLA cond", 0.1, max_g=512)


if __name__ == "__main__" and "crossover" not in __import__("sys").argv:
    main()


def bench_g(n_groups, alpha, max_g=None, label=""):
    if max_g is not None:
        old = fused_mod.MIG_MAX_G
        fused_mod.MIG_MAX_G = max_g
    try:
        model, de = gaussian.make(key=0, n_obs=50, n_groups=n_groups,
                                  Np=16, burnin=100, alpha=alpha)
        C = n_groups * 16
        spec = make_spec(model, de)
        state = init_state(model, de, spec, key=0)
        step = build_step(model, de, spec)
        assert getattr(step, "fused", False)
        state = step.to_fused(state)
        sup = step.get_superstep()
        K = step.superstep_k if sup is not None else 1
        per = slope_time(step, state, sup, K)
        print(f"{label:44s} per-step {per:7.2f} us  "
              f"({C / per:7.1f}M chain-steps/s)"
              f"  [K={K if sup is not None else 1}]", flush=True)
    finally:
        if max_g is not None:
            fused_mod.MIG_MAX_G = old


def crossover():
    print("backend:", jax.default_backend(), flush=True)
    for G in (256, 512):
        bench_g(G, 0.1, label=f"{G*16} chains a=0.1 in-kernel (G={G})")
        bench_g(G, 0.1, max_g=G // 2,
                label=f"{G*16} chains a=0.1 XLA cond")


if __name__ == "__main__" and "crossover" in __import__("sys").argv:
    crossover()
