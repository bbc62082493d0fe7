"""Scratch: cond-gated vs branchless XLA migration at G=4096 (65k chains).

The fused step's big-G path (G > MIG_MAX_G) gates the XLA migration on a
lax.cond — a ~1 µs device-scalar pipeline sync per step.  The branchless
variant always computes the O(G) exchange and mask-applies it (bitwise
identical).  Slope-fits both.  Run ALONE on the real TPU:

    PYTHONPATH=/root/.axon_site:/root/repo python validation/mig_gate_bench.py
"""
import os
import time

import jax
import jax.numpy as jnp

from demcmc_tpu.models import gaussian


def slope(step, state, label, L1=1000, L2=5000, reps=5):
    @jax.jit
    def run(s, dummy):
        s, _ = jax.lax.scan(lambda c, _: (step(c)[0], None), s, None,
                            length=dummy.shape[0])
        return s

    def t_at(s, n_iter):
        n = jnp.zeros(n_iter, jnp.int8)
        s = run(s, n)
        jax.block_until_ready(s.theta)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            s = run(s, n)
            jax.block_until_ready(s.theta)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = t_at(state, L1), t_at(state, L2)
    per = (t2 - t1) / (L2 - L1) * 1e6
    print(f"{label:42s} per-step {per:7.2f} us", flush=True)
    return per


def build(gate):
    os.environ["DEMCMC_MIG_GATE"] = gate
    from demcmc_tpu.sampler import build_step, init_state, make_spec
    model, de = gaussian.make(key=0, n_obs=50, n_groups=4096, Np=16,
                              burnin=100, alpha=0.1, theta_snooker=0.1)
    spec = make_spec(model, de)
    state = init_state(model, de, spec, key=0)
    # fresh model object per gate style (the step cache keys on the model)
    step = build_step(model, de, spec)
    assert getattr(step, "fused", False)
    return step, step.to_fused(state)


def main():
    print("backend:", jax.default_backend(), flush=True)
    for gate in ("cond", "branchless"):
        step, st = build(gate)
        slope(step, st, f"65k chains alpha=0.1 gate={gate}")


if __name__ == "__main__":
    main()
