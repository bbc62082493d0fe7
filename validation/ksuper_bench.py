"""Scratch: per-iteration cost of the K-iteration superstep at K=8/16/32.

Slope-fits (two scan lengths) the fused Gaussian kernel at several K to
see whether residual per-launch overhead still shows at SUPER_K=8.
Run ALONE on the real TPU:  python validation/ksuper_bench.py
"""
import time

import jax
import jax.numpy as jnp

from demcmc_tpu.models import gaussian
from demcmc_tpu.ops import fused_step as fused_mod
from demcmc_tpu.sampler import (SamplerState, build_step, init_state,
                                make_spec)


def time_launches(kern, state, n_launches, K, reps=5):
    def step(s, _=None):
        t, w, acc, fire = kern(s.theta, s.weight, s.key, s.iteration, s.fire)
        return SamplerState(theta=t[-1], weight=w[-1], key=s.key,
                            iteration=s.iteration + K, history=None,
                            fire=fire), None

    @jax.jit
    def run(s, dummy):
        s, _ = jax.lax.scan(step, s, None, length=dummy.shape[0])
        return s

    n = jnp.zeros(n_launches, jnp.int8)
    s = run(state, n)
    jax.block_until_ready(s.theta)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        s = run(s, n)
        jax.block_until_ready(s.theta)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    model, de = gaussian.make(key=0, n_obs=50, n_groups=256, Np=16,
                              burnin=100)
    spec = make_spec(model, de)
    state0 = init_state(model, de, spec, key=0)
    fused = build_step(model, de, spec)
    assert getattr(fused, "fused", False)
    st = fused.to_fused(state0)
    # raw uint32 key words like _call does
    key2 = jax.random.key_data(st.key).astype(jnp.uint32) \
        if not jnp.issubdtype(st.key.dtype, jnp.integer) \
        else st.key.astype(jnp.uint32)
    st = st._replace(key=key2)

    N_ITER = 16000 * 6
    for K in (8, 16, 32):
        kern = fused_mod.build_fused_step(model, de, spec, K=K,
                                          mig_in_kernel=True)
        L1, L2 = N_ITER // (6 * K), N_ITER // K
        t1 = time_launches(kern, st, L1, K)
        t2 = time_launches(kern, st, L2, K)
        per_launch = (t2 - t1) / (L2 - L1) * 1e6
        print(f"K={K:3d}: {per_launch:8.2f} us/launch = "
              f"{per_launch / K:6.3f} us/iteration "
              f"(naive@{L2}: {t2 / (L2 * K) * 1e6:.3f})", flush=True)


if __name__ == "__main__":
    main()
