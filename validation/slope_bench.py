"""Scratch: decompose fixed dispatch overhead vs true per-step cost.

Times the same jitted scan at two lengths; slope = per-step cost,
intercept = fixed per-call (tunnel dispatch + prologue) overhead.
"""
import time

import jax
import jax.numpy as jnp

from demcmc_tpu.models import gaussian
from demcmc_tpu.sampler import build_step, init_state, make_spec

L1, L2 = 2000, 10000


def time_at(step, state, n_iter, reps=5):
    @jax.jit
    def run(s, dummy):
        s, _ = jax.lax.scan(lambda c, _: (step(c)[0], None), s, None,
                            length=dummy.shape[0], unroll=2)
        return s

    n = jnp.zeros(n_iter, jnp.int8)
    s = run(state, n)
    jax.block_until_ready(s.theta)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        s = run(s, n)
        jax.block_until_ready(s.theta)
        best = min(best, time.perf_counter() - t0)
    return best


def slope(step, state, label):
    t1 = time_at(step, state, L1)
    t2 = time_at(step, state, L2)
    per = (t2 - t1) / (L2 - L1) * 1e6
    fixed = (t1 - per * 1e-6 * L1) * 1e3
    print(f"{label:32s} per-step {per:7.2f} us   fixed {fixed:7.2f} ms   "
          f"(naive@{L1}: {t1 / L1 * 1e6:.2f} us)", flush=True)
    return per


def main():
    import sys

    from demcmc_tpu.models import lba

    which = sys.argv[1:] or ["gauss"]
    print("backend:", jax.default_backend(), flush=True)
    if "gauss" in which:
        model, de = gaussian.make(key=0, n_obs=50, n_groups=256, Np=16,
                                  burnin=100)
        spec = make_spec(model, de)
        state0 = init_state(model, de, spec, key=0)

        xla_step = build_step(model, de, spec, allow_fused=False)
        slope(xla_step, state0, "XLA step (alpha=0.1)")

        fused = build_step(model, de, spec)
        assert getattr(fused, "fused", False), "fused path not taken!"
        slope(fused, fused.to_fused(state0), "fused step (alpha=0.1, cond)")

    if "gauss0" in which:
        m0, de0 = gaussian.make(key=0, n_obs=50, n_groups=256, Np=16,
                                burnin=100, alpha=0.0)
        spec0 = make_spec(m0, de0)
        s0 = init_state(m0, de0, spec0, key=0)
        f0 = build_step(m0, de0, spec0)
        assert getattr(f0, "fused", False)
        slope(f0, f0.to_fused(s0), "fused step (alpha=0, no cond)")

    if "super" in which:
        model, de = gaussian.make(key=0, n_obs=50, n_groups=256, Np=16,
                                  burnin=100)
        spec = make_spec(model, de)
        state0 = init_state(model, de, spec, key=0)
        fused = build_step(model, de, spec)
        assert getattr(fused, "fused", False)
        st = fused.to_fused(state0)
        slope(fused, st, "fused K=1 (in-kernel mig)")
        sup = fused.get_superstep()
        assert sup is not None, "superstep unavailable"
        per = slope(sup, st, "fused K=8 superstep (per launch)")
        print(f"  -> per ITERATION: {per / 8:.3f} us", flush=True)

    if "superlba" in which:
        from demcmc_tpu.models import lba as lba_mod
        ml, del_ = lba_mod.make(key=0, n_trials=100, n_groups=256, Np=16,
                                burnin=100)
        specl = make_spec(ml, del_)
        sl = init_state(ml, del_, specl, key=0)
        fl = build_step(ml, del_, specl)
        assert getattr(fl, "fused", False)
        stl = fl.to_fused(sl)
        supl = fl.get_superstep()
        assert supl is not None
        per = slope(supl, stl, "LBA K=8 superstep (per launch)")
        print(f"  -> per ITERATION: {per / 8:.3f} us", flush=True)

    if "lba" in which:
        ml, del_ = lba.make(key=0, n_trials=100, n_groups=256, Np=16,
                            burnin=100)
        specl = make_spec(ml, del_)
        sl = init_state(ml, del_, specl, key=0)
        fl = build_step(ml, del_, specl)
        assert getattr(fl, "fused", False)
        slope(fl, fl.to_fused(sl), "LBA fused (alpha=0.1)")
        xl = build_step(ml, del_, specl, allow_fused=False)
        slope(xl, sl, "LBA XLA (alpha=0.1)")


if __name__ == "__main__":
    main()
