"""One-shot on-chip validation of the rewritten fused kernel.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python validation/tpu_validate_fused.py

Covers, in a single TPU grant claim:
1. build/lower of the K=1 and K=8 kernels (in-kernel migration) for the
   Gaussian and LBA bench configs
2. the migration-kernel bitexactness check vs the numpy oracle
3. superstep-vs-single-step bitwise equality on the chip
4. a short statistical sanity run (posterior means vs quadrature)
5. slope timings (per-step µs at two scan lengths) for K=1 and K=8
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

from demcmc_tpu.models import gaussian, lba                   # noqa: E402
from demcmc_tpu.ops import fused_step                         # noqa: E402
from demcmc_tpu.sampler import (build_step, init_state,       # noqa: E402
                                make_spec)
import demcmc_tpu as dt                                       # noqa: E402

L1, L2 = 2000, 10000


def slope(step_fn, state, label, l1=L1, l2=L2):
    @jax.jit
    def run(s, dummy):
        s, _ = jax.lax.scan(lambda c, _: (step_fn(c)[0], None), s, None,
                            length=dummy.shape[0])
        return s

    def t_at(n_iter):
        n = jnp.zeros(n_iter, jnp.int8)
        s = run(state, n)
        jax.block_until_ready(s.theta)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            s = run(s, n)
            jax.block_until_ready(s.theta)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = t_at(l1), t_at(l2)
    per = (t2 - t1) / (l2 - l1) * 1e6
    print(f"{label:40s} per-call {per:7.3f} us", flush=True)
    return per


def main():
    print("backend:", jax.default_backend(), flush=True)

    # ---- 2. migration bitexactness vs numpy oracle -----------------
    sys.path.insert(0, "/root/repo/tests")
    from test_fused_step import _np_migration_oracle, _run_mig_kernel
    rng_ = np.random.default_rng(3)
    G, Np, d = 32, 4, 3
    theta = (rng_.standard_normal((G, Np, d)) * 1e3
             + rng_.random((G, Np, d)) * 1e-4).astype(np.float32)
    w = rng_.standard_normal((G, Np)).astype(np.float32)
    u = rng_.random(G).astype(np.float32)
    gum = rng_.gumbel(size=(G, Np)).astype(np.float32)
    got_t, got_w = _run_mig_kernel(theta, w, u, 17, gum, interpret=False)
    want_t, want_w = _np_migration_oracle(theta, w, u, 17, gum)
    ok = (np.array_equal(got_t, want_t) and np.array_equal(got_w, want_w))
    print("migration bitexact on chip:", ok, flush=True)
    if not ok:
        bad = np.argwhere(got_t != want_t)[:5]
        print("  mismatches:", bad, flush=True)

    # ---- 1+3+5. Gaussian bench config ------------------------------
    model, de = gaussian.make(key=0, n_obs=50, n_groups=256, Np=16,
                              burnin=100)
    spec = make_spec(model, de)
    state0 = init_state(model, de, spec, key=0)
    step = build_step(model, de, spec)
    assert getattr(step, "fused", False), "fused path not taken"
    st = step.to_fused(state0)
    sup = step.get_superstep()
    assert sup is not None, "superstep unavailable"

    # bitwise: 2·K iterations via 2 supersteps vs 2·K single steps
    # (K = step.superstep_k — honors a DEMCMC_SUPER_K override)
    sup_k = step.superstep_k
    s_a = st
    for _ in range(2):
        s_a, _ = jax.jit(sup)(s_a)
    s_b = st
    one = jax.jit(step)
    for _ in range(2 * sup_k):
        s_b, _ = one(s_b)
    eq = (np.array_equal(np.asarray(s_a.theta), np.asarray(s_b.theta))
          and np.array_equal(np.asarray(s_a.weight),
                             np.asarray(s_b.weight))
          and np.array_equal(np.asarray(s_a.fire), np.asarray(s_b.fire)))
    print(f"superstep bitwise == {2 * sup_k} singles on chip:", eq,
          flush=True)

    p1 = slope(step, st, "gaussian K=1 (in-kernel mig)")
    p8 = slope(sup, st, f"gaussian K={sup_k} superstep (per launch)")
    print(f"  -> gaussian per ITERATION: K=1 {p1:.3f} us, "
          f"K={sup_k} {p8 / sup_k:.3f} us", flush=True)

    # ---- 4. statistical sanity on chip ------------------------------
    chains = dt.sample(model, de, 3000, key=11)
    ref = gaussian.posterior_grid(np.asarray(model.data))
    mu = chains.data[..., 0].mean()
    sg = chains.data[..., 1].mean()
    print(f"posterior: mu {mu:.4f} (ref {ref['mu']['mean']:.4f}), "
          f"sigma {sg:.4f} (ref {ref['sigma']['mean']:.4f})", flush=True)
    ok_stat = (abs(mu - ref["mu"]["mean"]) < 0.02
               and abs(sg - ref["sigma"]["mean"]) < 0.02)
    print("statistical sanity:", ok_stat, flush=True)

    # ---- LBA superstep ----------------------------------------------
    ml, del_ = lba.make(key=0, n_trials=100, n_groups=256, Np=16,
                        burnin=100)
    specl = make_spec(ml, del_)
    sl = init_state(ml, del_, specl, key=0)
    fl = build_step(ml, del_, specl)
    assert getattr(fl, "fused", False)
    stl = fl.to_fused(sl)
    supl = fl.get_superstep()
    assert supl is not None
    kl = fl.superstep_k
    pl8 = slope(supl, stl, f"LBA K={kl} superstep (per launch)",
                l1=500, l2=2500)
    print(f"  -> LBA per ITERATION: {pl8 / kl:.3f} us", flush=True)


if __name__ == "__main__":
    main()
