"""On-chip validation + crossover measurement for the SORTED (bitonic
rank network) in-kernel migration.

1. Bitexactness at G=4096 (the 65k-chain config) vs the numpy oracle.
2. Slope-fit per-step times across G and variants to place the
   onehot/sorted boundary (MIG_MAX_G) and quantify the 65k-chain win:
     - in-kernel one-hot  (G <= MIG_MAX_G path)
     - in-kernel sorted   (force: MIG_MAX_G patched below G)
     - XLA cond           (force: also mig_sorted_ok patched False)
3. The 65k bench config (alpha=0.1 + snooker 0.1) end to end.

Run ALONE on the real TPU:  python validation/mig_sorted_bench.py
"""
import sys
import time

import numpy as np
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


def bitexact_4096():
    """Sorted-variant kernel at the 65k scale vs the numpy oracle."""
    G, Np, d = 4096, 16, 2
    C = G * Np
    R, Cf = 8, C // 8
    Gr = Cf // Np
    rng = np.random.default_rng(0)
    theta = (rng.standard_normal((G, Np, d)) * 1e3
             + rng.random((G, Np, d)) * 1e-4).astype(np.float32)
    w = rng.standard_normal((G, Np)).astype(np.float32)
    w[rng.random((G, Np)) < 0.05] = -np.inf
    u = rng.random(G).astype(np.float32)
    gum = rng.gumbel(size=(G, Np)).astype(np.float32)
    n_act = int(rng.integers(2, G + 1))

    t3 = np.ascontiguousarray(theta.reshape(-1, d).T.reshape(d, R, Cf))
    w3 = w.reshape(R, Cf)
    u_row = np.full((R, Cf), 777.0, np.float32)
    gs = np.arange(G)
    u_row[gs // Gr, (gs % Gr) * Np] = u
    kern = fused_mod.build_migration_kernel(G, Np, d, interpret=False,
                                            variant="sorted")
    nt, nw = jax.jit(kern)(t3, w3, u_row, np.float32(n_act).reshape(1, 1),
                           gum.reshape(R, Cf))
    nt = np.asarray(nt).reshape(d, C).T.reshape(G, Np, d)
    nw = np.asarray(nw).reshape(G, Np)

    order = np.lexsort((gs, u))
    rank = np.empty(G, int)
    rank[order] = np.arange(G)
    s = gum - w
    vid = np.argmax(s, axis=1)
    want_t, want_w = theta.copy(), w.copy()
    for g in range(G):
        r = rank[g]
        if r >= n_act:
            continue
        src = order[(r - 1) % n_act]
        want_t[g, vid[g]] = theta[src, vid[src]]
        want_w[g, vid[g]] = w[src, vid[src]]
    ok_t = np.array_equal(nt, want_t)
    ok_w = np.array_equal(nw, want_w)
    print(f"bitexact@G=4096 N={n_act}: theta={ok_t} w={ok_w}", flush=True)
    return ok_t and ok_w


def bench_g(n_groups, alpha, label, theta_snooker=0.0, force=None,
            reps=4):
    """force: None (default policy = sorted where G//8 is a power of
    two), 'onehot' (the [G, G] fallback), 'cond' (XLA migration)."""
    old_max, old_ok = fused_mod.MIG_MAX_G, fused_mod.mig_sorted_ok
    try:
        if force == "onehot":
            fused_mod.MIG_MAX_G = max(fused_mod.MIG_MAX_G, n_groups)
            fused_mod.mig_sorted_ok = lambda G, Np: False
        elif force == "cond":
            fused_mod.MIG_MAX_G = 4
            fused_mod.mig_sorted_ok = lambda G, Np: False
        model, de = gaussian.make(key=0, n_obs=50, n_groups=n_groups,
                                  Np=16, burnin=100, alpha=alpha,
                                  theta_snooker=theta_snooker)
        C = n_groups * 16
        spec = make_spec(model, de)
        state = init_state(model, de, spec, key=0)
        step = build_step(model, de, spec)
        assert getattr(step, "fused", False)
        state = step.to_fused(state)
        sup = step.get_superstep()
        K = step.superstep_k if sup is not None else 1
        per = slope_time(step, state, sup, K, reps=reps)
        print(f"{label:52s} per-step {per:7.2f} us  "
              f"({C / per:7.1f}M chain-steps/s)"
              f"  [K={K if sup is not None else 1}]", flush=True)
        return per
    finally:
        fused_mod.MIG_MAX_G = old_max
        fused_mod.mig_sorted_ok = old_ok


def main():
    print("backend:", jax.default_backend(), flush=True)
    if not bitexact_4096():
        print("BITEXACT FAILED — aborting bench", flush=True)
        sys.exit(1)

    # 65k-chain headline config (bench.py's 65k entry)
    bench_g(4096, 0.0, "65k a=0 floor")
    bench_g(4096, 0.1, "65k a=0.1 sorted in-kernel (default)", reps=8)
    bench_g(4096, 0.1, "65k a=0.1 XLA cond (old default)", force="cond")
    bench_g(4096, 0.1, "65k a=0.1+snooker sorted (bench cfg)",
            theta_snooker=0.1)
    bench_g(4096, 0.1, "65k a=0.1+snooker XLA cond (old)",
            theta_snooker=0.1, force="cond")

    # crossover: sorted (default) vs one-hot at the boundary Gs
    for G in (256, 512, 1024):
        bench_g(G, 0.1, f"{G*16//1024}k a=0.1 one-hot in-kernel",
                force="onehot")
        bench_g(G, 0.1, f"{G*16//1024}k a=0.1 sorted in-kernel")


if __name__ == "__main__":
    main()
