"""On-chip bitexactness of EVERY in-kernel migration geometry vs the
numpy oracle (ADVICE r3 item 1 + the round-4 padded lattice):

* one-hot [G, G] matrices                      (G=32,  Np=4)
* sorted, strided UNROLLED network             (G=32,  Np=4)
* sorted, compact-unrolled (compress/widen)    (G=1024, Np=4)
* sorted, compact LOOP-ROLLED (dyn rotates)    (G=4096, Np=3)
* sorted, padded-compact (non-pow2 Gr=24->32)  (G=192, Np=4)
* sorted, padded-compact (Gr=40->64)           (G=320, Np=5)

Same fixtures as tests/test_fused_step.py's tpu-marked test (this
plain-python runner exists because the axon harness and pytest's
platform override interact badly).  Run ALONE on the TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import numpy as np

import jax

CASES = [("onehot", 32, 4), ("sorted", 32, 4), ("sorted", 1024, 4),
         ("sorted", 4096, 3), ("sorted", 192, 4), ("sorted", 320, 5)]


def main():
    from test_fused_step import _np_migration_oracle, _run_mig_kernel
    print("devices:", jax.devices())
    ok_all = True
    for i, (variant, G, Np) in enumerate(CASES):
        rng_ = np.random.default_rng(3 + i)
        d = 3
        theta = (rng_.standard_normal((G, Np, d)) * 1e3
                 + rng_.random((G, Np, d)) * 1e-4).astype(np.float32)
        w = rng_.standard_normal((G, Np)).astype(np.float32)
        w[rng_.random((G, Np)) < 0.1] = -np.inf
        w[rng_.random((G, Np)) < 0.05] = np.inf
        u = rng_.random(G).astype(np.float32)
        gum = rng_.gumbel(size=(G, Np)).astype(np.float32)
        n_act = min(17, G)
        t0 = time.perf_counter()
        got_t, got_w = _run_mig_kernel(theta, w, u, n_act, gum,
                                       interpret=False, variant=variant)
        want_t, want_w = _np_migration_oracle(theta, w, u, n_act, gum)
        ok = (np.array_equal(got_t, want_t)
              and np.array_equal(got_w, want_w))
        ok_all = ok_all and ok
        print(f"[{'PASS' if ok else 'FAIL'}] {variant} G={G} Np={Np} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
    print("ALL PASS" if ok_all else "FAILURES PRESENT")
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
