"""One-process TPU batch for the round-2 follow-ups (single grant claim):

1. K-superstep scan (K=8/16/32) — does SUPER_K=8 leave launch overhead?
2. cond vs branchless big-G migration gate at 65k chains
3. on-chip in-kernel-migration bitexactness (the tpu-marked test)
4. full bench.py headline refresh

Run ALONE:  PYTHONPATH=/root/.axon_site:/root/repo python validation/tpu_batch_r02.py
"""
import importlib.util
import sys
import traceback

import jax


def section(name):
    print(f"\n===== {name} =====", flush=True)


def run_guarded(name, fn):
    section(name)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print(f"[{name}] FAILED (continuing)", flush=True)


def mig_bitexact():
    import numpy as np
    spec = importlib.util.spec_from_file_location(
        "tfs", "/root/repo/tests/test_fused_step.py")
    tfs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tfs)
    rng_ = np.random.default_rng(3)
    G, Np, d = 32, 4, 3
    theta = (rng_.standard_normal((G, Np, d)) * 1e3
             + rng_.random((G, Np, d)) * 1e-4).astype(np.float32)
    w = rng_.standard_normal((G, Np)).astype(np.float32)
    u = rng_.random(G).astype(np.float32)
    gum = rng_.gumbel(size=(G, Np)).astype(np.float32)
    got_t, got_w = tfs._run_mig_kernel(theta, w, u, 17, gum,
                                       interpret=False)
    want_t, want_w = tfs._np_migration_oracle(theta, w, u, 17, gum)
    np.testing.assert_array_equal(got_t, want_t)
    np.testing.assert_array_equal(got_w, want_w)
    print("in-kernel migration BITEXACT on chip", flush=True)


def blocked_fused_check():
    """On-chip sanity of the in-kernel block sweeps (new this session):
    blocked Gaussian posterior vs the quadrature oracle."""
    import numpy as np
    from demcmc_tpu import sample
    from demcmc_tpu.models import gaussian
    from demcmc_tpu.sampler import build_step, make_spec

    data = np.asarray(np.random.default_rng(3).normal(0, 1, 50),
                      np.float32)
    model, de = gaussian.make(data=data, Np=4, n_groups=32, burnin=500,
                              blocking_on=True,
                              blocks=[[True, False], [False, True]])
    step = build_step(model, de, make_spec(model, de))
    assert getattr(step, "fused", False), "blocked config not fused"
    c = sample(model, de, 3000, key=13)
    ref = gaussian.posterior_grid(np.asarray(data, np.float64))
    dm = abs(c.mean("mu") - ref["mu"]["mean"])
    ds = abs(c.mean("sigma") - ref["sigma"]["mean"])
    print(f"blocked fused on chip: dmu {dm:.4f} dsigma {ds:.4f} "
          f"(tol 0.03)", flush=True)
    assert dm < 0.03 and ds < 0.03


def main():
    print("backend:", jax.default_backend(), "devices:", jax.devices(),
          flush=True)

    # bench FIRST: it is the round artifact — if the grant dies
    # mid-batch the headline refresh must already be on disk
    sys.path.insert(0, "/root/repo")
    import bench
    run_guarded("bench.py headline", bench.main)

    run_guarded("in-kernel migration bitexact", mig_bitexact)

    run_guarded("blocked fused sweep on chip", blocked_fused_check)

    import ksuper_bench
    run_guarded("K-superstep scan", ksuper_bench.main)

    import mig_gate_bench
    run_guarded("migration gate cond-vs-branchless", mig_gate_bench.main)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo/validation")
    main()
