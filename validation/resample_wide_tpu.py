"""On-chip validation of the WIDE (C > 128) fused resample layout
(verdict r4 item 6): C=512 DE-MCz with snooker on the streaming
engine — posterior vs the quadrature oracle, plus per-step timing vs
the XLA step.  Run ALONE on the real TPU."""
import time

import numpy as np
import jax

from demcmc_tpu import sample
from demcmc_tpu.models import gaussian
from demcmc_tpu.ops import fused_step
from demcmc_tpu.sampler import build_step, make_spec


def run(n_groups=128, Np=4, n_iter=20_000, fused="auto"):
    import os
    os.environ["DEMCMC_FUSED"] = fused
    data = np.asarray(np.random.default_rng(0).standard_normal(50),
                      np.float32)
    model, de = gaussian.make(data=data, Np=Np, n_groups=n_groups,
                              alpha=0.0, sample="resample",
                              n_initial=50, burnin=1000,
                              theta_snooker=0.1, sweep="sync")
    C = n_groups * Np
    spec = make_spec(model, de)
    step = build_step(model, de, spec)
    is_fused = getattr(step, "fused", False)
    print(f"C={C} fused={is_fused} "
          f"layout={fused_step.resample_layout(de) if is_fused else '-'}",
          flush=True)
    t0 = time.perf_counter()
    chains = sample(model, de, n_iter, key=11, thin=10)
    wall = time.perf_counter() - t0
    # warm second run for the timing figure
    t0 = time.perf_counter()
    chains = sample(model, de, n_iter, key=12, thin=10)
    warm = time.perf_counter() - t0
    ref = gaussian.posterior_grid(data)
    means = chains.data.mean(axis=(0, 2))
    stds = chains.data.std(axis=(0, 2))
    print(f"  cold {wall:.1f}s warm {warm:.2f}s "
          f"({warm / n_iter * 1e6:.2f} us/iter, "
          f"{C * n_iter / warm / 1e6:.1f}M chain-steps/s)", flush=True)
    print(f"  mu   mean {means[0]:+.4f} (ref {ref['mu']['mean']:+.4f})  "
          f"std {stds[0]:.4f} (ref {ref['mu']['std']:.4f})", flush=True)
    print(f"  sig  mean {means[1]:+.4f} (ref {ref['sigma']['mean']:+.4f}) "
          f"std {stds[1]:.4f} (ref {ref['sigma']['std']:.4f})", flush=True)
    ok = (abs(means[0] - ref["mu"]["mean"]) < 0.03
          and abs(means[1] - ref["sigma"]["mean"]) < 0.03
          and abs(stds[0] - ref["mu"]["std"]) < 0.03
          and abs(stds[1] - ref["sigma"]["std"]) < 0.03)
    print(f"  posterior {'PASS' if ok else 'FAIL'}", flush=True)
    return warm / n_iter


def main():
    print("backend:", jax.default_backend(), flush=True)
    fused_t = run(fused="auto")
    xla_t = run(n_iter=2000, fused="off")
    print(f"speedup vs XLA step: {xla_t / fused_t:.1f}x", flush=True)


if __name__ == "__main__":
    main()
