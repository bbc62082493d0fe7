"""Scaling harness: weak scaling (fixed chains/device) plus a
fixed-total-chains overhead probe, with the host confound made explicit.

The BASELINE.json north star is >= 90% weak-scaling efficiency in
chain-steps/s from 1 chip to N >= 2 hosts.  **That number is only
measurable on real multi-chip hardware.**  This environment has ONE TPU
chip; by default this harness runs on N *virtual* CPU devices
(``--xla_force_host_platform_device_count``) on a host with
``os.cpu_count()`` physical cores.  Two consequences, both reported in
the output so the numbers cannot be misread:

* the raw weak-scaling "efficiency" on an oversubscribed host (8 virtual
  devices on 4 cores) is bounded above by cores/devices — mostly a
  measurement of the host, not the framework;
* the meaningful CPU-harness metric is the FIXED-TOTAL-chains comparison
  (same population partitioned over 1 vs N devices): since the total
  arithmetic is constant, the throughput delta isolates the
  partitioning + collective overhead the framework adds, which is the
  part the framework controls.

On a real slice, run unmodified with ``DEMCMC_SCALE_PLATFORM=tpu``.

Prints one JSON line per measurement plus a summary, and writes the
whole record to ``SCALING_r{N}.json`` (``DEMCMC_SCALING_OUT``).
"""

import json
import os
import sys
import time

MAX_DEV = int(os.environ.get("DEMCMC_SCALE_MAX_DEVICES", "8"))
PLATFORM = os.environ.get("DEMCMC_SCALE_PLATFORM", "cpu")
OUT_PATH = os.environ.get("DEMCMC_SCALING_OUT", "SCALING_r03.json")

import jax  # noqa: E402

if PLATFORM == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={MAX_DEV}"
        ).strip()
    jax.config.update("jax_platforms", None)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from demcmc_tpu.models import gaussian  # noqa: E402
from demcmc_tpu.parallel import chain_mesh  # noqa: E402
from demcmc_tpu.sampler import (_shard_state, build_step, init_state,  # noqa: E402
                                make_spec)

GROUPS_PER_DEVICE = 32
NP = 16
N_ITER = 200
FIXED_TOTAL_GROUPS = 64     # fixed-total-chains probe: 64 x 16 = 1024


def run_once(n_groups: int, n_dev: int) -> float:
    """chain-steps/s for n_groups groups sharded over n_dev devices."""
    model, de = gaussian.make(key=0, n_obs=50, n_groups=n_groups, Np=NP,
                              burnin=50)
    spec = make_spec(model, de)
    state = init_state(model, de, spec, key=0)
    mesh = chain_mesh(n_dev)
    state = _shard_state(state, mesh)
    # the fused Pallas step is single-device (and expects the fused state
    # layout); a mesh-sharded run must take the XLA step, same as sample()
    step = build_step(model, de, spec, allow_fused=False)

    @jax.jit
    def run(s, dummy):
        s, _ = jax.lax.scan(lambda c, x: (step(c)[0], None), s, None,
                            length=dummy.shape[0])
        return s

    n = jnp.zeros(N_ITER, jnp.int8)
    s = run(state, n)
    jax.block_until_ready(s.theta)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        s = run(s, n)
        jax.block_until_ready(s.theta)
        best = min(best, time.perf_counter() - t0)
    return N_ITER * de.n_chains / best


def main():
    cores = os.cpu_count()
    devs = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(jax.devices())]
    record = {
        "platform": PLATFORM,
        "physical_cpu_cores": cores,
        "virtual_devices": len(jax.devices()),
        "confound": None,
        "weak_scaling": [],
        "fixed_total_chains": [],
        "summary": {},
    }
    if PLATFORM == "cpu" and len(jax.devices()) > cores:
        record["confound"] = (
            f"{len(jax.devices())} virtual devices oversubscribe "
            f"{cores} physical cores: weak-scaling efficiency is bounded "
            f"above by ~{cores}/{len(jax.devices())} = "
            f"{cores / len(jax.devices()):.2f} by the HOST, independent "
            "of framework overhead.  The >=90% north star is only "
            "measurable on real multi-chip hardware; use the "
            "fixed_total_chains overhead probe on this harness instead.")

    # --- weak scaling: fixed chains per device --------------------------
    results = {}
    for n in devs:
        tp = run_once(GROUPS_PER_DEVICE * n, n)
        results[n] = tp
        row = {"devices": n, "chains": GROUPS_PER_DEVICE * n * NP,
               "chain_steps_per_s": round(tp, 1),
               "per_device": round(tp / n, 1)}
        record["weak_scaling"].append(row)
        print(json.dumps(row), flush=True)
    base = results[devs[0]]
    eff = {n: results[n] / (n * base) for n in devs}

    # --- fixed total chains: 1 device vs N ------------------------------
    # same arithmetic either way; the delta is partitioning + collective
    # overhead (plus host oversubscription on the CPU harness)
    fixed = {}
    for n in (devs[0], devs[-1]):
        tp = run_once(FIXED_TOTAL_GROUPS, n)
        fixed[n] = tp
        row = {"devices": n, "chains": FIXED_TOTAL_GROUPS * NP,
               "chain_steps_per_s": round(tp, 1)}
        record["fixed_total_chains"].append(row)
        print(json.dumps(row), flush=True)
    overhead_ratio = fixed[devs[-1]] / fixed[devs[0]]

    record["summary"] = {
        "metric": f"weak-scaling efficiency vs 1 device ({PLATFORM})",
        "value": round(min(eff.values()), 3),
        "unit": "fraction",
        "per_device_efficiency": {str(n): round(e, 3)
                                  for n, e in eff.items()},
        "fixed_total_chains_speedup": round(overhead_ratio, 3),
        "note": ("fixed_total_chains_speedup is throughput at "
                 f"{FIXED_TOTAL_GROUPS * NP} chains on {devs[-1]} devices "
                 "over 1 device; < 1 means partitioning/collective "
                 "overhead exceeds the parallel win at this size"),
    }
    print(json.dumps(record["summary"]))
    with open(OUT_PATH, "w") as f:
        json.dump(record, f, indent=1)
    print(f"[bench_scaling] wrote {OUT_PATH}")


if __name__ == "__main__":
    main()
