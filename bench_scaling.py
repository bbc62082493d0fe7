"""Weak-scaling harness: chain-steps/s vs device count at fixed
chains-per-device (the BASELINE.json north-star: >= 90% efficiency
1 chip -> N).

Real multi-chip hardware is not available in this environment, so by
default this runs on N virtual CPU devices
(``--xla_force_host_platform_device_count``) — which validates the
sharding/collective structure and measures the parallel fraction, not
real ICI bandwidth.  On a real slice, run it unmodified with
``DEMCMC_SCALE_PLATFORM=tpu``.

Prints one JSON line per device count plus a final efficiency summary.
"""

import json
import os
import sys
import time

MAX_DEV = int(os.environ.get("DEMCMC_SCALE_MAX_DEVICES", "8"))
PLATFORM = os.environ.get("DEMCMC_SCALE_PLATFORM", "cpu")

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


def run_once(n_dev: int) -> float:
    model, de = gaussian.make(key=0, n_obs=50,
                              n_groups=GROUPS_PER_DEVICE * n_dev, Np=NP,
                              burnin=50)
    spec = make_spec(model, de)
    state = init_state(model, de, spec, key=0)
    mesh = chain_mesh(n_dev)
    state = _shard_state(state, mesh)
    step = build_step(model, de, spec)

    @jax.jit
    def run(s, dummy):
        s, _ = jax.lax.scan(lambda c, x: (step(c)[0], None), s, None,
                            length=dummy.shape[0])
        return s

    n = jnp.zeros(N_ITER, jnp.int8)
    s = run(state, n)
    jax.block_until_ready(s.theta)
    t0 = time.perf_counter()
    s = run(s, n)
    jax.block_until_ready(s.theta)
    dt = time.perf_counter() - t0
    return N_ITER * de.n_chains / dt


def main():
    devs = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(jax.devices())]
    results = {}
    for n in devs:
        tp = run_once(n)
        results[n] = tp
        print(json.dumps({"devices": n,
                          "chains": GROUPS_PER_DEVICE * n * NP,
                          "chain_steps_per_s": round(tp, 1),
                          "per_device": round(tp / n, 1)}), flush=True)
    base = results[devs[0]]
    eff = {n: results[n] / (n * base) for n in devs}
    print(json.dumps({
        "metric": f"weak-scaling efficiency vs 1 device ({PLATFORM})",
        "value": round(min(eff.values()), 3),
        "unit": "fraction",
        "per_device_efficiency": {str(n): round(e, 3)
                                  for n, e in eff.items()},
    }))


if __name__ == "__main__":
    main()
