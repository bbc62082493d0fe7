"""Statistical validation of the COALESCED mesh-superstep migration law
on the real chip.

The coalesced path (sharded K-window launches accumulate the in-window
Bernoulli(α) gate count in-kernel; ``mig_multi`` replays the events at
the window boundary — PARITY.md delta 6) is bitwise-tested against a
stitch on the CPU harness, but its LAW — that deferring migration
events to window boundaries leaves the posterior exact — deserves a
statistical check too.  This runs it aggressively: α = 0.5 with K = 16
windows, so almost every window coalesces MULTIPLE events (mean 8)
through the fori_loop replay path, on a 1-device mesh (build_step
collapses 1-device meshes, so the wrapped builder is called directly —
the same structure a real multi-chip run uses).

Since round 5 the default on a shard-local group space is the
IN-KERNEL boundary replay (``mig_replay``), so a plain run validates
that law; ``DEMCMC_MIG_REPLAY=0`` re-validates the XLA ``mig_multi``
replay.  Recorded on v5e 2026-08-21: BOTH pass (in-kernel: mu mean
0.0014/sd 0.1426 vs oracle 0.0015/0.1434; XLA: 0.0016/0.1426 — sigma
likewise within 1e-3).

Asserts the posterior mean/sd of both parameters against the 2-D
quadrature oracle at the resolution the draw count supports.  Run ALONE
on the TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from demcmc_tpu.models import gaussian
from demcmc_tpu.sampler import (_build_fused_wrapped, _shard_state,
                                init_state, make_spec)

N_ITER = 40_000
BURN = 1_000


def main():
    print("devices:", jax.devices())
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("chains",))
    model, de = gaussian.make(key=3, n_obs=50, n_groups=64, Np=8,
                              burnin=BURN, alpha=0.5)
    spec = make_spec(model, de)
    step = _build_fused_wrapped(model, de, spec, mesh=mesh1)
    sup = step.get_superstep()
    assert sup is not None, "coalesced mesh superstep must be available"
    K = step.superstep_k
    state = step.to_fused(_shard_state(init_state(model, de, spec, 11),
                                       mesh1))

    @jax.jit
    def run(s, dummy):
        def body(c, _):
            c, out = sup(c)
            return c, out.theta      # [K, d, R, Cf]
        s, traj = jax.lax.scan(body, s, None, length=dummy.shape[0])
        return s, traj

    n_win = N_ITER // K
    t0 = time.perf_counter()
    s, traj = run(state, jnp.zeros((n_win,), jnp.int8))
    jax.block_until_ready(traj)                          # [W, K, d, R, Cf]
    wall = time.perf_counter() - t0
    d = spec.dim

    @jax.jit
    def moments(tr):
        # post-burnin mean/sd per parameter ON device — the trajectory
        # is ~160 MB and the tunnel moves ~1-2 MB/s; only 4 scalars
        # cross the host link
        x = tr.reshape(-1, d, tr.shape[-2] * tr.shape[-1])[BURN:]
        return x.mean(axis=(0, 2)), x.std(axis=(0, 2))

    means, sds = (np.asarray(a) for a in moments(traj))
    want = gaussian.posterior_grid(np.asarray(model.data))
    ok = True
    for i, name in enumerate(("mu", "sigma")):
        m, sd = means[i], sds[i]
        wm, wsd = want[name]["mean"], want[name]["std"]
        good = abs(m - wm) < 0.02 and abs(sd - wsd) < 0.02
        ok &= good
        print(f"[{'PASS' if good else 'FAIL'}] {name}: mean {m:.4f} vs "
              f"{wm:.4f}, sd {sd:.4f} vs {wsd:.4f} (atol 0.02)")
    print(f"{N_ITER} iterations x 512 chains, alpha=0.5, K={K} "
          f"coalesced windows, wall {wall:.1f}s")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
