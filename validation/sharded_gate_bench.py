"""Sharded fused-step cost vs the unsharded floor (VERDICT r3 item 4).

Under a mesh the whole-step Pallas kernel composes with shard_map but
migration runs at XLA level between launches.  Round 4 gates that
exchange behind a lax.cond (the kernel call stays OUTSIDE the cond), so
unfired iterations skip the argsort+gather entirely.  This script
quantifies, on ONE real chip via a 1-device mesh (the only sharded
timing this environment allows — build_step normally collapses a
1-device mesh, so the wrapped builder is called directly):

  a) unsharded fused, alpha=0       — the floor (K-superstep)
  b) unsharded fused, alpha=0.1     — in-kernel migration (superstep)
  c) sharded,  alpha=0.001, cond    — unfired-dominated, gate pays off
  d) sharded,  alpha=0.001, branchless — what round 3 always paid
  e) sharded,  alpha=0.1, cond / branchless

Writes SHARDED_GATE.json at the repo root.  Run ALONE on the TPU.
"""

import json
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
                                build_step, init_state, make_spec)

N_ITER = 20_000


def time_scan(step, state, n_iter, use_super=False):
    fn = step
    k = 1
    if use_super:
        sup = step.get_superstep()
        if sup is not None:
            fn, k = sup, step.superstep_k

    @jax.jit
    def run(s, dummy):
        s, _ = jax.lax.scan(lambda c, _: (fn(c)[0], None), s, None,
                            length=dummy.shape[0])
        return s

    n = jnp.zeros(n_iter // k, jnp.int8)
    s = run(state, n)
    jax.block_until_ready(s)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        s = run(s, n)
        jax.block_until_ready(s)
        times.append(time.perf_counter() - t0)
    t = sorted(times)[1]
    assert t > 0.025, f"implausible timing {times}"
    return t / ((n_iter // k) * k)


def build(alpha, mesh=None, gate=None, replay=None):
    if gate is not None:
        os.environ["DEMCMC_MIG_GATE"] = gate
    else:
        os.environ.pop("DEMCMC_MIG_GATE", None)
    # replay=True (default when eligible): in-kernel boundary replay of
    # the coalesced window events (round 5); replay=False forces the
    # XLA mig_multi replay (the round-4 behavior) for A/B
    if replay is None:
        os.environ.pop("DEMCMC_MIG_REPLAY", None)
    else:
        os.environ["DEMCMC_MIG_REPLAY"] = "1" if replay else "0"
    model, de = gaussian.make(key=0, n_obs=50, n_groups=256, Np=16,
                              burnin=100, alpha=alpha)
    spec = make_spec(model, de)
    if mesh is None:
        step = build_step(model, de, spec)
    else:
        step = _build_fused_wrapped(model, de, spec, mesh=mesh)
    assert getattr(step, "fused", False)
    state = init_state(model, de, spec, key=0)
    state = _shard_state(state, mesh)
    state = step.to_fused(state)
    return step, state


def main():
    print("devices:", jax.devices())
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("chains",))
    out = {}

    step, st = build(0.0)
    out["unsharded_alpha0_us"] = time_scan(step, st, N_ITER,
                                           use_super=True) * 1e6
    step, st = build(0.1)
    out["unsharded_alpha01_us"] = time_scan(step, st, N_ITER,
                                            use_super=True) * 1e6
    for alpha, tag in ((0.001, "a001"), (0.1, "a01")):
        for gate in ("cond", "branchless"):
            step, st = build(alpha, mesh=mesh1, gate=gate, replay=False)
            out[f"sharded_{tag}_{gate}_us"] = time_scan(
                step, st, N_ITER) * 1e6
        # coalesced mesh superstep with the round-4 XLA boundary
        # replay (mig_multi) — kept for A/B
        step, st = build(alpha, mesh=mesh1, gate="cond", replay=False)
        out[f"sharded_{tag}_super_xla_us"] = time_scan(
            step, st, N_ITER, use_super=True) * 1e6
        # round 5: the window events replay IN-kernel (mig_replay —
        # shard-local group space, the 1-device structure) — no XLA
        # work between launches at all
        step, st = build(alpha, mesh=mesh1, gate="cond", replay=True)
        out[f"sharded_{tag}_super_us"] = time_scan(
            step, st, N_ITER, use_super=True) * 1e6
    out["ratio_sharded_a001_cond_vs_floor"] = round(
        out["sharded_a001_cond_us"] / out["unsharded_alpha0_us"], 3)
    out["ratio_sharded_a001_branchless_vs_floor"] = round(
        out["sharded_a001_branchless_us"] / out["unsharded_alpha0_us"], 3)
    out["ratio_sharded_a001_super_vs_floor"] = round(
        out["sharded_a001_super_us"] / out["unsharded_alpha0_us"], 3)
    out["ratio_sharded_a01_super_vs_unsharded_a01"] = round(
        out["sharded_a01_super_us"] / out["unsharded_alpha01_us"], 3)
    out = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in out.items()}
    out["config"] = "gaussian 4096 chains (G=256, Np=16), 20k iters"
    out["note"] = ("1-device mesh: shard_map composition + migration "
                   "gating, the structure a real multi-chip run uses; "
                   "cond gate skips the exchange on unfired steps; "
                   "'super_xla' = coalesced K-superstep with the XLA "
                   "boundary replay (mig_multi, round 4); 'super' = the "
                   "round-5 IN-kernel boundary replay (mig_replay: the "
                   "window's events apply inside the kernel at k==0 "
                   "when the migration group space is shard-local — no "
                   "XLA work between launches)")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SHARDED_GATE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
