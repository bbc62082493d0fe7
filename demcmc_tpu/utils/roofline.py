"""Roofline accounting for the fused whole-step kernel.

Grounds the benchmark's "fast" in hardware terms (VERDICT r3 item 3):
for a fused configuration, walk the Pallas kernel's jaxpr and count the
VPU work it issues, express it as a per-iteration floor time, and report
the measured step time as a percentage of that floor.

Model (documented in NOTES.md):

* The VPU processes one (8, 128) f32 vreg per issue slot; the issue
  rate used here is the chip's DEMONSTRATED rate from round 2's LBA
  saturation analysis — ``VPU_ELEM_OPS_PER_S = 0.96e12`` element-ops/s
  (≈ 940 M vreg-slots/s on this v5e), the point where the fused and XLA
  paths converged on the same wall time.  This is an *empirical* anchor,
  not a datasheet number: it already includes issue overheads the
  datasheet hides, so "100% of floor" means "as fast as this chip has
  ever been observed to stream vector work".
* Every compute primitive costs 1 slot per (sublane-, lane-padded)
  vreg of its OUTPUT; transcendentals (exp/log/tanh/rsqrt/...) cost
  ``TRANSCENDENTAL_WEIGHT`` slots (multi-pass on the VPU).  Pure
  layout/metadata ops (reshape, convert, broadcast, slice, iota) cost 0
  — XLA/Mosaic fold or relayout them, and counting them would flatter
  the floor.
* The HBM floor counts the kernel's per-iteration off-chip traffic
  (trajectory output blocks + amortized launch I/O) against the v5e's
  819 GB/s.

The binding floor is the max of the two; ``pct_of_floor = floor /
measured``.  Loops inside the kernel (`while`) cannot be statically
counted — configurations containing them return ``None`` for the VPU
part rather than a wrong number (the bench configurations use the
unrolled sort network, which counts exactly).
"""

from __future__ import annotations

import numpy as np

import jax

# Peak anchors MEASURED on this chip by validation/vpu_peak.py
# (2026-08-20, v5e), in the SAME units the counter counts (slots per
# padded vreg of each primitive's output), so anchor and counter cannot
# drift apart:
#   * dependent a*b+c chain (every mul/add pair fuses to one VPU FMA):
#     2.26e12 counted el-ops/s — the chip's demonstrated peak;
#   * dependent mul/sub chain (no pairing): 1.80e12;
#   * dependent exp chain: 1.00e12 → one transcendental = 2.25
#     peak-slots.
# The PEAK (FMA-paired) rate is the anchor: pct_of_floor is then a true
# ≤-1-in-principle utilization, understated for select/compare-heavy
# code that cannot pair.  (Round 4's first anchor, 0.96e12 — the
# round-2 LBA saturation point — understated the chip 2.4x and the
# optimized kernels "beat the floor".)
VPU_ELEM_OPS_PER_S = 2.26e12     # measured peak counted el-ops/s (v5e)
HBM_BYTES_PER_S = 819e9          # v5e datasheet HBM bandwidth
_VREG = 8 * 128

TRANSCENDENTAL_WEIGHT = 2.25
_TRANSCENDENTAL = {"exp", "log", "log1p", "expm1", "tanh", "sin", "cos",
                   "rsqrt", "sqrt", "pow", "atan2", "cbrt", "logistic",
                   "erf", "erfc", "erf_inv", "lgamma", "digamma"}
# zero-cost layout/metadata ops (folded or free relayouts)
_FREE = {"reshape", "broadcast_in_dim", "convert_element_type", "iota",
         "squeeze", "bitcast_convert_type", "copy", "slice",
         "dynamic_slice", "dynamic_update_slice", "concatenate",
         "transpose", "rev", "get", "swap", "masked_load", "masked_swap",
         "program_id", "prng_seed", "stop_gradient"}
_CALLS = ("jaxpr", "call_jaxpr", "body_jaxpr", "cond_jaxpr")


def _vregs(shape) -> float:
    """Padded vreg count of an output shape (scalars -> 0: scalar core)."""
    if not shape:
        return 0.0
    lanes = -(-shape[-1] // 128) * 128
    subl = -(-(shape[-2] if len(shape) > 1 else 1) // 8) * 8
    lead = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    return lead * subl * lanes / _VREG


class _Uncountable(Exception):
    pass


def _walk(jaxpr) -> float:
    slots = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        length = 1
        if name == "while":
            raise _Uncountable("while loop (dynamic trip count)")
        if name == "scan":
            length = int(eqn.params.get("length", 1))
        subs = []
        for key in _CALLS:
            v = eqn.params.get(key)
            if v is None:
                continue
            vs = v if isinstance(v, (tuple, list)) else (v,)
            subs.extend(vs)
        for key in ("branches",):
            subs.extend(eqn.params.get(key, ()))
        if subs:
            inner = 0.0
            for s in subs:
                inner += _walk(getattr(s, "jaxpr", s))
            slots += length * inner
            continue
        if name in _FREE:
            continue
        w = TRANSCENDENTAL_WEIGHT if name in _TRANSCENDENTAL else 1.0
        for v in eqn.outvars:
            shape = getattr(v.aval, "shape", ())
            slots += w * _vregs(shape)
    return slots


def fused_floor(model, de, spec, K=None) -> dict | None:
    """Per-iteration floor times (µs) for the fused configuration, or
    None when the configuration is not fused / not statically countable.

    Returns ``{"vpu_floor_us", "hbm_floor_us", "floor_us"}``.
    """
    from ..ops import fused_step as fused_mod
    if not fused_mod.supported(model, de, spec):
        return None
    if K is None:
        K = fused_mod.super_k()
    G, Np, d = de.n_groups, de.Np, spec.dim
    alpha = float(de.alpha) if G > 1 else 0.0
    if alpha > 0.0:
        # The floor counts the ALWAYS-EXECUTED per-iteration work (an
        # α=0 build): migration is an O(α)-rate event whose branched
        # body would otherwise count fully on every iteration — the
        # round-4 first cut did that and reported a "floor" the kernel
        # beat 11x (the un-taken pl.when body dominated the count).
        # Excluding it biases the floor LOW, so pct_of_floor now
        # UNDERSTATES utilization on α > 0 configs — the safe direction.
        import dataclasses
        de = dataclasses.replace(de, alpha=0.0)
        alpha = 0.0
    try:
        kern = fused_mod.build_fused_step(model, de, spec, K=K,
                                          mig_in_kernel=False,
                                          interpret=False)
    except Exception:
        return None
    import jax.numpy as jnp
    R = fused_mod._R
    Cf = (G * Np) // R
    shapes = (jax.ShapeDtypeStruct((d, R, Cf), jnp.float32),
              jax.ShapeDtypeStruct((R, Cf), jnp.float32),
              jax.ShapeDtypeStruct((2,), jnp.uint32),
              jax.ShapeDtypeStruct((), jnp.int32),
              jax.ShapeDtypeStruct((1, 1), jnp.int32))
    closed = jax.make_jaxpr(kern)(*shapes)

    def find_pallas(jaxpr):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "pallas_call":
                return eqn
            for key in _CALLS:
                v = eqn.params.get(key)
                if v is not None:
                    vs = v if isinstance(v, (tuple, list)) else (v,)
                    for s in vs:
                        got = find_pallas(getattr(s, "jaxpr", s))
                        if got is not None:
                            return got
        return None

    eqn = find_pallas(closed.jaxpr)
    if eqn is None:
        return None
    inner = eqn.params["jaxpr"]
    try:
        slots = _walk(inner)        # one GRID STEP = one iteration
    except _Uncountable:
        return None
    vpu_floor_s = slots / (VPU_ELEM_OPS_PER_S / _VREG)
    # per-iteration HBM traffic: trajectory blocks out (theta, w, accept)
    traj_bytes = (d * R * Cf * 4) + (R * Cf * 4) + (R * Cf * 1)
    # launch-amortized state in/out
    state_bytes = 2.0 * (d * R * Cf + R * Cf) * 4 / max(K, 1)
    hbm_floor_s = (traj_bytes + state_bytes) / HBM_BYTES_PER_S
    return {"vpu_floor_us": vpu_floor_s * 1e6,
            "hbm_floor_us": hbm_floor_s * 1e6,
            "floor_us": max(vpu_floor_s, hbm_floor_s) * 1e6}
