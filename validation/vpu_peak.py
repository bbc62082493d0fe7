"""Measure the chip's peak VPU element-op rate — the roofline anchor.

The roofline (``demcmc_tpu/utils/roofline.py``) counts one slot per
(8, 128)-padded vreg of every compute primitive's output and divides by
``VPU_ELEM_OPS_PER_S``.  That anchor must be the rate THIS chip
demonstrably streams vector work at, measured in the SAME units the
counter counts — otherwise pct_of_floor is meaningless (round 4 first
anchored on the round-2 LBA saturation point, 0.96e12 el-ops/s, and the
optimized kernels then "beat the floor" 1.3-2.6x: that number reflected
one ALU's issue rate, not the chip).

Method: a Pallas kernel over a [64, 1024] f32 block (64 vregs of ILP
per op) running an unrolled chain of K mutually-dependent mul/sub pairs
(no constant-foldable structure), grid-amortized; rate = primitives ×
vregs × 1024 / wall.  The same jaxpr-walking counter verifies the slot
count, so anchor and counter cannot drift apart.

Writes the measured rate to stdout; update ``VPU_ELEM_OPS_PER_S`` (and
NOTES.md) from it.  Run ALONE on the TPU.
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 64, 1024          # 64 sublanes x 1024 lanes = 64 vregs
K_OPS = 512              # primitives per grid step (256 mul/sub pairs)
GRID = 8192


def kernel(x_ref, o_ref, acc_sc, b_sc):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_sc[:] = x_ref[:]
        b_sc[:] = x_ref[:] * np.float32(0.9999)

    acc = acc_sc[:]
    b = b_sc[:]
    for _ in range(K_OPS // 2):
        acc = acc * b            # mutually dependent pair: neither op
        b = b - acc              # can fold or reassociate away
    acc_sc[:] = acc
    b_sc[:] = b

    @pl.when(pl.program_id(0) == GRID - 1)
    def _():
        # tiny output: a [8, 128] corner — the timed loop forces a HOST
        # read of it per rep, which cannot phantom-complete (blocking a
        # single device output over the tunnel can; see bench.py)
        o_ref[:] = acc_sc[:8, :128] + b_sc[:8, :128]


def kernel_exp(x_ref, o_ref, acc_sc, b_sc):
    """Dependent exp chain: measures the transcendental slot rate (the
    values saturate to inf immediately — VPU latency is value-blind)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_sc[:] = x_ref[:]

    acc = acc_sc[:]
    for _ in range(K_OPS):
        acc = jnp.exp(acc)
    acc_sc[:] = acc

    @pl.when(pl.program_id(0) == GRID - 1)
    def _():
        o_ref[:] = acc_sc[:8, :128]


def kernel_fma(x_ref, o_ref, acc_sc, b_sc):
    """Dependent a*b+c chain: every mul/add pair fuses into one VPU FMA
    instruction, so this measures the chip's PEAK counted-slot rate (2
    counted slots per instruction) — the speed-of-light anchor."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_sc[:] = x_ref[:]
        b_sc[:] = x_ref[:] * np.float32(0.9999)

    acc = acc_sc[:]
    b = b_sc[:]
    for _ in range(K_OPS // 2):
        acc = acc * b + b        # one FMA: 2 counted slots, 1 instr
    acc_sc[:] = acc

    @pl.when(pl.program_id(0) == GRID - 1)
    def _():
        o_ref[:] = acc_sc[:8, :128]


def kernel_select(x_ref, o_ref, acc_sc, b_sc):
    """Dependent compare+select chain (the select/mask class the fused
    kernel's gather/seg-scan machinery is made of): alternating
    ``m = acc < b`` / ``acc = where(m, b*c, acc)`` — neither pairable
    into an FMA nor foldable.  Measures the class-B anchor for the
    class-resolved roofline (verdict r5 item 2)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_sc[:] = x_ref[:]
        b_sc[:] = x_ref[:] * np.float32(0.9999)

    acc = acc_sc[:]
    b = b_sc[:]
    for _ in range(K_OPS // 2):
        m = acc < b                    # 1 counted slot (compare)
        acc = jnp.where(m, b, acc)     # 1 counted slot (select)
    acc_sc[:] = acc
    b_sc[:] = b

    @pl.when(pl.program_id(0) == GRID - 1)
    def _():
        o_ref[:] = acc_sc[:8, :128]


def kernel_roll(x_ref, o_ref, acc_sc, b_sc):
    """Dependent lane-roll chain: measures the cross-lane permute rate
    (the fused kernel's gather/scan machinery is roll-heavy; if the
    permute network streams slower than ALU slots, rolls need their own
    roofline class)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_sc[:] = x_ref[:]

    acc = acc_sc[:]
    for i in range(K_OPS):
        acc = pltpu.roll(acc, 1 + (i & 3), axis=1)
    acc_sc[:] = acc

    @pl.when(pl.program_id(0) == GRID - 1)
    def _():
        o_ref[:] = acc_sc[:8, :128]


def main():
    print("devices:", jax.devices())
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0.99, 1.01, (R, L)), jnp.float32)
    call = pl.pallas_call(
        kernel,
        grid=(GRID,),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R, L), jnp.float32),
                        pltpu.VMEM((R, L), jnp.float32)],
    )
    fn = jax.jit(call)

    # cross-check: the roofline's own jaxpr counter must count this
    # kernel at K_OPS slots x 64 vregs per grid step (plus the tiny
    # init/output regions) — the anchor is only meaningful in the
    # counter's units, so a drift in counting rules fails HERE instead
    # of silently skewing every pct_of_floor
    from demcmc_tpu.utils import roofline

    def find_pallas(jaxpr):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "pallas_call":
                return eqn
            for key in roofline._CALLS:
                v = eqn.params.get(key)
                if v is not None:
                    vs = v if isinstance(v, (tuple, list)) else (v,)
                    for s in vs:
                        got = find_pallas(getattr(s, "jaxpr", s))
                        if got is not None:
                            return got
        return None

    closed = jax.make_jaxpr(call)(x)
    eqn = find_pallas(closed.jaxpr)
    assert eqn is not None
    slots = roofline._walk(eqn.params["jaxpr"])
    want = K_OPS * (R * L) / (8 * 128)
    assert abs(slots - want) / want < 0.05, (
        f"counter drift: counted {slots} slots, kernel issues ~{want}")
    print(f"counter cross-check OK: {slots:.0f} counted slots vs "
          f"{want:.0f} issued per grid step")

    np.asarray(fn(x))                       # warmup incl. compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(fn(x)).sum())      # host read: real completion
        times.append(time.perf_counter() - t0)
    t = sorted(times)[len(times) // 2]
    assert t > 0.025, f"implausible timing {times}"
    el_ops = K_OPS * GRID * R * L
    rate = el_ops / t
    print(f"wall {t*1e3:.2f} ms for {el_ops/1e9:.1f} G element-ops")
    print(f"measured VPU element-op rate: {rate:.4e} el-ops/s "
          f"({rate / (8 * 128) / 1e9:.2f} G vreg-slots/s)")

    grid_e = GRID // 4
    call_e = pl.pallas_call(
        kernel_exp,
        grid=(grid_e,),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R, L), jnp.float32),
                        pltpu.VMEM((R, L), jnp.float32)],
    )
    fn_e = jax.jit(call_e)
    np.asarray(fn_e(x))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(fn_e(x)).sum())
        times.append(time.perf_counter() - t0)
    te = sorted(times)[len(times) // 2]
    assert te > 0.025, f"implausible timing {times}"
    exp_ops = K_OPS * grid_e * R * L
    rate_e = exp_ops / te
    print(f"exp chain: wall {te*1e3:.2f} ms for {exp_ops/1e9:.1f} G exps")
    print(f"measured exp rate: {rate_e:.4e} exp-el/s")

    call_f = pl.pallas_call(
        kernel_fma,
        grid=(GRID,),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R, L), jnp.float32),
                        pltpu.VMEM((R, L), jnp.float32)],
    )
    fn_f = jax.jit(call_f)
    np.asarray(fn_f(x))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(fn_f(x)).sum())
        times.append(time.perf_counter() - t0)
    tf = sorted(times)[len(times) // 2]
    assert tf > 0.025, f"implausible timing {times}"
    fma_ops = K_OPS * GRID * R * L       # 2 counted slots per fused pair
    rate_f = fma_ops / tf
    print(f"fma chain: wall {tf*1e3:.2f} ms for {fma_ops/1e9:.1f} G "
          f"counted el-ops")
    print(f"PEAK counted-slot rate (FMA-paired): {rate_f:.4e} el-ops/s")
    print(f"transcendental weight vs peak = {rate_f / rate_e:.2f}")

    call_s = pl.pallas_call(
        kernel_select,
        grid=(GRID,),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R, L), jnp.float32),
                        pltpu.VMEM((R, L), jnp.float32)],
    )
    fn_s = jax.jit(call_s)
    np.asarray(fn_s(x))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(fn_s(x)).sum())
        times.append(time.perf_counter() - t0)
    ts = sorted(times)[len(times) // 2]
    assert ts > 0.025, f"implausible timing {times}"
    sel_ops = K_OPS * GRID * R * L
    rate_s = sel_ops / ts
    print(f"select chain: wall {ts*1e3:.2f} ms for {sel_ops/1e9:.1f} G "
          f"counted el-ops")
    print(f"measured compare+select rate: {rate_s:.4e} el-ops/s")

    grid_r = GRID // 4
    call_r = pl.pallas_call(
        kernel_roll,
        grid=(grid_r,),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R, L), jnp.float32),
                        pltpu.VMEM((R, L), jnp.float32)],
    )
    fn_r = jax.jit(call_r)
    np.asarray(fn_r(x))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(fn_r(x)).sum())
        times.append(time.perf_counter() - t0)
    tr = sorted(times)[len(times) // 2]
    assert tr > 0.025, f"implausible timing {times}"
    roll_ops = K_OPS * grid_r * R * L
    rate_r = roll_ops / tr
    print(f"roll chain: wall {tr*1e3:.2f} ms for {roll_ops/1e9:.1f} G "
          f"counted el-ops")
    print(f"measured lane-roll rate: {rate_r:.4e} el-ops/s")


if __name__ == "__main__":
    main()
