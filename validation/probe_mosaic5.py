"""Bisect the one-stage compare-exchange crash (probe_mosaic4 5a).

Constructs under suspicion (each probed alone on [8, 256]):
  A  jnp.where with BOOL value operands
  B  bool == bool compare
  C  full-array int32 -> f32 astype
  D  one-stage exchange in a "safe" formulation: swap parity via int
     add/mod (no bool==bool, no where-on-bool), f32-only where
  E  full bitonic sort (G=512, Np=4, Gr=64) in the safe formulation
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, W = 8, 256
Gr, Np = 64, 4
Cf = Gr * Np            # 256
G = R * Gr              # 512


INTERP = bool(int(__import__("os").environ.get("PROBE_INTERPRET", "0")))


def run(name, kernel, out_shape, *args):
    print(f"[{name}] compiling...", flush=True)
    try:
        f = pl.pallas_call(
            kernel, out_shape=out_shape,
            interpret=pltpu.InterpretParams() if INTERP else False)
        out = jax.jit(f)(*args)
        out = jax.tree.map(np.asarray, out)
        print(f"[{name}] ran", flush=True)
        return out
    except Exception as e:
        print(f"[{name}] FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


def sub_roll(x, k):
    return pltpu.roll(x, int(k) % x.shape[0], axis=0)


def main():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((R, W)).astype(np.float32)
    u = rng.random((R, Cf)).astype(np.float32)
    vals = rng.standard_normal((R, Cf)).astype(np.float32) * 1e3

    # ---- A: where with bool operands --------------------------------------
    def kA(x_ref, o_ref):
        v = x_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        b1 = lane % 2 == 0
        b2 = v > 0
        b3 = v < 1
        o_ref[:] = jnp.where(b1, b2, b3).astype(jnp.float32)
    out = run("A where-bool", kA, jax.ShapeDtypeStruct((R, W), jnp.float32),
              x)
    if out is not None:
        lane = np.arange(W)[None, :]
        want = np.where(lane % 2 == 0, x > 0, x < 1).astype(np.float32)
        print(f"[A] exact={np.array_equal(out, want)}", flush=True)

    # ---- B: bool == bool ---------------------------------------------------
    def kB(x_ref, o_ref):
        v = x_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        b1 = lane % 2 == 0
        b2 = v > 0
        o_ref[:] = (b1 == b2).astype(jnp.float32)
    out = run("B bool-eq-bool", kB,
              jax.ShapeDtypeStruct((R, W), jnp.float32), x)
    if out is not None:
        lane = np.arange(W)[None, :]
        want = ((lane % 2 == 0) == (x > 0)).astype(np.float32)
        print(f"[B] exact={np.array_equal(out, want)}", flush=True)

    # ---- C: int32 -> f32 astype -------------------------------------------
    def kC(x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
        o_ref[:] = (row * 31 + lane).astype(jnp.float32) + x_ref[:] * 0.0
    out = run("C int2f32", kC, jax.ShapeDtypeStruct((R, W), jnp.float32), x)
    if out is not None:
        want = (np.arange(R)[:, None] * 31
                + np.arange(W)[None, :]).astype(np.float32)
        print(f"[C] exact={np.array_equal(out, want)}", flush=True)

    # ---- D: one-stage exchange, safe formulation ---------------------------
    def stage(ku, kg, payloads, kidx, step, phase):
        je = step
        if je < Gr:
            j = je * Np
            bit0 = (kidx // je) % 2
            f = [jnp.where(bit0 == 0, pltpu.roll(v, Cf - j, axis=1),
                           pltpu.roll(v, j, axis=1))
                 for v in (ku, kg) + tuple(payloads)]
        else:
            jr = je // Gr
            bit0 = (kidx // je) % 2
            f = [jnp.where(bit0 == 0, sub_roll(v, -jr), sub_roll(v, jr))
                 for v in (ku, kg) + tuple(payloads)]
        pu, pg, pp = f[0], f[1], f[2:]
        less = (ku < pu) | ((ku == pu) & (kg < pg))
        less_i = less.astype(jnp.int32)
        parity = (kidx // step + kidx // (2 * phase)) % 2
        keep = (less_i + parity) % 2 == 1
        ku = jnp.where(keep, ku, pu)
        kg = jnp.where(keep, kg, pg)
        payloads = [jnp.where(keep, v, q) for v, q in zip(payloads, pp)]
        return ku, kg, payloads

    def kD(u_ref, v_ref, ou, ov):
        ku, kv = u_ref[:], v_ref[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 1)
        kidx = row * Gr + lane // Np
        kg = (row * 31 + lane).astype(jnp.float32) * 0.0 \
            + kidx.astype(jnp.float32)
        ku2, kg2, pays = stage(ku, kg, [kv], kidx, 2, 2)
        ou[:] = ku2
        ov[:] = pays[0]
    out = run("D one-stage-safe", kD,
              (jax.ShapeDtypeStruct((R, Cf), jnp.float32),
               jax.ShapeDtypeStruct((R, Cf), jnp.float32)), u, vals)

    # ---- E: full bitonic, safe formulation ---------------------------------
    def kE(u_ref, v_ref, ou, ov):
        ku, kv = u_ref[:], v_ref[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 1)
        kidx = row * Gr + lane // Np
        kg = kidx.astype(jnp.float32)
        payloads = [kv]
        phase = 1
        while phase < G:
            step_ = phase
            while step_ >= 1:
                ku, kg, payloads = stage(ku, kg, payloads, kidx, step_,
                                         phase)
                step_ //= 2
            phase *= 2
        ou[:] = ku
        ov[:] = payloads[0]
    out = run("E full-bitonic-safe", kE,
              (jax.ShapeDtypeStruct((R, Cf), jnp.float32),
               jax.ShapeDtypeStruct((R, Cf), jnp.float32)), u, vals)
    if out is not None:
        su, sv = out
        gs = np.arange(G)
        rr, bb = gs // Gr, (gs % Gr) * Np
        # keys here are LANE-resident (not leader-bcast): check leader
        # lanes only after sorting leader-consistent blocks is NOT
        # guaranteed in this probe — instead sort each (row-major) key
        # stream elementwise: every lane carries its own (u, kidx) key,
        # so lanes within a block may diverge.  Validate per-lane-slot:
        for s in range(Np):
            lu = u[gs // Gr, (gs % Gr) * Np + s]
            lv = vals[gs // Gr, (gs % Gr) * Np + s]
            order = np.lexsort((gs, lu))
            ok_u = np.array_equal(su[rr, bb + s], lu[order])
            ok_v = np.array_equal(sv[rr, bb + s], lv[order])
            if not (ok_u and ok_v):
                print(f"[E] slot {s}: sort_u={ok_u} payload={ok_v}",
                      flush=True)
                break
        else:
            print("[E] all slots sorted exactly", flush=True)

    print("probe_mosaic5 done", flush=True)


if __name__ == "__main__":
    main()
