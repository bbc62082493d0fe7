"""Bisect probe_mosaic3's strided-bitonic crash (probe 5).

Suspect: per-stage f32->int32 astype of the element index (kidx was
built f32, then `.astype(jnp.int32)` inside every stage).  Here kidx
stays int32 for all mask math; only gid (payload/tie-break) is f32,
converted ONCE via the verified int32->f32 direction.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8
Gr, Np = 8, 4
Cf = Gr * Np
G = R * Gr


def run(name, kernel, out_shape, *args):
    print(f"[{name}] compiling...", flush=True)
    try:
        f = pl.pallas_call(kernel, out_shape=out_shape)
        out = jax.jit(f)(*args)
        out = jax.tree.map(np.asarray, out)
        print(f"[{name}] ran", flush=True)
        return out
    except Exception as e:
        print(f"[{name}] FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


def sub_roll(x, k):
    return pltpu.roll(x, int(k) % x.shape[0], axis=0)


def lane_xor_pair(v, kidx, je):
    """Partner values at element distance je (elements = Np-lane blocks,
    row-major index r*Gr + b).  Within-row via lane rolls; cross-row via
    sublane rolls.  Mask bit from the INT32 element index."""
    bit0 = (kidx // je) % 2 == 0
    if je < Gr:
        j = je * Np
        return jnp.where(bit0, pltpu.roll(v, Cf - j, axis=1),
                         pltpu.roll(v, j, axis=1))
    jr = je // Gr
    return jnp.where(bit0, sub_roll(v, -jr), sub_roll(v, jr))


def main():
    rng = np.random.default_rng(0)
    u = rng.random((R, Cf)).astype(np.float32)
    vals = rng.standard_normal((R, Cf)).astype(np.float32) * 1e3

    # ---- 5a: single compare-exchange stage -------------------------------
    def k5a(u_ref, v_ref, ou, ov):
        ku, kv = u_ref[:], v_ref[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 1)
        kidx = row * Gr + lane // Np
        gid = kidx.astype(jnp.float32)
        je, phase = 2, 2
        pu = lane_xor_pair(ku, kidx, je)
        pv = lane_xor_pair(kv, kidx, je)
        pg = lane_xor_pair(gid, kidx, je)
        kbit = (kidx // je) % 2 == 0
        up = (kidx // (2 * phase)) % 2 == 0
        less = (ku < pu) | ((ku == pu) & (gid < pg))
        keep = jnp.where(kbit == up, less, ~less)
        ou[:] = jnp.where(keep, ku, pu)
        ov[:] = jnp.where(keep, kv, pv)
    out = run("5a one-stage", k5a,
              (jax.ShapeDtypeStruct((R, Cf), jnp.float32),
               jax.ShapeDtypeStruct((R, Cf), jnp.float32)), u, vals)

    # ---- 5b: full bitonic, int32 kidx ------------------------------------
    def k5b(u_ref, v_ref, ou, ov):
        ku, kv = u_ref[:], v_ref[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 1)
        kidx = row * Gr + lane // Np
        gid = kidx.astype(jnp.float32)
        phase = 1
        while phase < G:
            step = phase
            while step >= 1:
                pu = lane_xor_pair(ku, kidx, step)
                pv = lane_xor_pair(kv, kidx, step)
                pg = lane_xor_pair(gid, kidx, step)
                kbit = (kidx // step) % 2 == 0
                up = (kidx // (2 * phase)) % 2 == 0
                less = (ku < pu) | ((ku == pu) & (gid < pg))
                keep = jnp.where(kbit == up, less, ~less)
                ku = jnp.where(keep, ku, pu)
                kv = jnp.where(keep, kv, pv)
                gid = jnp.where(keep, gid, pg)
                step //= 2
            phase *= 2
        ou[:] = ku
        ov[:] = kv
    out = run("5b full-bitonic-int-kidx", k5b,
              (jax.ShapeDtypeStruct((R, Cf), jnp.float32),
               jax.ShapeDtypeStruct((R, Cf), jnp.float32)), u, vals)
    if out is not None:
        su, sv = out
        gs = np.arange(G)
        rr, bb = gs // Gr, (gs % Gr) * Np
        lu, lv = u[rr, bb], vals[rr, bb]
        order = np.lexsort((gs, lu))
        ok_u = np.array_equal(su[rr, bb], lu[order])
        ok_v = np.array_equal(sv[rr, bb], lv[order])
        print(f"[5b] sort_u={ok_u} payload={ok_v}", flush=True)

    print("probe_mosaic4 done", flush=True)


if __name__ == "__main__":
    main()
