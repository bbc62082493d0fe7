"""On-chip probe of Mosaic constructs for the SORTED big-G migration.

Run: python validation/probe_mosaic3.py   (claims the TPU grant)

The O(G log^2 G) migration rewrite (bitonic sort over group leaders
instead of [G, G] one-hot rank/route matrices) needs construct classes
the earlier probes did not cover:

1. sublane roll  — pltpu.roll(x, k, axis=0) on [8, W] f32
2. row XOR exchange — partner row r^j via two sublane rolls + row select
3. lane XOR exchange — partner lane c^j via two lane rolls + iota-bit
   select (distances that are multiples of Np)
4. full-array sum -> scalar -> splat into a where
5. strided bitonic sort of group leaders (G=64 over [8, 32] lanes,
   Np=4) against numpy lexsort
6. compress gather out[b] = in[b*Np] via destination-indexed barrel
   shift (linear shift s(b) = b*(Np-1))

Each probe is independent; a FAILED line names the crashing class.  A
HANG wedges the grant — run detached, check the log tail to see which
probe was in flight.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
        print(f"[{name}] FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


def sub_roll(x, k):
    return pltpu.roll(x, int(k) % x.shape[0], axis=0)


def main():
    rng = np.random.default_rng(0)
    R, W = 8, 256
    x = (rng.standard_normal((R, W)).astype(np.float32) * 1e3
         + rng.random((R, W)).astype(np.float32) * 1e-4)

    # ---- 1: sublane roll -------------------------------------------------
    def k1(x_ref, o_ref):
        o_ref[:] = sub_roll(x_ref[:], 1)
    out = run("1 sublane-roll", k1,
              jax.ShapeDtypeStruct((R, W), jnp.float32), x)
    if out is not None:
        ok = np.array_equal(out, np.roll(x, 1, axis=0))
        print(f"[1] exact={ok}", flush=True)

    # ---- 2: row XOR exchange (partner row r^2) ---------------------------
    def k2(x_ref, o_ref):
        v = x_ref[:]
        j = 2
        row = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
        partner = jnp.where((row // j) % 2 == 0, sub_roll(v, -j),
                            sub_roll(v, j))
        o_ref[:] = partner
    out = run("2 row-xor", k2, jax.ShapeDtypeStruct((R, W), jnp.float32), x)
    if out is not None:
        want = x[np.arange(R) ^ 2]
        print(f"[2] exact={np.array_equal(out, want)}", flush=True)

    # ---- 3: lane XOR exchange at Np-multiples ----------------------------
    def k3(x_ref, o_ref):
        v = x_ref[:]
        j = 16                              # element distance 4, Np=4
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        partner = jnp.where((lane // j) % 2 == 0,
                            pltpu.roll(v, W - j, axis=1),
                            pltpu.roll(v, j, axis=1))
        o_ref[:] = partner
    out = run("3 lane-xor", k3, jax.ShapeDtypeStruct((R, W), jnp.float32), x)
    if out is not None:
        want = x[:, np.arange(W) ^ 16]
        print(f"[3] exact={np.array_equal(out, want)}", flush=True)

    # ---- 4: global sum -> scalar splat -----------------------------------
    def k4(x_ref, o_ref):
        v = x_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
        pick = jnp.where((row == 3) & (lane == 17), v, 0.0)
        s = jnp.sum(pick)                   # scalar
        o_ref[:] = jnp.where(lane == 0, s, v)
    out = run("4 scalar-splat", k4,
              jax.ShapeDtypeStruct((R, W), jnp.float32), x)
    if out is not None:
        want = x.copy()
        want[:, 0] = x[3, 17]
        print(f"[4] exact={np.array_equal(out, want)}", flush=True)

    # ---- 5: strided bitonic sort of leaders ------------------------------
    # G=64 groups over [8, 32]: Gr=8 per row, Np=4 lanes per group.
    # Row-major element index k = r*Gr + b; leaders at lane b*Np.
    # Sort pairs (key u, payload val) ascending by (u, k).
    Gr, Np = 8, 4
    Cf = Gr * Np
    G = R * Gr
    u = rng.random((R, Cf)).astype(np.float32)
    vals = rng.standard_normal((R, Cf)).astype(np.float32) * 1e3

    def lane_xor(v, j):
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 1)
        return jnp.where((lane // j) % 2 == 0,
                         pltpu.roll(v, Cf - j, axis=1),
                         pltpu.roll(v, j, axis=1))

    def row_xor(v, j):
        row = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 0)
        return jnp.where((row // j) % 2 == 0, sub_roll(v, -j),
                         sub_roll(v, j))

    def k5(u_ref, v_ref, ou_ref, ov_ref):
        ku = u_ref[:]
        kv = v_ref[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 1)
        kidx = (row * Gr + lane // Np).astype(jnp.float32)  # element index
        gid = kidx                                          # tie-break key
        # bitonic network over n=G elements (leaders move; non-leader
        # lanes carry garbage that sorts along harmlessly in-lane-block)
        n = G
        phase = 1
        while phase < n:
            step = phase
            while step >= 1:
                je = step                     # element distance
                if je * Np < Cf:              # within-row exchange
                    pu = lane_xor(ku, je * Np)
                    pv = lane_xor(kv, je * Np)
                    pg = lane_xor(gid, je * Np)
                else:                         # cross-row exchange
                    jr = (je * Np) // Cf
                    pu = row_xor(ku, jr)
                    pv = row_xor(kv, jr)
                    pg = row_xor(gid, jr)
                kbit = (kidx.astype(jnp.int32) // je) % 2 == 0  # low side
                up = (kidx.astype(jnp.int32) // (2 * phase)) % 2 == 0
                less = (ku < pu) | ((ku == pu) & (gid < pg))
                keep_mine = jnp.where(kbit == up, less, ~less)
                ku = jnp.where(keep_mine, ku, pu)
                kv = jnp.where(keep_mine, kv, pv)
                gid = jnp.where(keep_mine, gid, pg)
                step //= 2
            phase *= 2
        ou_ref[:] = ku
        ov_ref[:] = kv
    out = run("5 strided-bitonic", k5,
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
        print(f"[5] sort_u={ok_u} payload={ok_v}", flush=True)

    # ---- 6: compress gather out[b] = in[b*Np] ----------------------------
    def k6(x_ref, o_ref):
        v = x_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 1)
        s = lane * (Np - 1)                   # shift for dest lane b
        t = 1
        while t < Cf:
            v = jnp.where((s // t) % 2 == 1, pltpu.roll(v, Cf - t, axis=1),
                          v)
            t *= 2
        o_ref[:] = v
    out = run("6 compress", k6, jax.ShapeDtypeStruct((R, Cf), jnp.float32),
              vals)
    if out is not None:
        want = vals[:, (np.arange(Cf) * Np) % Cf]  # defined for b < Gr
        ok = np.array_equal(out[:, :Gr], vals[:, np.arange(Gr) * Np])
        print(f"[6] exact={ok}", flush=True)

    print("probe_mosaic3 done", flush=True)


if __name__ == "__main__":
    main()
