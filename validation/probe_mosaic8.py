"""Probe DYNAMIC-shift constructs for the loop-rolled bitonic (the
unrolled ~78-stage sort costs ~20 µs/step even UNFIRED at G=4096 —
instruction-memory pressure — and 20-minute remote compiles):

  A  pltpu.roll with a traced (dynamic) shift, lane axis
  B  dynamic collapsed row roll ([Q·R, W], axis 0)
  C  dynamic vector>>scalar shift and //(dynamic pow2)
  D  lax.fori_loop carrying vectors + scalar log-step, dynamic roll
     inside (shift from the carry)
  E  mini loop-rolled bitonic (G=512 on [8, 64]) vs numpy lexsort
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, W = 8, 64
G = R * W                # 512 elements, Np_e=1 geometry

INTERP = bool(int(__import__("os").environ.get("PROBE_INTERPRET", "0")))


def run(name, kernel, out_shape, *args):
    print(f"[{name}] compiling...", flush=True)
    try:
        f = pl.pallas_call(
            kernel, out_shape=out_shape,
            interpret=pltpu.InterpretParams() if INTERP else False)
        out = jax.tree.map(np.asarray, jax.jit(f)(*args))
        print(f"[{name}] ran", flush=True)
        return out
    except Exception as e:
        print(f"[{name}] FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


def main():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((R, W)).astype(np.float32) * 1e3
    x3 = rng.standard_normal((3, R, W)).astype(np.float32) * 1e3
    sarr = np.asarray([5], np.int32)

    def kA(s_ref, x_ref, o_ref):
        s = s_ref[0]
        o_ref[:] = pltpu.roll(x_ref[:], s, axis=1)
    out = run("A dyn-lane-roll", kA,
              jax.ShapeDtypeStruct((R, W), jnp.float32), sarr, x)
    if out is not None:
        print(f"[A] exact={np.array_equal(out, np.roll(x, 5, axis=1))}",
              flush=True)

    def kB(s_ref, x_ref, o_ref):
        s = s_ref[0]
        v = x_ref[:]
        flat = v.reshape(-1, W)
        o_ref[:] = pltpu.roll(flat, s, axis=0).reshape(v.shape)
    out = run("B dyn-row-roll", kB,
              jax.ShapeDtypeStruct((3, R, W), jnp.float32), sarr, x3)
    if out is not None:
        want = np.roll(x3.reshape(-1, W), 5, axis=0).reshape(3, R, W)
        print(f"[B] exact={np.array_equal(out, want)}", flush=True)

    def kC(s_ref, x_ref, o_ref):
        t = s_ref[0] % 3                     # dynamic small scalar
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        a = jax.lax.shift_right_logical(lane, t)
        b = lane // (1 << t)
        o_ref[:] = (a + b).astype(jnp.float32) + x_ref[:] * 0.0
    out = run("C dyn-shift", kC,
              jax.ShapeDtypeStruct((R, W), jnp.float32), sarr, x)
    if out is not None:
        lane = np.arange(W)[None, :] * np.ones((R, 1), int)
        want = ((lane >> 2) + lane // 4).astype(np.float32)
        print(f"[C] exact={np.array_equal(out, want)}", flush=True)

    def kD(s_ref, x_ref, o_ref):
        def body(i, carry):
            v, ls = carry
            v = pltpu.roll(v, 1 << ls, axis=1)
            return (v, ls + 1)
        v, _ = jax.lax.fori_loop(0, 3, body, (x_ref[:], s_ref[0] % 2))
        o_ref[:] = v
    out = run("D fori-dyn-roll", kD,
              jax.ShapeDtypeStruct((R, W), jnp.float32), sarr, x)
    if out is not None:
        # ls starts at 5 % 2 = 1: rolls by 2, 4, 8 => total 14
        want = np.roll(x, 14, axis=1)
        print(f"[D] exact={np.array_equal(out, want)}", flush=True)

    # ---- E: loop-rolled bitonic over G=512 elements ([8, 64], Np_e=1,
    # row-major kidx = row*W + lane; cross-row when step >= W) ---------
    u = rng.random((R, W)).astype(np.float32)
    vals = rng.standard_normal((R, W)).astype(np.float32) * 1e3
    S = sum(p + 1 for p in range(int(np.log2(G))))     # 45 stages

    def kE(u_ref, v_ref, ou, ov):
        row = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        kidx = row * W + lane
        gid = kidx.astype(jnp.float32)

        def body(i, carry):
            key, tie, pay, logphase, logstep = carry
            step = 1 << logstep
            lsh = step % W                   # lane component (0 if >= W)
            rsh = step // W                  # row component (0 if < W)

            def xchg(v):
                plus = pltpu.roll(pltpu.roll(v, (W - lsh) % W, axis=1),
                                  (R - rsh) % R, axis=0)
                minus = pltpu.roll(pltpu.roll(v, lsh, axis=1), rsh,
                                   axis=0)
                bit0 = (kidx // step) % 2
                return jnp.where(bit0 == 0, plus, minus)

            pk, pt, pp = xchg(key), xchg(tie), xchg(pay)
            bit0 = (kidx // step) % 2
            less = (key < pk) | ((key == pk) & (tie < pt))
            parity = (bit0 + kidx // (2 << logphase)) % 2
            keep = (less.astype(jnp.int32) + parity) % 2 == 1
            key = jnp.where(keep, key, pk)
            tie = jnp.where(keep, tie, pt)
            pay = jnp.where(keep, pay, pp)
            nstep = logstep - 1
            nphase = jnp.where(nstep < 0, logphase + 1, logphase)
            nstep = jnp.where(nstep < 0, nphase, nstep)
            return (key, tie, pay, nphase, nstep)

        key, tie, pay, _, _ = jax.lax.fori_loop(
            0, S, body, (u_ref[:], gid, v_ref[:], jnp.int32(0),
                         jnp.int32(0)))
        ou[:] = key
        ov[:] = pay
    out = run("E loop-bitonic", kE,
              (jax.ShapeDtypeStruct((R, W), jnp.float32),
               jax.ShapeDtypeStruct((R, W), jnp.float32)), u, vals)
    if out is not None:
        su, sv = out
        lu, lv = u.reshape(-1), vals.reshape(-1)
        order = np.lexsort((np.arange(G), lu))
        ok_u = np.array_equal(su.reshape(-1), lu[order])
        ok_v = np.array_equal(sv.reshape(-1), lv[order])
        print(f"[E] sort_u={ok_u} payload={ok_v}", flush=True)

    print("probe_mosaic8 done", flush=True)


if __name__ == "__main__":
    main()
