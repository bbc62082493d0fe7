"""Probe constructs for BATCHED (3-D) sorted-migration machinery:

  A  3-D row-XOR exchange via collapsed-leading-dim sublane roll:
     [Q, R, W] -> reshape [Q·R, W] -> pltpu.roll(axis=0) -> reshape,
     with the per-row select keeping partners in-block (XOR never
     crosses the R boundary since R is a power of two)
  B  per-leading-dim scalar: sum over axes (1, 2) of [Q, R, W] then
     broadcast back via v[:, None, None]
  C  3-D lane rolls with a shared 2-D mask (compress barrel on [Q,R,W])
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q, R, W = 3, 8, 512

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
    x = rng.standard_normal((Q, R, W)).astype(np.float32) * 1e3

    def kA(x_ref, o_ref):
        v = x_ref[:]
        jr = 2
        flat = v.reshape(Q * R, W)
        lo = pltpu.roll(flat, (Q * R - jr) % (Q * R), axis=0).reshape(
            v.shape)
        hi = pltpu.roll(flat, jr, axis=0).reshape(v.shape)
        rowI = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
        bit0 = (rowI // jr) % 2
        o_ref[:] = jnp.where(bit0 == 0, lo, hi)
    out = run("A 3d-row-xor", kA,
              jax.ShapeDtypeStruct((Q, R, W), jnp.float32), x)
    if out is not None:
        want = x[:, np.arange(R) ^ 2, :]
        print(f"[A] exact={np.array_equal(out, want)}", flush=True)

    def kB(x_ref, o_ref):
        v = x_ref[:]
        s = jnp.sum(v, axis=(1, 2))          # [Q]
        o_ref[:] = v + s[:, None, None]
    out = run("B leading-scalar", kB,
              jax.ShapeDtypeStruct((Q, R, W), jnp.float32), x)
    if out is not None:
        want = x + x.sum(axis=(1, 2))[:, None, None]
        ok = np.allclose(out, want, rtol=1e-5)
        print(f"[B] close={ok}", flush=True)

    def kC(x_ref, o_ref):
        v = x_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        s_lane = lane * 3
        y = v
        t = 0
        while (1 << t) <= 3 * (W - 1):
            take = (s_lane // (1 << t)) % 2
            flat = y.reshape(-1, W)
            rolled = pltpu.roll(flat, (W - (1 << t)) % W,
                                axis=1).reshape(y.shape)
            y = jnp.where(take == 1, rolled, y)
            t += 1
        o_ref[:] = y
    out = run("C 3d-compress", kC,
              jax.ShapeDtypeStruct((Q, R, W), jnp.float32), x)
    if out is not None:
        Gr4 = W // 4
        want = x[:, :, (np.arange(W) * 4) % W]
        ok = np.array_equal(out[:, :, :Gr4], x[:, :, : Gr4 * 4 : 4])
        print(f"[C] exact={ok}", flush=True)

    print("probe_mosaic7 done", flush=True)


if __name__ == "__main__":
    main()
