"""Probe: native per-lane gathers in Mosaic on this backend (r5).

If any of these compile+run, the within-group partner gather can drop
its roll network entirely:
1. take_along  — jnp.take_along_axis(x [8,512], idx [8,512], axis=-1)
2. take_along3 — same with a [d,8,512] value array (leading dim)
3. one_hot_mxu — gather via one-hot matmul on the MXU (jnp.dot)

Run ALONE: python validation/probe_mosaic10.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, Cf, d, Np = 8, 512, 2, 16


def run(name, kern, out_shape, *args, want=None):
    print(f"[{name}] compiling...", flush=True)
    try:
        call = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape)
        out = np.asarray(jax.jit(call)(*args))
        ok = want is None or np.array_equal(out, want)
        print(f"[{name}] ran ok={ok}", flush=True)
    except Exception as e:
        print(f"[{name}] FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(R, Cf)), jnp.float32)
    x3 = jnp.asarray(rng.normal(size=(d, R, Cf)), jnp.float32)
    lane = np.broadcast_to(np.arange(Cf, dtype=np.int32), (R, Cf))
    p = lane % Np
    g0 = lane - p                                     # group base lane
    off = rng.integers(0, Np, size=(R, Cf)).astype(np.int32)
    idx = jnp.asarray(g0 + (p + off) % Np)            # absolute lane

    def k1(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=-1)
    want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=-1)
    run("take_along", k1, jax.ShapeDtypeStruct((R, Cf), jnp.float32),
        x, idx, want=want)

    def k2(x_ref, i_ref, o_ref):
        xv = x_ref[:]
        iv = jnp.broadcast_to(i_ref[:], (d, R, Cf))
        o_ref[:] = jnp.take_along_axis(xv, iv, axis=-1)
    want3 = np.take_along_axis(np.asarray(x3),
                               np.broadcast_to(np.asarray(idx),
                                               (d, R, Cf)), axis=-1)
    run("take_along3", k2, jax.ShapeDtypeStruct((d, R, Cf), jnp.float32),
        x3, idx, want=want3)
    variant_128()
    print("probe10 done", flush=True)


def variant_128():
    rng = np.random.default_rng(1)
    for W in (128, 256):
        x = jnp.asarray(rng.normal(size=(R, W)), jnp.float32)
        lane = np.broadcast_to(np.arange(W, dtype=np.int32), (R, W))
        p = lane % Np
        off = rng.integers(0, Np, size=(R, W)).astype(np.int32)
        idx = jnp.asarray(lane - p + (p + off) % Np)

        def k(x_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=-1)
        want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=-1)
        run(f"take_along_{W}", k,
            jax.ShapeDtypeStruct((R, W), jnp.float32), x, idx, want=want)


if __name__ == "__main__":
    main()
