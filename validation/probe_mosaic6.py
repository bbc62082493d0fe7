"""Probe Mosaic support for narrow<->wide lane restructuring — the
compact-layout sort optimization for big-G sorted migration needs to
(a) extract group-leader values [8, Cf] -> [8, Gr] and (b) spread
routed values back [8, Gr] -> [8, Cf].  Candidate single-op forms:

  P1 static contiguous lane slice   x[:, :Gr]
  P2 strided lane slice             x[:, ::Np]
  P3 jnp.repeat(narrow, Np, axis=1)
  P4 lane concat [narrow, zeros]
  P5 dynamic_update_slice(wide, narrow, (0, 0))
  P6 broadcast_to + reshape (Kronecker spread)

Real sizes: wide [8, 8192], narrow [8, 512], Np=16 (the G=4096 config).
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, Cf, Np = 8, 8192, 16
Gr = Cf // Np            # 512

INTERP = bool(int(__import__("os").environ.get("PROBE_INTERPRET", "0")))


def run(name, kernel, out_shape, *args):
    print(f"[{name}] compiling...", flush=True)
    try:
        f = pl.pallas_call(
            kernel, out_shape=out_shape,
            interpret=pltpu.InterpretParams() if INTERP else False,
            compiler_params=None if INTERP else pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024))
        out = jax.tree.map(np.asarray, jax.jit(f)(*args))
        print(f"[{name}] ran", flush=True)
        return out
    except Exception as e:
        print(f"[{name}] FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


def main():
    rng = np.random.default_rng(0)
    wide = rng.standard_normal((R, Cf)).astype(np.float32) * 1e3
    narrow = rng.standard_normal((R, Gr)).astype(np.float32) * 1e3

    def k1(x_ref, o_ref):
        o_ref[:] = x_ref[:][:, :Gr]
    out = run("P1 static-slice", k1,
              jax.ShapeDtypeStruct((R, Gr), jnp.float32), wide)
    if out is not None:
        print(f"[P1] exact={np.array_equal(out, wide[:, :Gr])}", flush=True)

    def k2(x_ref, o_ref):
        o_ref[:] = x_ref[:][:, ::Np]
    out = run("P2 strided-slice", k2,
              jax.ShapeDtypeStruct((R, Gr), jnp.float32), wide)
    if out is not None:
        print(f"[P2] exact={np.array_equal(out, wide[:, ::Np])}",
              flush=True)

    def k3(x_ref, o_ref):
        o_ref[:] = jnp.repeat(x_ref[:], Np, axis=1)
    out = run("P3 repeat", k3,
              jax.ShapeDtypeStruct((R, Cf), jnp.float32), narrow)
    if out is not None:
        print(f"[P3] exact={np.array_equal(out, np.repeat(narrow, Np, 1))}",
              flush=True)

    def k4(x_ref, o_ref):
        z = jnp.zeros((R, Cf - Gr), jnp.float32)
        o_ref[:] = jnp.concatenate([x_ref[:], z], axis=1)
    out = run("P4 lane-concat", k4,
              jax.ShapeDtypeStruct((R, Cf), jnp.float32), narrow)
    if out is not None:
        want = np.concatenate([narrow, np.zeros((R, Cf - Gr), np.float32)],
                              1)
        print(f"[P4] exact={np.array_equal(out, want)}", flush=True)

    def k5(w_ref, n_ref, o_ref):
        o_ref[:] = jax.lax.dynamic_update_slice(w_ref[:], n_ref[:], (0, 0))
    out = run("P5 dus", k5, jax.ShapeDtypeStruct((R, Cf), jnp.float32),
              wide, narrow)
    if out is not None:
        want = wide.copy()
        want[:, :Gr] = narrow
        print(f"[P5] exact={np.array_equal(out, want)}", flush=True)

    def k6(x_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = jnp.broadcast_to(x[:, :, None],
                                    (R, Gr, Np)).reshape(R, Cf)
    out = run("P6 bcast-reshape", k6,
              jax.ShapeDtypeStruct((R, Cf), jnp.float32), narrow)
    if out is not None:
        print(f"[P6] exact={np.array_equal(out, np.repeat(narrow, Np, 1))}",
              flush=True)

    print("probe_mosaic6 done", flush=True)


if __name__ == "__main__":
    main()
