"""Probe: dynamic-trip-count fori_loop inside a Pallas kernel on the
remote Mosaic backend — body draws PRNG bits and runs a [G, G] one-hot
matmul + scratch update (the shape of the in-kernel migration-replay
loop).  Run ALONE on the real TPU."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, R, Cf = 256, 8, 512
HIGH = jax.lax.Precision.HIGHEST


def kernel(cnt_ref, key_ref, x_ref, out_ref, acc_sc, r_sc):
    acc_sc[:] = x_ref[:]
    r_sc[:] = jnp.zeros((G, G), jnp.float32)
    pltpu.prng_seed(key_ref[0], key_ref[1])

    def body(e, carry):
        bits = pltpu.bitcast(pltpu.prng_random_bits((R, Cf)), jnp.uint32)
        u = pltpu.bitcast((bits >> 9) | jnp.full((R, Cf), 0x3F800000,
                                                 jnp.uint32),
                          jnp.float32) - np.float32(1.0)
        # one-hot-ish [G, G] contraction like _mig_apply's route
        gI = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
        gJ = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
        route = ((gI + e) % G == gJ).astype(jnp.float32)
        # NT contraction (the verified in-kernel dot orientation)
        moved = jax.lax.dot_general(route, route,
                                    (((1,), (1,)), ((), ())),
                                    precision=HIGH)       # [G, G]
        v = acc_sc[:]
        acc_sc[:] = v + u * np.float32(1e-6)
        r_sc[:] = r_sc[:] + moved          # keep the dot live
        return carry + 1

    n = jax.lax.fori_loop(0, cnt_ref[0], body, jnp.int32(0))
    out_ref[:] = (acc_sc[:] + n.astype(jnp.float32) * np.float32(0.0)
                  + r_sc[pl.ds(0, R), pl.ds(0, Cf)] * np.float32(0.0))


def main():
    print("backend:", jax.default_backend(), flush=True)
    x = jnp.arange(R * Cf, dtype=jnp.float32).reshape(R, Cf)
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct((R, Cf), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, Cf), jnp.float32),
                        pltpu.VMEM((G, G), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024))
    f = jax.jit(call)
    for cnt in (0, 1, 3):
        y = f(jnp.asarray([cnt], jnp.int32),
              jnp.asarray([7, 9], jnp.uint32), x)
        y0 = np.asarray(y)
        print(f"cnt={cnt}: out[0,:3]={y0[0, :3]}, "
              f"changed={not np.allclose(y0, np.asarray(x))}", flush=True)
    print("PROBE OK", flush=True)


if __name__ == "__main__":
    main()
