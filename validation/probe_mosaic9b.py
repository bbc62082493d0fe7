"""Narrow the dyn_dma_in crash from probe_mosaic9: which part of
``make_async_copy(hbm_ref.at[pl.ds(wb, W)], vmem_sc, sem)`` kills the
worker — the ANY-ref slice itself, the DYNAMIC offset, the slab count,
or the ref rank?

Run ALONE: python validation/probe_mosaic9b.py
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

d, Cf, S, W = 30, 128, 64, 8


def run(name, make_call, *args, want=None):
    print(f"[{name}] compiling...", flush=True)
    try:
        out = np.asarray(jax.jit(make_call())(*args))
        ok = want is None or np.array_equal(out, want)
        print(f"[{name}] ran ok={ok}", flush=True)
    except Exception as e:
        print(f"[{name}] FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)


def probe(name, kern, out_shape, *args, want=None,
          scratch=((W, d, Cf),)):
    def c():
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM(s, jnp.float32) for s in scratch]
            + [pltpu.SemaphoreType.DMA])
    run(name, c, *args, want=want)


def main():
    hist = jnp.arange(S * d * Cf, dtype=jnp.float32).reshape(S, d, Cf)
    h2 = jnp.arange(S * Cf, dtype=jnp.float32).reshape(S, Cf)
    it = jnp.asarray([5], jnp.int32)
    osh = jax.ShapeDtypeStruct((d, Cf), jnp.float32)

    # a. STATIC offset slice of ANY ref
    def ka(it_ref, h_ref, o_ref, sc, sem):
        cp = pltpu.make_async_copy(h_ref.at[pl.ds(3, W)], sc, sem)
        cp.start()
        cp.wait()
        o_ref[:] = sc[0]
    probe("static_any_slice", ka, osh, it, hist,
          want=np.asarray(hist[3]))

    # b. dynamic offset, ONE slab
    def kb(it_ref, h_ref, o_ref, sc, sem):
        wb = it_ref[0] - 2
        cp = pltpu.make_async_copy(h_ref.at[pl.ds(wb, 1)], sc, sem)
        cp.start()
        cp.wait()
        o_ref[:] = sc[0]
    probe("dyn_any_1slab", kb, osh, it, hist,
          want=np.asarray(hist[3]), scratch=((1, d, Cf),))

    # c. dynamic offset, 2-D ANY ref
    def kc(it_ref, h_ref, o_ref, sc, sem):
        wb = it_ref[0] - 2
        cp = pltpu.make_async_copy(h_ref.at[pl.ds(wb, 8)], sc, sem)
        cp.start()
        cp.wait()
        o_ref[:] = jnp.broadcast_to(sc[0:1, :], (d, Cf))
    probe("dyn_any_2d", kc, osh, it, h2,
          want=np.broadcast_to(np.asarray(h2[3]), (d, Cf)),
          scratch=((8, Cf),))

    # d. dynamic offset via .at[wb] integer index (squeeze form), 3-D
    def kd(it_ref, h_ref, o_ref, sc, sem):
        wb = it_ref[0] - 2
        cp = pltpu.make_async_copy(h_ref.at[wb], sc, sem)
        cp.start()
        cp.wait()
        o_ref[:] = sc[:]
    probe("dyn_any_intidx", kd, osh, it, hist,
          want=np.asarray(hist[3]), scratch=((d, Cf),))

    # e. whole-ref copy (known good baseline)
    def ke(it_ref, h_ref, o_ref, sc, sem):
        cp = pltpu.make_async_copy(h_ref, sc, sem)
        cp.start()
        cp.wait()
        o_ref[:] = sc[5]
    probe("whole_any_copy", ke, osh, it, hist,
          want=np.asarray(hist[5]), scratch=((S, d, Cf),))
    print("probe9b done", flush=True)


if __name__ == "__main__":
    main()
