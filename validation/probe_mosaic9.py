"""On-chip probe for the HBM-streaming resample history engine (r5).

The stream kernel crashed the remote Mosaic compile/worker on first
contact; this bisects its new construct classes:

1. where_scalar   — jnp.where(scalar_bool, [d,Cf], [d,Cf]) broadcast
2. where_mask     — same select via f32 arithmetic mask (fallback form)
3. dyn_input_load — pre_ref[pl.ds(i, 1)] dynamic load from an INPUT ref
4. dyn_dma_in     — make_async_copy(hbm.at[pl.ds(wb, W)], vmem_sc, sem)
5. dyn_dma_out    — make_async_copy(vmem_sc, hbm_out.at[pl.ds(wb, W)], sem)
6. grid_window    — 4+5 inside a K=4 grid under pl.when(k==0)/(k==K-1)

Run ALONE: python validation/probe_mosaic9.py  (a crash names the class)
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

d, Cf, S, W = 30, 128, 64, 8


def run(name, make_call, *args):
    print(f"[{name}] compiling...", flush=True)
    try:
        out = jax.jit(make_call())(*args)
        out = jax.tree.map(np.asarray, out)
        print(f"[{name}] ran", flush=True)
        return out
    except Exception as e:
        print(f"[{name}] FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


def main():
    x = jnp.arange(d * Cf, dtype=jnp.float32).reshape(d, Cf)
    y = -x
    hist = jnp.arange(S * d * Cf, dtype=jnp.float32).reshape(S, d, Cf)
    it = jnp.asarray([5], jnp.int32)

    # 1. scalar-bool where over [d, Cf]
    def k1(it_ref, a_ref, b_ref, o_ref):
        cond = it_ref[0] >= 3
        o_ref[:] = jnp.where(cond, a_ref[:], b_ref[:])

    def c1():
        return pl.pallas_call(
            k1,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((d, Cf), jnp.float32))
    r = run("where_scalar", c1, it, x, y)
    if r is not None:
        assert np.array_equal(r, np.asarray(x)), "wrong select"

    # 2. arithmetic-mask select (fallback form)
    def k2(it_ref, a_ref, b_ref, o_ref):
        m = (it_ref[0] >= 3).astype(jnp.float32)
        o_ref[:] = a_ref[:] * m + b_ref[:] * (1.0 - m)

    def c2():
        return pl.pallas_call(
            k2,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((d, Cf), jnp.float32))
    run("where_mask", c2, it, x, y)

    # 3. dynamic-index load from an INPUT VMEM ref
    def k3(it_ref, h_ref, o_ref):
        i = it_ref[0] % np.int32(S)
        o_ref[:] = h_ref[pl.ds(i, 1)].reshape(d, Cf)

    def c3():
        return pl.pallas_call(
            k3,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((d, Cf), jnp.float32))
    r = run("dyn_input_load", c3, it, hist)
    if r is not None:
        assert np.array_equal(r, np.asarray(hist[5]))

    # 4. dynamic-offset DMA HBM->VMEM scratch
    def k4(it_ref, h_ref, o_ref, sc, sem):
        wb = it_ref[0] - 2
        cp = pltpu.make_async_copy(h_ref.at[pl.ds(wb, W)], sc, sem)
        cp.start()
        cp.wait()
        o_ref[:] = sc[0]

    def c4():
        return pl.pallas_call(
            k4,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((d, Cf), jnp.float32),
            scratch_shapes=[pltpu.VMEM((W, d, Cf), jnp.float32),
                            pltpu.SemaphoreType.DMA])
    r = run("dyn_dma_in", c4, it, hist)
    if r is not None:
        assert np.array_equal(r, np.asarray(hist[3]))

    # 5. dynamic-offset DMA VMEM scratch -> HBM out (aliased shape)
    def k5(it_ref, h_ref, o_ref, sc, sem):
        wb = it_ref[0] - 2
        cpi = pltpu.make_async_copy(h_ref.at[pl.ds(wb, W)], sc, sem)
        cpi.start()
        cpi.wait()
        sc[0] = sc[0] + 1.0
        cpo = pltpu.make_async_copy(sc, o_ref.at[pl.ds(wb, W)], sem)
        cpo.start()
        cpo.wait()

    def c5():
        return pl.pallas_call(
            k5,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((S, d, Cf), jnp.float32),
            input_output_aliases={1: 0},
            scratch_shapes=[pltpu.VMEM((W, d, Cf), jnp.float32),
                            pltpu.SemaphoreType.DMA])
    r = run("dyn_dma_out", c5, it, hist)
    if r is not None:
        want = np.asarray(hist).copy()
        want[3] += 1.0
        assert np.array_equal(r, want), "aliased window write wrong"

    # 6. the window pattern inside a K-grid
    K = 4

    def k6(it_ref, h_ref, o_ref, ho_ref, sc, sem):
        k = pl.program_id(0)
        wb = it_ref[0] - 2

        @pl.when(k == 0)
        def _():
            cp = pltpu.make_async_copy(h_ref.at[pl.ds(wb, W)], sc, sem)
            cp.start()
            cp.wait()
        relw = jnp.clip((it_ref[0] + k) - wb, 0, W - 1)
        cur = sc[pl.ds(relw, 1)].reshape(d, Cf)
        sc[pl.ds(relw, 1)] = (cur + 1.0).reshape(1, d, Cf)
        o_ref[:] = cur

        @pl.when(k == K - 1)
        def _():
            cp = pltpu.make_async_copy(sc, ho_ref.at[pl.ds(wb, W)], sem)
            cp.start()
            cp.wait()

    def c6():
        return pl.pallas_call(
            k6, grid=(K,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(pl.BlockSpec((d, Cf), lambda k: (0, 0)),
                       pl.BlockSpec(memory_space=pl.ANY)),
            out_shape=(jax.ShapeDtypeStruct((d, Cf), jnp.float32),
                       jax.ShapeDtypeStruct((S, d, Cf), jnp.float32)),
            input_output_aliases={1: 1},
            scratch_shapes=[pltpu.VMEM((W, d, Cf), jnp.float32),
                            pltpu.SemaphoreType.DMA])
    r = run("grid_window", c6, it, hist)
    if r is not None:
        want = np.asarray(hist).copy()
        for k in range(K):
            want[5 + k] += 1.0
        assert np.array_equal(r[1], want), "grid window write wrong"
    print("probe9 done", flush=True)


if __name__ == "__main__":
    main()
