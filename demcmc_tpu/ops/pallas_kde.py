"""Pallas TPU kernel for the Epanechnikov KDE synthetic likelihood.

The ABC/KDE likelihood (reference ``Examples/KDE_Example.jl`` +
``Examples/KDE.jl``) is the one genuinely compute-bound density in the
model zoo: every log-likelihood evaluation forms an
``[n_eval, n_sim]`` kernel matrix (n_sim ~ 10^4 simulations) and reduces
it.  Batched over thousands of chains that is a
``[chains, n_eval, n_sim]`` elementwise+reduce — pure VPU work whose
performance is set by how well the reduction tiles onto VMEM.

This kernel fuses, per simulation tile (chains batch via vmap; all
eval points live in one [E, 1] block):
    u = (x - sim) / h;  k = 0.75 (1-u²)·1[|u|≤1];  acc += Σ_sim k
accumulating over a grid of simulation tiles in a VMEM scratch, writing
``log(max(mean/h, floor))`` on the last tile — so the kernel matrix is
never materialized in HBM (XLA's fallback materializes the [n_eval,
n_sim] intermediate per chain when the fusion exceeds its elementwise
budget).

Used by ``models.abc_kde.make(use_pallas=True)``; the jnp fallback
(``utils.kde``) is the reference implementation for correctness tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SIM_TILE = 2048
EVAL_TILE = 8      # eval-point padding granularity (sublane multiple)


def _kde_kernel(x_ref, sim_ref, h_ref, out_ref, acc_ref, *, n_sim, floor):
    """Grid: (sim_tiles,).  x [E], sim tile [T], h [1,1] in SMEM; out [E]."""
    import jax.experimental.pallas as pl

    t = pl.program_id(0)
    n_t = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h = h_ref[0, 0]
    x = x_ref[:]                      # [E, 1]
    sim = sim_ref[:]                  # [1, T]
    u = (x - sim) / h
    k = jnp.where(jnp.abs(u) <= 1.0, 0.75 * (1.0 - u * u), 0.0)
    acc_ref[:] += jnp.sum(k, axis=1, keepdims=True)      # [E, 1]

    @pl.when(t == n_t - 1)
    def _():
        dens = acc_ref[:] / (n_sim * h)
        out_ref[:] = jnp.log(jnp.maximum(dens, floor))


@functools.partial(jax.jit, static_argnames=("floor",))
def kde_logpdf_pallas(x, samples, bandwidth=None, floor: float = 1e-10):
    """log Epanechnikov-KDE density of ``x [n_eval]`` under ``samples
    [n_sim]`` — drop-in for :func:`demcmc_tpu.utils.kde.epanechnikov_logpdf`.

    Pads both axes to VPU-friendly tiles; padding simulations sit at +inf
    so their kernel weight is 0, padded eval rows are sliced off.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..utils.kde import silverman_bandwidth

    if bandwidth is None:
        bandwidth = silverman_bandwidth(samples)
    x = jnp.asarray(x, jnp.float32)
    samples = jnp.asarray(samples, jnp.float32)
    n_eval, n_sim = x.shape[0], samples.shape[0]

    E = max(EVAL_TILE, -(-n_eval // EVAL_TILE) * EVAL_TILE)
    T = min(SIM_TILE, max(128, -(-n_sim // 128) * 128))
    S = -(-n_sim // T) * T
    xp = jnp.pad(x, (0, E - n_eval))[:, None]                    # [E, 1]
    simp = jnp.pad(samples, (0, S - n_sim),
                   constant_values=jnp.inf)[None, :]             # [1, S]
    h = jnp.asarray(bandwidth, jnp.float32).reshape(1, 1)

    out = pl.pallas_call(
        functools.partial(_kde_kernel, n_sim=n_sim, floor=floor),
        grid=(S // T,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((E, 1), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((E, 1), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((E, 1), jnp.float32)],
    )(xp, simp, h)
    return out[:n_eval, 0]
