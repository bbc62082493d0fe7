"""On-chip probe of Mosaic features the in-kernel-migration rewrite needs.

Run: python validation/probe_mosaic.py   (claims the TPU grant)

Checks:
1. dot_general on [G,1]x[G,1] (broadcast trick) at Precision.HIGHEST
2. one-hot route matmul exactness for arbitrary f32 bit patterns
3. pl.when gated on an SMEM scalar + scalar write via jnp.sum
4. grid K with VMEM scratch carry + per-step output blocks + per-step seed
5. integer iota div/mod by non-pow2 constants; int32->f32 and bool->f32
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 256
HIGH = jax.lax.Precision.HIGHEST


def probe1_2(u, vals, route_idx):
    """Rank broadcast dots + one-hot route matmul exactness."""
    def kernel(u_ref, v_ref, r_ref, rank_out, routed_out):
        u = u_ref[:]                       # [G, 1]
        ones = jnp.ones((G, 1), jnp.float32)
        bcast_row = jax.lax.dot_general(
            ones, u, (((1,), (1,)), ((), ())), precision=HIGH)   # [G,G] u[j]
        bcast_col = jax.lax.dot_general(
            u, ones, (((1,), (1,)), ((), ())), precision=HIGH)   # [G,G] u[i]
        I = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
        J = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
        less = ((bcast_row < bcast_col)
                | ((bcast_row == bcast_col) & (J < I)))
        rank_out[:] = jnp.sum(less.astype(jnp.float32), axis=1,
                              keepdims=True)
        # one-hot route: routed[i] = vals[route_idx[i]]
        ridx_col = jax.lax.dot_general(
            r_ref[:], ones, (((1,), (1,)), ((), ())), precision=HIGH)
        route = (jnp.float32(J) == ridx_col).astype(jnp.float32)
        routed_out[:] = jax.lax.dot_general(
            route, v_ref[:], (((1,), (0,)), ((), ())), precision=HIGH)

    f = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((G, 1), jnp.float32),
                   jax.ShapeDtypeStruct((G, 1), jnp.float32)))
    return f(u, vals, route_idx)


def probe_compact_expand(vals):
    """Compaction [R,Cf]->[G,1] and expansion back via static one-hot dots.
    Np=16, Gr=Cf/Np; group value = value at its leader lane."""
    R, Cf = 8, 512
    Np = 16
    Gr = Cf // Np
    Gg = R * Gr           # 256

    def kernel(v_ref, out_col, out_lane):
        v = v_ref[:]                                    # [R, Cf]
        gI = jax.lax.broadcasted_iota(jnp.int32, (Gg, Cf), 0)
        lI = jax.lax.broadcasted_iota(jnp.int32, (Gg, Cf), 1)
        col = jnp.zeros((Gg, 1), jnp.float32)
        for r in range(R):
            P_r = (((gI // Gr) == r)
                   & (lI == (gI % Gr) * Np)).astype(jnp.float32)
            col = col + jax.lax.dot_general(
                P_r, v[r:r + 1, :], (((1,), (1,)), ((), ())),
                precision=HIGH)
        out_col[:] = col
        # expansion: every lane of group g gets col[g]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 0)
        acc = jnp.zeros((R, Cf), jnp.float32)
        for r in range(R):
            Q_r = (gI == (r * Gr + lI // Np)).astype(jnp.float32)
            e_r = jax.lax.dot_general(col, Q_r, (((0,), (0,)), ((), ())),
                                      precision=HIGH)   # [1, Cf]
            acc = acc + jnp.where(row == r, e_r, 0.0)
        out_lane[:] = acc

    f = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((Gg, 1), jnp.float32),
                   jax.ShapeDtypeStruct((R, Cf), jnp.float32)))
    return f(vals)


def probe3_4_5(x, fire0, K=4):
    """Grid-K scratch carry + pl.when on SMEM scalar + iota div/mod."""
    R, C = x.shape

    def kernel(fire_in, x_ref, out_ref, fin_ref, acc, fire_s):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            acc[:] = x_ref[:]
            fire_s[0] = fire_in[0]

        pltpu.prng_seed(jnp.uint32(7), jnp.uint32(0) + k.astype(jnp.uint32))
        bits = pltpu.bitcast(pltpu.prng_random_bits((R, C)), jnp.uint32)
        mant = bits >> 9
        one = jnp.full(mant.shape, 0x3F800000, jnp.uint32)
        u = pltpu.bitcast(mant | one, jnp.float32) - np.float32(1.0)

        @pl.when(fire_s[0] != 0)
        def _():
            acc[:] = acc[:] + 100.0

        lane = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
        grp = lane // 12                  # non-pow2 divisor
        slot = lane % 12
        acc[:] = acc[:] + (grp + slot).astype(jnp.float32) * 0.0 \
            + u * 0.0 + 1.0
        out_ref[0] = acc[:]
        # next fire: deterministic from k for checkability
        I = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
        gate = jnp.where((I == 0) & (lane == 0),
                         ((k + 1) % 2).astype(jnp.int32), 0)
        fire_s[0] = jnp.sum(gate)

        @pl.when(k == K - 1)
        def _():
            fin_ref[0] = fire_s[0]

    f = pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((R, C), lambda k: (0, 0))],
        out_specs=(pl.BlockSpec((1, R, C), lambda k: (k, 0, 0)),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((K, R, C), jnp.float32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((R, C), jnp.float32),
                        pltpu.SMEM((1,), jnp.int32)],
    )
    return f(fire0, x)


def main():
    rng = np.random.default_rng(0)
    u = rng.random((G, 1)).astype(np.float32)
    # vals with full-mantissa bit patterns to catch bf16 rounding
    vals = rng.standard_normal((G, 1)).astype(np.float32) * 1e3
    vals += rng.random((G, 1)).astype(np.float32) * 1e-4
    perm = rng.permutation(G)
    ridx = perm.astype(np.float32).reshape(G, 1)

    try:
        rank, routed = jax.jit(probe1_2)(u, vals, ridx)
        rank, routed = np.asarray(rank), np.asarray(routed)
        want = vals[perm]
        ok_route = np.array_equal(routed, want)
        true_rank = np.argsort(np.argsort(u[:, 0], kind="stable"))
        ok_rank = np.array_equal(rank[:, 0].astype(int), true_rank)
        print(f"probe1_2: rank_ok={ok_rank} route_bitexact={ok_route}")
        if not ok_route:
            bad = np.flatnonzero(routed[:, 0] != want[:, 0])[:5]
            print("   mismatches", bad, routed[bad, 0], want[bad, 0])
    except Exception as e:
        print(f"probe1_2: FAILED {type(e).__name__}: {str(e)[:300]}")

    lane_vals = (rng.standard_normal((8, 512)).astype(np.float32) * 1e3
                 + rng.random((8, 512)).astype(np.float32) * 1e-4)
    try:
        col, lane = jax.jit(probe_compact_expand)(lane_vals)
        col, lane = np.asarray(col), np.asarray(lane)
        want_col = lane_vals.reshape(8, 32, 16)[:, :, 0].reshape(256, 1)
        ok_c = np.array_equal(col, want_col)
        want_lane = np.repeat(want_col.reshape(8, 32), 16, axis=1)
        ok_e = np.array_equal(lane, want_lane)
        print(f"probe_compact_expand: compact_bitexact={ok_c} "
              f"expand_bitexact={ok_e}")
    except Exception as e:
        print(f"probe_compact_expand: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}")

    R, C = 8, 128
    x = rng.standard_normal((R, C)).astype(np.float32)
    try:
        out, fin = jax.jit(functools.partial(probe3_4_5, K=4))(
            x, np.asarray([1], np.int32))
        out, fin = np.asarray(out), np.asarray(fin)
        exp0 = x + 101.0
        exp1 = exp0 + 101.0
        exp2 = exp1 + 1.0
        exp3 = exp2 + 101.0
        ok = (np.allclose(out[0], exp0) and np.allclose(out[1], exp1)
              and np.allclose(out[2], exp2) and np.allclose(out[3], exp3))
        print(f"probe3_4_5: grid/scratch/when/iota ok={ok} fin={fin}")
        if not ok:
            for i, e in enumerate((exp0, exp1, exp2, exp3)):
                print(i, float(np.abs(out[i] - e).max()))
    except Exception as e:
        print(f"probe3_4_5: FAILED {type(e).__name__}: {str(e)[:500]}")


if __name__ == "__main__":
    main()
