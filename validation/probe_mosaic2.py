"""Bisect the probe_compact_expand compiler crash into single constructs."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

R, Cf, Np = 8, 512, 16
Gr = Cf // Np
G = R * Gr
HIGH = jax.lax.Precision.HIGHEST


def run(name, kernel, out_shape, *args):
    try:
        f = pl.pallas_call(kernel, out_shape=out_shape)
        out = jax.jit(f)(*args)
        out = jax.tree.map(np.asarray, out)
        print(f"{name}: OK")
        return out
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
        return None


def main():
    rng = np.random.default_rng(0)
    v = (rng.standard_normal((R, Cf)).astype(np.float32) * 1e3
         + rng.random((R, Cf)).astype(np.float32) * 1e-4)
    col = rng.standard_normal((G, 1)).astype(np.float32)

    # A: one-hot build [G, Cf] from iota with div/mod
    def kA(v_ref, o_ref):
        gI = jax.lax.broadcasted_iota(jnp.int32, (G, Cf), 0)
        lI = jax.lax.broadcasted_iota(jnp.int32, (G, Cf), 1)
        P = (((gI // Gr) == 3) & (lI == (gI % Gr) * Np)).astype(jnp.float32)
        o_ref[:] = P
    run("A onehot [G,Cf]", kA, jax.ShapeDtypeStruct((G, Cf), jnp.float32), v)

    # B: compaction dot [G,Cf] x [1,Cf] contract lanes -> [G,1]
    def kB(v_ref, o_ref):
        gI = jax.lax.broadcasted_iota(jnp.int32, (G, Cf), 0)
        lI = jax.lax.broadcasted_iota(jnp.int32, (G, Cf), 1)
        P = (((gI // Gr) == 3) & (lI == (gI % Gr) * Np)).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(P, v_ref[3:4, :],
                                       (((1,), (1,)), ((), ())),
                                       precision=HIGH)
    outB = run("B compact dot", kB, jax.ShapeDtypeStruct((G, 1), jnp.float32),
               v)
    if outB is not None:
        want = np.zeros((G, 1), np.float32)
        g_in_row3 = np.arange(3 * Gr, 4 * Gr)
        want[g_in_row3, 0] = v[3, (np.arange(Gr)) * Np]
        print("   bitexact:", np.array_equal(outB, want))

    # C: expansion dot [G,1] x [G,Cf] contract dim0 -> [1,Cf]
    def kC(c_ref, o_ref):
        gI = jax.lax.broadcasted_iota(jnp.int32, (G, Cf), 0)
        lI = jax.lax.broadcasted_iota(jnp.int32, (G, Cf), 1)
        Q = (gI == (3 * Gr + lI // Np)).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(c_ref[:], Q,
                                       (((0,), (0,)), ((), ())),
                                       precision=HIGH)
    outC = run("C expand dot ((0,),(0,))", kC,
               jax.ShapeDtypeStruct((1, Cf), jnp.float32), col)
    if outC is not None:
        want = col[3 * Gr + np.arange(Cf) // Np, 0].reshape(1, Cf)
        print("   bitexact:", np.array_equal(outC, want))

    # C2: expansion via transposed dnums [Dq,G] x [G,Cf]
    Dq = 4
    selT = rng.standard_normal((Dq, G)).astype(np.float32)

    def kC2(s_ref, o_ref):
        gI = jax.lax.broadcasted_iota(jnp.int32, (G, Cf), 0)
        lI = jax.lax.broadcasted_iota(jnp.int32, (G, Cf), 1)
        Q = (gI == (3 * Gr + lI // Np)).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(s_ref[:], Q,
                                       (((1,), (0,)), ((), ())),
                                       precision=HIGH)
    outC2 = run("C2 expand dot [Dq,G]@[G,Cf]", kC2,
                jax.ShapeDtypeStruct((Dq, Cf), jnp.float32), selT)
    if outC2 is not None:
        want = selT[:, 3 * Gr + np.arange(Cf) // Np]
        print("   bitexact:", np.array_equal(outC2, want))

    # D: broadcast-where [R,Cf] cond with [1,Cf] value
    e = rng.standard_normal((1, Cf)).astype(np.float32)

    def kD(e_ref, o_ref):
        rowI = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 0)
        o_ref[:] = jnp.where(rowI == 3, e_ref[:], 0.0)
    outD = run("D where bcast [1,Cf]->[R,Cf]", kD,
               jax.ShapeDtypeStruct((R, Cf), jnp.float32), e)
    if outD is not None:
        want = np.zeros((R, Cf), np.float32)
        want[3] = e[0]
        print("   bitexact:", np.array_equal(outD, want))

    # D2: multiply-accumulate form
    def kD2(e_ref, o_ref):
        rowI = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 0)
        m = (rowI == 3).astype(jnp.float32)
        o_ref[:] = m * e_ref[:]
    run("D2 mask-mul bcast", kD2, jax.ShapeDtypeStruct((R, Cf), jnp.float32),
        e)

    # E: sublane concat of [1,Cf] slices -> [Dq,Cf]
    def kE(v_ref, o_ref):
        parts = [v_ref[i:i + 1, :] for i in range(Dq)]
        o_ref[:] = jnp.concatenate(parts, axis=0)
    run("E sublane concat", kE, jax.ShapeDtypeStruct((Dq, Cf), jnp.float32),
        v)

    # F: leading-axis concat [1,R,Cf] pieces -> [2,R,Cf]
    def kF(v_ref, o_ref):
        o_ref[:] = jnp.concatenate([v_ref[:][None], (v_ref[:] * 2.0)[None]],
                                   axis=0)
    run("F leading concat", kF, jax.ShapeDtypeStruct((2, R, Cf), jnp.float32),
        v)


if __name__ == "__main__":
    main()
