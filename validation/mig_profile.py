"""Profile the fired sorted-migration cost at G=4096 (65k chains) by
timing standalone kernels that run each pipeline piece in isolation:

  empty     — baseline (load theta/w, write back)
  victim    — Gumbel-max victim select + value broadcast (seg ops)
  compress  — barrel-compress 4 quantities + slice
  sorts     — compact bitonic sort1+cycle+sort2 (on iota inputs)
  spread    — concat-widen + scatter + leader bcast (3 quantities)
  full      — the real _mig_apply_sorted

Each kernel is scanned L times; per-event cost = slope between two scan
lengths.  Run ALONE on the real TPU.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from demcmc_tpu.ops import fused_step as fs

G, Np, d = 4096, 16, 2
C = G * Np
R, Cf = 8, C // 8
Gr = Cf // Np
dt = jnp.float32


def build(piece):
    T_sp, word_np = fs._spread_word(Gr, Np, Cf)

    def kernel(t_ref, w_ref, u_ref, g_ref, word_ref, out_t, out_w):
        theta, w, u_row, gum = t_ref[:], w_ref[:], u_ref[:], g_ref[:]
        word = word_ref[:]
        rowI = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 0)
        laneI = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 1)
        p = laneI % Np
        na_f = jnp.sum(jnp.where((rowI == 0) & (laneI == 0),
                                 jnp.full((R, Cf), 37.0, dt), 0.0))
        na_f = na_f.reshape(1, 1) if hasattr(na_f, "reshape") else na_f

        out = [theta[i] for i in range(d)] + [w]

        if piece == "full":
            nt, nw = fs._mig_apply_sorted(theta, w, u_row,
                                          jnp.full((1, 1), 37.0, dt), gum,
                                          p, G=G, Np=Np, Gr=Gr,
                                          spread=(T_sp, word))
            out = list(nt) + [nw]
        elif piece == "victim":
            s = gum - w
            m = fs._seg_last_bcast(fs._seg_scan(s, p, Np, jnp.maximum),
                                   p, Np)
            cand = jnp.where(s == m, p, Np)
            vid = fs._seg_last_bcast(fs._seg_scan(cand, p, Np,
                                                  jnp.minimum), p, Np)
            vmask = p == vid

            def vict(q):
                z = jnp.where(vmask, q, jnp.zeros_like(q))
                return fs._seg_last_bcast(fs._seg_scan(z, p, Np, jnp.add),
                                          p, Np)
            out = [vict(theta[i]) for i in range(d)] + [vict(w)]
        elif piece == "compress":
            s_lane = laneI * (Np - 1)
            smax = (Gr - 1) * (Np - 1)

            def compress(x):
                y = x
                t = 0
                while (1 << t) <= smax:
                    take = (s_lane // (1 << t)) % 2
                    y = jnp.where(take == 1, fs._roll(y, -(1 << t)), y)
                    t += 1
                return y[:, :Gr]
            cs = [compress(v) for v in [u_row, theta[0], theta[1], w]]
            # fold the compacts back so the work isn't dead-code'd
            acc = cs[0]
            for v in cs[1:]:
                acc = acc + v
            pad = jnp.concatenate(
                [acc, jnp.zeros((R, Cf - Gr), dt)], axis=1)
            out = [theta[0] + pad, theta[1], w]
        elif piece == "sorts":
            rowC = jax.lax.broadcasted_iota(jnp.int32, (R, Gr), 0)
            laneC = jax.lax.broadcasted_iota(jnp.int32, (R, Gr), 1)
            kidx_c = rowC * Gr + laneC
            ku_c = u_row[:, :Gr]
            vals_c = [theta[0][:, :Gr], theta[1][:, :Gr], w[:, :Gr]]
            routed = fs._rank_cycle(ku_c, vals_c, kidx_c, laneC, G=G,
                                    Gr_e=Gr, Np_e=1,
                                    na_f=jnp.full((1, 1), 37.0, dt),
                                    dt=dt)
            acc = routed[0] + routed[1] + routed[2]
            pad = jnp.concatenate(
                [acc, jnp.zeros((R, Cf - Gr), dt)], axis=1)
            out = [theta[0] + pad, theta[1], w]
        elif piece == "spread":
            def widen(v_c):
                wide = jnp.concatenate(
                    [v_c, jnp.zeros((R, Cf - Gr), dt)], axis=1)
                y = wide
                for t in range(T_sp - 1, -1, -1):
                    take = (word // (1 << t)) % 2
                    y = jnp.where(take == 1, fs._roll(y, 1 << t), y)
                return fs._seg_leader_bcast(y, p, Np)
            out = [widen(theta[0][:, :Gr]), widen(theta[1][:, :Gr]),
                   widen(w[:, :Gr])]

        for i in range(d):
            out_t[i] = out[i]
        out_w[:] = out[d]

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((d, R, Cf), dt),
                   jax.ShapeDtypeStruct((R, Cf), dt)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    ), word_np


def bench(piece):
    kern, word_np = build(piece)
    rng = np.random.default_rng(0)
    t3 = rng.standard_normal((d, R, Cf)).astype(np.float32)
    w3 = rng.standard_normal((R, Cf)).astype(np.float32)
    u3 = rng.random((R, Cf)).astype(np.float32)
    g3 = rng.gumbel(size=(R, Cf)).astype(np.float32)
    word = jnp.asarray(word_np)

    def scan_n(n):
        @jax.jit
        def run(t, w, dummy):
            def body(c, _):
                tt, ww = c
                tt, ww = kern(tt, ww, u3, g3, word)
                return (tt, ww), None
            (t, w), _ = jax.lax.scan(body, (t, w), None,
                                     length=dummy.shape[0])
            return t, w

        nn = jnp.zeros(n, jnp.int8)
        o = run(t3, w3, nn)
        jax.block_until_ready(o)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            o = run(t3, w3, nn)
            jax.block_until_ready(o)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = scan_n(100), scan_n(500)
    per = (t2 - t1) / 400 * 1e6
    print(f"{piece:10s} {per:9.2f} us/event", flush=True)
    return per


def main():
    print("backend:", jax.default_backend(), flush=True)
    for piece in ("empty", "victim", "compress", "sorts", "spread",
                  "full"):
        try:
            bench(piece)
        except Exception as e:
            print(f"{piece}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
