"""Bisect WHICH part of the in-kernel sorted-migration region is paid
on UNFIRED iterations (alpha=0.001 ~ never fires; overhead vs the
alpha=0 floor should be ~0 if pl.when truly branches).

Variants monkeypatch _mig_apply_sorted with partial pipelines:
  ident     — pass-through (measured ~floor before)
  victim    — victim select + group-broadcast values only
  compress  — victim + barrel-compress + slice
  sorts     — victim + compress + rank-cycle (no widen)
  full      — everything (widen + final select)

Run ALONE on the real TPU.
"""
import numpy as np
import jax
import jax.numpy as jnp

from demcmc_tpu.ops import fused_step as fs
import validation.mig_sorted_bench as bench

_real = fs._mig_apply_sorted


def make_partial(upto):
    def partial_mig(theta, w, u_row, na_f, gum, p, *, G, Np, Gr,
                    spread=None, anchor=None):
        d, R, Cf = theta.shape
        dt = theta.dtype
        if upto == "ident":
            return [theta[i] for i in range(d)], w
        rowI = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 0)
        laneI = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 1)
        s = gum - w
        m = fs._seg_last_bcast(fs._seg_scan(s, p, Np, jnp.maximum), p, Np)
        cand = jnp.where(s == m, p, Np)
        vid = fs._seg_last_bcast(fs._seg_scan(cand, p, Np, jnp.minimum),
                                 p, Np)
        vmask = p == vid

        def vict(q):
            z = jnp.where(vmask, q, jnp.zeros_like(q))
            return fs._seg_last_bcast(fs._seg_scan(z, p, Np, jnp.add),
                                      p, Np)
        tv, wv = vict(theta), vict(w)
        if upto == "victim":
            return ([jnp.where(vmask, tv[i], theta[i]) for i in range(d)],
                    jnp.where(vmask, wv, w))

        T_sp, word = spread
        s_lane = laneI * (Np - 1)
        smax = (Gr - 1) * (Np - 1)

        def compress(x):
            y = x
            t = 0
            while (1 << t) <= smax:
                take = (s_lane // (1 << t)) % 2
                y = jnp.where(take == 1, fs._roll(y, -(1 << t)), y)
                t += 1
            return y[..., :Gr]
        ku_c = compress(u_row)
        tv_c, wv_c = compress(tv), compress(wv)
        if upto == "compress":
            pad_t = jnp.concatenate(
                [tv_c.reshape(-1, Gr),
                 jnp.zeros((d * R, Cf - Gr), dt)], axis=1).reshape(
                     d, R, Cf)
            pad_w = jnp.concatenate(
                [wv_c + ku_c, jnp.zeros((R, Cf - Gr), dt)], axis=1)
            return ([jnp.where(vmask, pad_t[i], theta[i])
                     for i in range(d)], jnp.where(vmask, pad_w, w))

        rowC = jax.lax.broadcasted_iota(jnp.int32, (R, Gr), 0)
        laneC = jax.lax.broadcasted_iota(jnp.int32, (R, Gr), 1)
        kidx_c = rowC * Gr + laneC
        t_r, w_r = fs._rank_cycle(ku_c, [tv_c, wv_c], kidx_c, laneC, G=G,
                                  Gr_e=Gr, Np_e=1, na_f=na_f, dt=dt)
        if upto == "sorts":
            pad_t = jnp.concatenate(
                [t_r.reshape(-1, Gr),
                 jnp.zeros((d * R, Cf - Gr), dt)], axis=1).reshape(
                     d, R, Cf)
            pad_w = jnp.concatenate(
                [w_r, jnp.zeros((R, Cf - Gr), dt)], axis=1)
            return ([jnp.where(vmask, pad_t[i], theta[i])
                     for i in range(d)], jnp.where(vmask, pad_w, w))
        return _real(theta, w, u_row, na_f, gum, p, G=G, Np=Np, Gr=Gr,
                     spread=spread, anchor=anchor)
    return partial_mig


def main():
    print("backend:", jax.default_backend(), flush=True)
    for upto in ("ident", "victim", "compress", "sorts", "full"):
        fs._mig_apply_sorted = make_partial(upto)
        try:
            bench.bench_g(4096, 0.001, f"65k a=0.001 region={upto}",
                          reps=5)
        except Exception as e:
            print(f"{upto}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    fs._mig_apply_sorted = _real


if __name__ == "__main__":
    main()
