"""Bisect the G=8192 (131k chains) UNFIRED migration penalty:
alpha=0.001 per-step vs the alpha=0 floor, with _mig_apply_sorted
monkeypatched to partial pipelines (static stage chains — the round-4
baseline form).  Run ALONE on the real TPU.

Variants:
  ident     — empty region (gate + unconditional draws only)
  victim    — Gumbel-max victim select + batched group-broadcast
  compress  — + barrel-compress to [.., Gr]
  sorts     — + rank cycle (loop-rolled bitonic x2 + flag chain)
  full      — + widen/spread + final select (the real thing)
"""
import numpy as np
import jax
import jax.numpy as jnp

from demcmc_tpu.ops import fused_step as fs
import validation.mig8192_bench as bench

_real = fs._mig_apply_sorted


def make_partial(upto):
    def partial_mig(theta, w, u_row, na_f, gum, p, *, G, Np, Gr,
                    spread=None, gemm=None):
        # the builder now ships gemm matrices where Gr % 128 == 0; this
        # bisect pins the round-4 BARREL form (the baseline the 46->22
        # numbers were measured against), so gemm inputs are ignored
        # and spread may be None for the compress+ variants
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

        twv = vict(jnp.concatenate([theta, w[None]], axis=0))
        if upto == "victim":
            return ([jnp.where(vmask, twv[i], theta[i])
                     for i in range(d)], jnp.where(vmask, twv[d], w))

        # (the spread word/T_sp aren't needed: the partial variants
        # stop before widen, and 'full' re-dispatches to the real fn)
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

        pc = compress(jnp.concatenate([twv, u_row[None]], axis=0))
        ku_c, twv_c = pc[d + 1], pc[:d + 1]

        def padwide(v_c):
            flat = v_c.reshape(-1, Gr)
            return jnp.concatenate(
                [flat, jnp.zeros((flat.shape[0], Cf - Gr), dt)],
                axis=1).reshape(v_c.shape[:-1] + (Cf,))

        if upto == "compress":
            pw = padwide(twv_c + ku_c[None])
            return ([jnp.where(vmask, pw[i], theta[i])
                     for i in range(d)], jnp.where(vmask, pw[d], w))

        rowC = jax.lax.broadcasted_iota(jnp.int32, (R, Gr), 0)
        laneC = jax.lax.broadcasted_iota(jnp.int32, (R, Gr), 1)
        kidx_c = rowC * Gr + laneC
        (r_c,) = fs._rank_cycle(ku_c, [twv_c], kidx_c, laneC, G=G,
                                Gr_e=Gr, Np_e=1, na_f=na_f, dt=dt)
        if upto == "sorts":
            pw = padwide(r_c)
            return ([jnp.where(vmask, pw[i], theta[i])
                     for i in range(d)], jnp.where(vmask, pw[d], w))
        return _real(theta, w, u_row, na_f, gum, p, G=G, Np=Np, Gr=Gr,
                     spread=spread, gemm=gemm)
    return partial_mig


def main():
    print("backend:", jax.default_backend(), flush=True)
    for upto in ("ident", "victim", "compress", "sorts", "full"):
        fs._mig_apply_sorted = make_partial(upto)
        try:
            bench.direct(8192, 0.001, f"131k a=0.001 region={upto}",
                         n_iter=10_000)
        except Exception as e:
            print(f"{upto}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    fs._mig_apply_sorted = _real


if __name__ == "__main__":
    main()
