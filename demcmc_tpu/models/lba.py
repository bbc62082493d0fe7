"""Linear Ballistic Accumulator choice-RT likelihood in JAX.

Reference: ``/root/reference/Examples/Run_LBA.jl`` — params
(ν[2], A, k, τ), priors ν ~ Normal(1,5), A ~ Normal(0.8,0.2),
k ~ Normal(0.2,0.1), τ ~ Uniform(0, min_rt); bounds all positive with
τ < min_rt.  The reference gets the density from
SequentialSamplingModels.jl; here it is implemented directly (Brown &
Heathcote 2008, drift sd s = 1) as a fully vectorized [n_trials, n_acc]
tensor expression — one fused kernel over the whole dataset per chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.stats as jss

from ..config import DE
from ..model import DEModel
from ..utils import dists

NAMES = ("nu", "A", "k", "tau")


def _phi(x):
    return jss.norm.pdf(x)


def _Phi(x):
    return jss.norm.cdf(x)


_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _Phi_phi(x):
    """Φ(x) and φ(x) sharing ONE exp(-x²/2).

    Φ = 0.5·erfc(-x/√2) with erfc via Abramowitz & Stegun 7.1.26, whose
    exponential exp(-(x/√2)²) IS φ's — so the pair costs one exp, one
    divide and a 5-term polynomial instead of the erf rational (12-term,
    own divide) PLUS a separate exp.  |Φ error| < 7.5e-8 absolute (at
    f32 εmach); deep-tail relative error matches the f32 cancellation
    the 1−cdf survivor computation incurs anyway (densities are clipped
    at 1e-30 downstream).  This is the hot function of the LBA density —
    4 (Φ, φ) pairs per trial per chain — and is shared by the XLA and
    fused-kernel paths."""
    from ..utils import dists as _d
    e = jnp.exp(-0.5 * x * x)
    t = 1.0 / (1.0 + _d.AS_ERFC_P * (jnp.abs(x) * _INV_SQRT2))
    half_erfc = 0.5 * e * _d.as_erfc_poly(t)   # erfc(|x|/√2) / 2
    Phi = jnp.where(x >= 0, 1.0 - half_erfc, half_erfc)
    return Phi, _INV_SQRT_2PI * e


def lba_pdf_cdf(t, nu, b, A, s=1.0):
    """Defective first-passage density f_i(t) and CDF F_i(t) of one LBA
    accumulator at decision time t (post-τ).  Broadcasts over accumulators.
    """
    ts = t * s
    z1 = (b - A - t * nu) / ts
    z2 = (b - t * nu) / ts
    P1, p1 = _Phi_phi(z1)
    P2, p2 = _Phi_phi(z2)
    pdf = (1.0 / A) * (-nu * P1 + s * p1 + nu * P2 - s * p2)
    cdf = (1.0 + ((b - A - t * nu) / A) * P1
           - ((b - t * nu) / A) * P2
           + (ts / A) * p1 - (ts / A) * p2)
    return pdf, cdf


def lba_logpdf(choice, rt, nu, A, k, tau, s=1.0):
    """log density of (choice, rt) pairs. choice: int [n] in 0..n_acc-1,
    rt: float [n]; nu: [n_acc]."""
    b = A + k
    t = rt[:, None] - tau                                   # [n, 1]
    valid = t[:, 0] > 0
    tsafe = jnp.where(t > 0, t, 1.0)
    pdf, cdf = lba_pdf_cdf(tsafe, nu[None, :], b, A, s)     # [n, n_acc]
    pdf = jnp.clip(pdf, 1e-30, jnp.inf)
    surv = jnp.clip(1.0 - cdf, 1e-30, 1.0)
    onehot = jax.nn.one_hot(choice, nu.shape[0], dtype=pdf.dtype)
    ll = jnp.sum(onehot * jnp.log(pdf) + (1.0 - onehot) * jnp.log(surv),
                 axis=1)
    return jnp.where(valid, ll, -jnp.inf)


def simulate(key, n, nu, A, k, tau, s=1.0):
    """Forward-simulate LBA trials (for generating test data)."""
    n_acc = len(nu)
    k1, k2 = jax.random.split(key)
    start = jax.random.uniform(k1, (n, n_acc), minval=0.0, maxval=A)
    drift = jnp.asarray(nu) + s * jax.random.normal(k2, (n, n_acc))
    drift = jnp.where(drift <= 0, jnp.nan, drift)   # negative drifts never finish
    ttf = (A + k - start) / drift
    ttf = jnp.where(jnp.isnan(ttf) | (ttf < 0), jnp.inf, ttf)
    choice = jnp.argmin(ttf, axis=1)
    rt = tau + jnp.min(ttf, axis=1)
    ok = jnp.isfinite(rt)
    return choice[ok], rt[ok]


def make(data=None, key=0, n_trials=100, Np=15, n_groups=3, burnin=1500,
         **de_kwargs):
    if data is None:
        choice, rt = simulate(jax.random.PRNGKey(key), n_trials,
                              jnp.array([3.0, 2.0]), 0.8, 0.2, 0.3)
        data = (jnp.asarray(choice), jnp.asarray(rt))
    choice, rt = data
    min_rt = float(jnp.min(rt))
    n_acc = 2

    bounds = ((0.0, jnp.inf), (0.0, jnp.inf), (0.0, jnp.inf),
              (0.0, min_rt))

    def prior_loglike(nu, A, k, tau):
        return (jnp.sum(dists.normal_logpdf(nu, 1.0, 5.0))
                + dists.normal_logpdf(A, 0.8, 0.2)
                + dists.normal_logpdf(k, 0.2, 0.1)
                + dists.uniform_logpdf(tau, 0.0, min_rt))

    def sample_prior(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        # positive-truncated draws so initial weights are finite
        nu = jnp.abs(1.0 + 5.0 * jax.random.normal(k1, (n_acc,)))
        A = jnp.abs(0.8 + 0.2 * jax.random.normal(k2))
        kk = jnp.abs(0.2 + 0.1 * jax.random.normal(k3))
        tau = jax.random.uniform(k4, minval=0.0, maxval=min_rt)
        return [nu, A, kk, tau]

    def loglike(data, nu, A, k, tau):
        choice, rt = data
        return jnp.sum(lba_logpdf(choice, rt, nu, A, k, tau))

    def prior_loglike_batched(nu, A, k, tau):
        # nu [n_acc, C]; A, k, tau [C] — same math as prior_loglike
        return (jnp.sum(dists.normal_logpdf(nu, 1.0, 5.0), axis=0)
                + dists.normal_logpdf(A, 0.8, 0.2)
                + dists.normal_logpdf(k, 0.2, 0.1)
                + dists.uniform_logpdf(tau, 0.0, min_rt))

    def loglike_batched(data, nu, A, k, tau):
        """Chains-last batched LBA density for the fused TPU kernel: all
        intermediates [n_trials, *cs] (lane-major; ``cs`` is the kernel's
        opaque chain shape), accumulators unrolled as a static python
        loop (avoids an extra n_acc=2 axis whose sublane dim would waste
        3/4 of each tile)."""
        choice, rt = data
        cn = A.ndim                                   # chain axes
        exp = lambda arr: jnp.reshape(arr, jnp.shape(arr) + (1,) * cn)
        b = A + k                                     # [*cs]
        t = exp(rt) - tau[None]                       # [n, *cs]
        valid = t > 0
        ts = jnp.where(valid, t, 1.0)
        inv_ts = 1.0 / ts
        inv_A = 1.0 / A[None]
        ll = jnp.zeros_like(ts)
        for i in range(n_acc):
            nui = nu[i][None]                         # [1, *cs]
            z1 = (k[None] - ts * nui) * inv_ts        # (b - A - t nu)/ts
            z2 = (b[None] - ts * nui) * inv_ts
            P1, p1 = _Phi_phi(z1)
            P2, p2 = _Phi_phi(z2)
            pdf = inv_A * (-nui * P1 + p1 + nui * P2 - p2)
            cdf = (1.0 + (k[None] - ts * nui) * inv_A * P1
                   - (b[None] - ts * nui) * inv_A * P2
                   + ts * inv_A * (p1 - p2))
            win = exp(choice == i)
            ll = ll + jnp.where(
                win, jnp.log(jnp.clip(pdf, 1e-30, jnp.inf)),
                jnp.log(jnp.clip(1.0 - cdf, 1e-30, 1.0)))
        ll = jnp.where(valid, ll, -jnp.inf)
        return jnp.sum(ll, axis=0)

    model = DEModel(loglike=loglike, prior_loglike=prior_loglike,
                    sample_prior=sample_prior, names=NAMES, data=data,
                    loglike_batched=loglike_batched,
                    prior_loglike_batched=prior_loglike_batched,
                    chunk_obs=True)      # trials are iid: fused kernel
    #   may sum the density over small trial chunks (see DEModel docs)
    kw = dict(bounds=bounds, burnin=burnin, Np=Np, n_groups=n_groups)
    kw.update(de_kwargs)
    de = DE(**kw)
    return model, de
