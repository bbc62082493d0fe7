"""Lotka-Volterra (predator-prey) ODE inference.

Reference: ``/root/reference/Examples/Predator_Prey_Example.jl`` — params
(α, β, γ, δ, σ) with truncated-normal priors and an InverseGamma(2,3)
noise prior; likelihood is iid Normal(σ) residuals around the ODE solution
sampled at Δt = 0.1 on t ∈ [0, 10].

The reference integrates with DifferentialEquations.jl Tsit5; here the
integrator is a fixed-step RK4 under ``lax.scan`` (no adaptive stepping —
data-dependent step counts don't compile).  dt = 0.02 with every 5th state
saved reproduces the saveat-0.1 trajectory to ~1e-6, far below the
observation noise.  The whole solve is jittable and vmaps over the chain
population, so each sampler step integrates thousands of ODEs in one
fused tensor program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DE
from ..model import DEModel
from ..utils import dists

NAMES = ("alpha", "beta", "gamma", "delta", "sigma")
BOUNDS = ((0.5, 2.5), (0.0, 2.0), (1.0, 4.0), (0.0, 2.0), (0.0, jnp.inf))


def _vector_field(u, p):
    x, y = u[0], u[1]
    alpha, beta, gamma, delta = p
    return jnp.stack([(alpha - beta * y) * x, (delta * x - gamma) * y])


def solve(p, u0=(1.0, 1.0), t1=10.0, saveat=0.1, substeps=5):
    """RK4 solution sampled at ``saveat`` intervals: returns [n_save+1, 2]
    including t=0."""
    dt = saveat / substeps
    n_save = int(round(t1 / saveat))
    # carry dtype must match the vector field's output or lax.scan
    # rejects the body under jax_enable_x64 (smoke-test finding r5)
    u0 = jnp.asarray(u0, jnp.result_type(jnp.asarray(p).dtype,
                                         jnp.float32))

    def rk4_step(u, _):
        k1 = _vector_field(u, p)
        k2 = _vector_field(u + 0.5 * dt * k1, p)
        k3 = _vector_field(u + 0.5 * dt * k2, p)
        k4 = _vector_field(u + dt * k3, p)
        return u + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

    def save_step(u, _):
        u, _ = jax.lax.scan(rk4_step, u, None, length=substeps)
        return u, u

    _, traj = jax.lax.scan(save_step, u0, None, length=n_save)
    return jnp.concatenate([u0[None], traj])          # [n_save+1, 2]


def inverse_gamma_logpdf(x, a=2.0, b=3.0):
    lp = (a * jnp.log(b) - jax.scipy.special.gammaln(a)
          - (a + 1) * jnp.log(x) - b / x)
    return jnp.where(x > 0, lp, -jnp.inf)


def _trunc_norm(x, mu, sd, lo, hi):
    return dists.truncated_logpdf(
        lambda v, **kw: dists.normal_logpdf(v, mu, sd),
        lambda v, **kw: dists.normal_cdf(v, mu, sd), x, lo, hi)


def make(data=None, key=0, true_p=(1.5, 1.0, 3.0, 1.0), noise=0.5,
         Np=12, n_groups=3, burnin=1000, **de_kwargs):
    if data is None:
        traj = solve(jnp.asarray(true_p))
        data = traj + noise * jax.random.normal(jax.random.PRNGKey(key),
                                                traj.shape)

    def prior_loglike(alpha, beta, gamma, delta, sigma):
        return (_trunc_norm(alpha, 1.5, 0.5, 0.5, 2.5)
                + _trunc_norm(beta, 1.2, 0.5, 0.0, 2.0)
                + _trunc_norm(gamma, 3.0, 0.5, 1.0, 4.0)
                + _trunc_norm(delta, 1.0, 0.5, 0.0, 2.0)
                + inverse_gamma_logpdf(sigma))

    def sample_prior(key):
        ks = jax.random.split(key, 5)
        alpha = dists.sample_truncated_normal(ks[0], 1.5, 0.5, 0.5, 2.5)
        beta = dists.sample_truncated_normal(ks[1], 1.2, 0.5, 0.0, 2.0)
        gamma = dists.sample_truncated_normal(ks[2], 3.0, 0.5, 1.0, 4.0)
        delta = dists.sample_truncated_normal(ks[3], 1.0, 0.5, 0.0, 2.0)
        # InverseGamma(2, 3) draw: 3 / Gamma(2, 1)
        sigma = 3.0 / jax.random.gamma(ks[4], 2.0)
        return [alpha, beta, gamma, delta, sigma]

    def loglike(data, alpha, beta, gamma, delta, sigma):
        pred = solve(jnp.stack([alpha, beta, gamma, delta]))
        return jnp.sum(dists.normal_logpdf(data, pred, sigma))

    model = DEModel(loglike=loglike, prior_loglike=prior_loglike,
                    sample_prior=sample_prior, names=NAMES, data=data)
    kw = dict(bounds=BOUNDS, burnin=burnin, Np=Np, n_groups=n_groups)
    kw.update(de_kwargs)
    de = DE(**kw)
    return model, de
