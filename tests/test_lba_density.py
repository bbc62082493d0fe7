"""Validation of the LBA density (``models/lba.py``).

The reference imports the LBA density from SequentialSamplingModels.jl
(``/root/reference/Examples/Run_LBA.jl:34-37``); here it is implemented
directly, with a shared-exponential Φ/φ pair (A&S 7.1.26 erfc) on the
hot path.  These tests pin: (a) Φ/φ accuracy against the erf-based
oracle, (b) per-trial vs chains-batched density agreement (the fused
kernel consumes the batched form), (c) the defective pdf/cdf relation
by numerical differentiation, and (d) simulation-vs-density consistency
(empirical choice rates match integrated defective densities).
"""

import numpy as np
import pytest
from scipy import stats as sps
from scipy.integrate import quad

import jax
import jax.numpy as jnp

from demcmc_tpu.models import lba


def test_phi_phi_accuracy_f64():
    x = jnp.asarray(np.linspace(-8.0, 8.0, 20001), jnp.float64)
    Phi, phi = lba._Phi_phi(x)
    Phi_ref = sps.norm.cdf(np.asarray(x))
    phi_ref = sps.norm.pdf(np.asarray(x))
    # A&S 7.1.26: |abs error| < 1.5e-7 on erf => < 7.5e-8 on Phi
    assert np.max(np.abs(np.asarray(Phi) - Phi_ref)) < 7.5e-8
    # phi is exact (one exp, one multiply)
    np.testing.assert_allclose(np.asarray(phi), phi_ref, rtol=1e-12)


def test_phi_phi_accuracy_f32():
    x = jnp.asarray(np.linspace(-6.0, 6.0, 4001), jnp.float32)
    Phi, phi = lba._Phi_phi(x)
    assert Phi.dtype == jnp.float32
    Phi_ref = sps.norm.cdf(np.asarray(x, np.float64))
    assert np.max(np.abs(np.asarray(Phi, np.float64) - Phi_ref)) < 4e-7


def test_batched_matches_per_trial():
    """loglike_batched (chains-last, accumulator-unrolled, used by the
    fused kernel) must agree with the per-chain lba_logpdf path."""
    rng = np.random.default_rng(11)
    model, de = lba.make(key=3, n_trials=64)
    choice, rt = model.data
    C = 24
    nu = jnp.asarray(np.abs(rng.normal(2.0, 0.7, (2, C))), jnp.float64)
    A = jnp.asarray(np.abs(rng.normal(0.8, 0.1, C)), jnp.float64)
    k = jnp.asarray(np.abs(rng.normal(0.2, 0.05, C)), jnp.float64)
    tau = jnp.asarray(rng.uniform(0.05, float(rt.min()) * 0.9, C),
                      jnp.float64)
    batched = model.loglike_batched(model.data, nu, A, k, tau)
    per = np.array([
        float(jnp.sum(lba.lba_logpdf(choice, rt, nu[:, c], A[c], k[c],
                                     tau[c])))
        for c in range(C)])
    np.testing.assert_allclose(np.asarray(batched), per, rtol=1e-9)


def test_pdf_is_cdf_derivative():
    nu = jnp.asarray([3.0, 2.0])
    A, b = 0.8, 1.0
    t = jnp.asarray(np.linspace(0.15, 2.0, 2000))[:, None]
    pdf, cdf = lba.lba_pdf_cdf(t, nu[None, :], b, A)
    # central differences only (np.gradient's boundary stencils are O(h))
    num = np.gradient(np.asarray(cdf), np.asarray(t[:, 0]), axis=0)[1:-1]
    np.testing.assert_allclose(num, np.asarray(pdf)[1:-1], atol=2e-3)


def test_defective_density_integrates_to_choice_rate():
    """∫ f_i(t)·Π_{j≠i}(1−F_j(t)) dt must equal the simulated P(choice=i)."""
    nu = np.array([3.0, 2.0])
    A, kk, tau = 0.8, 0.2, 0.3
    b = A + kk

    def winner_density(t, i):
        pdf, cdf = lba.lba_pdf_cdf(jnp.asarray([[t]]), jnp.asarray(nu),
                                   b, A)
        pdf, cdf = np.asarray(pdf)[0], np.asarray(cdf)[0]
        other = 1 - i
        return float(pdf[i] * (1.0 - cdf[other]))

    p0 = quad(winner_density, 1e-6, 30.0, args=(0,), limit=200)[0]
    choice, rt = lba.simulate(jax.random.PRNGKey(0), 200_000, nu, A, kk,
                              tau)
    emp0 = float(np.mean(np.asarray(choice) == 0))
    # normalize by the finite-RT mass (negative-drift trials never finish)
    p1 = quad(winner_density, 1e-6, 30.0, args=(1,), limit=200)[0]
    assert abs(p0 / (p0 + p1) - emp0) < 0.005


def test_invalid_rt_rejected():
    """rt <= tau must give -inf (the (0, min_rt) bound on tau depends on
    it, Run_LBA.jl:31)."""
    nu = jnp.asarray([3.0, 2.0])
    ll = lba.lba_logpdf(jnp.asarray([0, 0]), jnp.asarray([0.25, 0.8]),
                        nu, 0.8, 0.2, 0.3)
    assert np.isneginf(float(ll[0]))          # 0.25 < tau=0.3
    assert np.isfinite(float(ll[1]))
