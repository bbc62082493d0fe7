"""Epanechnikov kernel density estimation in JAX.

Reference: ``/root/reference/Examples/KDE.jl`` (KernelDensity.jl with an
Epanechnikov kernel) feeding the ABC-style synthetic likelihoods of
``Examples/KDE_Example.jl``.  The reference builds an FFT-gridded KDE and
interpolates; on TPU the direct [n_eval, n_samples] kernel matrix is a
single fused reduction (and the shape the Pallas fast path in
``ops.pallas_kde`` tiles onto VMEM), so no grid/interp machinery is needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def silverman_bandwidth(samples, alpha: float = 0.9):
    """Silverman's rule of thumb, as KernelDensity.jl's
    ``default_bandwidth``: 0.9 · min(std, IQR/1.34) · n^(-1/5)."""
    n = samples.shape[-1]
    std = jnp.std(samples, axis=-1)
    q75, q25 = (jnp.quantile(samples, 0.75, axis=-1),
                jnp.quantile(samples, 0.25, axis=-1))
    width = jnp.minimum(std, (q75 - q25) / 1.34)
    width = jnp.where(width <= 0, jnp.maximum(std, 1e-6), width)
    return alpha * width * n ** (-0.2)


def epanechnikov_pdf(x, samples, bandwidth=None):
    """KDE density of ``x [n_eval]`` given ``samples [n_samples]`` with the
    Epanechnikov kernel K(u) = 0.75·(1-u²)·1[|u|≤1]."""
    if bandwidth is None:
        bandwidth = silverman_bandwidth(samples)
    u = (x[:, None] - samples[None, :]) / bandwidth
    k = jnp.where(jnp.abs(u) <= 1.0, 0.75 * (1.0 - u * u), 0.0)
    return jnp.mean(k, axis=1) / bandwidth


def epanechnikov_logpdf(x, samples, bandwidth=None, floor: float = 1e-10):
    """log KDE density with the reference's 1e-10 floor
    (``Examples/KDE_Example.jl:10``)."""
    return jnp.log(jnp.maximum(epanechnikov_pdf(x, samples, bandwidth),
                               floor))
