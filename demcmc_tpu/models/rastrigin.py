"""Rastrigin benchmark for DE optimization.

Reference: ``/root/reference/test/optimization_tests.jl:1-44`` — 2-D
Rastrigin minimized with ``minimize!`` + ``evaluate_fun!``; optimum 0
within 1e-8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DE
from ..model import DEModel

NAMES = ("x",)
BOUNDS = ((-5.0, 5.0),)


def rastrigin(data, x):
    A = 10.0
    return A * x.shape[0] + jnp.sum(x ** 2 - A * jnp.cos(2 * jnp.pi * x))


def rastrigin_batched(data, x):
    """Chains-last batched form (``x`` ``[n_dim, ...chains]``) — enables
    the fused-kernel optimization path for f32 configs."""
    A = 10.0
    return A * x.shape[0] + jnp.sum(x ** 2 - A * jnp.cos(2 * jnp.pi * x),
                                    axis=0)


def make(n_dim=2, Np=6, n_groups=1, dtype=jnp.float64, **de_kwargs):
    def sample_prior(key):
        return [jax.random.uniform(key, (n_dim,), minval=-5.0, maxval=5.0)]

    model = DEModel(loglike=rastrigin, sample_prior=sample_prior,
                    loglike_batched=rastrigin_batched,
                    names=NAMES, data=None)
    kw = dict(bounds=BOUNDS, Np=Np, n_groups=n_groups,
              update_particle="minimize", evaluate_fitness="fun",
              dtype=dtype)
    kw.update(de_kwargs)
    de = DE(**kw)
    return model, de
