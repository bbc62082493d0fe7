"""ParamSpec flatten/unflatten/naming/bounds unit tests.

Mirrors the reference's type-helper coverage (`as_union`, `get_names` —
/root/reference/src/utilities.jl:131-149,182-187) with exact assertions.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from demcmc_tpu import ParamSpec, as_union


def _spec(bounds=None):
    example = [np.float64(0.5), np.zeros(3), np.zeros((2, 2)), np.int64(4)]
    return ParamSpec.from_example(("a", "b", "m", "k"), example, bounds)


def test_sizes_and_dim():
    spec = _spec()
    assert spec.sizes == (1, 3, 4, 1)
    assert spec.dim == 9
    assert spec.offsets == (0, 1, 4, 8)


def test_flatten_unflatten_roundtrip():
    spec = _spec()
    params = [0.5, jnp.arange(3.0), jnp.arange(4.0).reshape(2, 2), 7]
    flat = spec.flatten(params)
    assert flat.shape == (9,)
    out = spec.unflatten(flat)
    assert float(out[0]) == 0.5
    np.testing.assert_allclose(out[1], np.arange(3.0))
    np.testing.assert_allclose(out[2], np.arange(4.0).reshape(2, 2))
    # integer leaf comes back as a true integer (round-and-cast rule,
    # reference src/utilities.jl:360-369)
    assert out[3].dtype == jnp.int32
    assert int(out[3]) == 7


def test_int_mask():
    spec = _spec()
    np.testing.assert_array_equal(
        spec.int_mask,
        [False, False, False, False, False, False, False, False, True])
    assert spec.has_int


def test_flat_names_one_based():
    spec = _spec()
    # 1-based indices like the reference's get_names ("β0[3]", "m[1,2]")
    assert spec.flat_names() == [
        "a", "b[1]", "b[2]", "b[3]",
        "m[1,1]", "m[1,2]", "m[2,1]", "m[2,2]", "k"]


def test_bounds_broadcast_per_parameter():
    bounds = ((-1.0, 1.0), (0.0, jnp.inf), (-jnp.inf, jnp.inf), (0, 10))
    spec = _spec(bounds)
    np.testing.assert_allclose(spec.lo[:4], [-1.0, 0.0, 0.0, 0.0])
    assert spec.hi[1] == np.inf
    assert spec.lo[4] == -np.inf
    np.testing.assert_allclose(spec.lo[8], 0.0)
    np.testing.assert_allclose(spec.hi[8], 10.0)


def test_bounds_length_mismatch_raises():
    with pytest.raises(ValueError):
        _spec(bounds=((0, 1),))


def test_names_mismatch_raises():
    with pytest.raises(ValueError):
        ParamSpec.from_example(("a",), [1.0, 2.0], None)


def test_as_union_identity():
    p = [1.0, np.zeros(2)]
    out = as_union(p)
    assert out[0] == 1.0
    assert out[1] is p[1]


def test_zero_arg_sample_prior_host_style():
    """Reference-style zero-arg sample_prior() (numpy RNG) is accepted and
    used host-side at init."""
    import demcmc_tpu as dm

    rng_host = np.random.default_rng(0)

    def sample_prior():
        return [rng_host.normal(), abs(rng_host.normal()) + 0.1]

    def loglike(data, mu, sigma):
        return jnp.sum(-0.5 * ((data - mu) / sigma) ** 2
                       - jnp.log(sigma))

    model = dm.DEModel(loglike=loglike, prior_loglike=lambda m, s: 0.0,
                       sample_prior=sample_prior, names=("mu", "sigma"),
                       data=jnp.zeros(10))
    de = dm.DE(bounds=((-np.inf, np.inf), (1e-6, np.inf)), Np=4,
               burnin=10, discard_burnin=False)
    chains = dm.sample(model, de, 50, key=0)
    assert len(chains) == 50
    assert np.isfinite(chains.lp).all()


def test_model_args_kwargs_passthrough():
    """data/args/kwargs close over loglike like the reference ctor."""
    import demcmc_tpu as dm

    seen = {}

    def loglike(data, scale, mu, *, offset=0.0):
        seen["ok"] = True
        return -jnp.sum((data * scale - mu - offset) ** 2)

    model = dm.DEModel(
        loglike=loglike, prior_loglike=lambda mu: 0.0,
        sample_prior=lambda k: [jax.random.normal(k)], names=("mu",),
        data=jnp.ones(5), args=(2.0,), kwargs={"offset": 1.0})
    de = dm.DE(Np=4, burnin=5, discard_burnin=False)
    chains = dm.sample(model, de, 30, key=0)
    assert seen.get("ok")
    # posterior concentrates at mu = data*scale - offset = 1
    assert abs(chains.data[-10:].mean() - 1.0) < 0.5


import jax  # noqa: E402
