"""Device-mesh sharding tests on the 8-virtual-CPU-device harness —
SURVEY.md §4(c).  The reference's only parallel path is MCMCThreads
(thread per group); here the group axis shards over a `chains` mesh and
the result must be IDENTICAL to the unsharded run (pure functional step +
counter-based RNG ⇒ layout cannot change the math).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import demcmc_tpu as dm
from demcmc_tpu.models import gaussian, mvnormal
from demcmc_tpu.parallel import chain_mesh, data_mesh, shard_data


def test_eight_virtual_devices(eight_devices):
    assert len(eight_devices) == 8


def test_sharded_statistically_equals_unsharded(eight_devices):
    """Same key, different device layout: XLA compiles transcendentals at
    different vector widths per partitioning, so trajectories can diverge
    by ULPs (and MCMC is chaotic) — the guarantee is statistical equality
    of the posterior, plus bitwise determinism for a FIXED layout (next
    test)."""
    model, de = gaussian.make(key=5, n_obs=30, burnin=500, n_groups=8, Np=8)
    c_ref = dm.sample(model, de, 2500, key=4)
    mesh = chain_mesh(8)
    c_shard = dm.sample(model, de, 2500, key=4, mesh=mesh)
    assert abs(c_ref.mean("mu") - c_shard.mean("mu")) < 0.05
    assert abs(c_ref.mean("sigma") - c_shard.mean("sigma")) < 0.05
    assert abs(c_ref.std("mu") - c_shard.std("mu")) < 0.03


def test_sharded_deterministic_across_runs(eight_devices):
    model, de = gaussian.make(key=5, n_obs=30, burnin=100, n_groups=8, Np=4)
    mesh = chain_mesh(8)
    c1 = dm.sample(model, de, 300, key=4, mesh=mesh)
    c2 = dm.sample(model, de, 300, key=4, mesh=mesh)
    np.testing.assert_array_equal(c1.data, c2.data)


def test_sharded_migration_path(eight_devices):
    # alpha high so cross-device migration collectives actually fire
    model, de = gaussian.make(key=5, n_obs=30, burnin=200, n_groups=8, Np=4,
                              alpha=0.5)
    mesh = chain_mesh(8)
    chains = dm.sample(model, de, 1000, key=4, mesh=mesh)
    truth = gaussian.posterior_grid(np.asarray(model.data))
    assert abs(chains.mean("mu") - truth["mu"]["mean"]) < 0.1


def test_sharded_resample_history(eight_devices):
    model, de = mvnormal.make(d=4, n_obs=30, key=1, burnin=200,
                              n_groups=1, Np=8)
    # resample mode with the chain axis of history sharded
    de = de.replace(n_groups=8, Np=3, n_initial=40)
    mesh = chain_mesh(8)
    chains = dm.sample(model, de, 800, key=2, mesh=mesh)
    assert np.isfinite(chains.data).all()


def test_mesh_smaller_than_devices(eight_devices):
    model, de = gaussian.make(key=5, n_obs=30, burnin=50, n_groups=4, Np=4)
    mesh = chain_mesh(4)
    chains = dm.sample(model, de, 150, key=4, mesh=mesh)
    assert len(chains) == 100


def test_data_sharding_psum(eight_devices):
    # 2-D mesh: 4-way chains x 2-way data; likelihood reduces the sharded
    # observation axis (the MCMC analogue of sequence parallelism)
    mesh = data_mesh(4, 2)
    raw = np.random.default_rng(0).normal(0.0, 1.0, size=(64,))
    data = shard_data(jnp.asarray(raw), mesh, axis=0)

    model, de = gaussian.make(data=data, burnin=100, n_groups=4, Np=6)
    chains = dm.sample(model, de, 500, key=1, mesh=mesh)
    truth = gaussian.posterior_grid(raw)
    assert abs(chains.mean("mu") - truth["mu"]["mean"]) < 0.12
    assert abs(chains.mean("sigma") - truth["sigma"]["mean"]) < 0.12


def test_graft_entry_compiles():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, example_args = mod.entry()
    out = jax.jit(fn)(*example_args)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(out))


def test_graft_dryrun_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
