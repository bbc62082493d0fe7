"""Checkpoint / resume — the carry is the entire run state, so resuming
from a snapshot must reproduce the uninterrupted run bit-for-bit (the
counter-based RNG keys depend only on (base key, iteration)).
"""

import numpy as np

import demcmc_tpu as dm
from demcmc_tpu.models import binomial, mvnormal
from demcmc_tpu.sampler import build_step, init_state, make_spec, run_scan


def test_resume_bitwise_identical(tmp_path):
    model, de = binomial.make(N=10, k=5, burnin=0, discard_burnin=False)
    spec = make_spec(model, de)
    step = build_step(model, de, spec)

    # uninterrupted: 100 steps
    s0 = init_state(model, de, spec, 7)
    full, ys_full = run_scan(step, s0, 100)

    # interrupted: 40 steps, save, load, 60 more
    s0 = init_state(model, de, spec, 7)
    mid, ys_a = run_scan(step, s0, 40)
    path = tmp_path / "ckpt.npz"
    dm.save_state(path, mid)
    loaded = dm.load_state(path)
    end, ys_b = run_scan(step, loaded, 60)

    np.testing.assert_array_equal(np.asarray(full.theta),
                                  np.asarray(end.theta))
    np.testing.assert_array_equal(np.asarray(full.weight),
                                  np.asarray(end.weight))
    np.testing.assert_array_equal(
        np.asarray(ys_full.theta),
        np.concatenate([np.asarray(ys_a.theta), np.asarray(ys_b.theta)]))


def test_checkpoint_roundtrip_with_history(tmp_path):
    model, de = mvnormal.make(d=3, n_obs=20, n_initial=8, burnin=5)
    spec = make_spec(model, de)
    state = init_state(model, de, spec, 3)
    path = tmp_path / "h.npz"
    dm.save_state(path, state)
    loaded = dm.load_state(path)
    np.testing.assert_array_equal(np.asarray(state.history),
                                  np.asarray(loaded.history))
    assert int(loaded.iteration) == int(state.iteration)


def test_sample_periodic_checkpoint_and_resume(tmp_path):
    path = str(tmp_path / "run.npz")
    model, de = binomial.make(N=10, k=5, burnin=10, discard_burnin=False)
    dm.sample(model, de, 100, key=1, checkpoint_every=25,
              checkpoint_path=path)
    state = dm.load_state(path)
    assert int(state.iteration) == 101
    # resume API: continue sampling from the loaded carry
    chains = dm.sample(model, de, 50, key=1, state=state)
    assert len(chains) == 50  # discard_burnin=False keeps everything


def test_resume_resample_grows_history():
    """Resuming a resample-mode run must extend the history buffer —
    without growth, writes/reads clamp to the last row and silently bias
    DE-MCz partner draws (review finding)."""
    model, de = mvnormal.make(d=3, n_obs=20, n_initial=8, burnin=5,
                              discard_burnin=False)
    c1, s1 = dm.sample(model, de, 40, key=3, return_state=True)
    H1 = s1.history.shape[0]
    assert H1 == 8 + 40
    c2, s2 = dm.sample(model, de, 30, key=3, state=s1, return_state=True)
    assert s2.history.shape[0] == H1 + 30
    assert int(s2.iteration) == 8 + 40 + 30 + 1
    # the newly appended rows were actually written
    h = np.asarray(s2.history)
    assert np.any(h[-1] != 0)


def test_checkpoint_roundtrip_fused_state_with_fire(tmp_path):
    """A fused-layout state carries ``fire``; the named-field format must
    round-trip it as FIRE, not mislabel it as the history buffer (the
    old positional format did exactly that)."""
    import jax
    import jax.numpy as jnp
    from demcmc_tpu.sampler import SamplerState
    from demcmc_tpu.utils.checkpoint import load_state, save_state

    st = SamplerState(theta=jnp.ones((2, 8, 16)),
                      weight=jnp.zeros((8, 16)),
                      key=jax.random.PRNGKey(0),
                      iteration=jnp.asarray(7, jnp.int32),
                      history=None,
                      fire=jnp.ones((1, 1), jnp.int32))
    path = tmp_path / "fused_ckpt"
    save_state(path, st)
    got = load_state(path)
    assert got.history is None
    assert got.fire is not None and got.fire.shape == (1, 1)
    assert int(got.iteration) == 7
    np.testing.assert_array_equal(np.asarray(got.theta),
                                  np.asarray(st.theta))


def test_checkpoint_legacy_positional_format_still_loads(tmp_path):
    """Old checkpoints (leaf_i + n_leaves) keep loading."""
    import jax
    import jax.numpy as jnp
    from demcmc_tpu.sampler import SamplerState
    from demcmc_tpu.utils.checkpoint import load_state

    st = SamplerState(theta=jnp.ones((4, 3, 2)), weight=jnp.zeros((4, 3)),
                      key=jax.random.PRNGKey(1),
                      iteration=jnp.asarray(3, jnp.int32), history=None)
    leaves = jax.tree.flatten(st)[0]
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    path = str(tmp_path / "legacy.npz")
    np.savez(path, n_leaves=len(leaves), **arrays)
    got = load_state(path)
    assert got.history is None and got.fire is None
    np.testing.assert_array_equal(np.asarray(got.theta),
                                  np.asarray(st.theta))


def test_checkpoint_async_and_atomic(tmp_path):
    """async_=True returns a Future, the write is atomic (no .tmp debris,
    valid npz), and the round trip matches the sync path."""
    import jax
    import jax.numpy as jnp
    from demcmc_tpu.sampler import SamplerState
    from demcmc_tpu.utils.checkpoint import load_state, save_state

    st = SamplerState(theta=jnp.arange(24.0).reshape(4, 3, 2),
                      weight=jnp.zeros((4, 3)),
                      key=jax.random.PRNGKey(2),
                      iteration=jnp.asarray(11, jnp.int32), history=None)
    path = tmp_path / "async_ckpt"
    fut = save_state(path, st, async_=True)
    assert fut is not None
    fut.result(timeout=30)
    got = load_state(path)
    np.testing.assert_array_equal(np.asarray(got.theta),
                                  np.asarray(st.theta))
    assert int(got.iteration) == 11
    # no tmp debris left behind
    leftovers = [p for p in path.parent.iterdir() if ".tmp" in p.name]
    assert leftovers == []


def test_checkpoint_fires_when_chunk_does_not_divide_interval(tmp_path):
    """Progress/stop_rhat chunking makes `done` advance on a grid that can
    skip every multiple of checkpoint_every; the interval-elapsed trigger
    must still fire (the old `done % every == 0` trigger never would
    here: chunk grid 6, interval 35, lcm 210 > n_iter)."""
    from demcmc_tpu.models import gaussian
    from demcmc_tpu.utils.checkpoint import load_state

    model, de = gaussian.make(key=0, n_obs=20, n_groups=4, Np=4,
                              burnin=20)
    path = str(tmp_path / "cadence")
    # stop_rhat=0 is unreachable -> full run, but forces progress-style
    # chunking (ceil(120/20) = 6 outer steps per chunk)
    dm.sample(model, de, 120, key=1, stop_rhat=0.0,
              checkpoint_every=35, checkpoint_path=path)
    st = load_state(path)           # must exist and be a late snapshot
    it = int(st.iteration)
    assert it >= 100
