"""Checkpoint / resume for the sampler carry.

The reference has no checkpointing (SURVEY.md §5); here the entire run
state is one pytree (:class:`demcmc_tpu.sampler.SamplerState`), so a
snapshot is a plain ``.npz``.  ``sample(..., checkpoint_every=K,
checkpoint_path=...)`` saves periodically; ``load_state`` +
``sample(..., state=...)`` resumes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _norm_path(path) -> str:
    # np.savez appends '.npz' to extension-less paths; normalize both
    # sides so save/load round-trip with any path the user gives
    path = str(path)
    return path if path.endswith(".npz") else path + ".npz"


def save_state(path: str, state) -> None:
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    # Record which optional leaves (history) are present via leaf count.
    np.savez(_norm_path(path), n_leaves=len(leaves), **arrays)


def load_state(path: str):
    from ..sampler import SamplerState
    z = np.load(_norm_path(path))
    n = int(z["n_leaves"])
    leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    if n == 4:       # no history buffer
        theta, weight, key, iteration = leaves
        history = None
    else:
        theta, weight, key, iteration, history = leaves
    return SamplerState(theta=theta, weight=weight, key=key,
                        iteration=iteration, history=history)
