"""Device-mesh helpers.

The reference's only parallel backend is one CPU thread per particle group
(``/root/reference/src/main.jl:135-148``).  The TPU-native replacement:
shard the *group axis* of the population tensor over a 1-D ``chains`` mesh
(groups never interact inside an update — SURVEY.md §3.2 — so this axis is
communication-free except for migration, which GSPMD lowers to a tiny
all-gather over ICI), and optionally shard large datasets inside the
likelihood over a second ``data`` axis (the MCMC analogue of sequence
parallelism; partial log-likelihoods are summed with an XLA-inserted
psum/reduce-scatter).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def chain_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the ``chains`` axis (shards particle groups)."""
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.array(devices), ("chains",))


def data_mesh(n_chain_devices: int, n_data_devices: int,
              devices=None) -> Mesh:
    """2-D ``chains × data`` mesh: groups shard over ``chains``, the
    likelihood's dataset over ``data``."""
    if devices is None:
        devices = jax.devices()
    devices = np.array(devices[:n_chain_devices * n_data_devices])
    return Mesh(devices.reshape(n_chain_devices, n_data_devices),
                ("chains", "data"))


def shard_data(data, mesh: Mesh, axis: int = 0, mesh_axis: str = "data"):
    """Place a dataset array sharded along ``axis`` over ``mesh_axis``.

    Close the returned array over your ``loglike``; under jit, reductions
    over the sharded axis compile to on-device partial sums + psum over ICI
    — no host involvement.  The mesh axis size must divide the data size
    along ``axis``.
    """
    if mesh_axis not in mesh.axis_names:
        raise ValueError(f"mesh has no axis {mesh_axis!r}")
    n_shards = mesh.shape[mesh_axis]
    size = np.shape(data)[axis]
    if size % n_shards:
        raise ValueError(
            f"data size {size} along axis {axis} is not divisible by the "
            f"{n_shards}-way {mesh_axis!r} mesh axis")
    ndim = np.ndim(data)
    spec = [None] * ndim
    spec[axis] = mesh_axis
    return jax.device_put(data, NamedSharding(mesh, P(*spec)))
