"""Multi-host initialization and mesh construction.

The reference has no distributed story at all (SURVEY.md §2: shared-memory
threads only).  Here the chain axis scales past one host by running the
same program on every host of a TPU pod slice under
``jax.distributed.initialize``: the population's group axis shards over
ALL devices, migration's route matmul and any ``resample`` history reads
compile to XLA collectives over ICI (within a slice) / DCN (across
slices).  No custom transport is needed — GSPMD inserts the collectives.

Typical pod-slice driver::

    from demcmc_tpu.parallel import distributed as dist

    dist.initialize()                     # no-op on single-host
    mesh = dist.global_chain_mesh()       # 1-D mesh over ALL devices
    de = DE(n_groups=len(jax.devices()) * groups_per_device, ...)
    chains = sample(model, de, n_iter, mesh=mesh, key=0)

Every host must call :func:`initialize` with the same coordinator before
any jax computation.  The counter-based RNG keys make the run bitwise
reproducible for a fixed device layout regardless of host count.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from .mesh import chain_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX (wrapper over ``jax.distributed``).

    With no arguments, relies on the TPU environment's auto-detection
    (the standard path on Cloud TPU pods); explicit arguments follow
    ``jax.distributed.initialize``.  Safe to call on a single host: if
    no cluster environment is detected and no coordinator is given, this
    is a no-op.

    Must run BEFORE any jax computation or device query — this function
    deliberately queries nothing itself (even ``jax.process_count()``
    would initialize the backends and break the cluster attach).
    Failures are re-raised with a pointer rather than swallowed: a
    silently-degraded single-host run is the worst outcome on a pod.
    """
    if coordinator_address is None and num_processes is None:
        # Auto-detectable environments: Cloud TPU pods / Slurm / GKE.
        detectable = any(v in os.environ for v in (
            "TPU_WORKER_ID", "CLOUD_TPU_TASK_ID", "SLURM_JOB_ID",
            "JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"))
        if not detectable:
            return
        try:
            jax.distributed.initialize()
        except RuntimeError as e:
            if "already initialized" in str(e).lower():
                return
            raise RuntimeError(
                "jax.distributed.initialize() failed on a detectable "
                "cluster environment — call demcmc_tpu.parallel."
                "distributed.initialize() before ANY jax computation "
                f"or device query. Original error: {e}") from e
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)


def global_chain_mesh():
    """1-D ``chains`` mesh over every device of every host (the sharding
    target for pod-scale runs)."""
    return chain_mesh(devices=jax.devices())


def is_coordinator() -> bool:
    """True on the process that should print/serialize results."""
    return jax.process_index() == 0
