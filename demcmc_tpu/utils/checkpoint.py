"""Checkpoint / resume for the sampler carry.

The reference has no checkpointing (SURVEY.md §5); here the entire run
state is one pytree (:class:`demcmc_tpu.sampler.SamplerState`), so a
snapshot is a plain ``.npz``.  ``sample(..., checkpoint_every=K,
checkpoint_path=...)`` saves periodically; ``load_state`` +
``sample(..., state=...)`` resumes.

Writes are **atomic** (tmp file + ``os.replace``) so a crash mid-write
never corrupts the previous snapshot, and optionally **asynchronous**
(``async_=True``): the device→host transfer happens on the caller's
thread (it must — the state may be donated to the next scan chunk), but
serialization + disk I/O move to a single background writer thread so
large-history checkpoints don't stall the sampling loop.
"""

from __future__ import annotations

import concurrent.futures
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

_writer = None            # lazily-created single-thread writer executor


def _norm_path(path) -> str:
    # np.savez appends '.npz' to extension-less paths; normalize both
    # sides so save/load round-trip with any path the user gives
    path = str(path)
    return path if path.endswith(".npz") else path + ".npz"


def _write_atomic(path: str, arrays: dict) -> None:
    d = os.path.dirname(path) or "."
    fd, tmp = tempfile.mkstemp(suffix=".npz.tmp", dir=d)
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def save_state(path: str, state, async_: bool = False):
    """Snapshot ``state`` to ``path`` (atomically).  With ``async_=True``
    the disk write runs on a background thread and a
    ``concurrent.futures.Future`` is returned — call ``.result()`` to
    join; exceptions surface there."""
    # named fields, not positional leaves: optional fields (history,
    # fire) must survive a round trip unambiguously — a leaf COUNT
    # cannot distinguish (history) from (fire)
    arrays = {name: np.asarray(val)
              for name, val in state._asdict().items() if val is not None}
    if not async_:
        _write_atomic(_norm_path(path), arrays)
        return None
    global _writer
    if _writer is None:
        _writer = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="demcmc-ckpt")
    return _writer.submit(_write_atomic, _norm_path(path), arrays)


def load_state(path: str):
    from ..sampler import SamplerState
    z = np.load(_norm_path(path))
    if "n_leaves" in z.files:            # legacy positional format
        n = int(z["n_leaves"])
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
        if n == 4:       # no history buffer
            theta, weight, key, iteration = leaves
            history = None
        else:
            theta, weight, key, iteration, history = leaves
        return SamplerState(theta=theta, weight=weight, key=key,
                            iteration=iteration, history=history)
    fields = {k: jnp.asarray(z[k]) for k in z.files}
    return SamplerState(**{f: fields.get(f)
                           for f in SamplerState._fields})
