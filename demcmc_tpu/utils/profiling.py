"""Tracing / profiling helpers.

The reference's only observability is a ProgressMeter bar (SURVEY.md §5);
here the sampler exposes JAX profiler integration so a run can be traced
in TensorBoard/Perfetto and its phases timed.

* :func:`trace` — context manager around ``jax.profiler.trace`` capturing
  a device trace to a directory.
* :func:`annotate` — named ``TraceAnnotation`` so sampler phases (e.g.
  chunks of the scan) show up in the trace timeline.
* :class:`StepTimer` — host-side wall-clock phase timing with per-phase
  totals; used by ``bench_scaling.py`` and handy in notebooks.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile: ``with profiling.trace('/tmp/prof'): ...``"""
    with jax.profiler.trace(str(log_dir)):
        yield


def annotate(name: str):
    """Named region for the profiler timeline (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulating wall-clock phase timer.

    >>> t = StepTimer()
    >>> with t.phase("sample"):
    ...     chains = sample(model, de, n_iter)
    >>> t.summary()
    {'sample': {'total_s': ..., 'calls': 1}}
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.calls = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.calls[name] += 1

    def summary(self) -> dict:
        return {k: {"total_s": self.totals[k], "calls": self.calls[k]}
                for k in self.totals}

    def __repr__(self):
        parts = [f"{k}: {v:.3f}s/{self.calls[k]}" for k, v in
                 self.totals.items()]
        return "StepTimer(" + ", ".join(parts) + ")"
