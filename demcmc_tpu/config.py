"""DE sampler configuration.

Frozen config mirroring every knob of the reference ``DE`` struct
(``/root/reference/src/structs.jl:57-131``) with the same names and
defaults (unicode spelled out: α→alpha, β→beta, ϵ→epsilon, σ→sigma,
κ→kappa, θsnooker→theta_snooker).  Mutable run state (iteration counter,
RNG key, history) lives in the scan carry (:class:`SamplerState`), not in
the config — the config hashes as a static jit argument.

Strategy slots (function-valued, swappable like the reference's
``generate_proposal`` / ``update_particle!`` / ``evaluate_fitness!`` /
``sample`` / ``blocking_on``, ``src/structs.jl:71-76``):

* ``generate_proposal``: batched proposal builder; built-ins
  :func:`demcmc_tpu.random_gamma` (default), ``fixed_gamma``,
  ``variable_gamma``; custom callables welcome (see ops/proposals.py for
  the ``ProposalContext`` signature).
* ``update_particle``: ``mh_update`` (default), ``maximize``, ``minimize``.
* ``evaluate_fitness``: ``compute_posterior`` (default) or ``evaluate_fun``.
* ``sample``: partner source — ``demcmc_tpu.sample_current`` (default:
  current particles) or ``demcmc_tpu.resample`` (DE-MCz: draw from the
  history of past states, ter Braak & Vrugt 2008).
* ``blocking_on``: callable of the sampler view returning True/False per
  iteration; ``blocks`` is a list of boolean masks matching the parameter
  structure.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, replace
from typing import Any, Callable

import numpy as np


def _default_blocking_on(de) -> bool:
    return False


def _always_blocking_on(de) -> bool:
    return True


@dataclass(frozen=True)
class DE:
    """Differential Evolution MCMC sampler configuration.

    Keyword parity with the reference constructor (``src/structs.jl:80-131``):
    ``n_groups=4, Np, burnin=1000, discard_burnin=True, alpha=.1, beta=.1,
    epsilon=.001, sigma=.05, kappa=1.0, theta_snooker=0.0, bounds,
    n_initial=0`` plus the five strategy slots.
    """

    Np: int = None
    n_groups: int = 4
    burnin: int = 1000
    discard_burnin: bool = True
    alpha: float = 0.1          # migration probability (α)
    beta: float = 0.1           # mutation probability (β)
    epsilon: float = 0.001      # crossover noise half-width (ϵ)
    sigma: float = 0.05         # mutation noise sd (σ)
    kappa: float = 1.0          # recombination keep-probability (κ)
    theta_snooker: float = 0.0  # snooker probability (θsnooker)
    bounds: Any = None
    n_initial: int = 0
    generate_proposal: Callable = None   # default set in __post_init__
    update_particle: Any = None          # 'mh' | 'maximize' | 'minimize' | callable
    evaluate_fitness: Any = None         # 'posterior' | 'fun' | callable
    sample: Any = None                   # 'sample' | 'resample' | callable
    blocking_on: Callable = _default_blocking_on
    blocks: Any = None
    dtype: Any = np.float32
    sweep: str = "auto"
    """Within-group update order.  ``'sequential'`` replays the
    reference's in-place sweep exactly (``src/crossover.jl:12-17``:
    particle i's proposal and partners see particles 1..i-1 already
    updated this iteration) — exactly invariant at ANY group size, at
    ~Np× the per-iteration cost.  ``'sync'`` updates the whole group
    from iteration-start state in one vectorized pass — the fast form
    for large groups, but a FULLY synchronous ensemble update is not
    exactly invariant (same reason emcee uses red-black half-ensemble
    moves): the stationary distribution narrows by O(1/Np²), measured
    on the conjugate binomial as -7%/-1.6%/-0.5% posterior-sd bias at
    Np=3/4/6 and not detectable at Np≥16 (PARITY.md).  ``'auto'``
    (default) picks 'sequential' when ``Np <= 4`` — the regime where the
    bias is material AND populations are small enough that Np× cost is
    negligible — and 'sync' otherwise."""
    # sample_prior accepted for ctor parity with the reference (which needs
    # it to allocate the history eltype); unused here — the model carries it.
    sample_prior: Callable = None

    def __post_init__(self):
        from .ops import proposals, accept  # local import, avoids cycle

        if self.Np is None:
            raise ValueError("Np (particles per group) is required")
        if self.n_groups == 1 and self.alpha > 0:
            warnings.warn("migration probability alpha > 0 but n_groups == 1."
                          " Changing alpha = 0.0")
            object.__setattr__(self, "alpha", 0.0)
        if self.generate_proposal is None:
            object.__setattr__(self, "generate_proposal", proposals.random_gamma)
        if self.update_particle is None:
            object.__setattr__(self, "update_particle", accept.mh_update)
        if self.evaluate_fitness is None:
            object.__setattr__(self, "evaluate_fitness", accept.compute_posterior)
        if self.sample in (None, "sample", "current"):
            object.__setattr__(self, "sample", proposals.sample_current)
        elif self.sample == "resample":
            object.__setattr__(self, "sample", proposals.resample)
        if isinstance(self.blocking_on, (bool, np.bool_)):
            # the reference slot is a callable of the sampler view
            # (structs.jl:71-76); accept plain bools as the constant
            # functions (module-level, so content-equal configs still
            # hash equal for the step cache)
            object.__setattr__(self, "blocking_on",
                               _always_blocking_on if self.blocking_on
                               else _default_blocking_on)
        if self.uses_resample and self.Np < 3:
            raise ValueError("Np must be >= 3 when sample=resample")
        if self.sweep not in ("auto", "sync", "sequential"):
            raise ValueError(f"sweep must be 'auto', 'sync' or "
                             f"'sequential'; got {self.sweep!r}")
        if self.blocks is not None:
            if len(self.blocks) == 0:
                raise ValueError("blocks must be a non-empty list of "
                                 "parameter masks (or None)")
            object.__setattr__(self, "blocks", tuple(
                tuple(np.asarray(b, dtype=object) for b in blk)
                if isinstance(blk, (list, tuple)) else blk
                for blk in self.blocks))

    # -- derived ----------------------------------------------------------
    @property
    def n_chains(self) -> int:
        return self.n_groups * self.Np

    @property
    def uses_resample(self) -> bool:
        from .ops import proposals
        return self.sample in ("resample", proposals.resample)

    @property
    def uses_snooker(self) -> bool:
        return self.theta_snooker > 0.0

    @property
    def sequential_sweep(self) -> bool:
        """Resolved ``sweep`` knob (see its docstring)."""
        if self.sweep == "sequential":
            return True
        if self.sweep == "sync":
            return False
        return self.Np <= 4

    @property
    def is_mh(self) -> bool:
        from .ops import accept
        return self.update_particle in ("mh", accept.mh_update)

    @property
    def is_maximize(self) -> bool:
        from .ops import accept
        return self.update_particle in ("maximize", accept.maximize)

    @property
    def is_minimize(self) -> bool:
        from .ops import accept
        return self.update_particle in ("minimize", accept.minimize)

    def replace(self, **kw) -> "DE":
        return replace(self, **kw)

    def _static_key(self):
        """A fully hashable/equatable content key — ndarray-valued fields
        (bounds, blocks) frozen to nested tuples.  Used for ``__hash__``,
        ``__eq__`` and the step-function cache: the dataclass-generated
        ``__eq__`` would compare ndarray-containing tuples directly and
        raise the ambiguous-truth-value ValueError on dict lookups."""
        def freeze(x):
            if isinstance(x, np.ndarray):
                return ("nd", x.shape, tuple(x.reshape(-1).tolist()))
            if isinstance(x, (list, tuple)):
                return tuple(freeze(e) for e in x)
            return x
        return (self.Np, self.n_groups, self.burnin, self.discard_burnin,
                self.alpha, self.beta, self.epsilon, self.sigma,
                self.kappa, self.theta_snooker, freeze(self.bounds),
                self.n_initial, self.generate_proposal,
                self.update_particle, self.evaluate_fitness, self.sample,
                self.blocking_on, freeze(self.blocks), str(self.dtype),
                self.sweep)

    def __hash__(self):
        return hash(self._static_key())

    def __eq__(self, other):
        if not isinstance(other, DE):
            return NotImplemented
        return self._static_key() == other._static_key()


class MCMCThreads:
    """API-compat marker (reference: AbstractMCMC's ``MCMCThreads()``).

    The reference maps groups to CPU threads (``src/main.jl:62-71``); here
    every group is always part of one fused tensor program, and passing
    ``MCMCThreads()`` is simply accepted and ignored — device-level
    parallelism is configured with ``mesh=`` instead.
    """
