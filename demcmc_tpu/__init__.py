"""demcmc_tpu — TPU-native Differential Evolution MCMC.

A from-scratch JAX/XLA re-design of the capabilities of
``itsdfish/DifferentialEvolutionMCMC.jl`` (reference mounted at
``/root/reference``): ter Braak DE-MCMC with snooker updates, block-wise
crossover, mutation, migration between particle groups, DE-MCz history
resampling, and DE-based optimization — as one fused tensor program over
the whole chain population, scanned over iterations and sharded over
devices.

Export parity with the reference module
(``/root/reference/src/DifferentialEvolutionMCMC.jl:15-18``): ``DE``,
``DEModel``, ``sample``, ``MCMCThreads``, ``fixed_gamma``,
``variable_gamma``, ``random_gamma``, ``evaluate_fun`` (``evaluate_fun!``),
``compute_posterior`` (``compute_posterior!``), ``greedy_update``
(the reference's stale ``greedy_update!`` export — alias of ``maximize``),
``optimize``, ``get_optimal``, ``resample``, ``as_union``, plus ``DEMCMC``
as a module alias.  ``Particle`` is provided as a host-side compatibility
type (the sampler itself holds the population as one tensor; see
:class:`Chains` / :class:`Population` for its outputs).
"""

from .utils.compile_cache import enable_persistent_cache

# Persistent compilation cache ON by default (DEMCMC_CACHE_DIR=off to
# opt out; an already-configured jax_compilation_cache_dir is
# respected).  The fused sampler's Pallas kernels are multi-second
# Mosaic compiles — with the on-disk cache a fresh process replays
# them in milliseconds (measured 70.9 s -> 8.4 s on the flagship MVN
# cold wall; see utils/compile_cache.py).
enable_persistent_cache()

from . import diagnostics, models, ops, parallel, utils
from .chains import Chains
from .config import DE, MCMCThreads
from .diagnostics import (ess, ess_bulk, ess_tail,
                          rank_normalized_rhat, split_rhat)
from .model import DEModel, ParamSpec
from .ops.accept import (compute_posterior, evaluate_fun, greedy_update,
                         maximize, mh_update, minimize)
from .ops.proposals import (fixed_gamma, random_gamma, resample,
                            sample_current, snooker, variable_gamma)
from .optimize import (Population, get_optimal, optimize,
                       optimize_replicated)
from .particle import Particle
from .sampler import (SamplerState, init_state, make_spec, sample,
                      sample_replicated, sample_replicated_packed)
from .utils.checkpoint import load_state, save_state
from .utils.pytree import as_union

__version__ = "0.1.0"

# Module self-alias, like the reference's `const DEMCMC = DifferentialEvolutionMCMC`
import sys as _sys
DEMCMC = _sys.modules[__name__]

__all__ = [
    "DE", "DEModel", "MCMCThreads", "Chains", "ParamSpec", "Particle",
    "Population",
    "SamplerState", "sample", "sample_replicated",
    "sample_replicated_packed", "optimize",
    "optimize_replicated",
    "get_optimal", "init_state",
    "make_spec", "random_gamma", "fixed_gamma", "variable_gamma", "snooker",
    "resample", "sample_current", "mh_update", "maximize", "minimize",
    "greedy_update", "compute_posterior", "evaluate_fun", "as_union",
    "split_rhat", "rank_normalized_rhat", "ess", "ess_bulk", "ess_tail",
    "save_state", "load_state", "DEMCMC",
    "diagnostics", "models", "ops", "parallel", "utils",
]
