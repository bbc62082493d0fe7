from . import accept, migration, mutation, proposals
from .accept import (apply_accept, compute_posterior, evaluate_fun,
                     greedy_update, in_bounds, make_fitness, make_update,
                     maximize, mh_update, minimize)
from .migration import maybe_migrate, migrate
from .mutation import mutate
from .proposals import (ProposalContext, fixed_gamma, project, random_gamma,
                        recombination, resample, sample_current, select_base,
                        snooker, snooker_log_adj, variable_gamma)

__all__ = [
    "accept", "migration", "mutation", "proposals",
    "apply_accept", "compute_posterior", "evaluate_fun", "greedy_update",
    "in_bounds", "make_fitness", "make_update", "maximize", "mh_update",
    "minimize", "maybe_migrate", "migrate", "mutate", "ProposalContext",
    "fixed_gamma", "project", "random_gamma", "recombination", "resample",
    "sample_current", "select_base", "snooker", "snooker_log_adj",
    "variable_gamma",
]
