from . import checkpoint, dists, profiling
from .pytree import as_union, ravel_params

__all__ = ["checkpoint", "dists", "profiling", "as_union", "ravel_params"]
