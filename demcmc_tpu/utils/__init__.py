from . import checkpoint, dists
from .pytree import as_union, ravel_params

__all__ = ["checkpoint", "dists", "as_union", "ravel_params"]
