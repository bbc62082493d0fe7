"""Small structural helpers.

The reference's ``as_union`` (``/root/reference/src/utilities.jl:182-187``)
exists only to make Julia's heterogeneous ``Vector{Any}`` type-stable;
Python lists are natively heterogeneous, so here it is an identity kept for
API parity (every mixed-shape reference example calls it).
"""

from __future__ import annotations

import numpy as np


def as_union(params):
    """API-parity no-op: return the parameter list unchanged."""
    return list(params) if isinstance(params, (list, tuple)) else params


def ravel_params(spec, params):
    """Flatten a parameter list to a flat [d] numpy vector using the spec's
    layout (host-side convenience mirroring ``ParamSpec.flatten``)."""
    segs = []
    for p, shape in zip(params, spec.shapes):
        a = np.asarray(p, dtype=np.float64)
        segs.append(a.reshape(-1) if shape else a.reshape(1))
    return np.concatenate(segs)
