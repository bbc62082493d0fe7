"""Model protocol and parameter-space description.

Mirrors the capabilities of the reference's ``DEModel``
(``/root/reference/src/structs.jl:169-189``) and ``Particle``
(``src/structs.jl:202-223``) with a TPU-first representation:

* No per-particle objects.  The whole population lives in one flat tensor
  ``[..., d]`` where ``d`` is the total number of scalar parameters; a
  :class:`ParamSpec` records how to scatter a flat vector back into the
  user's (possibly heterogeneous: scalar / vector / matrix / integer)
  parameter list — the reference's ``Particle.Θ::Vector{T}``.
* Discrete parameters: the reference rounds ``Int × Float`` arithmetic back
  to ``Int`` (``src/utilities.jl:360-369``).  Here integer leaves get an
  ``is_int`` mask over flat dims; proposals are computed in float and
  rounded once at the end (same proposal support, documented delta).
* Bounds: per-named-parameter ``(lo, hi)`` tuples broadcast over all
  elements of that parameter, exactly like ``in_bounds``
  (``src/utilities.jl:70-78``).  Out-of-bounds is a hard reject (weight
  ``-inf``), never a transform.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ParamSpec:
    """Static description of the parameter space.

    Attributes
    ----------
    names: user-facing parameter names, one per (possibly array) parameter.
    shapes: shape of each named parameter (``()`` for scalars).
    int_mask_np: numpy bool ``[d]`` — True where the flat dim is an integer
        parameter (round-and-cast rule).
    lo/hi: numpy float ``[d]`` bounds per flat dim (±inf allowed).
    """

    names: Tuple[str, ...]
    shapes: Tuple[Tuple[int, ...], ...]
    is_int: Tuple[bool, ...]
    lo: np.ndarray
    hi: np.ndarray

    @property
    def sizes(self) -> Tuple[int, ...]:
        return tuple(int(np.prod(s)) if s else 1 for s in self.shapes)

    @property
    def dim(self) -> int:
        return int(sum(self.sizes))

    @property
    def offsets(self) -> Tuple[int, ...]:
        out, acc = [], 0
        for s in self.sizes:
            out.append(acc)
            acc += s
        return tuple(out)

    @property
    def int_mask(self) -> np.ndarray:
        m = np.zeros(self.dim, dtype=bool)
        for off, sz, isi in zip(self.offsets, self.sizes, self.is_int):
            if isi:
                m[off:off + sz] = True
        return m

    @property
    def has_int(self) -> bool:
        return any(self.is_int)

    # ---- flatten / unflatten -------------------------------------------
    def flatten(self, params: Sequence[Any]) -> jnp.ndarray:
        """Pack a list of parameter values (matching `names`) into flat [d]."""
        segs = []
        for p, shape in zip(params, self.shapes):
            a = jnp.asarray(p, dtype=jnp.result_type(float))
            segs.append(a.reshape(-1) if shape else a.reshape(1))
        return jnp.concatenate(segs) if len(segs) > 1 else segs[0]

    def unflatten(self, x: jnp.ndarray) -> list:
        """Split flat [d] into the user's parameter list.

        Integer parameters are rounded and cast to int32 so user likelihoods
        see true integers (reference keeps them ``Int64`` throughout).
        Scalars come back as 0-d arrays.
        """
        out = []
        for off, sz, shape, isi in zip(self.offsets, self.sizes, self.shapes,
                                       self.is_int):
            # static slice + reshape, not dynamic_slice/seg[0]: offsets are
            # Python ints, and the dynamic forms batch (vmap) into 1-wide
            # lax.gathers, which TPU serializes on the scalar core and the
            # Mosaic kernel lowering rejects outright
            a = jax.lax.slice_in_dim(x, off, off + sz).reshape(shape)
            if isi:
                a = jnp.round(a).astype(jnp.int32)
            out.append(a)
        return out

    def unflatten_cols(self, x2: jnp.ndarray) -> list:
        """Split ``[d, *cs]`` (parameters × chain axes) into chain-LAST
        parameter arrays: a scalar parameter becomes ``[*cs]``, a ``(k,)``
        parameter ``[k, *cs]``, etc.  This is the batched-density
        convention consumed by the fused TPU kernel (``ops/fused_step.py``)
        — ``cs`` is the kernel's ``(8, C/8)`` sublane×lane chain layout, so
        every density op runs on full vector tiles, where the per-cell
        ``vmap`` of :meth:`unflatten` would put chains on the sublane axis
        (measured ~10x slower in-kernel)."""
        cs = x2.shape[1:]
        out = []
        for off, sz, shape, isi in zip(self.offsets, self.sizes, self.shapes,
                                       self.is_int):
            a = jax.lax.slice_in_dim(x2, off, off + sz, axis=0)
            a = a.reshape(shape + cs) if shape else a.reshape(cs)
            if isi:
                a = jnp.round(a).astype(jnp.int32)
            out.append(a)
        return out

    def flat_names(self) -> list:
        """Flattened scalar names: ``"β0[3]"``, ``"m[1,2]"``.

        Indices are 1-based like the reference's ``get_names``
        (``src/utilities.jl:131-149``); multi-dim parameters enumerate in
        C (row-major) order here vs Julia's column-major — a display-order
        delta only.
        """
        out = []
        for name, shape in zip(self.names, self.shapes):
            if not shape:
                out.append(str(name))
            else:
                for idx in np.ndindex(*shape):
                    out.append(f"{name}[{','.join(str(i + 1) for i in idx)}]")
        return out

    @staticmethod
    def from_example(names, example: Sequence[Any], bounds) -> "ParamSpec":
        """Build a spec from one draw of ``sample_prior`` plus DE bounds."""
        names = tuple(str(n) for n in names)
        example = _aslist(example)
        if len(example) != len(names):
            raise ValueError(
                f"sample_prior returned {len(example)} parameters but "
                f"{len(names)} names were given")
        shapes, is_int = [], []
        for p in example:
            a = np.asarray(p)
            shapes.append(tuple(a.shape))
            is_int.append(np.issubdtype(a.dtype, np.integer))
        if bounds is None:
            bounds = tuple(((-np.inf, np.inf),) * len(names))
        if len(bounds) != len(names):
            raise ValueError(
                f"{len(bounds)} bounds for {len(names)} parameters")
        sizes = [int(np.prod(s)) if s else 1 for s in shapes]
        lo = np.concatenate([np.full(sz, float(b[0])) for sz, b in zip(sizes, bounds)])
        hi = np.concatenate([np.full(sz, float(b[1])) for sz, b in zip(sizes, bounds)])
        return ParamSpec(names=names, shapes=tuple(shapes),
                         is_int=tuple(is_int), lo=lo, hi=hi)


def _aslist(x):
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]


def _n_args(fn) -> Optional[int]:
    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return None
    n = 0
    for p in sig.parameters.values():
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD):
            n += 1
        elif p.kind == p.VAR_POSITIONAL:
            return None
    return n


@dataclass
class DEModel:
    """User model bundle — the reference's ``DEModel`` (``src/structs.jl:176-189``).

    Parameters
    ----------
    loglike : callable ``loglike(data, *params) -> scalar`` log likelihood
        (or objective function under :func:`demcmc_tpu.optimize`).  ``data``
        and any ``args/kwargs`` are closed over at construction, exactly like
        the reference ctor.  Must be JAX-traceable.
    prior_loglike : callable ``prior_loglike(*params) -> scalar``; optional
        for optimization.
    sample_prior : callable producing one draw of the parameter list.  Either
        ``sample_prior(key)`` (JAX, preferred) or a zero-arg numpy-RNG
        function like the reference's; the latter is called host-side at
        init only.
    names : tuple of parameter names.
    data : dataset passed as first argument to ``loglike``.
    args/kwargs : extra positional/keyword args for ``loglike``.
    """

    loglike: Callable = None
    prior_loglike: Optional[Callable] = None
    sample_prior: Callable = None
    names: Tuple = ()
    data: Any = None
    args: Tuple = ()
    kwargs: dict = field(default_factory=dict)
    loglike_batched: Optional[Callable] = None
    """Optional chains-last batched form of ``loglike`` (a TPU perf
    feature, no reference analogue): ``loglike_batched(data, *params) ->
    [*cs]`` where each scalar parameter arrives as a ``[*cs]`` array and
    each ``(k,)`` parameter as ``[k, *cs]`` — ``cs`` is an OPAQUE chain
    shape (the fused kernel passes its ``(8, C/8)`` sublane×lane layout),
    so implementations must broadcast data against params with leading
    ``data.reshape(data.shape + (1,) * param.ndim)`` style expansion, not
    hard-coded ``[:, None]``.  When both batched densities are given,
    supported configurations run the whole-step fused Pallas kernel
    (``ops/fused_step.py``) with the density evaluated in lane-major
    layout; otherwise the per-cell ``loglike`` is vmapped by the XLA step.
    The two forms must compute the same math."""

    prior_loglike_batched: Optional[Callable] = None
    """Chains-last batched form of ``prior_loglike`` — see
    ``loglike_batched``."""

    data_batched: Any = None
    """Optional alternative ``data`` used ONLY by the batched densities
    (the fused kernel path).  ``sample_replicated_packed`` sets this to
    the per-chain-expanded data (leaves with trailing ``[8, C/8]`` chain
    axes) while ``data`` keeps one replication's plain shape, so the
    per-cell XLA ``loglike`` — which build_step still traces for dtype
    and draw-pool probing — sees broadcast-compatible operands."""

    chunk_obs: bool = False
    """Declares that every leaf of ``data`` carries a LEADING independent-
    observation axis and ``loglike_batched`` sums over it, so the fused
    TPU kernel may evaluate the density in observation chunks and add the
    partial sums (identical math up to fp reassociation).  Chunking keeps
    each in-kernel intermediate within the vector register file — without
    it a heavy density (e.g. LBA's [n_trials, chains] working set) streams
    every op through VMEM and the fused path falls back to XLA."""

    stochastic: bool = False
    """Pseudo-marginal mode: ``loglike`` additionally receives a fresh
    ``key=`` PRNG key on EVERY evaluation (unique per iteration, block and
    particle), for stochastic likelihoods that re-simulate with fresh noise
    — the reference's ABC examples re-draw from the global RNG each call
    (``Examples/Binomial_ABC.jl:16-23``).  The accepted particle's weight
    is never re-evaluated (it is carried in the sampler state), which is
    exactly the pseudo-marginal construction."""

    noise_shape: Optional[Tuple] = None
    """Fused-path noise panel for ``stochastic`` models: when set,
    ``loglike_batched`` must accept a keyword ``noise=`` holding FRESH
    uniform(0,1) draws of shape ``noise_shape + cs`` (chains-last like
    the parameters), and the whole-step Pallas kernel supplies them from
    the hardware PRNG on every evaluation — the in-kernel equivalent of
    the per-evaluation ``key``.  The simulation must be re-expressed as
    a deterministic transform of these uniforms (e.g. inverse-CDF
    sampling); any unbiasedness-preserving reformulation keeps the
    pseudo-marginal construction valid.  Keep ``noise_shape`` modest and
    transform it in chunks: in-kernel intermediates beyond ~1 MiB make
    the build fall back to the XLA step."""

    def __post_init__(self):
        if self.loglike is None:
            raise ValueError("loglike is required")
        if self.sample_prior is None:
            raise ValueError("sample_prior is required")
        self.names = tuple(self.names)

    # -- prior sampling ---------------------------------------------------
    def prior_takes_key(self) -> bool:
        n = _n_args(self.sample_prior)
        return n is None or n >= 1

    def draw_prior(self, key) -> list:
        """One parameter-list draw (host or traced depending on style)."""
        if self.prior_takes_key():
            return _aslist(self.sample_prior(key))
        return _aslist(self.sample_prior())

    def draw_prior_flat(self, spec: ParamSpec, key) -> jnp.ndarray:
        return spec.flatten(self.draw_prior(key))

    def init_population(self, spec: ParamSpec, key, n: int,
                        dtype=jnp.float32) -> jnp.ndarray:
        """Stacked prior draws ``[n, d]`` (reference ``init_particle``,
        ``src/utilities.jl:13-22``)."""
        if self.prior_takes_key():
            keys = jax.random.split(key, n)
            x = jax.vmap(lambda k: self.draw_prior_flat(spec, k))(keys)
        else:
            x = jnp.stack([self.draw_prior_flat(spec, None) for _ in range(n)])
        x = x.astype(dtype)
        if spec.has_int:
            x = jnp.where(jnp.asarray(spec.int_mask), jnp.round(x), x)
        return x

    # -- densities --------------------------------------------------------
    def log_prior_flat(self, spec: ParamSpec, x: jnp.ndarray):
        if self.prior_loglike is None:
            raise ValueError("prior_loglike not given (optimization-only model)")
        return self.prior_loglike(*spec.unflatten(x))

    def log_like_flat(self, spec: ParamSpec, x: jnp.ndarray, key=None):
        params = spec.unflatten(x)
        if self.stochastic and key is not None:
            return self.loglike(self.data, *self.args, *params, key=key,
                                **self.kwargs)
        return self.loglike(self.data, *self.args, *params, **self.kwargs)
