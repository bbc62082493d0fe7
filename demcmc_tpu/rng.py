"""Counter-based RNG helpers.

The reference (DifferentialEvolutionMCMC.jl) uses Julia's sequential global
RNG, re-seeded per thread-task (``src/main.jl:169-172,193-197``).  That model
does not survive vectorization or device sharding, so this framework uses
JAX's counter-based keys exclusively.  Per iteration, the sampler derives
one step key ``step_key(base, it)`` from which a single :class:`Pool`
(fused random-bit buffer) supplies every tensor-shaped draw; scalar/custom
draws ride tagged subkeys.  Same key => bit-identical chains, independent
of device count for a fixed layout (tested in tests/test_sharding.py).

Namespace separation: iteration keys and purpose tags live under DISTINCT
first-level folds (``ITER_NS`` vs ``INIT_NS``/tag constants) — a flat
``fold_in(base, x)`` namespace would alias iteration x with tag x (e.g.
iteration 17 with the init-population key).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# First-level namespace folds (values chosen far above any tag constant).
ITER_NS = 0x51e9    # per-iteration step keys
INIT_NS = 0x1217    # population initialization

# Purpose tags used WITHIN an iteration's step key.
ACCEPT = 16         # custom update_particle slots
INIT_THETA = 17     # init_state population draw (under INIT_NS)
BLOCK = 18          # per-block subkeys in blocked updates
CUSTOM = 19         # custom strategy-slot key root
NEXT_KEY = 20       # ProposalContext.next_key substream
EVAL = 21           # stochastic (pseudo-marginal) likelihood evaluations
MIGRATE = 22        # fused-path migration draws (exchange fired by `fire`)
MIG_EVENT_NS = 0x6d19   # per-event subkeys in coalesced boundary replays
#                         (NS-sized so it can never alias a KeyDraws
#                         draw index fold_in(base, i), i small)
RESAMPLE = 23       # fused-path resample (DE-MCz) partner-index draws
MEMBER = 24         # per-member subkeys in sequential (in-place) sweeps


def step_key(base_key: jax.Array, iteration) -> jax.Array:
    """The one key from which iteration ``iteration`` derives all draws."""
    return jax.random.fold_in(jax.random.fold_in(base_key, ITER_NS),
                              iteration)


def init_key(base_key: jax.Array) -> jax.Array:
    """Key for the initial population draw (its own namespace)."""
    return jax.random.fold_in(jax.random.fold_in(base_key, INIT_NS),
                              INIT_THETA)


def ensure_key(key) -> jax.Array:
    """Accept an int seed or a PRNG key and return a PRNG key."""
    if isinstance(key, int):
        return jax.random.PRNGKey(key)
    if key is None:
        return jax.random.PRNGKey(0)
    return key


def uniform(key, shape=(), lo=0.0, hi=1.0, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype=dtype, minval=lo, maxval=hi)


class Pool:
    """One fused random-bit generation per sampler step.

    Every ``jax.random.*`` call lowers to its own counter-hash kernel; a
    full DE-MCMC step makes ~12 of them, and at small population sizes the
    step cost is pure kernel-count overhead.  The pool draws ONE uint32
    buffer for the whole step (single fused threefry) and derives every
    uniform / gumbel / normal / randint from static slices of it.

    The buffer is laid out ``[n_rows, words_per_row]`` with rows = the
    GROUP axis, so under a ``chains`` device mesh the generation itself
    shards (a flat buffer would be computed replicated on every device —
    observed to destroy weak scaling).  Group-shaped draws (leading or
    second axis == n_rows) consume row-local columns; scalar/global draws
    delegate to a per-call key side-channel (they must be identical on
    every device and are O(1) per step).

    Consumption order is part of the program (static shapes ⇒ static
    offsets), so same key ⇒ bit-identical chains, as with per-call keys.

    Derivations:
    * uniform: top 24 bits × 2⁻²⁴ → [0, 1) with full f32 mantissa use.
      float64 requests consume TWO words per element for a full 53-bit
      mantissa (26 high + 27 low bits, each product exact in f64).
    * gumbel:  −log(−log(u)) with u clamped to (0, 1).
    * normal:  Box-Muller from two uniforms.
    * randint: ``bits % n`` — exact for power-of-two ranges.  With x64
      enabled, two words combine into a 64-bit draw (relative modulo
      bias ≤ n·2⁻⁶⁴); otherwise bias is ≤ 2⁻²⁴ relative (n is never
      > a few thousand here).
    """

    def __init__(self, key, n_rows: int, words_per_row: int):
        self.n_rows = int(n_rows)
        self.bits = jax.random.bits(
            jax.random.fold_in(key, 0),
            (self.n_rows, int(words_per_row)), jnp.uint32)
        self.scalars = KeyDraws(jax.random.fold_in(key, 1))
        self.offset = 0

    def _row_words(self, shape):
        """(cols, reshape_fn) for a group-shaped request, or None."""
        if shape and shape[0] == self.n_rows:
            k = int(np.prod(shape[1:])) if len(shape) > 1 else 1
            return k, lambda w: w.reshape(shape)
        if len(shape) >= 2 and shape[1] == self.n_rows:
            n, rest = shape[0], shape[2:]
            k = n * (int(np.prod(rest)) if rest else 1)
            return k, lambda w: jnp.moveaxis(
                w.reshape((self.n_rows, n) + tuple(rest)), 1, 0)
        return None

    def _take(self, shape):
        rw = self._row_words(tuple(shape))
        if rw is None:
            raise ValueError(
                f"pool draw shape {shape} has no row (group) axis of size "
                f"{self.n_rows}; use the scalar side-channel")
        k, reshape = rw
        if self.offset + k > self.bits.shape[1]:
            raise ValueError("random pool exhausted; size it to the step")
        w = jax.lax.dynamic_slice_in_dim(self.bits, self.offset, k, axis=1)
        self.offset += k
        return reshape(w)

    def uniform(self, shape=(), lo=0.0, hi=1.0, dtype=jnp.float32):
        if self._row_words(tuple(shape)) is None:
            return self.scalars.uniform(shape, lo, hi, dtype)
        if jnp.dtype(dtype) == jnp.float64:
            # 53-bit mantissa from two words: 26 high + 27 low bits.  Both
            # partial products and their sum are exact in f64 (the 53 bits
            # never overlap), giving the same granularity as
            # jax.random.uniform's f64 path.
            w_hi = self._take(shape)
            w_lo = self._take(shape)
            u = ((w_hi >> 6).astype(dtype) * np.asarray(2.0 ** -26, dtype)
                 + (w_lo >> 5).astype(dtype) * np.asarray(2.0 ** -53, dtype))
        else:
            scale = np.asarray(2.0 ** -24, dtype)
            u = (self._take(shape) >> 8).astype(dtype) * scale
        if lo == 0.0 and hi == 1.0:
            return u
        return lo + (hi - lo) * u

    def gumbel(self, shape=(), dtype=jnp.float32):
        if self._row_words(tuple(shape)) is None:
            return self.scalars.gumbel(shape, dtype)
        u = self.uniform(shape, dtype=dtype)
        tiny = jnp.finfo(dtype).tiny
        return -jnp.log(-jnp.log(jnp.maximum(u, tiny)))

    def normal(self, shape=(), dtype=jnp.float32):
        if self._row_words(tuple(shape)) is None:
            return self.scalars.normal(shape, dtype)
        u1 = jnp.maximum(self.uniform(shape, dtype=dtype),
                         jnp.finfo(dtype).tiny)
        u2 = self.uniform(shape, dtype=dtype)
        return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)

    def randint(self, shape, lo: int, hi: int):
        if self._row_words(tuple(shape)) is None:
            return self.scalars.randint(shape, lo, hi)
        if jax.config.jax_enable_x64:
            # 64-bit draw from two words: relative modulo bias <= n·2^-64,
            # far below f64 statistical resolution even at 10^10 draws.
            w_hi = self._take(shape).astype(jnp.uint64)
            w_lo = self._take(shape).astype(jnp.uint64)
            bits = (w_hi << 32) | w_lo
            span = jnp.uint64(hi - lo)
            return (bits % span).astype(jnp.int32) + lo
        span = jnp.uint32(hi - lo)
        return (self._take(shape) % span).astype(jnp.int32) + lo

    def randuint(self, shape, span):
        """Uniform uint32 draw in ``[0, span)`` with a possibly TRACED
        ``span`` (uint32, broadcastable to ``shape``) — the full-width
        variant :mod:`demcmc_tpu.ops.proposals` uses for resample's flat
        (row·chains) index space, which can exceed int31.  Modulo bias
        ≤ span·2⁻³² relative, same class as :meth:`randint`."""
        if self._row_words(tuple(shape)) is None:
            return self.scalars.randuint(shape, span)
        return self._take(shape) % span

    def bernoulli(self, shape, p):
        return self.uniform(shape) <= p


class CountingDraws:
    """Shape-faithful stand-in used to SIZE a :class:`Pool`: run the step
    body once under ``jax.eval_shape`` with this source and ``.words``
    tallies the per-row column consumption exactly as the real pool will
    (normal costs 2 words/element via Box-Muller; scalar/global draws go
    to the key side-channel and consume no pool words).
    """

    def __init__(self, n_rows: int):
        self.n_rows = int(n_rows)
        self.words = 0         # columns (words per row)

    def _row_cols(self, shape):
        shape = tuple(shape)
        if shape and shape[0] == self.n_rows:
            return int(np.prod(shape[1:])) if len(shape) > 1 else 1
        if len(shape) >= 2 and shape[1] == self.n_rows:
            rest = shape[2:]
            return shape[0] * (int(np.prod(rest)) if rest else 1)
        return 0               # scalar side-channel

    @staticmethod
    def _wpe(dtype) -> int:
        """Words per element — must mirror Pool.uniform's dtype rule."""
        return 2 if jnp.dtype(dtype) == jnp.float64 else 1

    def uniform(self, shape=(), lo=0.0, hi=1.0, dtype=jnp.float32):
        self.words += self._wpe(dtype) * self._row_cols(shape)
        return jnp.zeros(shape, dtype) + lo

    def gumbel(self, shape=(), dtype=jnp.float32):
        self.words += self._wpe(dtype) * self._row_cols(shape)
        return jnp.zeros(shape, dtype)

    def normal(self, shape=(), dtype=jnp.float32):
        self.words += 2 * self._wpe(dtype) * self._row_cols(shape)
        return jnp.zeros(shape, dtype)

    def randint(self, shape, lo, hi):
        # mirrors Pool.randint: two words per draw under x64
        self.words += (2 if jax.config.jax_enable_x64 else 1) \
            * self._row_cols(shape)
        return jnp.zeros(shape, jnp.int32) + lo

    def randuint(self, shape, span):
        self.words += self._row_cols(shape)
        return jnp.zeros(shape, jnp.uint32)

    def bernoulli(self, shape, p):
        self.words += self._row_cols(shape)
        return jnp.zeros(shape, bool)


class KeyDraws:
    """Same interface as :class:`Pool`, but one fold_in-derived key per
    draw — the fallback source used outside the fused step (init) and a
    reference implementation for tests.  Slower (one hash kernel per
    call); the sampler's hot path always uses :class:`Pool`.
    """

    def __init__(self, key):
        self.key = key
        self.i = 0

    def _next(self):
        self.i += 1
        return jax.random.fold_in(self.key, self.i)

    def uniform(self, shape=(), lo=0.0, hi=1.0, dtype=jnp.float32):
        return jax.random.uniform(self._next(), shape, dtype, lo, hi)

    def gumbel(self, shape=(), dtype=jnp.float32):
        return jax.random.gumbel(self._next(), shape, dtype)

    def normal(self, shape=(), dtype=jnp.float32):
        return jax.random.normal(self._next(), shape, dtype)

    def randint(self, shape, lo, hi):
        return jax.random.randint(self._next(), shape, lo, hi, jnp.int32)

    def randuint(self, shape, span):
        return jax.random.bits(self._next(), shape, jnp.uint32) % span

    def bernoulli(self, shape, p):
        return self.uniform(shape) <= p
