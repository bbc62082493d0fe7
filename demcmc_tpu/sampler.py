"""Scan-based sampling driver.

Reference: ``/root/reference/src/main.jl`` (``sample``/``_sample``/``step!``/
``update!``/``block_update!``/``mutate_or_crossover!``/``sample_init``).

TPU-first architecture: the reference's Python/Julia-level triple loop
(iteration × group × particle, ``src/main.jl:33-38`` +
``src/crossover.jl:12-17``) becomes ONE jitted step over the whole
population tensor ``[G, Np, d]`` wrapped in ``lax.scan`` over iterations.
Groups shard over a ``chains`` mesh axis (``mesh=`` argument): crossover and
mutation are group-local, migration's cross-group shuffle and
``resample``-mode history gathers compile to XLA collectives under GSPMD.
The reference's ``MCMCThreads`` thread-per-group backend
(``src/main.jl:135-148``) has no analogue — device sharding replaces it.
"""

from __future__ import annotations

import collections
import math
import os
import time
import weakref
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import rng
from .chains import Chains
from .config import DE, MCMCThreads
from .model import DEModel, ParamSpec
from .ops import accept as accept_ops
from .ops import migration as migration_ops
from .ops import mutation as mutation_ops
from .ops import proposals as proposal_ops


class SamplerState(NamedTuple):
    """The scan carry — the entire resumable state of a run.

    The reference's equivalent is the mutable ``DE`` fields + particle
    objects + ``de.samples`` history (``src/structs.jl``); here it is a
    plain pytree: trivially checkpointable and shardable.
    """

    theta: jax.Array          # [G, Np, d] ([d, 8, C/8] on the fused path)
    weight: jax.Array         # [G, Np]    ([8, C/8] fused)
    key: jax.Array            # base PRNG key (counter-based derivation)
    iteration: jax.Array      # scalar int32, 1-based, reference `de.iter`
    history: Optional[jax.Array]  # [H, C, d] past states, or None
    fire: Optional[jax.Array] = None  # fused path only: next iteration's
    #   migration gate (drawn one step ahead inside the kernel)


class StepOutput(NamedTuple):
    theta: jax.Array          # [C, d] post-step population
    accept: jax.Array         # [C] bool
    lp: jax.Array             # [C] current weight after update


class _DEView:
    """What ``blocking_on`` sees: config knobs plus the (traced) iteration
    counter — mirroring the reference's practice of passing the DE object
    (``de.blocking_on(de)``, ``src/main.jl:162``)."""

    def __init__(self, de: DE, iteration):
        self._de = de
        self.iter = iteration

    def __getattr__(self, name):
        return getattr(self._de, name)


def flatten_block(spec: ParamSpec, block) -> np.ndarray:
    """Flatten one block mask (nested per-parameter bools/arrays, reference
    ``blocks`` kwarg, ``src/structs.jl:48``) to a flat [d] bool mask."""
    if isinstance(block, np.ndarray) and block.dtype != object:
        block = list(block)
    parts = []
    for elem, shape, size in zip(block, spec.shapes, spec.sizes):
        a = np.asarray(elem, dtype=bool)
        if a.shape == ():
            parts.append(np.full(size, bool(a)))
        else:
            if int(np.prod(a.shape)) != size:
                raise ValueError(
                    f"block element shape {a.shape} does not match "
                    f"parameter shape {shape}")
            parts.append(a.reshape(-1))
    return np.concatenate(parts)


def _spec_key(spec: ParamSpec):
    return (spec.names, spec.shapes, spec.is_int,
            spec.lo.tobytes(), spec.hi.tobytes())


def build_step(model: DEModel, de: DE, spec: ParamSpec,
               allow_fused: bool = True, mesh=None):
    """Build the fused one-iteration step function (pure, jittable).

    All randomness for one iteration comes from a single :class:`rng.Pool`
    (one fused threefry per step, sized once at build time by tracing the
    step body with a :class:`rng.CountingDraws` stub under ``eval_shape``)
    — per-call ``jax.random`` kernels were the dominant per-iteration cost
    at small populations.

    On TPU, configurations the whole-step Pallas kernel supports
    (``ops/fused_step.py``: default proposals incl. snooker, no resample/blocks,
    MH, f32) get the fused step instead — ONE kernel per iteration, with
    the state carried in the kernel's ``[d, C]`` layout (the returned
    function has ``.fused = True`` plus ``to_fused``/``from_fused``
    converters).  ``allow_fused=False`` forces the XLA step.

    Under a device mesh the kernel composes with ``jax.shard_map``:
    every device runs the kernel over its own shard of the lane-packed
    population (groups are iteration-independent, SURVEY §3.2) with a
    per-shard folded PRNG key, and migration — the only cross-group
    communication — stays on the XLA/GSPMD path at global level.
    Configurations :func:`~demcmc_tpu.ops.fused_step.sharded_supported`
    rejects fall back to the GSPMD-partitioned XLA step.

    The built step is cached on the model per (de, spec, mesh): repeated
    ``sample``/``optimize`` calls with the same configuration reuse one
    function object, so the driver's jitted scans hit the compile cache
    instead of recompiling every call.
    """
    from .ops import fused_step as fused_mod
    if mesh is not None:
        allow_fused = allow_fused and fused_mod.sharded_supported(
            model, de, spec, mesh)
        if mesh.devices.size == 1:
            mesh = None                  # single-device mesh: plain path
    else:
        allow_fused = allow_fused and fused_mod.supported(model, de, spec)
    try:
        cache = model.__dict__.setdefault("_step_cache", {})
        # the frozen content key, NOT the DE object: distinct-but-equal DE
        # configs with ndarray blocks would hash equal but make the dict's
        # __eq__ fallback raise the ambiguous-array ValueError
        # super_k()/DEMCMC_MIG_GATE/DEMCMC_MIG_REPLAY/DEMCMC_MIG_IK_MAX_G
        # in the key: a build-time env-knob change between runs must
        # rebuild the step (get_superstep memoizes its kernel; the
        # migration gate style, replay mode and in-kernel size cutoff
        # are baked into the wrapped step)
        import os as _os
        cache_key = (de._static_key(), _spec_key(spec), allow_fused, mesh,
                     fused_mod.super_k() if allow_fused else 0,
                     (_os.environ.get("DEMCMC_MIG_GATE", "cond"),
                      _os.environ.get("DEMCMC_MIG_REPLAY", "1"),
                      fused_mod.mig_ik_max_g())
                     if allow_fused else "")
        hash(cache_key)
    except TypeError:
        cache, cache_key = None, None
    if cache is not None and cache_key in cache:
        return cache[cache_key]
    step = None
    if allow_fused:
        try:
            step = _build_fused_wrapped(model, de, spec, mesh=mesh)
        except Exception as e:                   # unsupported-op fallback
            import warnings
            warnings.warn(f"fused step unavailable ({e}); using XLA step")
    if step is None:
        step = _build_step_uncached(model, de, spec)
    if cache is not None:
        cache[cache_key] = step
    return step


def _raw_key(key):
    """PRNG key as its raw uint32 words (old- or new-style keys).

    Fused-path contract: 2-word (threefry2x32) keys only — the kernel
    seeds the hardware PRNG from exactly two words and the sharded
    wrapper re-wraps with ``impl='threefry2x32'``.  ``supported()``
    already rejects a non-threefry *default* impl; this guard catches an
    explicitly-passed foreign key (e.g. a 4-word rbg key), which would
    otherwise be silently truncated."""
    raw = (key.astype(jnp.uint32) if jnp.issubdtype(key.dtype, jnp.integer)
           else jax.random.key_data(key).astype(jnp.uint32))
    if raw.shape[-1] != 2:
        raise ValueError(
            f"the fused kernel requires a 2-word threefry2x32 key; got "
            f"key data shape {raw.shape} (pass allow_fused=False or use "
            "the default PRNG impl)")
    return raw


def _shard_wrap(kern, mesh):
    """Wrap a per-device fused kernel as a global-array call via
    ``jax.shard_map``: the lane axis of the packed ``[d, 8, C/8]``
    population shards over the mesh (each shard is itself a valid fused
    layout over ``G / D`` groups — groups never interact inside an
    iteration, SURVEY §3.2), and each device folds its mesh index into
    the PRNG key so shards draw decorrelated streams.  The exported
    look-ahead migration gate is taken from shard 0 (one valid
    Bernoulli(α) draw — or, for K-window launches, the window's gate
    COUNT for the coalesced boundary replay; the per-shard exports are
    equally valid but must not disagree).  Note the cross-layout RNG
    contract: a sharded run is
    statistically — not bitwise — equal to the single-device run (same
    contract as the XLA path across shardings, docs/scaling.md)."""
    from jax.sharding import PartitionSpec as P
    axis = mesh.axis_names[0]

    def local_fn(theta3, weight3, key2, it, fire):
        idx = jax.lax.axis_index(axis)
        key = jax.random.wrap_key_data(key2, impl="threefry2x32")
        key2_l = jax.random.key_data(
            jax.random.fold_in(key, idx)).astype(jnp.uint32)
        return kern(theta3, weight3, key2_l, it, fire)

    sm = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, None, axis), P(None, axis), P(), P(), P()),
        out_specs=(P(None, None, None, axis), P(None, None, axis),
                   P(None, None, axis), P(axis, None)),
        check_vma=False)

    def wrapped(theta3, weight3, key2, it, fire):
        t, wout, acc, f = sm(theta3, weight3, key2,
                             jnp.asarray(it), fire)
        return t, wout, acc, f[:1]
    return wrapped


def _build_fused_wrapped(model: DEModel, de: DE, spec: ParamSpec,
                         mesh=None, phase="all"):
    """Wrap the whole-step Pallas kernel as a scan-compatible step over a
    fused-layout :class:`SamplerState` (theta ``[d, 8, C/8]``, weight
    ``[8, C/8]`` — the kernel's sublane×lane chain packing, chain
    c ↔ (c // (C/8), c mod (C/8)) — and ``fire`` = next iteration's
    migration gate; ``fire is not None`` marks a fused-layout state).

    Migration and the γ₂-burnin phase switch run IN-kernel (see
    ``ops/fused_step.py``: [G, G] one-hot routing for G ≤ ``MIG_MAX_G``,
    the O(G log² G) bitonic rank network above it), so the step has no
    data-dependent ``lax.cond`` at all — and a K-iteration "superstep"
    kernel (``step.get_superstep()``) amortizes the per-launch overhead
    across ``SUPER_K`` iterations, bitwise identical to K single steps.
    Migration falls back to the XLA path (2-way cond or branchless
    masked exchange) only under a mesh or when G//8 is not a power of
    two.  Under a mesh the superstep/device-thin still compose via
    COALESCING: K-window launches accumulate the in-window gate count
    in-kernel and the events replay at window boundaries (law-exact —
    PARITY.md delta 6) — IN-kernel when the migration group space is
    shard-local (``mig_replay``, round 5), else by ``mig_multi`` in
    XLA.  ``SHARDED_GATE.json`` (v5e): sharded α=0.1 superstep 0.97x
    the unsharded in-kernel step; α=0.001 at 0.98x the α=0 floor."""
    from .ops import fused_step as fused_mod
    if de.uses_resample:
        if mesh is not None:
            raise ValueError("fused resample path is single-device")
        return _build_fused_resample_wrapped(model, de, spec)
    G, Np, d = de.n_groups, de.Np, spec.dim
    C = G * Np
    R = fused_mod._R
    Cf = C // R
    alpha = float(de.alpha) if G > 1 else 0.0
    # migration stays on the XLA path only when under a mesh — it is the
    # only cross-group op and must run at GLOBAL level (migration.jl:31-35
    # draws from ALL groups; a per-shard in-kernel version would only
    # exchange within each device's groups).  Single-device, two in-kernel
    # variants cover everything: the bitonic rank network (O(G log² G),
    # measured fastest at every size; select-only value movement so ±inf
    # weights transport exactly — min-mode +inf scores included)
    # whenever G//8 is a power of two, else the [G, G] one-hot matrices
    # for small-G MH/max layouts.  In-kernel migration is what lets
    # α > 0 runs keep the K-superstep (the gate is data-dependent
    # between iterations).
    mig_ik_ok = (mesh is None and 0.0 < alpha and 2 <= G
                 and (fused_mod.mig_sorted_ok(G, Np)
                      or (G <= fused_mod.MIG_MAX_G
                          and not de.is_minimize)))
    # in-kernel COALESCED boundary replay for mesh runs whose migration
    # group space is SHARD-LOCAL (round 5, verdict r4 item 3): a
    # 1-device mesh — the gate-bench structure — replays the window's
    # events inside the kernel at k == 0 (build_fused_step mig_replay),
    # eliminating the XLA exchange's ~20 µs/event between launches.
    # Multi-device group spaces keep the XLA mig_multi replay: the
    # global cycle's victim values cross shards (future: pltpu remote
    # DMA).  DEMCMC_MIG_REPLAY=0 forces the XLA replay for A/B.
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    G_loc = G // n_dev
    mig_replay = (mesh is not None and 0.0 < alpha and 2 <= G_loc
                  and n_dev == 1
                  and os.environ.get("DEMCMC_MIG_REPLAY", "1") != "0"
                  and os.environ.get("DEMCMC_MIG_GATE",
                                     "cond") != "branchless"
                  and G_loc <= fused_mod.mig_ik_max_g()
                  and (fused_mod.mig_sorted_ok(G_loc, Np)
                       or (G_loc <= fused_mod.MIG_MAX_G
                           and not de.is_minimize)))
    # past MIG_IK_MAX_G the in-kernel machinery costs ~27 µs/step even
    # unfired (kernel-size cliff, see the constant's comment); those
    # layouts keep the superstep through the single-device COALESCED
    # XLA exchange below instead — unless α is high enough that the
    # in-kernel form's cheaper fired events win the penalty back
    # (measured crossover MIG_IK_MIN_ALPHA; α is static)
    mig_ik = mig_ik_ok and (G <= fused_mod.mig_ik_max_g()
                            or alpha >= fused_mod.MIG_IK_MIN_ALPHA)

    def _mk(K, mig_in_kernel, emit="all"):
        if mesh is None:
            return fused_mod.build_fused_step(
                model, de, spec, K=K, mig_in_kernel=mig_in_kernel,
                emit=emit, phase=phase)
        kern = fused_mod.build_fused_step(
            model, fused_mod.local_de(de, int(mesh.devices.size)), spec,
            K=K, mig_in_kernel=False, emit=emit, phase=phase,
            mig_replay=mig_replay)
        wrapped = _shard_wrap(kern, mesh)
        # build_fused_step only lowers the BARE local kernel; errors
        # specific to partitioning the manual Pallas region under
        # shard_map would otherwise surface inside run_scan's first jit
        # with no XLA fallback.  Check the composition here so
        # build_step's try/except can fall back: a full compile() on a
        # real backend (partitioning runs at compile time; one-time cost,
        # cached on the model), trace-only eval_shape on the CPU harness
        # (interpret-mode compiles take ~1 min and the tests execute the
        # real thing anyway).
        shapes = (jax.ShapeDtypeStruct((d, R, Cf), jnp.float32),
                  jax.ShapeDtypeStruct((R, Cf), jnp.float32),
                  jax.ShapeDtypeStruct((2,), jnp.uint32),
                  jax.ShapeDtypeStruct((), jnp.int32),
                  jax.ShapeDtypeStruct((1, 1), jnp.int32))
        if jax.default_backend() == "tpu":
            jax.jit(wrapped).lower(*shapes).compile()
        else:
            jax.eval_shape(wrapped, *shapes)
        return wrapped

    try:
        k1 = _mk(1, mig_ik)
    except Exception:
        if not mig_ik:
            raise
        # in-kernel migration failed to lower; retry with migration on
        # the XLA path (density build errors re-raise below and the
        # caller falls back to the XLA step)
        mig_ik = False
        k1 = _mk(1, False)

    def _base_mig_key(state):
        return jax.random.fold_in(
            rng.step_key(state.key, state.iteration), rng.MIGRATE)

    def _exchange(kd_key, t3, w3, fire=True):
        tg = jnp.transpose(t3.reshape(d, G, Np), (1, 2, 0))
        wg = w3.reshape(G, Np)
        tgn, wgn = migration_ops.migrate(rng.KeyDraws(kd_key), tg, wg, G,
                                         fire=fire)
        return (jnp.transpose(tgn, (2, 0, 1)).reshape(d, R, Cf),
                wgn.reshape(R, Cf))

    def mig(state, t3, w3, fire=True):
        # mesh path: XLA migration BEFORE the update, like the
        # reference (src/main.jl:85); the Bernoulli(α) gate was drawn by
        # the PREVIOUS kernel invocation and carried in `fire`
        return _exchange(_base_mig_key(state), t3, w3, fire=fire)

    def mig_multi(state, t3, w3):
        """Boundary exchange for K-window launches under a mesh
        (superstep / device-thin): ``state.fire`` carries the COUNT of
        look-ahead Bernoulli(α) gates that fired during the previous
        window (see ``build_fused_step``'s fire docstring), and every
        coalesced event replays here as an independent reference-law
        exchange — the per-window event count stays exactly
        Binomial(K, α), only the events' position within the window
        moves to its boundary.  Validity: migration is a permutation of
        the chain ensemble (``src/migration.jl:84-91``), and any
        state-independently-scheduled composition of the kernels
        preserves the stationary law, so deferring events to window
        boundaries is exact for the posterior (docs/scaling.md).  Event
        0 uses the single-step key so K=1 launches stay bitwise
        identical to the per-iteration cond path."""
        count = state.fire.reshape(()).astype(jnp.int32)

        # nested conds, ALL key derivation inside the fired branch: the
        # dominant count = 0 case pays only the cond sync — hoisting the
        # scalar threefry chain (_base_mig_key) out of the branch
        # measured ~3 µs/launch on a v5e, and a lax.switch was as bad —
        # and the fori_loop's while bookkeeping only runs on multi-event
        # windows.  count 0/1 is bitwise identical to the per-iteration
        # cond path (event 0 = the single-step key).
        def fired_branch(a):
            base = _base_mig_key(state)
            first = _exchange(base, *a)
            # event j >= 1 keys live under a dedicated namespace fold:
            # a bare fold_in(base, j) would alias KeyDraws(base)'s own
            # j-th draw key (rng.py's namespace rule), making event 0's
            # observed draws encode later events' seeds
            ev_base = jax.random.fold_in(base, rng.MIG_EVENT_NS)
            return jax.lax.cond(
                count > 1,
                lambda b: jax.lax.fori_loop(
                    1, count,
                    lambda j, carry: _exchange(
                        jax.random.fold_in(ev_base, j), *carry),
                    b),
                lambda b: b, first)

        return jax.lax.cond(count > 0, fired_branch, lambda a: a,
                            (t3, w3))

    # XLA-migration gate style (mesh path — single-device always migrates
    # in-kernel since round 4): "cond" skips the exchange work on unfired
    # iterations via a lax.cond around ONLY the migration (the shard_map
    # kernel call stays outside the cond — GSPMD partitioning of manual
    # regions under cond is fragile, but partitioning the plain XLA
    # exchange under cond is fine), "branchless" always computes the
    # exchange and mask-applies it.  fire=False is an exact identity, so
    # both styles are bitwise identical; cond saves the ~90% of
    # iterations where migration doesn't fire from paying the
    # argsort+gather exchange (VERDICT r3 item 4).
    import os as _os
    branchless = _os.environ.get("DEMCMC_MIG_GATE", "cond") == "branchless"
    # coalesced mesh mode: K-window launches accumulate the in-window
    # migration gate count in-kernel and mig_multi replays the events at
    # window boundaries — this is what lets sharded α > 0 runs keep the
    # K-superstep and device-thin (VERDICT r3 item 4); the branchless
    # experiment keeps per-iteration exchanges and forfeits both
    # single-device runs coalesce too when the layout is in-kernel-
    # eligible but sits above the MIG_IK_MAX_G kernel-size cliff
    # (smaller/odd layouts keep the bitwise per-iteration cond path)
    coalesce = (alpha > 0.0 and not mig_ik and not mig_replay
                and not branchless and (mesh is not None or mig_ik_ok))

    def _call(kern, state):
        it = state.iteration
        key2 = _raw_key(state.key)
        if mig_ik or mig_replay or alpha == 0.0:
            return kern(state.theta, state.weight, key2, it, state.fire)
        if coalesce:
            t3, w3 = mig_multi(state, state.theta, state.weight)
        elif branchless:
            fired = state.fire.reshape(()) > 0
            t3, w3 = mig(state, state.theta, state.weight, fire=fired)
        else:
            fired = state.fire.reshape(()) > 0
            t3, w3 = jax.lax.cond(fired, lambda a: mig(state, *a),
                                  lambda a: a,
                                  (state.theta, state.weight))
        return kern(t3, w3, key2, it, state.fire)

    def step(state: SamplerState, _=None):
        t, wout, acc, fire = _call(k1, state)
        new_t, new_w = t[0], wout[0]
        new_state = SamplerState(theta=new_t, weight=new_w, key=state.key,
                                 iteration=state.iteration + 1,
                                 history=None, fire=fire)
        # outputs stay in kernel layout ([d,R,Cf] / [R,Cf]) through the
        # scan — relayout to flat chains happens ONCE post-scan in
        # ``sample`` rather than per iteration
        out = StepOutput(theta=new_t, accept=acc[0], lp=new_w)
        return new_state, out

    _super = []

    def get_superstep():
        """The K-iteration superstep (or None if unavailable): scan ys
        carry a leading [SUPER_K] axis; bitwise identical to SUPER_K
        single steps (same per-iteration hardware-PRNG seeding) — except
        in coalesced mesh mode, where in-window migration events replay
        at window boundaries (``mig_multi``; statistically exact, not
        bitwise vs singles)."""
        if not (mig_ik or mig_replay or alpha == 0.0 or coalesce):
            return None                  # data-dependent XLA migration
        if not _super:
            sk = fused_mod.super_k()
            if mig_replay:
                # the NEXT launch replays up to K coalesced events;
                # its interpret-mode draw rows are budgeted at
                # _REPLAY_E_CAP (an env-overridden DEMCMC_SUPER_K has
                # no other clamp)
                sk = min(sk, fused_mod._REPLAY_E_CAP)
            try:
                kk = _mk(sk, mig_ik)
            except Exception:
                _super.append(None)
            else:
                def superstep(state: SamplerState, _=None):
                    t, wout, acc, fire = _call(kk, state)
                    new_state = SamplerState(
                        theta=t[-1], weight=wout[-1], key=state.key,
                        iteration=state.iteration + sk,
                        history=None, fire=fire)
                    return new_state, StepOutput(theta=t, accept=acc,
                                                 lp=wout)
                step.superstep_k = sk
                _super.append(superstep)
        return _super[0]

    step.superstep_k = fused_mod.super_k()
    step.get_superstep = get_superstep

    _thin_cache = {}

    def get_thin_step(thin):
        """Device-side thinning (or None if unavailable): ONE kernel
        launch per stored draw — ``thin`` in-kernel iterations with only
        the last one's trajectory written to HBM (``emit='last'``).
        Replaces run_scan's thin-inner-scan of single-step launches,
        which is launch-overhead bound on this path."""
        if not (mig_ik or mig_replay or alpha == 0.0 or coalesce):
            return None                  # data-dependent XLA migration
        if mig_replay and thin > fused_mod._REPLAY_E_CAP:
            return None   # next launch's replay rows are budgeted at CAP
        if thin not in _thin_cache:
            try:
                kt = _mk(thin, mig_ik, emit="last")
            except Exception:
                _thin_cache[thin] = None
            else:
                def thin_step(state: SamplerState, _=None):
                    t, wout, acc, fire = _call(kt, state)
                    new_state = SamplerState(
                        theta=t[0], weight=wout[0], key=state.key,
                        iteration=state.iteration + thin,
                        history=None, fire=fire)
                    return new_state, StepOutput(theta=t[0],
                                                 accept=acc[0],
                                                 lp=wout[0])
                _thin_cache[thin] = thin_step
        return _thin_cache[thin]

    step.get_thin_step = get_thin_step

    def to_fused(state: SamplerState) -> SamplerState:
        if state.fire is not None:
            return state
        # the kernel is f32 throughout; a model whose PER-CELL density
        # promotes under x64 (e.g. discrete_binomial's gammaln) leaves an
        # f64 initial weight in the state — cast it to the kernel dtype
        theta3 = (state.theta.reshape(C, d).T.reshape(d, R, Cf)
                  .astype(jnp.float32))
        w3 = state.weight.reshape(R, Cf).astype(jnp.float32)
        # first iteration's migration gate (subsequent gates come from the
        # kernel's look-ahead draw; carried through checkpoints for
        # bitwise resume)
        fire = jax.random.bernoulli(
            jax.random.fold_in(rng.step_key(state.key, state.iteration),
                               rng.MIGRATE + 1), alpha)
        out = state._replace(theta=theta3, weight=w3,
                             fire=fire.reshape(1, 1).astype(jnp.int32))
        if mesh is not None:
            # lane axis of the packed layout over the mesh (matches the
            # shard_map in_specs; one explicit relayout instead of a
            # GSPMD-inferred one on the first step)
            from jax.sharding import NamedSharding, PartitionSpec as P
            axis = mesh.axis_names[0]
            out = out._replace(
                theta=jax.device_put(
                    out.theta, NamedSharding(mesh, P(None, None, axis))),
                weight=jax.device_put(
                    out.weight, NamedSharding(mesh, P(None, axis))),
                fire=jax.device_put(out.fire, NamedSharding(mesh, P())))
        return out

    def from_fused(state: SamplerState) -> SamplerState:
        return _unpack_fused_state(state, G, Np, d)

    step.fused = True
    step.to_fused = to_fused
    step.from_fused = from_fused

    _post = []

    def get_post_burnin():
        """A parallel step object whose kernels statically DROP the
        predicated γ₂-burnin base-select region (phase='post') — valid,
        and BITWISE identical to this step, for iterations > burnin
        (the dead draws stay stream-aligned; ops/fused_step.py).
        ``run_scan`` switches to it at the burnin boundary; measured
        −0.29 µs/iter on the 4k-chain Gaussian.  None when the config
        has no burnin machinery to drop."""
        from .ops import proposals as _props
        if (phase != "all" or de.burnin <= 0
                or de.generate_proposal not in (_props.random_gamma,
                                                "random_gamma")):
            return None
        if not _post:
            try:
                _post.append(_build_fused_wrapped(model, de, spec,
                                                  mesh=mesh,
                                                  phase="post"))
            except Exception:
                _post.append(None)
        return _post[0]

    step.get_post_burnin = get_post_burnin
    return step


def _build_fused_resample_wrapped(model: DEModel, de: DE, spec: ParamSpec):
    """Fused step for resample (DE-MCz) configurations — the reference's
    flagship small-population mode (``test/multivariate_normal_tests.jl``:
    Np=3, n_groups=1, θsnooker=0.1, 50k iterations), where per-step
    launch overhead dominates and the fused kernel pays off most.

    Layout (see ``ops/fused_step.py`` resample constants): population
    padded to one ``[d, 8, Cf]`` block with the C real chains as the
    sublane-row-0 prefix (Cf = 128 for C ≤ 128; the WIDE layout
    Cf = ceil(C/128)·128 above it, stream-engine-only); history packed
    into lane-dense ``[S, d, Cf]`` slabs carried in ``state.history``
    and updated IN-kernel.  Kernels
    build lazily per (K, slab count, emit) — the slab count depends on
    the run's ``n_iter`` — and memoize on the step object.  Trajectory
    outputs are sliced to the real chains inside the jitted step (so the
    scan never stacks pad lanes)."""
    from .ops import fused_step as fused_mod
    G, Np, d = de.n_groups, de.Np, spec.dim
    C_real, B, Cf = fused_mod.resample_layout(de)
    R = fused_mod._R
    dtype = jnp.float32
    _kcache = {}

    def _stream_for(S: int) -> bool:
        """HBM-streaming history engine for this run (``S`` = packed
        slab count)?  'auto' (default) streams exactly when the packed
        history exceeds the in-VMEM engine's measured-safe budget — so
        arbitrarily long runs keep the fused kernel instead of dropping
        to the ~100x-slower XLA step (verdict r4 item 1).
        DEMCMC_RESAMPLE_STREAM=1/0 forces — except on the WIDE layout
        (C > 128), which only exists on the streaming engine."""
        if C_real > fused_mod.RESAMPLE_CF:
            return True
        env = os.environ.get("DEMCMC_RESAMPLE_STREAM", "auto")
        if env == "1":
            return True
        if env == "0":
            return False
        return (S * spec.dim * Cf * 4
                > fused_mod.RESAMPLE_HIST_VMEM)

    # multi-group resample keeps the reference migration IN-kernel
    # (round 5): real groups are the row-0 prefix of the nominal group
    # grid, pad groups mask out of the law (fused_step G_mig comment)
    alpha_r = float(de.alpha) if de.n_groups > 1 else 0.0
    mig_ik_res = alpha_r > 0.0

    def _get_kernel(K, S, emit="all", stream=False):
        kk = (K, S, emit, stream)
        if kk not in _kcache:
            # kernels build lazily, usually at trace time (the slab
            # count S is a run property, first seen inside run_scan's
            # jit); build_fused_step runs its host-side constant folding
            # under ensure_compile_time_eval so this is safe
            _kcache[kk] = fused_mod.build_fused_step(
                model, de, spec, K=K, mig_in_kernel=mig_ik_res,
                emit=emit, hist_S=S, hist_stream=stream)
        return _kcache[kk]

    # validate the program (density replay, layout) once with the
    # smallest slab count so build_step's try/except can fall back
    _get_kernel(1, fused_mod.RESAMPLE_S_GRAN,
                stream=_stream_for(fused_mod.RESAMPLE_S_GRAN))

    def _call(kern, state):
        return kern(state.theta, state.weight, _raw_key(state.key),
                    state.iteration, state.fire, state.history)

    def _slice_t(t):           # [..., d, 8, 128] -> [..., d, C_real]
        return t[..., 0, :C_real]

    def _slice_w(w):           # [..., 8, 128] -> [..., C_real]
        return w[..., 0, :C_real]

    def step(state: SamplerState, _=None):
        S = int(state.history.shape[0])
        kern = _get_kernel(1, S, stream=_stream_for(S))
        t, wout, acc, fire, hist = _call(kern, state)
        new_state = SamplerState(theta=t[0], weight=wout[0],
                                 key=state.key,
                                 iteration=state.iteration + 1,
                                 history=hist, fire=fire)
        return new_state, StepOutput(theta=_slice_t(t[0]),
                                     accept=_slice_w(acc[0]),
                                     lp=_slice_w(wout[0]))

    sup_k = fused_mod.resample_super_k(de)
    step.superstep_k = sup_k
    _super = []

    def get_superstep():
        if not _super:
            def superstep(state: SamplerState, _=None):
                S = int(state.history.shape[0])
                kern = _get_kernel(sup_k, S, stream=_stream_for(S))
                t, wout, acc, fire, hist = _call(kern, state)
                new_state = SamplerState(
                    theta=t[-1], weight=wout[-1], key=state.key,
                    iteration=state.iteration + sup_k,
                    history=hist, fire=fire)
                return new_state, StepOutput(theta=_slice_t(t),
                                             accept=_slice_w(acc),
                                             lp=_slice_w(wout))
            _super.append(superstep)
        return _super[0]

    step.get_superstep = get_superstep

    def get_thin_step(thin):
        # K = thin launches: the [thin · slots · lane_w] index array —
        # past the budget (physical SMEM for narrow kernels; the same
        # word count doubles as a conservative VMEM window bound for
        # wide ones), fall back to the thin-wrap of single steps
        # (code-review r4)
        if (thin * fused_mod.resample_idx_words(de)
                > fused_mod.RESAMPLE_SMEM_WORDS_MAX):
            return None

        def thin_step(state: SamplerState, _=None):
            S = int(state.history.shape[0])
            kern = _get_kernel(thin, S, emit="last",
                               stream=_stream_for(S))
            t, wout, acc, fire, hist = _call(kern, state)
            new_state = SamplerState(theta=t[0], weight=wout[0],
                                     key=state.key,
                                     iteration=state.iteration + thin,
                                     history=hist, fire=fire)
            return new_state, StepOutput(theta=_slice_t(t[0]),
                                         accept=_slice_w(acc[0]),
                                         lp=_slice_w(wout[0]))
        return thin_step

    step.get_thin_step = get_thin_step

    def get_thin_superstep(thin):
        """Device-thinned SUPERSTEP: one launch per m = sup_k//thin
        stored draws (m·thin in-kernel iterations, strided emit), so
        thinned runs keep amortizing the per-launch history DMA over
        ~sup_k iterations instead of paying it per stored draw.
        Returns ``(step_fn, m)`` with ys carrying a leading [m] axis, or
        None when a launch would hold < 2 draws.  No SMEM guard is
        needed here (unlike ``get_thin_step``, whose K = user ``thin``
        is unbounded): m·thin ≤ sup_k, and ``resample_super_k`` already
        bounds sup_k's index words by RESAMPLE_SMEM_IDX ≪ the physical
        RESAMPLE_SMEM_WORDS_MAX."""
        m = max(1, sup_k // thin)
        assert (m * thin * fused_mod.resample_idx_words(de)
                <= fused_mod.RESAMPLE_SMEM_WORDS_MAX)
        if m < 2:
            return None

        def thin_super(state: SamplerState, _=None):
            S = int(state.history.shape[0])
            kern = _get_kernel(m * thin, S, emit=("stride", thin),
                               stream=_stream_for(S))
            t, wout, acc, fire, hist = _call(kern, state)
            new_state = SamplerState(theta=t[-1], weight=wout[-1],
                                     key=state.key,
                                     iteration=state.iteration + m * thin,
                                     history=hist, fire=fire)
            return new_state, StepOutput(theta=_slice_t(t),
                                         accept=_slice_w(acc),
                                         lp=_slice_w(wout))
        return thin_super, m

    step.get_thin_superstep = get_thin_superstep

    def accepts_history(H: int) -> bool:
        """Can the fused path run an H-row history?  Always True since
        round 5: histories past the in-VMEM budget take the
        HBM-streaming engine (``_stream_for``) instead of falling back
        to the XLA step.  Only DEMCMC_RESAMPLE_STREAM=0 (force-vmem,
        for A/B testing) restores the old budget gate."""
        if (os.environ.get("DEMCMC_RESAMPLE_STREAM", "auto") == "0"
                and C_real <= fused_mod.RESAMPLE_CF):
            return fused_mod.resample_hist_fits(de, spec, H)
        return True

    step.accepts_history = accepts_history

    def pack_history(h):
        """[H, C, d] -> lane-dense slabs [S, d, 128]: row t, chain c ->
        slab t // B, lane (t % B)·C + c; slab count rounded up to the
        compile-reuse granule with zero rows (never read: row draws are
        bounded by iteration-1 < H)."""
        H = h.shape[0]
        S = fused_mod.resample_hist_slabs(de, H)
        hp = h.astype(dtype)
        if S * B > H:
            hp = jnp.concatenate(
                [hp, jnp.zeros((S * B - H, C_real, d), dtype)])
        x = hp.reshape(S, B, C_real, d).transpose(0, 3, 1, 2)
        x = x.reshape(S, d, B * C_real)
        if B * C_real < Cf:
            x = jnp.concatenate(
                [x, jnp.zeros((S, d, Cf - B * C_real), dtype)], axis=-1)
        return x

    def to_fused(state: SamplerState) -> SamplerState:
        if state.fire is not None:
            return state
        th = state.theta.reshape(C_real, d).astype(dtype).T     # [d, C]
        th_pad = jnp.zeros((d, R * Cf), dtype).at[:, :C_real].set(th)
        w_pad = jnp.full((R * Cf,), -jnp.inf, dtype).at[:C_real].set(
            state.weight.reshape(C_real).astype(dtype))
        if mig_ik_res:
            # first iteration's migration gate — the look-ahead
            # convention of the standard fused path (subsequent gates
            # come from the kernel's own draw)
            fire = jax.random.bernoulli(
                jax.random.fold_in(
                    rng.step_key(state.key, state.iteration),
                    rng.MIGRATE + 1), alpha_r).reshape(1, 1)
            fire = fire.astype(jnp.int32)
        else:
            fire = jnp.zeros((1, 1), jnp.int32)     # alpha == 0 gate
        return state._replace(
            theta=th_pad.reshape(d, R, Cf), weight=w_pad.reshape(R, Cf),
            history=pack_history(state.history),
            fire=fire)

    def from_fused(state: SamplerState) -> SamplerState:
        return _unpack_fused_state(state, G, Np, d)

    step.fused = True
    step.resample_fused = True
    step.to_fused = to_fused
    step.from_fused = from_fused
    return step


def _wrap_packed_migration(inner, spec, n_reps: int, G_rep: int,
                           Np: int, alpha: float, base_super_k: int):
    """Replication-LOCAL migration for :func:`sample_replicated_packed`
    at ``alpha > 0`` (verdict r4 item 5).

    The packed kernel runs with migration OFF (its in-kernel network
    spans all ``R·G`` groups — the wrong law: the reference migrates
    within one run's G groups, ``src/migration.jl:11-19``).  Migration
    is instead replayed here at XLA level between launches: the
    reference's gate (``rand() <= α`` per iteration per run,
    ``src/main.jl:85``) is STATE-INDEPENDENT, so each (iteration,
    replication) event is drawn from the iteration-keyed stream and the
    window's events replay coalesced at the launch boundary — exact for
    the posterior because migration is a state-independently-scheduled
    permutation of that replication's chains (the same argument as the
    coalesced mesh superstep, PARITY.md delta 6; at K=1 the replay IS
    the per-iteration reference law).  Iteration-keyed gates make the
    EVENT SCHEDULE identical for any mix of launch sizes; event keys
    and coalescing positions still depend on the window split, so
    different launch mixes are statistically (not bitwise)
    equivalent — the packed path's standing contract."""
    d = spec.dim

    def _replay(state, K: int):
        t3, w3 = state.theta, state.weight
        d_, Rr, Cf = t3.shape
        its = state.iteration + jnp.arange(K, dtype=jnp.int32)

        def gate(it):
            kk = jax.random.fold_in(rng.step_key(state.key, it),
                                    rng.MIGRATE)
            return jax.random.uniform(kk, (n_reps,)) <= alpha

        counts = jnp.sum(jax.vmap(gate)(its).astype(jnp.int32), axis=0)

        def fired(args):
            t3, w3 = args
            tg = t3.reshape(d_, n_reps, G_rep, Np).transpose(1, 2, 3, 0)
            wg = w3.reshape(n_reps, G_rep, Np)
            base = jax.random.fold_in(
                rng.step_key(state.key, state.iteration), rng.MIGRATE)
            ev_base = jax.random.fold_in(base, rng.MIG_EVENT_NS)
            rkeys = jax.vmap(
                lambda r: jax.random.fold_in(ev_base, r))(
                    jnp.arange(n_reps))

            def body(j, carry):
                tg, wg = carry

                def one(kr, t, w, fire):
                    return migration_ops.migrate(
                        rng.KeyDraws(jax.random.fold_in(kr, j)),
                        t, w, G_rep, fire=fire)

                return jax.vmap(one)(rkeys, tg, wg, j < counts)

            tg, wg = jax.lax.fori_loop(0, jnp.max(counts), body,
                                       (tg, wg))
            return (tg.transpose(3, 0, 1, 2).reshape(d_, Rr, Cf),
                    wg.reshape(Rr, Cf))

        t3, w3 = jax.lax.cond(jnp.max(counts) > 0, fired, lambda a: a,
                              (t3, w3))
        return state._replace(theta=t3, weight=w3)

    def step(state: SamplerState, _=None):
        return inner(_replay(state, 1))

    def get_superstep():
        inner_super = inner.get_superstep()
        if inner_super is None:
            return None
        sk = inner.superstep_k

        def superstep(state, _=None):
            return inner_super(_replay(state, sk))
        step.superstep_k = sk
        return superstep

    def get_thin_step(thin):
        inner_thin = inner.get_thin_step(thin)
        if inner_thin is None:
            return None

        def thin_step(state, _=None):
            return inner_thin(_replay(state, thin))
        return thin_step

    step.fused = True
    step.superstep_k = base_super_k
    step.get_superstep = get_superstep
    step.get_thin_step = get_thin_step
    step.to_fused = inner.to_fused
    step.from_fused = inner.from_fused
    return step


def _unpack_fused_state(state: SamplerState, G: int, Np: int,
                        d: int) -> SamplerState:
    """Fused kernel layout (theta ``[d, 8, C/8]``, weight ``[8, C/8]``,
    ``fire`` set) back to the XLA layout (``[G, Np, d]`` / ``[G, Np]``,
    ``fire=None``).  The single inverse of ``step.to_fused`` — used by the
    fused step's ``from_fused`` and by ``sample`` when a fused-layout
    checkpoint resumes on the XLA path.  Pad-aware: resample-mode states
    carry a PADDED population (real chains = row-major prefix of the
    [d, 8, 128] block) plus the lane-packed history slabs, both of which
    unpack here (pad values are garbage by construction and dropped)."""
    if state.fire is None:
        return state
    C = G * Np
    th2 = state.theta.reshape(d, -1)            # [d, C or padded]
    history = state.history
    if history is not None:
        # packed resample slabs [S, d, lanes] -> [S·B, C, d]
        S, _, lanes = history.shape
        B = lanes // C
        x = history[:, :, :B * C].reshape(S, d, B, C)
        history = x.transpose(0, 2, 3, 1).reshape(S * B, C, d)
    return state._replace(
        theta=th2[:, :C].T.reshape(G, Np, d),
        weight=state.weight.reshape(-1)[:C].reshape(G, Np),
        history=history, fire=None)


def _build_step_uncached(model: DEModel, de: DE, spec: ParamSpec):
    G, Np, d = de.n_groups, de.Np, spec.dim
    fitness = accept_ops.make_fitness(model, spec, de)
    update_fn = accept_ops.make_update(de)
    builtin_update = de.is_mh or de.is_maximize or de.is_minimize
    int_mask = jnp.asarray(spec.int_mask) if spec.has_int else None
    block_masks = None
    if de.blocks is not None:
        block_masks = [jnp.asarray(flatten_block(spec, b)) for b in de.blocks]

    seq_sweep = de.sequential_sweep

    def do_update(draws, theta, weight, iteration, history, key, block_mask,
                  member=None, mut_mask=None):
        """One mutate-or-crossover sweep over all groups (reference
        ``mutate_or_crossover!``, ``src/main.jl:199-207``).  With
        ``member`` set (sequential mode), proposals are computed for the
        whole population but the accept applies ONLY to group slot
        ``member`` — the reference's in-place sweep semantics
        (``crossover.jl:12-17``) one masked sub-sweep at a time;
        ``mut_mask`` then carries the per-group mutation gate drawn once
        per sweep (``main.jl:199-207`` draws it per GROUP, not per
        particle)."""
        if member is not None:
            key = jax.random.fold_in(key, rng.MEMBER * 1000 + member)
        k_custom = jax.random.fold_in(key, rng.CUSTOM)
        ctx = proposal_ops.ProposalContext(
            de=de, spec=spec, theta=theta, weight=weight,
            iteration=iteration, history=history, draws=draws,
            key=k_custom)

        # --- crossover branch (custom proposals draw via ctx.next_key()
        # so their keys never collide with other custom slots') ----------
        cross = de.generate_proposal(ctx, ctx.next_key())
        log_adj = jnp.zeros((G, Np), theta.dtype)
        if de.uses_snooker:
            sn_gate = draws.uniform((G, Np)) <= de.theta_snooker
            sn_prop, z, degen = proposal_ops.snooker(ctx)
            cross = jnp.where(sn_gate[..., None], sn_prop, cross)
        if block_mask is not None:
            # reset! semantics: non-block params revert to current values
            # (src/crossover.jl:336-352), applied before the snooker MH
            # correction like the reference (src/crossover.jl:84-87).
            cross = jnp.where(block_mask, cross, theta)
        if de.uses_snooker:
            adj = proposal_ops.snooker_log_adj(theta, cross, z, d, degen)
            log_adj = jnp.where(sn_gate, adj, 0.0)

        # --- mutation branch (per-group Bernoulli(β); mutation ignores
        # block masks, matching src/main.jl:199-207) ----------------------
        if de.beta > 0.0:
            if mut_mask is None:
                mut_mask = draws.uniform((G,)) <= de.beta
            mut_prop = mutation_ops.mutate(draws, theta, de.sigma)
            prop = jnp.where(mut_mask[:, None, None], mut_prop, cross)
            log_adj = jnp.where(mut_mask[:, None], 0.0, log_adj)
        else:
            prop = cross

        if int_mask is not None:
            prop = jnp.where(int_mask, jnp.round(prop), prop)

        # --- fitness + accept (THE hot kernel: user logpost vmapped over
        # the population; everything above fuses into it) -----------------
        if model.stochastic:
            # pseudo-marginal: fresh simulation noise per evaluation, keyed
            # per (iteration, block) — fitness splits per particle
            w_prop = fitness(prop, jax.random.fold_in(key, rng.EVAL))
        else:
            w_prop = fitness(prop)
        acc_src = draws if builtin_update else jax.random.fold_in(
            key, rng.ACCEPT)
        acc = update_fn(acc_src, weight, w_prop, log_adj)
        if member is not None:
            acc = acc & (jnp.arange(Np)[None, :] == member)
        theta, weight = accept_ops.apply_accept(theta, weight, prop,
                                                w_prop, acc)
        return theta, weight, acc

    def sweep_update(draws, theta, weight, it, history, key, bmask):
        """One reference 'sweep' (mutate_or_crossover! over every group):
        synchronous (one vectorized pass from iteration-start state) or,
        when ``de.sequential_sweep``, the reference-EXACT in-place order —
        Np masked sub-sweeps, each recomputing partners/base from the
        partially-updated population (``crossover.jl:12-17``).  The
        synchronous form is not exactly invariant at small Np (see the
        ``DE.sweep`` docstring); 'auto' resolves by group size."""
        if not seq_sweep:
            return do_update(draws, theta, weight, it, history, key, bmask)
        mut_mask = None
        if de.beta > 0.0:
            # per-GROUP gate, once per sweep like main.jl:199-207
            mut_mask = draws.uniform((G,)) <= de.beta
        acc_tot = jnp.zeros((G, Np), bool)
        for p0 in range(Np):
            theta, weight, acc = do_update(draws, theta, weight, it,
                                           history, key, bmask,
                                           member=p0, mut_mask=mut_mask)
            acc_tot = acc_tot | acc
        return theta, weight, acc_tot

    def step_core(draws, theta, weight, it, history, kit):
        # 1. migration with probability α (src/main.jl:85)
        theta, weight = migration_ops.maybe_migrate(
            draws, theta, weight, de.alpha, G)

        # 2. block_update! or mutate_or_crossover! (src/main.jl:161-207)
        def plain(theta, weight):
            return sweep_update(draws, theta, weight, it, history, kit,
                                None)

        def blocked(theta, weight):
            for bi, bmask in enumerate(block_masks):
                kb = jax.random.fold_in(kit, rng.BLOCK * 1000 + bi)
                theta, weight, acc = sweep_update(draws, theta, weight,
                                                  it, history, kb, bmask)
            # accept/lp from the last block — the reference's mh_update!
            # overwrites accept[iter]/lp[iter] once per block
            # (src/utilities.jl:201-210), so the final block wins there too.
            return theta, weight, acc

        if block_masks is None:
            return plain(theta, weight)
        flag = de.blocking_on(_DEView(de, it))
        if isinstance(flag, (bool, np.bool_)):
            return (blocked if flag else plain)(theta, weight)
        return jax.lax.cond(flag, blocked, plain, theta, weight)

    # ---- pool sizing: trace the core once with a counting stub ----------
    counter = rng.CountingDraws(G)
    dtype = jnp.dtype(de.dtype)
    hist_spec = (None if not de.uses_resample else
                 jax.ShapeDtypeStruct((1, de.n_chains, d), dtype))
    # the RUNTIME weight dtype is the fitness output's (a user loglike may
    # promote, e.g. f64 data under x64) — dtype-sensitive draws (mh_update,
    # select_base) consume 2 words/element for f64, so the probe must see
    # the same dtype or the pool under-sizes
    w_dtype = jax.eval_shape(
        lambda x: fitness(x, jax.random.PRNGKey(0)) if model.stochastic
        else fitness(x),
        jax.ShapeDtypeStruct((G, Np, d), dtype)).dtype

    def _probe(theta, weight, it, kit):
        return step_core(counter, theta, weight, it, hist_spec and
                         jnp.zeros(hist_spec.shape, hist_spec.dtype), kit)[0]

    jax.eval_shape(_probe,
                   jax.ShapeDtypeStruct((G, Np, d), dtype),
                   jax.ShapeDtypeStruct((G, Np), w_dtype),
                   jax.ShapeDtypeStruct((), jnp.int32),
                   jax.random.PRNGKey(0))
    pool_words = max(counter.words, 1)

    def step(state: SamplerState, _=None):
        it = state.iteration
        kit = rng.step_key(state.key, it)
        draws = rng.Pool(kit, G, pool_words)
        theta, weight, acc = step_core(draws, state.theta, state.weight,
                                       it, state.history, kit)

        # 3. store_samples! (src/utilities.jl:161-180): only the resample
        # strategy reads history; trajectory output rides the scan ys.
        history = state.history
        if history is not None:
            flat = theta.reshape(1, G * Np, d)
            zero = jnp.zeros((), it.dtype)
            history = jax.lax.dynamic_update_slice(
                history, flat.astype(history.dtype), (it - 1, zero, zero))

        new_state = SamplerState(theta=theta, weight=weight, key=state.key,
                                 iteration=it + 1, history=history)
        out = StepOutput(theta=theta.reshape(G * Np, d),
                         accept=acc.reshape(G * Np),
                         lp=weight.reshape(G * Np))
        return new_state, out

    return step


def init_state(model: DEModel, de: DE, spec: ParamSpec, key,
               start_iteration: int = None) -> SamplerState:
    """Population init (reference ``sample_init`` + ``init_particle``,
    ``src/main.jl:263-271``, ``src/utilities.jl:1-41``): prior draws for
    every chain; with ``n_initial > 0`` the history buffer is pre-seeded
    with ``n_initial`` rows of prior draws per chain and chains start from
    row 0, exactly like ``de.samples[1, :, id]``."""
    key = rng.ensure_key(key)
    G, Np, d, C = de.n_groups, de.Np, spec.dim, de.n_chains
    dtype = jnp.dtype(de.dtype)
    k_init = rng.init_key(key)

    history = None
    if de.uses_resample:
        if de.n_initial < 1:
            raise ValueError(
                "sample=resample requires n_initial >= 1 prior-seeded "
                "history rows (the reference recommends 10x the parameter "
                "count, src/structs.jl:37)")
        seeds = model.init_population(spec, k_init, de.n_initial * C, dtype)
        history = jnp.zeros((de.n_initial, C, d), dtype).at[:, :, :].set(
            seeds.reshape(de.n_initial, C, d))
        theta0 = history[0].reshape(G, Np, d)
    else:
        theta0 = model.init_population(spec, k_init, C, dtype).reshape(G, Np, d)

    fitness = accept_ops.make_fitness(model, spec, de)
    if model.stochastic:
        k_eval = jax.random.fold_in(
            jax.random.fold_in(key, rng.INIT_NS), rng.EVAL)
        weight0 = fitness(theta0, k_eval)
    else:
        weight0 = fitness(theta0)
    it0 = de.n_initial + 1 if start_iteration is None else start_iteration
    return SamplerState(theta=theta0, weight=weight0, key=key,
                        iteration=jnp.asarray(it0, jnp.int32),
                        history=history)


def _grow_history(state: SamplerState, n_iter: int) -> SamplerState:
    """Extend the history buffer to hold ``n_iter`` more rows."""
    if state.history is None:
        return state
    H, C, d = state.history.shape
    pad = jnp.zeros((n_iter, C, d), state.history.dtype)
    return state._replace(history=jnp.concatenate([state.history, pad]))


def _shard_state(state: SamplerState, mesh):
    """Place the carry on a device mesh: group axis of the population and
    chain axis of the history shard over the ``chains`` mesh axis; XLA
    (GSPMD) inserts the collectives for migration / resample gathers."""
    if mesh is None:
        return state
    from jax.sharding import NamedSharding, PartitionSpec as P
    axis = mesh.axis_names[0]
    if state.fire is not None:
        # fused kernel layout (resumed fused checkpoint): theta
        # [d, 8, C/8] / weight [8, C/8] shard on the LANE axis — the
        # shard_map composition's layout (``_shard_wrap``)
        shardings = SamplerState(
            theta=NamedSharding(mesh, P(None, None, axis)),
            weight=NamedSharding(mesh, P(None, axis)),
            key=NamedSharding(mesh, P()),
            iteration=NamedSharding(mesh, P()),
            history=None,
            fire=NamedSharding(mesh, P()),
        )
    else:
        shardings = SamplerState(
            theta=NamedSharding(mesh, P(axis, None, None)),
            weight=NamedSharding(mesh, P(axis, None)),
            key=NamedSharding(mesh, P()),
            iteration=NamedSharding(mesh, P()),
            history=(None if state.history is None
                     else NamedSharding(mesh, P(None, axis, None))),
        )
    return jax.tree.map(jax.device_put, state,
                        shardings, is_leaf=lambda x: x is None)


def _thin_wrap(step, thin):
    """Keep every ``thin``-th draw on the XLA step path: ``thin - 1``
    carry-only steps in an inner scan, then one emitting step.  Shared
    by :func:`run_scan` and :func:`sample_replicated`'s vmapped runs
    (the fused path replaces this with an emit='last' kernel launch)."""
    def thin_step(s, _=None):
        s, _ = jax.lax.scan(lambda c, x: (step(c)[0], None), s, None,
                            length=thin - 1)
        return step(s)
    return thin_step


def run_scan(step, state: SamplerState, n_iter: int, progress: bool = False,
             checkpoint_every: int = 0, checkpoint_path: str = None,
             progress_chunks: int = 20, thin: int = 1,
             collect: bool = True, unroll: int = 2,
             monitor=None, monitor_skip: int = 0, stop_check=None,
             phase2=None):
    """Run ``n_iter`` steps of the jitted scan, optionally chunked for
    progress display (the reference's ProgressMeter, ``src/main.jl:30,37``)
    and periodic checkpointing of the carry.

    ``thin > 1`` emits every ``thin``-th iteration: the inner iterations
    run carry-only (no trajectory stacking), cutting the scan-output HBM
    footprint and device→host transfer by the same factor.  ``n_iter``
    must be divisible by ``thin``.  ``collect=False`` stores no
    trajectory at all (optimization mode) and returns ``ys=None``.

    ``checkpoint_every`` and the progress display count REAL iterations
    (not stored draws): with ``thin > 1`` they are rescaled to outer
    steps internally.

    ``phase2=(step_post, switch_iters)`` switches to a second step
    object after ``switch_iters`` REAL iterations — the fused path's
    post-burnin kernel variant (``step.get_post_burnin``), bitwise
    identical past the boundary but statically free of the predicated
    burnin machinery.  The switch lands on a chunk boundary.
    """
    base_step = step
    n_iter_real = n_iter
    if checkpoint_every and checkpoint_every > 0 and thin > 1:
        # checkpoints can only land on outer-step boundaries; round the
        # real-iteration interval up to the nearest multiple of thin
        checkpoint_every = max(1, math.ceil(checkpoint_every / thin))
    if thin > 1 and n_iter % thin:
        raise ValueError(f"n_iter ({n_iter}) must be divisible by "
                         f"thin ({thin})")
    n_iter = n_iter // thin if thin > 1 else n_iter

    def _wire(step_obj):
        """Build the run_steps closure (thin wrapping, memoized jitted
        chunk/superstep scans) for one step object."""
        step = step_obj
        if thin > 1:
            thin_step = getattr(step_obj, "get_thin_step",
                                lambda t: None)(thin)
            if thin_step is not None:
                # fused path: ONE kernel launch per stored draw (thin
                # in-kernel iterations, emit='last') instead of a
                # launch-per-iteration inner scan
                step = thin_step
            else:
                step = _thin_wrap(step_obj, thin)

        if not collect:
            inner_step = step

            def step(s, _=None):
                return inner_step(s)[0], None

        # The jitted scan is memoized on the ORIGINAL step function (a
        # stable object thanks to build_step's cache), so repeated
        # sample()/optimize() calls with the same configuration share
        # one jit cache entry instead of retracing and recompiling
        # every call.
        jit_cache = getattr(step_obj, "_scan_jit_cache", None)
        if jit_cache is None:
            jit_cache = {}
            try:
                step_obj._scan_jit_cache = jit_cache
            except AttributeError:
                pass
        variant = (thin, collect, unroll)
        chunk_scan = jit_cache.get(variant)
        if chunk_scan is None:
            scan_step = step

            @jax.jit
            def chunk_scan(s, n_steps_dummy):
                # unroll: fuses elementwise chains across iterations and
                # amortizes while-loop bookkeeping (measured best at 2
                # on a v5e for both light and heavy likelihoods)
                return jax.lax.scan(
                    scan_step, s, None, length=n_steps_dummy.shape[0],
                    unroll=min(unroll, n_steps_dummy.shape[0]))
            jit_cache[variant] = chunk_scan

        # superstep path (fused kernel only): one kernel launch per
        # SUPER_K iterations, bitwise identical to SUPER_K single
        # steps; the leading [S, K, ...] ys axes flatten inside the jit
        sup_k = getattr(step_obj, "superstep_k", 0)
        sup_fn = None
        if sup_k and thin == 1 and n_iter >= sup_k:
            sup_fn = step_obj.get_superstep()
            sup_k = step_obj.superstep_k   # authoritative once built
        elif thin > 1 and hasattr(step_obj, "get_thin_superstep"):
            # device-thinned superstep (fused resample path): each call
            # advances sup_k STORED draws (= sup_k·thin iterations) in
            # one launch with strided in-kernel emit; n_iter is already
            # in stored-draw units here
            got = step_obj.get_thin_superstep(thin)
            if got is not None and n_iter >= got[1]:
                sup_fn, sup_k = got
        super_scan = None
        if sup_fn is not None:
            super_scan = jit_cache.get(("super", collect, thin))
            if super_scan is None:
                @jax.jit
                def super_scan(s, n_dummy):
                    s, ys = jax.lax.scan(sup_fn, s, None,
                                         length=n_dummy.shape[0])
                    if not collect:   # optimization mode: carry only
                        return s, None
                    ys = jax.tree.map(
                        lambda a: a.reshape((a.shape[0] * a.shape[1],)
                                            + a.shape[2:]), ys)
                    return s, ys
                jit_cache[("super", collect, thin)] = super_scan

        def run_steps(s, n):
            """n outer steps as supersteps + a remainder of singles."""
            pieces = []
            if super_scan is not None:
                ns, n = divmod(n, sup_k)
                if ns:
                    s, ys = super_scan(s, jnp.zeros((ns,), jnp.int8))
                    if collect:
                        pieces.append(ys)
            if n:
                s, ys = chunk_scan(s, jnp.zeros((n,), jnp.int8))
                if collect:
                    pieces.append(ys)
            return s, pieces

        return run_steps

    run_steps = _wire(base_step)
    run_steps_post = None
    switch_outer = None
    if phase2 is not None:
        post_step, switch_iters = phase2
        if switch_iters % (thin if thin > 1 else 1):
            raise ValueError("phase2 switch must land on an outer-step "
                             "boundary")
        switch_outer = switch_iters // thin if thin > 1 else switch_iters
        if switch_outer < n_iter:
            run_steps_post = _wire(post_step)

    chunk = n_iter
    if checkpoint_every and checkpoint_every > 0:
        chunk = min(chunk, checkpoint_every)
    if progress or stop_check is not None:
        chunk = min(chunk, max(1, math.ceil(n_iter / progress_chunks)))

    outs = []
    done = 0
    emitted = 0                    # stored draws fed to the monitor
    ckpt_future = None             # in-flight async checkpoint write
    last_ckpt = 0                  # outer step of the last checkpoint
    t0 = done0 = None
    while done < n_iter:
        n = min(chunk, n_iter - done)
        rs = run_steps
        if run_steps_post is not None:
            if done < switch_outer:
                n = min(n, switch_outer - done)   # land on the boundary
            else:
                rs = run_steps_post
        state, pieces = rs(state, n)
        if collect:
            got = [jax.device_get(y) for y in pieces]
            outs.extend(got)
            if monitor is not None:
                # feed post-burnin draws (monitor_skip = stored burnin
                # draws) chunk-by-chunk — live streaming R̂/ESS at zero
                # device cost (the transfer happens for bundling anyway)
                for y in got:
                    T = y.theta.shape[0]
                    lo = max(monitor_skip - emitted, 0)
                    if lo < T:
                        monitor.update(y.theta[lo:])
                    emitted += T
        done += n
        if progress:
            # rate/ETA like the reference's ProgressMeter (main.jl:30) —
            # clocked from the END of the first chunk so the one-time jit
            # compile doesn't poison the estimate
            if t0 is None:
                t0, done0, tail = time.perf_counter(), done, ""
            else:
                rate = ((done - done0) * thin
                        / max(time.perf_counter() - t0, 1e-9))
                eta = (n_iter - done) * thin / max(rate, 1e-9)
                tail = f"  ({rate:,.0f} it/s, ETA {eta:,.1f}s)"
            if monitor is not None:
                r = monitor.max_rhat()
                if r is not None:
                    tail += f"  R̂max {r:.3f}"
            print(f"\r[demcmc_tpu] {done * thin}/{n_iter_real} iterations"
                  f"{tail}", end="", flush=True)
        if (checkpoint_every and checkpoint_path
                # interval-elapsed, not divisibility: progress/stop_rhat
                # chunking may make `done` skip over multiples of the
                # checkpoint interval
                and done - last_ckpt >= checkpoint_every):
            last_ckpt = done
            from .utils.checkpoint import save_state
            if ckpt_future is not None:
                ckpt_future.result()   # serialize writes; surface errors
            # transfer on this thread, disk write in the background —
            # the scan keeps running while the npz lands (atomically)
            ckpt_future = save_state(checkpoint_path, state, async_=True)
        if stop_check is not None and done < n_iter and stop_check():
            if progress:
                print(f"\n[demcmc_tpu] convergence target reached at "
                      f"{done * thin}/{n_iter_real} iterations", flush=True)
            break
    if progress:
        print()
    if ckpt_future is not None:
        ckpt_future.result()           # join the last in-flight write
    if not collect:
        return state, None
    ys = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *outs)
    return state, StepOutput(*ys)


def sample(model: DEModel, de: DE, *args, key=0, progress: bool = False,
           mesh=None, checkpoint_every: int = 0, checkpoint_path: str = None,
           return_state: bool = False, state: SamplerState = None,
           thin: int = 1, monitor: bool = False, stop_rhat: float = None):
    """Sample from the posterior (reference ``sample``,
    ``src/main.jl:19-42``).

    Call as ``sample(model, de, n_iter)`` or, for reference API parity,
    ``sample(model, de, MCMCThreads(), n_iter)`` — the threaded form is
    identical here (one fused tensor program; pass ``mesh=`` for device
    parallelism).

    Parameters beyond the reference: ``key`` (int seed or PRNG key — JAX has
    no global RNG), ``mesh`` (a 1-axis ``jax.sharding.Mesh`` to shard groups
    over devices), ``checkpoint_every/checkpoint_path`` (periodic carry
    snapshots), ``state`` (resume from a saved carry), ``return_state``,
    ``thin`` (keep every thin-th draw; ``n_iter`` and ``burnin`` must be
    divisible by it), ``monitor`` (stream a running split-R̂ / rough
    ESS over post-burnin draws as they come off the device; with
    ``progress=True`` the live ``R̂max`` shows in the progress line, and
    the :class:`~demcmc_tpu.utils.monitor.ConvergenceMonitor` is attached
    to the returned chains as ``.monitor``), ``stop_rhat`` (auto-stop:
    end the run early once the streaming post-burnin ``R̂max`` falls to
    or below this target — checked at chunk boundaries, never before 50
    stored post-burnin draws; implies ``monitor=True``; the returned
    chains hold only the draws actually taken).

    Returns a :class:`demcmc_tpu.Chains` (the MCMCChains.Chains analogue).
    """
    args = [a for a in args if not isinstance(a, MCMCThreads)]
    if len(args) != 1:
        raise TypeError("expected sample(model, de, n_iter) or "
                        "sample(model, de, MCMCThreads(), n_iter)")
    n_iter = int(args[0])

    spec = make_spec(model, de)
    if state is None:
        state = init_state(model, de, spec, key)
    fire_ckpt = None
    if state.fire is not None and state.history is not None:
        # fused-resample checkpoint: unpack the lane-packed history slabs
        # so the buffer can grow; to_fused repacks below (real-chain
        # values round-trip exactly).  The checkpointed look-ahead
        # migration gate is preserved across the round-trip: with
        # alpha > 0 (multi-group resample, round 5) to_fused's redrawn
        # gate comes from a different stream than the kernel's
        # look-ahead draw, which would break bitwise resume
        fire_ckpt = state.fire
        state = _unpack_fused_state(state, de.n_groups, de.Np, spec.dim)
    # grow the resample-history buffer for this run's rows — also on
    # RESUMED states (a checkpointed history only covers past iterations;
    # without growth, new writes/reads would clamp to the last row)
    state = _grow_history(state, n_iter)

    if thin > 1 and de.discard_burnin and de.burnin % thin:
        raise ValueError(f"burnin ({de.burnin}) must be divisible by "
                         f"thin ({thin})")
    # fused kernel when supported (under a mesh: shard_map composition,
    # falling back to the GSPMD-partitioned XLA step otherwise)
    step = build_step(model, de, spec, mesh=mesh)
    fused = getattr(step, "fused", False)
    if (fused and getattr(step, "resample_fused", False)
            and not step.accepts_history(int(state.history.shape[0]))):
        # this run's history would exceed the kernel's VMEM budget
        step = build_step(model, de, spec, allow_fused=False, mesh=mesh)
        fused = False
    if not fused and state.fire is not None:   # fused checkpoint, XLA run
        state = _unpack_fused_state(state, de.n_groups, de.Np, spec.dim)
    state = _shard_state(state, mesh)     # layout-aware (XLA or fused)
    if fused:
        state = step.to_fused(state)      # no-op on a fused-layout resume
        if fire_ckpt is not None:
            state = state._replace(
                fire=jnp.asarray(fire_ckpt).reshape(1, 1)
                .astype(jnp.int32))       # bitwise resume (see above)
    mon = None
    if monitor or stop_rhat is not None:
        from .utils.monitor import ConvergenceMonitor
        mon = ConvergenceMonitor(fused=fused)
    stop_check = None
    if stop_rhat is not None:
        def stop_check():
            if mon.n < 50:       # too few draws for a stable R̂
                return False
            r = mon.max_rhat()
            return r is not None and np.isfinite(r) and r <= stop_rhat
    # post-burnin kernel variant (fused random_gamma configs): the
    # predicated γ₂-burnin region is statically absent past the burnin
    # boundary — bitwise identical, measured −14% step time on the 4k
    # Gaussian (get_post_burnin docstring)
    phase2 = None
    if (fused and getattr(step, "get_post_burnin", None) is not None
            and os.environ.get("DEMCMC_POST_SPLIT", "1") != "0"):
        remaining = de.burnin - (int(state.iteration) - 1)
        if remaining < n_iter and (thin <= 1 or remaining % thin == 0):
            post = step.get_post_burnin()
            if post is not None:
                if remaining <= 0:
                    step = post          # the whole run is post-burnin
                else:
                    phase2 = (post, remaining)
    state, ys = run_scan(step, state, n_iter, progress=progress,
                         checkpoint_every=checkpoint_every,
                         checkpoint_path=checkpoint_path, thin=thin,
                         monitor=mon, stop_check=stop_check,
                         monitor_skip=de.burnin // thin, phase2=phase2)
    if ys is not None:
        # auto-stop may end the run early — bundle what was taken
        n_iter = ys.theta.shape[0] * thin
    if fused and ys is not None:
        # kernel layout [T, d, 8, C/8] -> the bundling layout [T, C, d]
        T = ys.theta.shape[0]
        ys = ys._replace(
            theta=np.swapaxes(np.reshape(ys.theta, (T, spec.dim, -1)),
                              1, 2),
            accept=np.reshape(ys.accept, (T, -1)),
            lp=np.reshape(ys.lp, (T, -1)))
        state = step.from_fused(state)

    chains = bundle_samples(model, de, spec, ys, n_iter, thin=thin)
    if mon is not None:
        chains.monitor = mon
    if return_state:
        return chains, state
    return chains


def make_spec(model: DEModel, de: DE) -> ParamSpec:
    """Build the ParamSpec from one host-side prior draw."""
    example = model.draw_prior(jax.random.PRNGKey(0))
    example = jax.tree.map(np.asarray, example)
    return ParamSpec.from_example(model.names, example, de.bounds)


def bundle_samples(model: DEModel, de: DE, spec: ParamSpec, ys: StepOutput,
                   n_iter: int, thin: int = 1) -> Chains:
    """Convert scan outputs to a Chains object (reference ``bundle_samples``,
    ``src/main.jl:222-250``): keep ``n_iter - burnin`` draws when
    ``discard_burnin``, with per-chain ``acceptance`` and ``lp`` internals.

    Delta vs reference: with ``n_initial > 0`` the reference slices history
    rows ``burnin+1 .. n_iter`` which straddles the prior-seed rows
    (SURVEY.md §3.3 caveat); here the output is always the post-init
    iterations ``burnin+1 .. n_iter``.
    """
    offset = de.burnin if de.discard_burnin else 0
    if offset >= n_iter and de.discard_burnin:
        raise ValueError(f"burnin ({de.burnin}) >= n_iter ({n_iter}); "
                         "nothing left to return")
    offset //= thin
    theta = np.asarray(ys.theta)[offset:]        # [Ns, C, d]
    acc = np.asarray(ys.accept)[offset:]
    lp = np.asarray(ys.lp)[offset:]
    return Chains.from_samples(theta, acc, lp, spec)


# jit wrappers for sample_replicated: a BOUNDED LRU keyed on
# (weakref(make_model), run signature).  A WeakKeyDictionary cannot
# self-clean here — the cached wrapper's closure calls make_model, so
# the value strongly references the key and entries would be immortal;
# the LRU bound caps the worst case (fresh lambda per call) at
# _REPLICATED_CACHE_MAX compiled programs while repeated same-callable
# calls still hit the cache.
_REPLICATED_CACHE_MAX = 8
_replicated_jit_cache = collections.OrderedDict()


def _replicated_jit(make_model, sig, build):
    """Memoize a replicated-run jit wrapper on (weakref(make_model),
    sig) in the bounded LRU above; non-weakrefable callables skip the
    cache (pre-round-4 behavior: a fresh wrapper per call)."""
    try:
        wref = weakref.ref(make_model)
    except TypeError:
        return build()
    ck = (wref,) + tuple(sig)
    fn = _replicated_jit_cache.get(ck)
    if fn is None:
        fn = build()
        # evict dead-callable entries, then bound the LRU
        for k in [k for k in _replicated_jit_cache if k[0]() is None]:
            del _replicated_jit_cache[k]
        _replicated_jit_cache[ck] = fn
        while len(_replicated_jit_cache) > _REPLICATED_CACHE_MAX:
            _replicated_jit_cache.popitem(last=False)
    else:
        _replicated_jit_cache.move_to_end(ck)
    return fn


def _replicated_setup(make_model, de: DE, datasets, key, keys):
    """Shared plumbing of :func:`sample_replicated` /
    :func:`demcmc_tpu.optimize.optimize_replicated`: validate the leading
    replication axis, build the spec from replication 0's concrete data,
    and resolve per-replication keys."""
    leaves = jax.tree.leaves(datasets)
    if not leaves:
        raise ValueError("datasets is empty")
    R = int(np.asarray(leaves[0]).shape[0])
    for x in leaves:
        if int(np.asarray(x).shape[0]) != R:
            raise ValueError("all dataset leaves need the same leading "
                             "replication axis")
    datasets = jax.tree.map(jnp.asarray, datasets)
    example = jax.tree.map(lambda x: x[0], datasets)
    model0 = make_model(example)
    spec = make_spec(model0, de)
    if keys is None:
        keys = jax.random.split(rng.ensure_key(key), R)
    else:
        keys = jnp.stack([rng.ensure_key(k) for k in keys]) \
            if isinstance(keys, (list, tuple)) else jnp.asarray(keys)
        if keys.shape[0] != R:
            raise ValueError(f"{keys.shape[0]} keys for {R} replications")
    return datasets, keys, model0, spec, R


def _shard_replications(datasets, keys, mesh, R: int):
    """Place the replication axis over a device mesh: each device runs
    R/n_dev whole replications — embarrassingly parallel (no cross-
    replication ops, so GSPMD inserts no collectives in the hot loop)."""
    if mesh is None:
        return datasets, keys
    from jax.sharding import NamedSharding, PartitionSpec as P
    n_dev = mesh.devices.size
    if R % n_dev:
        raise ValueError(f"{R} replications must divide over "
                         f"{n_dev} devices")
    axis = mesh.axis_names[0]

    def put(x):
        return jax.device_put(
            x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))

    return jax.tree.map(put, datasets), put(keys)


def sample_replicated(make_model, de: DE, n_iter: int, datasets, key=0,
                      thin: int = 1, keys=None, mesh=None):
    """Run R independent replications — one dataset per replication — as
    ONE vmapped device program.

    TPU-native batching with no reference analogue: where
    ``MCMCThreads`` parallelizes the groups of a single run, this batches
    R *whole runs* (init → scan → trajectories) into one XLA program, so
    small-population workloads (per-subject model fits, simulation-based
    calibration, prior-predictive sweeps) fill the chip instead of
    queueing as R separate dispatches with R recompiles.

    Parameters
    ----------
    make_model : callable ``data -> DEModel``.  Called under ``vmap`` with
        a traced data pytree, so it must be JAX-traceable (no numpy on
        ``data``); the returned model must route ``data`` through
        ``DEModel.data`` / ``loglike(data, ...)`` as usual.
    datasets : pytree whose leaves all carry a leading replication axis
        ``[R, ...]``.
    key / keys : either a base key (split into R per-run keys) or an
        explicit ``[R]`` array of keys.  Replication r's chains are
        bitwise identical to ``sample(make_model(datasets[r]), de, n_iter,
        key=keys[r])`` on the XLA step path.
    thin : keep every ``thin``-th draw (as in :func:`sample`).
    mesh : optional 1-axis ``jax.sharding.Mesh`` — shards the REPLICATION
        axis over devices (R must divide the device count): each chip
        runs its own subset of whole replications, embarrassingly
        parallel (contrast ``sample(mesh=...)``, which shards the groups
        of one run).

    Returns a list of R :class:`Chains`.
    """
    datasets, keys, model0, spec, R = _replicated_setup(
        make_model, de, datasets, key, keys)
    datasets, keys = _shard_replications(datasets, keys, mesh, R)

    if thin > 1:
        if n_iter % thin:
            raise ValueError(f"n_iter ({n_iter}) must be divisible by "
                             f"thin ({thin})")
        if de.discard_burnin and de.burnin % thin:
            raise ValueError(f"burnin ({de.burnin}) must be divisible by "
                             f"thin ({thin})")

    def one(data, k):
        model = make_model(data)
        # the XLA step, uncached: the model closes over a TRACED data
        # leaf, so neither the per-model step cache nor the fused
        # kernel's host-side constant folding applies
        step = _build_step_uncached(model, de, spec)
        state = _grow_history(init_state(model, de, spec, k), n_iter)
        run_step = _thin_wrap(step, thin) if thin > 1 else step
        _, ys = jax.lax.scan(lambda s, x: run_step(s), state, None,
                             length=n_iter // thin)
        return ys

    # memoize the jit wrapper on (make_model, run signature): a fresh
    # jax.jit per call would otherwise re-trace and re-compile every
    # repeated same-shape call (per-subject refits, SBC round loops) —
    # VERDICT r3 weak item 8.  Keyed on a weakref of the user's
    # make_model object (jit's own same-function-object contract);
    # shape/sharding changes still re-trace via the stored wrapper's
    # normal jit cache.
    fn = _replicated_jit(
        make_model, ("sample", de._static_key(), _spec_key(spec),
                     n_iter, thin),
        lambda: jax.jit(jax.vmap(one)))
    ys = fn(datasets, keys)
    ys = jax.device_get(ys)
    return [bundle_samples(model0, de, spec,
                           StepOutput(*(np.asarray(a[r]) for a in ys)),
                           n_iter, thin=thin)
            for r in range(R)]


def _packed_setup(make_model, de: DE, datasets, key):
    """Build the packed replicated step + initial fused state (shared by
    :func:`sample_replicated_packed` and bench.py's packed entry)."""
    datasets, keys, model0, spec, R = _replicated_setup(
        make_model, de, datasets, key, None)
    import dataclasses as _dc

    from .ops import fused_step as fused_mod
    G, Np, d = de.n_groups, de.Np, spec.dim
    C_rep = G * Np
    C_tot = C_rep * R
    Rrow = fused_mod._R
    if C_tot % Rrow or (C_tot // Rrow) % Np:
        raise ValueError(f"packed population C={C_tot} does not fit the "
                         f"kernel layout (C % 8 == 0, (C/8) % Np == 0)")
    Cf_tot = C_tot // Rrow
    # the packed kernel runs with migration OFF — replication-local
    # migration replays at XLA level between launches (see
    # sample_replicated_packed docstring / _wrap_packed_migration)
    alpha = float(de.alpha) if de.n_groups > 1 else 0.0
    de_packed = _dc.replace(de, n_groups=G * R, alpha=0.0)

    def pack(leaf):
        a = np.asarray(leaf)                      # [R, *obs]
        a = np.repeat(a, C_rep, axis=0)           # [C_tot, *obs]
        a = np.moveaxis(a, 0, -1)                 # [*obs, C_tot]
        return a.reshape(a.shape[:-1] + (Rrow, Cf_tot))

    packed_data = jax.tree.map(pack, jax.tree.map(np.asarray, datasets))
    packed_model = _dc.replace(model0, data_batched=packed_data)
    packed_model.__dict__.pop("_step_cache", None)

    step = build_step(packed_model, de_packed, spec)
    if not getattr(step, "fused", False):
        raise ValueError(
            "configuration is not fused-supported when packed "
            f"(n_groups={G * R}); use sample_replicated")
    if alpha > 0.0:
        step = _wrap_packed_migration(step, spec, R, G, Np, alpha,
                                      step.superstep_k)

    # per-replication init with the replication's OWN data and key —
    # identical initial states to the serial runs
    def init_one(data, k):
        model = make_model(data)
        s = init_state(model, de, spec, k)
        return s.theta, s.weight

    th, w = jax.jit(jax.vmap(init_one))(datasets, keys)
    # assemble the packed state directly — a full init_state(de_packed)
    # would evaluate a throwaway C_tot-chain prior population (and run
    # the user loglike against replication-0 data) only to discard it
    state = SamplerState(theta=jnp.reshape(th, (G * R, Np, d)),
                         weight=jnp.reshape(w, (G * R, Np)),
                         key=rng.ensure_key(key),
                         iteration=jnp.asarray(de.n_initial + 1,
                                               jnp.int32),
                         history=None)
    return step, step.to_fused(state), model0, spec, R


def sample_replicated_packed(make_model, de: DE, n_iter: int, datasets,
                             key=0, thin: int = 1):
    """R independent replications PACKED into one fused-kernel
    population: replication r's ``n_groups`` groups become groups
    ``[r·G, (r+1)·G)`` of a single ``R·G``-group run, and each data
    leaf expands to a per-chain constant (trailing ``[8, C_tot/8]``
    axes) that the kernel's build-time partial evaluator folds like any
    other data.  Groups never interact when ``alpha == 0``, so the
    packed run IS R independent runs — at one-Pallas-kernel-per-
    iteration speed, where :func:`sample_replicated` vmaps the
    multi-kernel XLA step.

    Contract beyond :func:`sample_replicated`:

    * ``de.alpha > 0`` runs migration REPLICATION-LOCALLY: the packed
      kernel itself migrates nothing (its network would span
      replications), and each replication's own G groups exchange via
      the XLA-level coalesced replay (:func:`_wrap_packed_migration` —
      per-(iteration, replication) Bernoulli(α) events, the reference
      law per run, ``src/migration.jl:11-19``);
    * the packed configuration (``n_groups = R·G``) must be fused-
      supported, and the model's ``loglike_batched`` must compute any
      host-side data statistics along axis 0 only, so data leaves with
      trailing chain axes broadcast (true of the zoo densities);
    * chains are NOT bitwise-equal to serial ``sample`` runs (all
      replications draw from one per-chain PRNG stream) — statistically
      equivalent only.  Initial states DO match the serial runs (same
      per-replication init keys).

    Returns a list of R :class:`Chains`.
    """
    if thin > 1 and de.discard_burnin and de.burnin % thin:
        raise ValueError(f"burnin ({de.burnin}) must be divisible by "
                         f"thin ({thin})")
    step, state, model0, spec, R = _packed_setup(make_model, de,
                                                 datasets, key)
    G, Np, d = de.n_groups, de.Np, spec.dim
    C_rep = G * Np
    C_tot = C_rep * R
    state, ys = run_scan(step, state, n_iter, thin=thin)
    T = ys.theta.shape[0]
    theta = np.swapaxes(np.reshape(np.asarray(ys.theta), (T, d, C_tot)),
                        1, 2)                     # [T, C_tot, d]
    acc = np.reshape(np.asarray(ys.accept), (T, C_tot))
    lp = np.reshape(np.asarray(ys.lp), (T, C_tot))
    out = []
    for r in range(R):
        sl = slice(r * C_rep, (r + 1) * C_rep)
        out.append(bundle_samples(
            model0, de, spec,
            StepOutput(theta=theta[:, sl], accept=acc[:, sl],
                       lp=lp[:, sl]), n_iter, thin=thin))
    return out
