"""Whole-step fused Pallas kernel for flat-parameter models.

The XLA step (``sampler._build_step_uncached``) lowers to ~8-10 kernels
per iteration (threefry pool, one-hot gathers, fitness, accept, ...); at
4k chains each kernel is ~1 µs of fixed launch overhead against ~100 ns
of arithmetic, so the step is kernel-count bound (measured 12 µs/step on
a v5e — see NOTES.md).  This module fuses the ENTIRE iteration —
migration (for G ≤ ``MIG_MAX_G``), proposal, partner selection, bounds,
the user log-posterior, and the MH accept — into ONE Pallas kernel, and
runs ``K`` iterations per launch (``SUPER_K`` supersteps, the population
carried in VMEM scratch across a sequential grid), so neither the
migration gate nor the γ₂-burnin phase needs an XLA-level branch
(each ``lax.cond``/``switch`` on this path costs a ~1 µs pipeline sync):
both are in-kernel ``pl.when`` regions.

Reference semantics preserved (``src/crossover.jl:12-99``,
``src/utilities.jl:92-99,201-210``): per-cell iid base/partner draws,
γ₂-burnin schedule, ϵ-noise, κ-recombination, β-mutation, bounds +
NaN-masked posterior, log-space MH.  The RNG is the TPU hardware PRNG
seeded per (key, iteration) — a DIFFERENT (still counter-style,
deterministic) stream than the XLA path's threefry pool, so the two
paths are statistically, not bitwise, identical; both are SBC-validated.

Layout: the kernel works in ``[d, 8, C/8]`` (parameters × sublanes ×
lanes) — the C chains tiled onto BOTH the sublane and the lane axis of
each (8, 128) vreg, row-major (chain c ↔ (c // (C/8), c mod (C/8))).
A flat ``[d, C]`` layout (chains on lanes only) fills 1-2 of the 8
sublanes per vreg, and the kernel is VPU-op-count bound: the 8x vreg
inflation put the round-1 kernel at 13.4 µs/step vs the XLA step's 11.1
(ablation: ~7.3 µs in the gather/select machinery alone).  Packing the
sublanes cuts every machinery op 8x.  Groups (Np contiguous chains) must
not straddle rows — ``supported`` requires (C/8) % Np == 0 — so
group-local operations (softmax base-select, partner gathers over the Np
group members) work within each row independently via per-row lane-roll
networks:

* segmented scan / broadcast — log₂(Np) ``pltpu.roll`` + select passes;
* dynamic within-group gather — Np static-offset rolled copies combined
  with per-lane one-hot masks (a "roll dictionary": the group axis is
  contiguous in lanes, so member (g, (p+o) mod Np) of every group g is
  ONE global lane-roll away for each static offset o).

The user log-posterior is traced INTO the kernel via ``jax.vmap`` over
the lane axis; models whose densities use only Mosaic-supported ops
(elementwise math, reductions — true of every model in the zoo) compile;
anything else falls back to the XLA step at build time.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import rng
from . import accept as accept_ops
from . import proposals as proposal_ops

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:                                        # pragma: no cover
    _HAVE_PALLAS = False


_R = 8          # f32 sublane count: chains pack as [_R, C // _R]

# Ceiling for the FALLBACK in-kernel migration variant (the [G, G]
# one-hot rank/route matrices of _mig_apply), used only when the
# preferred bitonic rank network (_mig_apply_sorted, O(G log² G)) has
# no XOR lattice — i.e. G//8 not a power of two.  The matrices grow
# O(G²) (64 MB each at G=4096 — past VMEM), so above this the XLA
# migration path takes over for such layouts (lax.cond or branchless,
# forfeiting the K-superstep).  The sorted variant measured faster at
# EVERY size (validation/mig_sorted_bench.py, 2026-08-19, v5e, Np=16,
# α=0.1, slope-fit):
#   G=256:  sorted 1.91 µs/step vs one-hot  2.56
#   G=512:  sorted 3.48         vs one-hot  5.91
#   G=1024: sorted 6.43         vs one-hot 21.9   (round-2 cond: 9.81)
#   G=4096: sorted ≈ a=0 floor + ~1 µs     (cond: 40.7)
# DISTINCT from ops/migration.py's _SMALL_G (=1024), the XLA routing's
# own matrix-vs-argsort cutoff in HBM.
MIG_MAX_G = 512

# largest G that migrates IN-kernel: past it the sorted machinery's
# presence costs ~27 µs/step even on UNFIRED iterations (a kernel-size
# cliff measured at G=8192 on v5e, 2026-08-20 — invariant to geometry:
# barrel/gemm compress, loop-rolled vs batched chains all land ~the
# same; at G ≤ 4096 the same code costs < 1 µs unfired.  See NOTES.md
# round-5).  Above the cutoff, α > 0 runs keep the K-superstep through
# the COALESCED XLA exchange instead (mig_multi window replay — the
# sharded path's law-exact mechanism, sampler.py).
MIG_IK_MAX_G = 4096


# ...except at high α, where the in-kernel form's cheaper fired events
# win the unfired penalty back: at G=8192 (v5e) in-kernel runs α=0.1 at
# 73.8 µs/step vs coalesced 80.2, while at α=0.001 coalesced wins 22.7
# vs 46 — measured crossover ≈ 0.08 (α is static, so the builder picks)
MIG_IK_MIN_ALPHA = 0.08


def mig_ik_max_g() -> int:
    """In-kernel migration size cutoff; ``DEMCMC_MIG_IK_MAX_G``
    overrides (A/B knob for the kernel-size cliff)."""
    return int(os.environ.get("DEMCMC_MIG_IK_MAX_G", MIG_IK_MAX_G))

# iterations per kernel launch on the superstep path (build_fused_step K):
# per-iteration cost is launch-overhead bound, so one launch runs K
# iterations with the population carried in VMEM scratch.  Bitwise
# equality with K single-iteration launches is guaranteed (the hardware
# PRNG is re-seeded per (key, iteration) inside the grid loop) and
# regression-tested.  On-chip K-scan (validation/ksuper_bench.py,
# 2026-08-19, v5e): K=8 → 2.603 µs/iter, K=16 → 2.528, K=32 → 2.490 on
# the 4k-chain Gaussian; 16 takes most of the tail without inflating
# the per-launch trajectory block.
SUPER_K = 16

# interpret-mode row budget for the in-kernel migration boundary replay
# (mig_replay): 3 pre-laid draw rows per potential coalesced event.
# The gate COUNT a launch receives is bounded by the PREVIOUS launch's
# K, so the sampler clamps replay-mode superstep/thin K to this cap
# (an env-overridden DEMCMC_SUPER_K is otherwise unclamped on the
# standard path); the hardware path draws in-body and needs no cap.
_REPLAY_E_CAP = 512


def super_k() -> int:
    """Iterations per superstep launch; ``DEMCMC_SUPER_K`` overrides the
    default (on-chip K-scan knob — any K is bitwise-equivalent)."""
    return int(os.environ.get("DEMCMC_SUPER_K", SUPER_K))


def _mode():
    """'auto' (TPU only), 'off', or 'interpret' (CPU testing)."""
    return os.environ.get("DEMCMC_FUSED", "auto")


def supported(model, de, spec) -> bool:
    """Static predicate: can this configuration take the fused path?"""
    if not _HAVE_PALLAS or _mode() == "off":
        return False
    if _mode() != "interpret" and jax.default_backend() != "tpu":
        return False
    if jax.config.jax_default_prng_impl != "threefry2x32":
        # the kernel's (key, iteration) seeding contract and the sharded
        # wrapper's wrap_key_data both assume 2-word threefry key data; a
        # 4-word rbg key would be silently truncated (single-device) or
        # raise inside the jitted scan (sharded) — fall back to XLA
        return False
    gp = de.generate_proposal
    if gp not in (proposal_ops.random_gamma, proposal_ops.fixed_gamma,
                  proposal_ops.variable_gamma, "random_gamma",
                  "fixed_gamma", "variable_gamma"):
        return False
    if de.sample not in (proposal_ops.sample_current, "sample",
                         proposal_ops.resample, "resample"):
        return False
    if de.uses_resample and not _resample_supported(de):
        return False              # snooker IS supported (in-kernel branch)
    if de.blocks is not None and _blocking_const(de) is None:
        return False              # dynamic blocking_on gating: XLA cond
        # (constant-True blocking runs the block sweeps IN-kernel;
        # constant-False means the blocks never apply — plain sweep)
    if de.is_mh:
        if de.evaluate_fitness not in ("posterior",
                                       accept_ops.compute_posterior):
            return False
    elif de.update_particle in ("maximize", accept_ops.maximize,
                                "minimize", accept_ops.minimize):
        # optimization mode: greedy accept + objective-only fitness
        # (evaluate_fun!, utilities.jl:113-120) fuse too
        if de.evaluate_fitness not in ("fun", accept_ops.evaluate_fun):
            return False
    else:
        return False
    if getattr(model, "stochastic", False):
        # pseudo-marginal models fuse when they declare a uniform noise
        # panel (DEModel.noise_shape): the kernel supplies fresh
        # hardware-PRNG uniforms to loglike_batched(noise=...) on every
        # evaluation.  Without the panel the density draws jax.random
        # noise from a key — not replayable in-kernel — so: XLA path.
        if getattr(model, "noise_shape", None) is None:
            return False
        if model.chunk_obs:
            return False        # chunked data + whole-panel noise: XLA
    if model.loglike_batched is None or (
            de.is_mh and model.prior_loglike_batched is None):
        # without a chains-last batched density the in-kernel evaluation
        # would come from vmapping the per-cell form, which batches chains
        # onto the SUBLANE axis (intermediates [C, n_obs] + transposes) —
        # measured slower than the plain XLA step; not worth fusing
        return False
    if jnp.dtype(de.dtype) != jnp.float32:
        return False
    C = de.n_groups * de.Np
    if not de.uses_resample and (C % _R != 0 or (C // _R) % de.Np != 0):
        return False                   # groups must not straddle sublane rows
    if de.Np < 3 or de.Np > 64:        # need 2 distinct non-self partners;
        return False                   # roll dictionary is 2·Np-1 copies
    return True


# ---------------------------------------------------------------------------
# DE-MCz (resample-from-history) fused path: layout + gates
# ---------------------------------------------------------------------------
# Resample configurations are SMALL by construction (the reference docs
# recommend Np=3, n_groups=1, crossover.jl:113-124 / structs.jl:37-43):
# the per-step cost is pure launch/dispatch overhead, exactly what the
# fused kernel eliminates.  The layout pads the population to one full
# [d, 8, 128] vreg block — the C real chains sit in sublane row 0 as the
# row-major prefix (chain c <-> (c // 128, c % 128), so the standard
# packing convention holds) and the 7 pad rows + pad lanes are garbage
# that computes for free (the vreg is the unit of VPU work either way)
# and is never read: partner values come from the HISTORY, the softmax
# base-select is group-local to row-0 lanes, and outputs/history writes
# slice the real prefix.
#
# The history ring ([H, C, d] in the carry) packs into lane-dense slabs
# [S, d, 128]: slab s holds B = 128 // C consecutive rows side by side
# (row t, chain c -> slab t // B, lane (t % B)·C + c), DMA'd HBM->VMEM
# once per K-iteration launch and written back at the end.  Partner
# (row, chain) index draws are precomputed in XLA per launch — the same
# without-replacement draws as the XLA path (resample_flat_indices, a
# pure function of (key, iteration)) — and enter the kernel through SMEM
# as packed slab·128+lane int32 scalars, so the in-kernel gather is a
# dynamic slab load + one-hot lane reduction per (chain, slot).

RESAMPLE_CF = 128          # lane-width granule; narrow layouts (C <=
                           # RESAMPLE_CF) keep all chains in one row
# WIDE resample layout (round 5): C in (128, 1024] keeps all chains in
# sublane row 0 but across Cf = ceil(C/128)·128 lanes; history slabs
# become one row per slab (B = 1) and the path is STREAM-ONLY — the
# XLA pre-gather already lands each lane's partner column at its own
# lane (one [d, Cf] row per (iteration, slot)), so the narrow path's
# per-chain python gather loop (code size ∝ C) is replaced by direct
# row reads + an exact one-hot-gemm lane permute for the rare
# within-launch-window partners.  Ref: src/crossover.jl:103-140 —
# the reference's resample slot composes at ANY population size.
RESAMPLE_MAX_C_WIDE = 1024
RESAMPLE_S_GRAN = 64       # slab-count rounding granule (compile reuse)
# In-VMEM history engine budget: the flagship MVN config's
# 50k-iteration history (~19 MB packed) runs; ~37 MB (100k rows)
# compiles but ABORTS the device at kernel load (observed on v5e
# 2026-08-20 — the remote backend does not enforce vmem_limit_bytes at
# compile time), so the static bound stays at a measured-safe 24 MiB.
# Since round 5 this is an ENGINE-SELECTION threshold, not a run-length
# ceiling: histories past it take the HBM-streaming engine
# (``hist_stream`` in :func:`build_fused_step` — XLA pre-gather of the
# launch's partner rows + a small VMEM write window), which is bitwise
# identical and bounded only by HBM, like the reference's plain-RAM
# history (``src/utilities.jl:24-41``).
RESAMPLE_HIST_VMEM = 24 * 1024 * 1024   # history VMEM budget (bytes)
RESAMPLE_SMEM_IDX = 16384  # index words per launch (SMEM budget)
# hard physical bound for a single launch's flat index array (~800 KB
# of the chip's 1 MB SMEM): device-thin kernels build with K = thin,
# which the SUPER_K budget does not govern — past this the thin path
# must fall back (sampler get_thin_step returns None)
RESAMPLE_SMEM_WORDS_MAX = 200_000


def _resample_supported(de) -> bool:
    """Fused-path gate for resample (DE-MCz) configurations."""
    C = de.n_groups * de.Np
    if C > RESAMPLE_MAX_C_WIDE:
        return False               # past the wide single-row layout: XLA
    if de.n_groups > 1 and float(de.alpha) > 0.0:
        # multi-group resample migrates IN-kernel since round 5: real
        # groups are the row-0 prefix of the nominal group grid (pad
        # groups mask out of the law with rank keys > 1) — needs a
        # migration variant for the NOMINAL grid, under the
        # kernel-size cliff
        _, _, Cf_r = resample_layout(de)
        G_m = _R * max(Cf_r // de.Np, 1)
        if not (mig_sorted_ok(G_m, de.Np) or G_m <= MIG_MAX_G):
            return False
        if G_m > mig_ik_max_g():
            return False
    # blocked resample sweeps run in-kernel since round 5 (each block's
    # sweep consumes its own partner-draw slot sets, like the
    # reference's per-block crossover calls); dynamic blocking_on still
    # needs the XLA cond — gated by the shared check in supported()
    if not de.is_mh:
        return False               # optimization + resample: XLA path
    if de.n_initial < 1:
        return False
    return True


def resample_layout(de):
    """(C_real, B, Cf) of the padded resample layout: C_real chains in
    sublane row 0.  Narrow (C <= 128): Cf = 128, history slabs hold
    B = 128 // C rows side by side.  Wide (C > 128): Cf =
    ceil(C/128)·128 lanes, one history row per slab (B = 1)."""
    C_real = de.n_groups * de.Np
    if C_real <= RESAMPLE_CF:
        return C_real, RESAMPLE_CF // C_real, RESAMPLE_CF
    Cf = -(-C_real // RESAMPLE_CF) * RESAMPLE_CF
    return C_real, 1, Cf


def resample_hist_slabs(de, H: int) -> int:
    """Slab count for an ``H``-row history, rounded up to the compile-
    reuse granule (pad slabs are zero and never read: row draws are
    bounded by ``iteration - 1 < H``)."""
    _, B, _ = resample_layout(de)
    S = -(-H // B)
    return -(-S // RESAMPLE_S_GRAN) * RESAMPLE_S_GRAN


def resample_hist_fits(de, spec, H: int) -> bool:
    """Does the packed history fit the kernel's VMEM budget?  (Narrow
    layout only — the wide layout is stream-engine-only.)"""
    _, _, Cf = resample_layout(de)
    S = resample_hist_slabs(de, H)
    return S * spec.dim * Cf * 4 <= RESAMPLE_HIST_VMEM


def resample_super_k(de) -> int:
    """Iterations per launch on the resample path.  Larger than the
    plain SUPER_K: each launch pays a full history DMA in/out, so K
    amortizes it (18 MB at the reference's flagship MVN config ≈ 45 µs
    per launch ≈ 0.18 µs/iter at K=256).  Bounded by the SMEM budget
    for the per-iteration partner-index words (wide layouts use the
    narrow-equivalent heuristic — see comment).  ``DEMCMC_SUPER_K``
    overrides."""
    C_real, _, Cf = resample_layout(de)
    if C_real > RESAMPLE_CF:
        # wide layout: K is nearly a wash on-chip (measured at C=512,
        # n=24k: K ∈ {8, 12, 16, 24} all ~31-33 µs/iter — the
        # per-launch O(S) pre-gather transpose amortizes against the
        # K-scaled window machinery and window-hit rate; K=240 from a
        # pure-VMEM budget measured 85).  Keep the narrow-equivalent
        # index-words heuristic (K=6 at the C=512 snooker config).
        n_slots_tot = max(resample_idx_words(de) // Cf, 1)
        k = RESAMPLE_SMEM_IDX // max(n_slots_tot * C_real, 1)
    else:
        k = RESAMPLE_SMEM_IDX // max(resample_idx_words(de), 1)
    # K scales DOWN to 1 for word-heavy configs: a max(16, ...) floor
    # used to push e.g. sequential-sweep Np=64 launches to 2.6 MB of
    # SMEM, past the chip's 1 MB (code-review r4).  The env override is
    # clamped to the same budget.
    cap = max(1, min(256, (k // 16) * 16 if k >= 16 else k))
    env = os.environ.get("DEMCMC_SUPER_K")
    if env is not None:
        if int(env) > cap and not _super_k_clamp_warned:
            import warnings
            _super_k_clamp_warned.append(True)
            warnings.warn(
                f"DEMCMC_SUPER_K={env} exceeds this resample config's "
                f"SMEM index budget; clamped to K={cap}", stacklevel=2)
        return max(1, min(int(env), cap))
    return cap


_super_k_clamp_warned: list = []   # one warning per process (advice r4)


def resample_idx_words(de) -> int:
    """Per-ITERATION partner-index words on the fused resample path
    (the [K · n_slots · lane_width] launch array divided by K).  The
    narrow layout ships C words per slot through SMEM; the wide layout
    ships one Cf-lane VMEM row per slot — the same formula still
    bounds K (conservative: it also caps the write-window slab
    count)."""
    C_real, _, Cf = resample_layout(de)
    lane_w = C_real if C_real <= RESAMPLE_CF else Cf
    n_slots = 2 + (3 if float(de.theta_snooker) > 0.0 else 0)
    if de.sequential_sweep:
        n_slots *= de.Np      # one tuple set per member per iteration
    if de.blocks is not None and _blocking_const(de) is True:
        n_slots *= len(de.blocks)   # one tuple set per block sweep
    return n_slots * lane_w


def _blocking_const(de):
    """True/False when ``blocking_on`` is one of the constant slot
    functions (the reference's common case), None for a custom (dynamic)
    callable — which needs the XLA step's ``lax.cond``."""
    from ..config import _always_blocking_on, _default_blocking_on
    if de.blocking_on is _always_blocking_on:
        return True
    if de.blocking_on is _default_blocking_on:
        return False
    return None


def local_de(de, n_dev: int):
    """The per-device view of a sharded configuration: each device runs
    the fused kernel over its own ``n_groups // n_dev`` groups (groups
    are independent within an iteration — SURVEY §3.2)."""
    from dataclasses import replace
    return replace(de, n_groups=de.n_groups // n_dev)


def sharded_supported(model, de, spec, mesh) -> bool:
    """Can this configuration run the fused kernel under ``shard_map``
    on ``mesh``?  Requires a 1-axis mesh whose device count divides the
    packed chain layout so each shard is itself a valid fused layout:
    ``Gr % D == 0`` (every sublane row's ``Gr = C/(8·Np)`` group blocks
    split evenly on the lane axis) — which implies ≥ 8 groups per device
    (8 sublane rows × ≥ 1 group per row) — plus :func:`supported` on the
    per-device configuration."""
    if mesh is None or len(mesh.axis_names) != 1:
        return False
    if de.uses_resample:
        return False       # history gathers are cross-shard: GSPMD path
    n_dev = int(mesh.devices.size)
    if n_dev == 1:
        return supported(model, de, spec)
    C = de.n_groups * de.Np
    if C % (_R * de.Np) or (C // (_R * de.Np)) % n_dev:
        return False
    return supported(model, local_de(de, n_dev), spec)


# ---------------------------------------------------------------------------
# lane-segment helpers (group = Np contiguous lanes WITHIN a sublane row;
# all arrays are [R, Cf] or [d, R, Cf] and rolls act on the last axis, so
# every row's groups shift independently and in parallel)
# ---------------------------------------------------------------------------

def _roll(x, shift):
    """Last-axis roll: out[..., c] = x[..., c - shift] (np.roll
    semantics), applied to every leading row independently.
    ``pltpu.roll`` requires a non-negative shift; circularity makes
    ``-k`` equivalent to ``Cf - k``.  3-D inputs are viewed 2-D first —
    collapsing leading axes is layout-preserving (tiling only involves
    the last two dims, and the collapsed sublane axis is a multiple of
    the sublane tile)."""
    shift = int(shift) % x.shape[-1]
    if shift == 0:
        return x
    if x.ndim > 2:
        flat = x.reshape(-1, x.shape[-1])
        return pltpu.roll(flat, shift, axis=1).reshape(x.shape)
    return pltpu.roll(x, shift, axis=x.ndim - 1)


def _sroll(x, shift):
    """Sublane (row) roll on [R, Cf]: out[r] = x[r - shift].  Verified
    safe on the remote Mosaic compiler (validation/probe_mosaic3.py)."""
    shift = int(shift) % x.shape[0]
    if shift == 0:
        return x
    return pltpu.roll(x, shift, axis=0)


def _seg_scan(x, p, Np, op):
    """Inclusive segmented Hillis-Steele scan within Np-lane groups.
    ``p`` is the within-group slot index per lane ([R, Cf] int32)."""
    k = 1
    while k < Np:
        x = jnp.where(p >= k, op(x, _roll(x, k)), x)
        k *= 2
    return x


def _seg_last_bcast(x, p, Np):
    """Broadcast each group's LAST lane value to the whole group."""
    k = 1
    while k < Np:
        x = jnp.where(p <= Np - 1 - k, _roll(x, -k), x)
        k *= 2
    return x


def _seg_leader_bcast(x, p, Np):
    """Broadcast each group's FIRST lane value to the whole group."""
    k = 1
    while k < Np:
        x = jnp.where(p >= k, _roll(x, k), x)
        k *= 2
    return x


def _roll_dict(x, p, Np):
    """All within-group member views of ``x``: entry ``o`` holds, at
    every lane (g, q), the value of member (g, (q+o) mod Np) — the
    lo/hi roll pair pre-merged by the static in-segment mask, so each
    of the (up to six) gathers per sweep costs ONE select per offset
    instead of re-merging the pair every time."""
    out = [x]
    for o in range(1, Np):
        lo = _roll(x, -o)                        # lane c + o
        hi = _roll(x, Np - o)                    # lane c + o - Np
        out.append(jnp.where(p + o < Np, lo, hi))
    return out


def _seg_gather(rolls, idx, p, Np):
    """Within-group dynamic gather: out[..., c] = x[..., g(c)·Np + idx[c]]
    from a precomputed ``_roll_dict``.  ``idx``/``p`` are [R, Cf].
    Running select over the member views — every lane matches exactly
    one offset, so no arithmetic touches the values (any bit pattern
    transports exactly)."""
    off = jnp.remainder(idx - p, Np)             # within-group offset
    acc = rolls[0]
    for o in range(1, Np):
        acc = jnp.where(off == o, rolls[o], acc)
    return acc


def _seg_gather_bin(x, idx, p, Np):
    """Within-group dynamic gather by BINARY offset decomposition:
    ``out[..., c] = x[..., g(c)·Np + idx[c]]`` in ⌈log₂ Np⌉ stages —
    stage k applies an in-group roll by 2ᵏ (lo/hi global-roll pair
    merged by the CONSTANT in-segment mask) to the lanes whose offset
    has bit k set.  In-group rolls compose additively mod Np, so the
    accumulated shift per lane is exactly ``off``.  vs the
    ``_roll_dict`` + linear-select form: O(log Np) rolls/selects per
    gather instead of O(Np) shared build + O(Np) selects — measured
    2028 → ~1100 select-class slots per iteration on the 4k-chain
    Gaussian (Np=16), the top cost the class-resolved roofline
    surfaced (verdict r4 item 2).  Pure transport: no arithmetic
    touches the values."""
    off = jnp.remainder(idx - p, Np)             # [R, Cf] in [0, Np)
    acc = x
    k = 1
    while k < Np:
        lo = _roll(acc, -k)                      # lane c + k (in row)
        hi = _roll(acc, Np - k)                  # lane c + k - Np
        ingroup = jnp.where(p + k < Np, lo, hi)   # iota-derived mask
        acc = jnp.where((off & k) != 0, ingroup, acc)
        k *= 2
    return acc


def _seg_gather_bin_multi(x, idxs, p, Np):
    """n simultaneous within-group gathers of ``x [d, R, Cf]`` by
    STACKING them on the leading axis: ``len(idxs)`` networks share one
    ⌈log₂ Np⌉-stage roll pipeline on ``[n·d, R, Cf]``, so the ROLL OP
    count is 2·⌈log₂ Np⌉ total instead of per gather.  Rolls are the
    kernel's slowest op class (~100 ns per op nearly independent of
    size ≤ 16 vregs — validation/vpu_peak.py roll scaling, 2026-08-20),
    so fewer/fatter rolls beat more/thinner ones even at equal element
    volume.  Returns the n gathered ``[d, R, Cf]`` views."""
    d = x.shape[0]
    n = len(idxs)
    xx = jnp.concatenate([x] * n, axis=0)        # [n·d, R, Cf]
    off = jnp.concatenate(
        [jnp.broadcast_to(jnp.remainder(i - p, Np), (d,) + p.shape)
         for i in idxs])                         # [n·d, R, Cf]
    acc = xx
    k = 1
    while k < Np:
        lo = _roll(acc, -k)
        hi = _roll(acc, Np - k)
        ingroup = jnp.where(p + k < Np, lo, hi)   # iota-derived mask
        acc = jnp.where((off & k) != 0, ingroup, acc)
        k *= 2
    return [acc[j * d:(j + 1) * d] for j in range(n)]


# ---------------------------------------------------------------------------
# kernel builder
# ---------------------------------------------------------------------------

def _mig_apply(theta, w, u_row, na_f, gum, p, *, G, Np, Gr):
    """The reference migration (``src/migration.jl:11-91``) on the
    packed population: N ~ U{2..G} groups (per-group uniform ranks —
    each group's uniform is its LEADER lane's value of the per-chain
    draw ``u_row`` [R, Cf], compacted here so the kernel's unconditional
    draw is one ordinary row instead of a [G, 128] prng block),
    victim per group ∝ softmax(-w) (Gumbel-max), circular shift of
    victims along the rank order.  Routing runs in group space via
    one-hot contractions at ``Precision.HIGHEST`` — bitexact for 0/1
    operands (verified on-chip), preserving the weight ==
    logpost(theta) invariant.  -inf weights ride a separate flag
    column (a matmul would produce 0·inf = NaN)."""
    d, R, Cf = theta.shape
    dt = theta.dtype
    HIGH = jax.lax.Precision.HIGHEST
    inf32 = np.float32(np.inf)
    ones = jnp.ones((G, 1), dt)

    def brow(col):                  # [G,1] -> [G,G]: out[i,j]=col[j]
        return jax.lax.dot_general(ones, col, (((1,), (1,)), ((), ())),
                                   precision=HIGH)

    def bcol(col):                  # [G,1] -> [G,G]: out[i,j]=col[i]
        return jax.lax.dot_general(col, ones, (((1,), (1,)), ((), ())),
                                   precision=HIGH)

    # ---- lane -> group compaction (shared by the rank uniforms and the
    # victim transport below): out[g] = v[row_of(g), leader_lane(g)] via
    # a one-hot NT gemm + row-select mask (exact: one-hot × value).
    gcI = jax.lax.broadcasted_iota(jnp.int32, (G, Cf), 0)
    lcI = jax.lax.broadcasted_iota(jnp.int32, (G, Cf), 1)
    A_leader = (lcI == (gcI % Gr) * Np).astype(dt)            # [G,Cf]
    gRI = jax.lax.broadcasted_iota(jnp.int32, (G, R), 0)
    rRI = jax.lax.broadcasted_iota(jnp.int32, (G, R), 1)
    row_of_g = ((gRI // Gr) == rRI).astype(dt)                # [G,R]

    def compact(v):                 # [R,Cf] leader-lane values -> [G,1]
        out_gr = jax.lax.dot_general(A_leader, v,
                                     (((1,), (1,)), ((), ())),
                                     precision=HIGH)          # [G,R]
        return jnp.sum(out_gr * row_of_g, axis=1, keepdims=True)

    u_col = compact(u_row)                                    # [G,1]

    # rank of each group's uniform (ties broken by index: a strict
    # total order, so ranks are a permutation — select_groups,
    # migration.jl:31-35 draws the subset; the first N ranks are it)
    I2 = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
    J2 = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    Uj, Ui = brow(u_col), bcol(u_col)
    less = (Uj < Ui) | ((Uj == Ui) & (J2 < I2))
    rank = jnp.sum(less.astype(dt), axis=1, keepdims=True)    # [G,1]
    na_col = jax.lax.dot_general(ones, na_f, (((1,), (1,)), ((), ())),
                                 precision=HIGH)              # [G,1]
    active = rank < na_col
    # rank r receives from rank (r-1) mod N among the active; inactive
    # groups self-route (identity)
    src = jnp.where(active,
                    jnp.where(rank >= 1.0, rank - 1.0, na_col - 1.0),
                    rank)
    route = (brow(rank) == bcol(src)).astype(dt)              # [G,G]

    # victim per group: Gumbel-max over -w (select_particle,
    # migration.jl:64-70; -inf weight -> +inf logit, picked first)
    s = gum - w
    m = _seg_last_bcast(_seg_scan(s, p, Np, jnp.maximum), p, Np)
    cand = jnp.where(s == m, p, Np)
    vid = _seg_last_bcast(_seg_scan(cand, p, Np, jnp.minimum), p, Np)
    vmask = p == vid                                          # [R,Cf]

    neg = (w == -inf32).astype(dt)
    wf = jnp.where(w == -inf32, jnp.zeros_like(w), w)
    quants = [theta[i] for i in range(d)] + [wf, neg]
    Dq = d + 2

    def vict(q):                    # victim value bcast over its group
        z = jnp.where(vmask, q, jnp.zeros_like(q))
        return _seg_last_bcast(_seg_scan(z, p, Np, jnp.add), p, Np)

    vsel = [vict(q) for q in quants]

    # ---- lane -> group transport, per quantity -----------------------
    # All contractions are the VERIFIED NT-gemm/outer-product classes
    # (contract dim1 × dim1, one-hot or [·,1] operands — the only dot
    # orientations the remote Mosaic compiler demonstrably handles;
    # TN-orientation dots and [1,Cf]-broadcast arithmetic crashed it).
    # Compaction is the shared `compact` above (victim values were
    # group-broadcast by `vict`, so their leader lane carries them).

    # routing: routed[g] = sel[source(g)] — elementwise mask + lane
    # reduce over the one-hot route rows (exactly one nonzero per row,
    # so the sum is an exact copy; no matmul touches the values)
    def route_col(col):             # [G,1] -> [G,1]
        return jnp.sum(route * brow(col), axis=1, keepdims=True)

    # expansion: every lane of group g gets col[g].  Broadcast the
    # column across rows (outer product with a ones column), align each
    # sublane row's Gr-block by a lane roll, then repeat each group
    # value Np times along lanes with a one-hot NT gemm.
    ones_R = jnp.ones((R, 1), dt)
    rowRG = jax.lax.broadcasted_iota(jnp.int32, (R, G), 0)
    lS = jax.lax.broadcasted_iota(jnp.int32, (Cf, Gr), 0)
    jS = jax.lax.broadcasted_iota(jnp.int32, (Cf, Gr), 1)
    S_rep = ((lS // Np) == jS).astype(dt)                     # [Cf,Gr]

    def expand(col):                # [G,1] -> [R,Cf]
        big = jax.lax.dot_general(ones_R, col, (((1,), (1,)), ((), ())),
                                  precision=HIGH)             # [R,G]
        x = big
        for r in range(1, R):
            x = jnp.where(rowRG == r, _roll(big, (G - r * Gr) % G), x)
        block = x[:, :Gr]                                     # [R,Gr]
        return jax.lax.dot_general(block, S_rep,
                                   (((1,), (1,)), ((), ())),
                                   precision=HIGH)            # [R,Cf]

    exp = [expand(route_col(compact(v))) for v in vsel]

    # each group's victim slot receives its source group's victim
    # (shift_particles!, migration.jl:84-91); self-routes are no-ops
    new_theta = [jnp.where(vmask, exp[i], theta[i]) for i in range(d)]
    w_routed = jnp.where(exp[d + 1] > np.float32(0.5), -inf32, exp[d])
    new_w = jnp.where(vmask, w_routed, w)
    return new_theta, new_w


def mig_sorted_ok(G, Np) -> bool:
    """Static predicate: can migration run in-kernel via the bitonic
    rank network (:func:`_mig_apply_sorted`)?  Power-of-two ``Gr = G//8``
    (groups per sublane row) runs the native row-major XOR lattice;
    ANY other Gr runs the COMPACT geometry padded to the next
    power-of-two lattice with +inf-keyed virtual elements (round 4) —
    so every fused layout (G is always a multiple of 8 there) migrates
    in-kernel, at any size and in min-mode too.  ``Np`` may be anything
    (strided exchanges move whole Np-lane blocks by ±step·Np lane
    rolls; compact exchanges move single leader lanes)."""
    return G % _R == 0 and G // _R >= 1


def _gr_pow2(G) -> bool:
    Gr = G // _R
    return (Gr & (Gr - 1)) == 0


# compact-sort threshold: once Gr (groups per sublane row) is a whole
# multiple of the 128-lane vreg width, the sort runs on sliced [8, Gr]
# arrays — Np× fewer roll-vregs per stage.  (The full-width "strided"
# sort at G=4096 spent ~33 µs/step amortized in the rolls alone.)
COMPACT_MIN_GR = 128

def _compress_mats(Np):
    """One-hot matrices for the MXU compress/widen (gemm geometry):
    ``Pt [128, 128·Np]`` with ``Pt[l, c] = (c == l·Np)`` contracts a
    ``128·Np``-lane population slice down to its 128 leader lanes
    (NT gemm, the verified-exact orientation), and ``Pw = Ptᵀ`` spreads
    128 compact lanes back to the leader positions of a ``128·Np``-lane
    slice."""
    K = 128 * Np
    Pt = np.zeros((128, K), np.float32)
    Pt[np.arange(128), np.arange(128) * Np] = 1.0
    return Pt, np.ascontiguousarray(Pt.T)


def _spread_word(Gr, Np, Cf):
    """Packed per-stage destination masks for the injective lane
    scatter ``b -> b·Np`` (widening compact-sorted results back to the
    population layout), computed by exact numpy routing simulation at
    build time.  Stage ``t`` (applied MSB→LSB) moves lanes flagged in
    bit ``t`` by ``+2^t``:  ``y = where(bit_t(word), roll(y, 2^t), y)``.
    Returns ``(T, word [8, Cf] int32)``; raises AssertionError if the
    routing ever collides (it cannot for this monotone injective map —
    asserted anyway)."""
    s = (np.arange(Gr) * (Np - 1)).astype(np.int64)
    T = max(1, int(s.max()).bit_length())
    pos = np.arange(Gr, dtype=np.int64)
    word = np.zeros(Cf, np.int32)
    for t in range(T - 1, -1, -1):
        move = ((s >> t) & 1) == 1
        pos2 = pos + (np.int64(1) << t) * move
        assert len(np.unique(pos2)) == Gr, "spread routing collision"
        word[pos2[move]] |= np.int32(1) << t
        pos = pos2
    assert np.array_equal(pos, np.arange(Gr, dtype=np.int64) * Np)
    return T, np.ascontiguousarray(np.broadcast_to(word, (_R, Cf)))


def _crow(x, jr):
    """Row roll on the last-but-one axis of a 2-D or 3-D array via the
    layout-preserving leading-dim collapse (``[Q, R, W] -> [Q·R, W]``).
    Callers pair ±jr rolls with per-row XOR selects, whose partners
    never cross a Q-block boundary (R is a power of two), so the
    collapsed wrap rows are never selected — verified on-chip
    (validation/probe_mosaic7.py)."""
    if x.ndim == 2:
        return _sroll(x, jr)
    flat = x.reshape(-1, x.shape[-1])
    out = pltpu.roll(flat, int(jr) % flat.shape[0], axis=0)
    return out.reshape(x.shape)


def _rank_cycle(ku, payloads, kidx, laneI, *, G, Gr_e, Np_e, na_f, dt):
    """Sort elements by ``(ku, element index)`` ascending, apply the
    migration cycle (position k < N receives position (k−1) mod N's
    payload), and unsort.  Elements are ``Np_e``-lane blocks, ``Gr_e``
    per sublane row, row-major index ``kidx``; ``ku``/payloads must be
    block-consistent (identical on all lanes of an element) so blocks
    move as units.  Payload entries may be 2-D ``[R, W]`` or BATCHED
    3-D ``[Q, R, W]`` — batching moves Q quantities per roll/select
    instead of issuing Q separate op chains (keys and masks stay 2-D
    and broadcast).  Bitonic exchanges at element distance ``step``
    are two lane rolls (±step·Np_e) within rows, or two row rolls
    (±step//Gr_e) across them.  The compare-exchange keep-predicate is
    int add/mod parity — bool==bool / where-on-bool crash the remote
    Mosaic compile helper (validation/probe_mosaic3/5.py)."""
    gid0 = kidx.astype(dt)                  # exact for G <= 2^24
    Wl = kidx.shape[-1]                     # lane width of the grid

    def xchg(v, step, bit0):
        if step < Gr_e:
            j = step * Np_e
            return jnp.where(bit0 == 0, _roll(v, -j), _roll(v, j))
        jr = step // Gr_e
        return jnp.where(bit0 == 0, _crow(v, -jr), _crow(v, jr))

    def bitonic_unrolled(key, tie, payloads):
        phase = 1
        while phase < G:
            step = phase
            while step >= 1:
                bit0 = (kidx // step) % 2
                pk = xchg(key, step, bit0)
                pt = xchg(tie, step, bit0) if tie is not None else None
                pp = [xchg(v, step, bit0) for v in payloads]
                if tie is None:
                    less = key < pk
                else:
                    less = (key < pk) | ((key == pk) & (tie < pt))
                parity = (bit0 + kidx // (2 * phase)) % 2
                keep = (less.astype(jnp.int32) + parity) % 2 == 1
                key = jnp.where(keep, key, pk)
                if tie is not None:
                    tie = jnp.where(keep, tie, pt)
                payloads = [jnp.where(keep, v, q)
                            for v, q in zip(payloads, pp)]
                step //= 2
            phase *= 2
        return key, tie, payloads

    def _ldyn(v, sh):
        """Dynamic lane roll, any ndim (leading-collapse)."""
        if v.ndim == 2:
            return pltpu.roll(v, sh, axis=1)
        flat = v.reshape(-1, v.shape[-1])
        return pltpu.roll(flat, sh, axis=1).reshape(v.shape)

    def _rdyn(v, sh):
        """Dynamic collapsed row roll, any ndim; negative shifts via
        the dynamic mod."""
        flat = v.reshape(-1, v.shape[-1]) if v.ndim == 3 else v
        out = pltpu.roll(flat, sh % flat.shape[0], axis=0)
        return out.reshape(v.shape)

    def bitonic_loop(key, tie, payloads):
        """The same network, loop-rolled: one ``lax.fori_loop`` stage
        body with dynamic rotate distances instead of ~log²(G)/2
        unrolled stages.  Bitwise-identical results, ~50x less code.
        At G=4096 the unrolled form's instruction footprint costs
        ~20 µs/step even on UNfired iterations (plus 20-minute remote
        compiles) — measured α=0.001 36.8 µs/step vs the 16.4 α=0
        floor, dropping to 17.0 with this loop.  Dynamic rotates are
        ~4x slower per exchange than static ones (fired cost 100 vs 22
        µs/event), so the loop only wins where the code-size penalty
        bites — G ≥ 4096; a phase-structured hybrid (static row stages
        + per-phase lane loops) was tried and re-crossed the
        instruction cliff (35.7 µs/step unfired).  Needs ≥ one full
        vreg of lanes: dynamic lane rotates crash the remote compiler
        below 128 lanes (validation/probe_mosaic8.py)."""
        n_ph = G.bit_length() - 1
        S = n_ph * (n_ph + 1) // 2

        def body(_, carry):
            key, tie, pays, logphase, logstep = carry
            step = 1 << logstep
            J = step * Np_e                 # lane distance of the pair
            lsh = J % Wl                    # in-row component (0 if big)
            rsh = J // Wl                   # cross-row component
            bit0 = (kidx // step) % 2

            def pxc(v):                     # partner values at kidx^step
                plus = _rdyn(_ldyn(v, (Wl - lsh) % Wl), -rsh)
                minus = _rdyn(_ldyn(v, lsh), rsh)
                return jnp.where(bit0 == 0, plus, minus)

            pk = pxc(key)
            pt = pxc(tie) if tie is not None else None
            pp = [pxc(v) for v in pays]
            if tie is None:
                less = key < pk
            else:
                less = (key < pk) | ((key == pk) & (tie < pt))
            parity = (bit0 + kidx // (2 << logphase)) % 2
            keep = (less.astype(jnp.int32) + parity) % 2 == 1
            key = jnp.where(keep, key, pk)
            if tie is not None:
                tie = jnp.where(keep, tie, pt)
            pays = [jnp.where(keep, v, q) for v, q in zip(pays, pp)]
            nstep = logstep - 1
            nphase = jnp.where(nstep < 0, logphase + 1, logphase)
            nstep = jnp.where(nstep < 0, nphase, nstep)
            return (key, tie, pays, nphase, nstep)

        key, tie, payloads, _, _ = jax.lax.fori_loop(
            0, S, body, (key, tie, payloads, jnp.int32(0), jnp.int32(0)))
        return key, tie, payloads

    bitonic = (bitonic_loop if Wl >= 128 and G >= 4096
               else bitonic_unrolled)

    _, gid_s, vals_s = bitonic(ku, gid0, payloads)

    # rank-space cycle over the first N positions: position k receives
    # position k-1's value (position 0 receives position N-1's).  The
    # wrap value (position N-1, a dynamic location) reaches position 0
    # by flag-guided select-doubling — log₂(G) roll stages, no
    # reductions (per-leading-dim scalar broadcasts crash the remote
    # compiler, probe_mosaic7.py) and no arithmetic on the payload
    # (±inf transports exactly).
    na = jnp.sum(na_f)                      # scalar N as f32
    pos_f = kidx.astype(dt)
    # all Np_e lanes of position N-1 flag (payloads are block-consistent,
    # so duplicates are harmless — and the victim lane that ultimately
    # consumes the value is NOT necessarily the leader lane)
    pick = pos_f == na - np.float32(1.0)
    flag0 = pick.astype(jnp.int32)

    rowI = kidx // Gr_e                     # sublane row, [R, W] int

    def crow_circ(v, jr):
        """Row roll circular WITHIN each leading block: out[.., r, :] =
        v[.., (r - jr) mod R, :].  For 3-D the plain collapsed roll
        would leak across blocks at the wrap rows; pairing two
        collapsed rolls with a row select keeps it in-block."""
        if v.ndim == 2:
            return _sroll(v, jr)
        R = v.shape[-2]
        return jnp.where(rowI < jr, _crow(v, jr - R), _crow(v, jr))

    def kroll(v, s):
        """CIRCULAR roll by +s in row-major element-index space."""
        j = s * Np_e
        if j < Gr_e * Np_e:
            v1 = _roll(v, j)
            fix = crow_circ(v1, 1)
            return jnp.where(laneI < j, fix, v1)
        return crow_circ(v, j // (Gr_e * Np_e))

    # the flag chain is payload-independent: precompute each stage's
    # arrival mask once and share it across the payload broadcasts
    rfs = []
    flag = flag0
    s = 1
    while s < G:
        rf = kroll(flag, s)
        rfs.append((s, rf))
        flag = jnp.maximum(flag, rf)
        s *= 2

    routed = []
    for v in vals_s:
        v1 = kroll(v, 1)                    # element k-1 everywhere
        # broadcast position N-1's value to all lanes (only position 0
        # consumes it)
        val = jnp.where(pick, v, jnp.zeros_like(v))
        for s, rf in rfs:
            val = jnp.where(rf == 1, kroll(val, s), val)
        nv = jnp.where(kidx == 0, val, v1)
        routed.append(jnp.where(pos_f < na, nv, v))

    # unsort: key gid (a permutation — strict order, no tie key)
    _, _, back = bitonic(gid_s, None, routed)
    return back


def _mig_apply_sorted(theta, w, u_row, na_f, gum, p, *, G, Np, Gr,
                      spread=None, gemm=None):
    """The reference migration (``src/migration.jl:11-91``) as an
    O(G log² G) bitonic rank network — the any-scale replacement for
    :func:`_mig_apply`, whose [G, G] one-hot rank/route matrices grow
    quadratically (and stop fitting VMEM around G ≈ 2k; at G = 4096
    they would be 64 MB each).

    Same semantics, same draws, same permutation: groups rank by
    (leader-lane uniform, group index) ascending; the first N ranks
    form the migration cycle (rank r's victim slot receives rank
    (r−1) mod N's victim); victims by Gumbel-max of −w, first index on
    ties.  All RANK/ROUTE value movement is roll+select (never
    arithmetic), so every f32 bit pattern — including ±inf weights —
    transports exactly; no −inf flag column is needed, and min-mode
    optimization (+inf out-of-bounds scores) works too.  One exception:
    the victim group-broadcast (``vict``) uses an additive segmented
    scan, so a ``-0.0`` payload canonicalizes to ``+0.0`` before
    transport (matching the one-hot variant's behavior; ±inf/NaN are
    unaffected).

    Three geometries (identical permutation; strided/compact-barrel are
    bitexact, compact-gemm differs only in that finite ``-0.0`` weights
    canonicalize — see below):

    * strided (``spread=None, gemm=None``): elements are the Np-lane
      group blocks themselves, keys leader-broadcast so blocks move as
      units — no layout changes, but every exchange rolls full-width
      arrays;
    * compact-barrel (``spread=(T, word)``): leader values
      barrel-compress (destination-indexed shifts with the linear shift
      ``s(b) = b·(Np−1)`` — iota masks) into sliced ``[8, Gr]`` arrays,
      the sorts run there at Np× fewer roll-vregs per stage, and
      results widen back by lane-concat + the :func:`_spread_word`
      scatter, then a leader broadcast;
    * compact-gemm (``gemm=(Pt, Pw)``, requires ``Gr % 128 == 0``):
      the compress/widen run as exact one-hot NT gemms on the MXU
      (:func:`_compress_mats`) — ~16 dot ops instead of ~28 full-width
      roll/select stages, which at G >= 8192 is the difference between
      a ~21 µs/step UNFIRED instruction-footprint penalty and ~none
      (measured, validation/mig8192_bisect.py).  ±inf weights ride 0/1
      flag columns through the gemms (0·inf would be NaN); transported
      values are otherwise exact (one-hot × value at HIGHEST), with
      ``-0.0 → +0.0`` canonicalization — which the additive ``vict``
      transport already applies to every payload on all geometries.
      PRECONDITION of the gemm geometry: no NaN in theta/w — a NaN
      would spread through a whole 128-group slice via 0·NaN (the
      roll/select geometries keep it lane-local).  The kernel
      guarantees this upstream: fitness NaN-masks to -inf and rejected
      out-of-bounds proposals never enter theta."""
    d, R, Cf = theta.shape
    dt = theta.dtype

    rowI = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 0)
    laneI = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 1)
    # victim per group: Gumbel-max over -w (select_particle,
    # migration.jl:64-70; -inf weight -> +inf logit, picked first)
    s = gum - w
    m = _seg_last_bcast(_seg_scan(s, p, Np, jnp.maximum), p, Np)
    cand = jnp.where(s == m, p, Np)
    vid = _seg_last_bcast(_seg_scan(cand, p, Np, jnp.minimum), p, Np)
    vmask = p == vid

    def vict(q):                    # victim value bcast over its group
        # q may be 3-D [d, R, Cf] — one seg-op chain moves all d rows
        # (2-D masks broadcast against the trailing axes)
        z = jnp.where(vmask, q, jnp.zeros_like(q))
        return _seg_last_bcast(_seg_scan(z, p, Np, jnp.add), p, Np)

    # every transported quantity rides ONE stacked [d+1, R, Cf] array
    # through the seg/compress/sort/widen chains: N quantities cost one
    # batched op chain instead of N — the region's unrolled full-width
    # stages are the dominant UNFIRED cost at big G (instruction fetch
    # for the branched-over body, NOTES.md "instruction-footprint
    # cliff"), so fewer/larger ops cut both code size and fired work
    twv = vict(jnp.concatenate([theta, w[None]], axis=0))

    if spread is None and gemm is None:
        # group sort key: the leader lane's uniform, broadcast so whole
        # blocks carry consistent keys (exchanges decide per-lane)
        ku = _seg_leader_bcast(u_row, p, Np)
        kidx = rowI * Gr + laneI // Np
        (r_all,) = _rank_cycle(ku, [twv], kidx, laneI, G=G, Gr_e=Gr,
                               Np_e=Np, na_f=na_f, dt=dt)
        t_b, w_b = r_all[:d], r_all[d]
    else:
        inf32 = np.float32(np.inf)
        if gemm is not None:
            # MXU compress: one exact one-hot NT gemm per 128·Np-lane
            # slice.  ±inf weights cannot ride a gemm (0·inf = NaN), so
            # w splits into a finite part + 0/1 flag columns; payload
            # rows through the sort become [theta(d), wf, neg, pos].
            Pt, Pw = gemm
            HIGH = jax.lax.Precision.HIGHEST
            KK = 128 * Np
            Q = Gr // 128
            wv = twv[d]
            neg = (wv == -inf32).astype(dt)
            pos = (wv == inf32).astype(dt)
            wf = jnp.where((neg + pos) > np.float32(0.5),
                           jnp.zeros_like(wv), wv)
            pack = jnp.concatenate(
                [twv[:d], wf[None], neg[None], pos[None], u_row[None]],
                axis=0)
            flat = pack.reshape((d + 4) * R, Cf)
            cc = jnp.concatenate(
                [jax.lax.dot_general(flat[:, q * KK:(q + 1) * KK], Pt,
                                     (((1,), (1,)), ((), ())),
                                     precision=HIGH)
                 for q in range(Q)], axis=1).reshape(d + 4, R, Gr)
            ku_c = cc[d + 3]             # [R, Gr] sort key
            twv_c = cc[:d + 3]           # [d+3, R, Gr] payloads
            n_pay = d + 3
        else:
            T_sp, word = spread
            # barrel-compress leader lanes: out[..., b] = x[..., b·Np] —
            # the destination-indexed shift s(b) = b·(Np−1) is linear,
            # so the LSB→MSB stage masks are exact iota expressions
            s_lane = laneI * (Np - 1)
            smax = (Gr - 1) * (Np - 1)

            def compress(x):
                y = x
                t = 0
                while (1 << t) <= smax:
                    take = (s_lane // (1 << t)) % 2
                    y = jnp.where(take == 1, _roll(y, -(1 << t)), y)
                    t += 1
                return y[..., :Gr]

            pc = compress(jnp.concatenate([twv, u_row[None]], axis=0))
            ku_c = pc[d + 1]             # [R, Gr] sort key
            twv_c = pc[:d + 1]           # [d+1, R, Gr] victim payloads
            n_pay = d + 1
        # non-power-of-two Gr: pad the compact arrays to the next
        # power-of-two lattice with +inf-keyed VIRTUAL elements — they
        # sort past every real group (uniform keys < 1 < inf), the cycle
        # only touches the first N ≤ G real ranks, and the gid unsort
        # returns them to the pad lanes, which are then sliced off.
        # Real-element tie-break order is preserved: r·Gr2+b is monotone
        # in (r, b) exactly like r·Gr+b.  Lane-concat of [narrow, pad]
        # is a verified-safe construct (validation/probe_mosaic*).
        Gr2 = 1 << (Gr - 1).bit_length()         # next power of two

        def lane_pad(x, fill):
            if Gr2 == Gr:
                return x
            flat = x.reshape(-1, Gr)
            padv = jnp.full((flat.shape[0], Gr2 - Gr), fill, x.dtype)
            return jnp.concatenate([flat, padv], axis=1).reshape(
                x.shape[:-1] + (Gr2,))

        ku_c = lane_pad(ku_c, np.float32(np.inf))
        twv_c = lane_pad(twv_c, 0.0)
        rowC = jax.lax.broadcasted_iota(jnp.int32, (R, Gr2), 0)
        laneC = jax.lax.broadcasted_iota(jnp.int32, (R, Gr2), 1)
        kidx_c = rowC * Gr2 + laneC
        (r_c,) = _rank_cycle(ku_c, [twv_c], kidx_c, laneC,
                             G=_R * Gr2, Gr_e=Gr2, Np_e=1, na_f=na_f,
                             dt=dt)
        if Gr2 != Gr:
            r_c = r_c[..., :Gr]

        if gemm is not None:
            # MXU widen: compact lanes back to the leader positions of
            # each 128·Np-lane slice (non-leaders get exact 0), then a
            # leader broadcast; ±inf weights reassemble from the flags
            flatc = r_c.reshape(n_pay * R, Gr)
            wide = jnp.concatenate(
                [jax.lax.dot_general(flatc[:, q * 128:(q + 1) * 128],
                                     Pw, (((1,), (1,)), ((), ())),
                                     precision=HIGH)
                 for q in range(Q)], axis=1).reshape(n_pay, R, Cf)
            wide = _seg_leader_bcast(wide, p, Np)
            t_b = wide[:d]
            w_b = jnp.where(wide[d + 1] > np.float32(0.5), -inf32,
                            jnp.where(wide[d + 2] > np.float32(0.5),
                                      inf32, wide[d]))
        else:
            def widen(v_c):
                flat = v_c.reshape(-1, Gr)   # leading-collapse: 2-D concat
                y = jnp.concatenate(
                    [flat,
                     jnp.zeros((flat.shape[0], Cf - Gr), v_c.dtype)],
                    axis=1).reshape(v_c.shape[:-1] + (Cf,))
                for t in range(T_sp - 1, -1, -1):
                    take = (word // (1 << t)) % 2
                    y = jnp.where(take == 1, _roll(y, 1 << t), y)
                return _seg_leader_bcast(y, p, Np)

            r_w = widen(r_c)                 # [d+1, R, Cf], one chain
            t_b, w_b = r_w[:d], r_w[d]

    new_theta = [jnp.where(vmask, t_b[i], theta[i]) for i in range(d)]
    new_w = jnp.where(vmask, w_b, w)
    return new_theta, new_w


def build_migration_kernel(G, Np, d, interpret=True, variant="onehot",
                           force_barrel=False):
    """Standalone kernel around :func:`_mig_apply` for exactness tests
    (interpret mode on CPU; real lowering for the on-chip bitexactness
    check).  Inputs are the raw migration draws, so a numpy oracle can
    compute the expected output deterministically:

    ``(theta3 [d,R,Cf], w3 [R,Cf], u_row [R,Cf] per-chain uniforms
    (group g ranks by its leader lane's value), na_f [1,1] N-as-float,
    gum [R,Cf] gumbels) -> (new_theta3, new_w3)``.

    ``variant``: ``"onehot"`` = the [G, G] matrix formulation
    (:func:`_mig_apply`), ``"sorted"`` = the bitonic rank network
    (:func:`_mig_apply_sorted`).  Same permutation.
    ``force_barrel`` pins the compact-barrel geometry where the gemm
    one would be chosen (for A/B exactness tests).
    """
    if variant == "sorted" and not mig_sorted_ok(G, Np):
        raise ValueError(f"sorted migration needs G a multiple of 8; "
                         f"got G={G} (non-power-of-two Gr runs the "
                         f"padded compact lattice automatically)")
    C = G * Np
    R = _R
    Cf = C // R
    Gr = Cf // Np
    dt = jnp.float32
    extra = []
    sp_T = None
    use_gemm = (variant == "sorted" and Gr % COMPACT_MIN_GR == 0
                and not force_barrel)
    if use_gemm:
        extra = list(_compress_mats(Np))
    elif variant == "sorted" and (Gr % COMPACT_MIN_GR == 0
                                  or Gr & (Gr - 1)):
        # compact geometry: wide power-of-two layouts (perf) and EVERY
        # non-power-of-two Gr (the padded lattice only exists there)
        sp_T, word_np = _spread_word(Gr, Np, Cf)
        extra = [word_np]

    def kernel(t_ref, w_ref, u_ref, na_ref, g_ref, *rest):
        if extra:
            ex_refs, (out_t, out_w) = rest[:len(extra)], rest[len(extra):]
        else:
            out_t, out_w = rest
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 1)
        p = lane % Np
        if variant == "onehot":
            nt, nw = _mig_apply(t_ref[:], w_ref[:], u_ref[:], na_ref[:],
                                g_ref[:], p, G=G, Np=Np, Gr=Gr)
        else:
            sp = gm = None
            if use_gemm:
                gm = (ex_refs[0][:], ex_refs[1][:])
            elif extra:
                sp = (sp_T, ex_refs[0][:])
            nt, nw = _mig_apply_sorted(t_ref[:], w_ref[:], u_ref[:],
                                       na_ref[:], g_ref[:], p, G=G,
                                       Np=Np, Gr=Gr, spread=sp,
                                       gemm=gm)
        for i in range(d):
            out_t[i] = nt[i]
        out_w[:] = nw

    call = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((d, R, Cf), dt),
                   jax.ShapeDtypeStruct((R, Cf), dt)),
        interpret=pltpu.InterpretParams() if interpret else False,
        # the sorted variant's bitonic stages hold ~30 MB of scoped
        # temporaries at G=4096 — same raised budget as build_fused_step
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024))
    if not extra:
        return call
    consts = [jnp.asarray(e) for e in extra]
    return lambda t3, w3, u, na, gum: call(t3, w3, u, na, gum, *consts)


# ---------------------------------------------------------------------------
# in-kernel replacements for Mosaic-unsupported math primitives
# (substituted into the density replay by build_fused_step's _overrides)
# ---------------------------------------------------------------------------

def _erf32(x):
    """float32 erf as XLA's own rational approximation (ErfImpl32,
    xla/client/lib/math.cc) with saturation at |x|=3.8 — Mosaic has no
    erf lowering.  Max abs deviation from the XLA primitive: 4.8e-7
    (~4 ulp at 1.0), verified in ``tests/test_fused_step.py``."""
    alpha = (0.00022905065861350646, 0.0034082910107109506,
             0.050955695062380861, 0.18520832239976145,
             1.128379143519084)
    beta = (-1.1791602954361697e-7, 0.000023547966471313185,
            0.0010179625278914885, 0.014070470171167667,
            0.11098505178285362, 0.49746925110067538, 1.0)
    xc = jnp.clip(x, -3.8, 3.8)
    x2 = xc * xc

    def poly(cs):
        r = jnp.full_like(x2, np.float32(cs[0]))
        for c in cs[1:]:
            r = r * x2 + np.float32(c)
        return r

    rat = xc * poly(alpha) / poly(beta)
    return jnp.where(jnp.abs(x) >= np.float32(3.8), jnp.sign(x), rat)

def _erfc32(x):
    """float32 erfc via Abramowitz & Stegun 7.1.26 (|abs err| < 6e-7;
    tail-relative error grows to ~1e-2 by |x|≈5, comparable to the
    f32 cancellation the per-cell path already incurs computing
    1-cdf).  Φ(z) = 0.5·erfc(-z/√2) is how jax.scipy lowers norm.cdf."""
    from ..utils import dists as _d
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + np.float32(_d.AS_ERFC_P) * ax)
    y = jnp.exp(-ax * ax) * _d.as_erfc_poly(t)
    return jnp.where(x >= 0, y, np.float32(2.0) - y)

def _lgamma32(x):
    """float32 log-gamma — Mosaic has no lgamma lowering.  Shift-up
    recurrence to z = x+n (n = ⌈max(8−x, 0)⌉, so only the terms below
    8 enter the product) then a 3-term Stirling series (series
    truncation < 3e-10 at z ≥ 8; f32 roundoff dominates at ~2 ulp,
    verified vs scipy in tests/test_fused_step.py up to x = 1e6).  A
    FIXED 8-term shift overflowed the f32 product at x ≥ ~6.3e4 and
    returned −inf (code-review r4); the masked shift keeps the product
    ≤ ~8·9·…·15 at any x.  Valid for x > 0; non-positive x yields
    NaN/±inf garbage exactly where the true lgamma has poles — zoo
    densities where-mask those lanes (e.g. the discrete binomial's
    N < k reject)."""
    n = jnp.ceil(jnp.maximum(np.float32(8.0) - x, np.float32(0.0)))
    prod = jnp.where(n > 0, x, np.float32(1.0))
    for i in range(1, 8):
        fi = np.float32(float(i))
        prod = prod * jnp.where(fi < n, x + fi, np.float32(1.0))
    z = x + n
    zi = np.float32(1.0) / z
    zi2 = zi * zi
    series = zi * (np.float32(1.0 / 12.0)
                   + zi2 * (np.float32(-1.0 / 360.0)
                            + zi2 * np.float32(1.0 / 1260.0)))
    lg = ((z - np.float32(0.5)) * jnp.log(z) - z
          + np.float32(0.5 * np.log(2.0 * np.pi)) + series)
    return lg - jnp.log(prod)

_overrides = {"erf": lambda invals, params: [_erf32(invals[0])],
              "erfc": lambda invals, params: [_erfc32(invals[0])],
              "lgamma": lambda invals, params: [_lgamma32(invals[0])]}
_call_prims = ("pjit", "closed_call", "core_call", "custom_jvp_call",
               "custom_vjp_call", "custom_vjp_call_jaxpr", "remat",
               "checkpoint")


def build_fused_step(model, de, spec, interpret=None, K=1,
                     mig_in_kernel=False, emit="all", hist_S=None,
                     hist_stream=False, phase="all", mig_replay=False):
    """Returns ``kernel_call(theta3 [d,R,Cf], weight3 [R,Cf], key2 [2]
    uint32, it scalar, fire [1,1] int32) -> (theta_traj [K,d,R,Cf],
    w_traj [K,R,Cf], accept [K,R,Cf] bool, fire_out [1,1])`` — ``K``
    fused iterations per kernel launch in the sublane-packed chain
    layout (R=8 rows, Cf=C/8 lanes; chain c ↔ row c//Cf, lane c%Cf),
    with the population carried across the grid in VMEM scratch.
    Raises on trace failure (caller falls back).

    Resample (DE-MCz) configurations take the PADDED layout (module
    constants above :func:`_resample_supported`): ``hist_S`` is the
    packed history slab count and the call signature gains a trailing
    ``hist [S, d, 128]`` argument and output — one full HBM↔VMEM DMA of
    the history per launch, per-iteration in-VMEM row gathers/writes,
    partner indices precomputed in XLA (``resample_flat_indices``, the
    same without-replacement semantics as the XLA step) and shipped
    through SMEM.  Reference: ``src/crossover.jl:103-140`` (resample +
    snooker partner draws from ``de.samples``).

    ``hist_stream=True`` switches the resample path to the HBM-RESIDENT
    history engine (no VMEM ceiling — the reference's history is plain
    RAM, ``src/utilities.jl:24-41``, so any ``n_iter`` must work): the
    partner (row, chain) draws are known in XLA BEFORE the launch, so
    rows older than the launch (row < it0-1) are PRE-GATHERED in XLA
    into a compact ``[ceil(K·slots·C/128), d, 128]`` lane-packed buffer
    the kernel reads by static-order flat index, while rows written
    DURING the launch come from a small VMEM window of the
    ``(K-1)//B + 2`` slabs this launch writes (DMA'd in at k==0,
    updated per iteration, DMA'd back at k==K-1).  Only the window
    round-trips; the full history never leaves HBM.  Values fetched are
    identical to the in-VMEM engine, so the two modes are BITWISE equal
    (regression-tested).

    ``emit='last'`` shrinks the trajectory outputs to ``[1, ...]`` —
    every grid step writes the same (VMEM-resident) output block, so
    only the final iteration's values land in HBM.  This is the
    device-side ``thin``: one launch per STORED draw, K = thin
    iterations, with per-iteration HBM trajectory traffic eliminated.

    The γ₂-burnin phase switch of ``random_gamma`` (crossover.jl:164)
    runs IN-kernel under ``pl.when(it <= burnin)`` — the softmax
    base-select machinery costs nothing once past burnin, and no
    XLA-level ``lax.cond`` (a ~1 µs pipeline sync per step, NOTES.md) is
    needed.  With ``mig_in_kernel=True`` the reference's migration
    (``src/migration.jl:11-91``: N ~ U{2..G} groups, inverse-softmax
    victims, circular shift) also runs in-kernel under
    ``pl.when(fire != 0)`` — rank/route/one-hot matmuls in group space
    at ``Precision.HIGHEST`` (bitexact for 0/1 operands, verified
    on-chip) — so a ``K``-iteration launch needs no data-dependent
    branching at all.  ``fire`` is the look-ahead Bernoulli(α) gate for
    the FIRST grid step; each step draws the next gate into SMEM
    scratch and the last step exports it.

    With ``mig_in_kernel=False`` and ``K > 1`` (the mesh superstep /
    device-thin path, where migration runs at XLA level BETWEEN
    launches), the export is instead the COUNT of look-ahead gates that
    fired across the whole K-window — ``fire_in`` was already consumed
    by the boundary exchange before this launch and is ignored — so the
    caller can replay every coalesced migration event at the next
    window boundary (``sampler._build_fused_wrapped``'s ``mig_multi``).
    At ``K=1`` the two conventions coincide bitwise (one gate, count in
    {0, 1}).
    """
    if interpret is None:
        interpret = _mode() == "interpret"
    post = phase == "post"
    G, Np, d = de.n_groups, de.Np, spec.dim
    C = G * Np
    R = _R
    resample = bool(de.uses_resample)
    stream = bool(hist_stream) and resample
    # sequential (reference-exact in-place) sweep: Np masked sub-sweeps
    # per iteration — see DE.sweep; 'auto' resolves it for Np <= 4 where
    # the synchronous form's invariance bias is material
    seq = bool(de.sequential_sweep)
    n_members = de.Np if seq else 1
    if resample:
        C_real, B_hist, Cf = resample_layout(de)
        C = R * Cf                    # padded chain count (layout/draws)
        wide = C_real > RESAMPLE_CF   # multi-vreg single-row layout
        if wide and not hist_stream:
            raise ValueError("C > 128 resample runs the streaming "
                             "history engine only")
        if hist_S is None:
            raise ValueError("resample kernel needs hist_S (slab count)")
        S_hist = int(hist_S)
        n_slots = 2 + (3 if float(de.theta_snooker) > 0.0 else 0)
    else:
        C_real, Cf = C, C // R
        S_hist = n_slots = 0
        wide = False
    # one partner-draw slot set per (block sweep, member): the reference
    # draws fresh partners for every block's crossover call
    # (main.jl:174-179 -> crossover.jl sample slot)
    n_blk = (len(de.blocks)
             if de.blocks is not None and _blocking_const(de) is True
             else 1)
    n_slots_tot = n_slots * n_members * n_blk
    if stream:
        # window of slabs this launch writes (rows it0-1 .. it0+K-2)
        W_win = min((K - 1) // B_hist + 2, S_hist)
        if wide:
            # one [d, Cf] pre row per (iteration, slot): the padded
            # fetch order j = (k·slots_tot + slot)·Cf + c aligns every
            # slot's C chains to its own pre row's lanes
            n_pre = K * n_slots_tot
        else:
            # pre-gather buffer: one lane-packed [d, 128] slab per 128
            # consecutive flat fetches (static fetch order j =
            # (k·slots_tot + slot)·C + c — the SAME flat order as the
            # SMEM index array)
            n_pre = -(-(K * n_slots_tot * C_real) // Cf)
    else:
        W_win = n_pre = 0
    Gr = max(Cf // Np, 1)             # groups per sublane row (G == R·Gr)
    # migration machinery geometry: the NOMINAL group grid of the lane
    # layout.  Standard layout: G_mig == G.  Resample layout: real
    # groups are the row-0 prefix of the nominal grid; pad groups mask
    # out of the law with rank keys = 2.0 (> any real uniform — NOT
    # +inf, which would 0·inf→NaN through the one-hot gemm compactions)
    # and the N ~ U{2..G_real} draw keeps them out of the cycle.
    G_mig = R * Gr
    HIGH = jax.lax.Precision.HIGHEST  # bitexact one-hot contractions
    dt = jnp.float32
    lo_b = np.asarray(spec.lo, np.float32).reshape(d, 1)
    hi_b = np.asarray(spec.hi, np.float32).reshape(d, 1)
    eps = float(de.epsilon)
    kappa = float(de.kappa)
    beta = float(de.beta)
    sigma = float(de.sigma)
    alpha = float(de.alpha) if G > 1 else 0.0
    theta_s = float(de.theta_snooker)      # per-CHAIN snooker probability
    burnin = int(de.burnin)
    mig_in_kernel = bool(mig_in_kernel) and alpha > 0.0
    # mig_replay (round 5, verdict r4 item 3): migration stays OUT of
    # the per-iteration path (the mesh/coalesced convention — fire
    # exports the window's gate count), but the window's coalesced
    # events replay IN-kernel at k == 0 instead of in XLA between
    # launches: a dynamic-trip fori_loop applies the verified
    # _mig_apply/_mig_apply_sorted machinery ``count`` times with
    # draws from a dedicated hardware-PRNG stream (probe_mosaic11
    # validates the constructs).  Callers use it when the migration
    # group space is SHARD-LOCAL (a 1-device mesh — the gate-bench
    # structure; multi-device group spaces need the cross-shard victim
    # hop, which stays on the XLA path).  The XLA exchange's ~20
    # µs/event (kernel-count-bound argsort+gathers) drops to the
    # in-kernel event cost.
    mig_replay = bool(mig_replay) and alpha > 0.0 and not mig_in_kernel
    # K > 1 with alpha > 0 and migration OUTSIDE the kernel is the
    # coalesced mesh-window form: no exchange runs in-kernel, and the
    # fire export becomes the window's gate COUNT (docstring) for the
    # caller's boundary replay (sampler mig_multi)
    # acceptance mode: MH sampling or greedy optimization
    # (maximize!/minimize!, utilities.jl:212-226 — log_adj is ignored and
    # the objective-only fitness scores out-of-bounds ∓inf)
    if de.is_mh:
        mode = "mh"
    elif de.is_minimize:
        mode = "min"
    else:
        mode = "max"
    # migration variant: the bitonic rank network wherever its XOR
    # lattice exists (G//8 a power of two) — measured faster than the
    # [G, G] one-hot matrices at EVERY size on a v5e (4k chains: 1.91 vs
    # 2.56 µs/step; 8k: 3.48 vs 5.91; 16k: 6.43 vs 21.9;
    # validation/mig_sorted_bench.py, 2026-08-19), and its select-only
    # value movement carries ±inf exactly, so min-mode (+inf
    # out-of-bounds scores) works too.  One-hot is the fallback for
    # non-power-of-two group layouts up to MIG_MAX_G (MH/max only — its
    # weight transport's -inf flag column doesn't cover +inf).
    if mig_sorted_ok(G_mig, Np) and _gr_pow2(G_mig):
        mig_variant = "sorted"     # native power-of-two lattice
    elif G_mig <= MIG_MAX_G and mode != "min":
        mig_variant = "onehot"     # small non-pow2 layouts: the verified
        # [G, G] one-hot path (padded-compact works here too but the
        # matrices are cheap at this size)
    elif mig_sorted_ok(G_mig, Np):
        mig_variant = "sorted"     # padded-compact lattice (any Gr)
    elif mig_in_kernel or mig_replay:
        raise ValueError(
            f"no in-kernel migration variant for G={G_mig} (not a "
            f"multiple of 8 and the [G, G] fallback is "
            f"{'min-mode-incompatible' if mode == 'min' else 'capped at '}"
            f"{'' if mode == 'min' else MIG_MAX_G})")
    else:
        mig_variant = None
    # block updating (block_update!, main.jl:174-179): STATIC flat [d]
    # bool masks, one full sweep per block per iteration; None when
    # blocking is off (blocks set but constant-False blocking_on means
    # the blocks are never applied — matching the XLA step)
    blocks_flat = None
    if de.blocks is not None and _blocking_const(de) is True:
        from ..sampler import flatten_block
        blocks_flat = [np.asarray(flatten_block(spec, b), bool)
                       for b in de.blocks]
    n_sweeps = len(blocks_flat) if blocks_flat is not None else 1
    # discrete parameter dims (STATIC): float-proposed values snap to
    # integers before fitness — the round-and-cast rule of
    # src/utilities.jl:360-369, same placement as the XLA step
    int_dims = ([i for i, m in enumerate(np.asarray(spec.int_mask)) if m]
                if spec.has_int else [])
    gp = de.generate_proposal
    is_random_gamma = gp in (proposal_ops.random_gamma, "random_gamma")
    if gp in (proposal_ops.fixed_gamma, "fixed_gamma"):
        fixed_g1 = 2.38
    elif gp in (proposal_ops.variable_gamma, "variable_gamma"):
        fixed_g1 = 2.38 / float(np.sqrt(2.0 * d))
    else:
        fixed_g1 = None

    # pseudo-marginal noise panel (DEModel.noise_shape): fresh uniforms
    # drawn in-kernel on every evaluation, traced here as a SECOND
    # symbolic input of the density replay
    stochastic = bool(getattr(model, "stochastic", False))
    noise_shape = (tuple(model.noise_shape) if stochastic else ())
    noise_words = int(np.prod(noise_shape)) if stochastic else 0

    def _lp_fn(prop3, noise):
        """Posterior log density of the whole population,
        [d, R, Cf] -> [R, Cf], via the model's chains-LAST batched
        densities (bounds/NaN mask applied outside).  Chains stay in the
        packed sublane×lane layout throughout — the per-cell vmap
        alternative batches chains onto sublanes only (intermediates
        [C, n_obs] plus lane<->sublane transposes), which measured ~10x
        slower in-kernel."""
        cols = spec.unflatten_cols(prop3)
        lp = _ll(cols, noise)
        if mode == "mh":
            lp = model.prior_loglike_batched(*cols) + lp
        return lp.reshape(R, Cf).astype(dt)

    def _ll(cols, noise):
        # data_batched (when set) is the BATCHED densities' view of the
        # data — e.g. sample_replicated_packed's per-chain-expanded
        # leaves — while model.data keeps the plain shape the per-cell
        # XLA path (and build_step's dtype/pool probes) can broadcast
        ll_data = (model.data if model.data_batched is None
                   else model.data_batched)
        kw = dict(model.kwargs)
        if stochastic:
            kw["noise"] = noise
        if not model.chunk_obs:
            return model.loglike_batched(ll_data, *model.args, *cols,
                                         **kw)
        # observation chunking (model.chunk_obs contract): evaluate the
        # density over small data slices and add the partial sums, so
        # each in-kernel intermediate is [CH, R, Cf] instead of
        # [n_obs, R, Cf] — small enough to live in vector registers
        # rather than streaming through VMEM on every op.  CH targets
        # ≤ 16 vregs (64 KiB) per intermediate.
        import jax.tree_util as jtu
        data = jtu.tree_map(np.asarray, ll_data)
        n_obs = jtu.tree_leaves(data)[0].shape[0]
        CH = max(1, (1 << 16) // (R * Cf * 4))
        tot = None
        for c0 in range(0, n_obs, CH):
            dc = jtu.tree_map(lambda a: a[c0:c0 + CH], data)
            t = model.loglike_batched(dc, *model.args, *cols,
                                      **model.kwargs)
            tot = t if tot is None else tot + t
        return tot

    # Pallas kernels cannot capture array constants (model data, prior
    # hyperparameters, ...) — trace the log posterior to a jaxpr and
    # PARTIALLY EVALUATE it at build time: every const-only subgraph is
    # folded on the host (so e.g. data reshapes/expansions — which Mosaic
    # would lower as unsupported lane<->sublane transposes — happen in
    # numpy, once), and only the residual program that actually touches
    # the proposal is replayed in-kernel, with its folded operands shipped
    # as explicit kernel inputs.  Const broadcasts stay LAZY: the small
    # base array is shipped and the ``broadcast_in_dim`` to the full
    # [n_obs, R, Cf] intermediate shape is replayed in-kernel (a natively
    # supported splat), so a 400 B data vector is not shipped as a 1.6 MB
    # pre-broadcast block.  The replay interpreter substitutes Mosaic-
    # unsupported primitives (``erf``/``erfc``, from Φ in e.g. the LBA
    # density) with in-kernel implementations; call primitives
    # (pjit/custom_jvp) are inlined during partial evaluation.  The fused
    # path is f32 throughout: a jaxpr touching f64 (not a Mosaic dtype)
    # raises here and the caller falls back to the XLA step.
    from jax.extend import core as jax_core
    if stochastic:
        closed = jax.make_jaxpr(_lp_fn)(
            jnp.zeros((d, R, Cf), dt),
            jnp.zeros(noise_shape + (R, Cf), dt))
    else:
        closed = jax.make_jaxpr(lambda p: _lp_fn(p, None))(
            jnp.zeros((d, R, Cf), dt))

    def _subjaxprs(params):
        for v in params.values():
            vs = v if isinstance(v, (tuple, list)) else (v,)
            for w in vs:
                if isinstance(w, jax_core.ClosedJaxpr):
                    yield w.jaxpr
                elif isinstance(w, jax_core.Jaxpr):
                    yield w

    def _check_f64(jaxpr):
        for eqn in jaxpr.eqns:
            for v in eqn.outvars:
                if getattr(v.aval, "dtype", None) == jnp.float64:
                    raise ValueError(
                        "log posterior traces to float64 ops; the fused "
                        "kernel is f32-only (build the model with f32 "
                        "data or run under enable_x64(False))")
            for sub in _subjaxprs(eqn.params):
                _check_f64(sub)

    _check_f64(closed.jaxpr)


    # ---- build-time partial evaluation -------------------------------
    class _Sym:                          # token for an in-kernel value
        __slots__ = ()

    class _Lazy:                         # un-materialized const broadcast
        __slots__ = ("base", "shape", "bdims")

        def __init__(self, base, shape, bdims):
            self.base, self.shape, self.bdims = base, shape, bdims

    residual = []                        # (eqn, operand descs, out syms)
    ship, _ship_key = [], {}             # kernel inputs for folded consts

    def _ship_arr(a):
        a = np.asarray(a)
        if a.dtype == np.bool_:
            a = a.astype(np.int32)       # Mosaic has no bool inputs
        if a.dtype in (np.float64, np.int64, np.uint64):
            raise ValueError(f"64-bit const ({a.dtype}) in the density")
        key = (a.dtype.str, a.shape, a.tobytes())
        if key not in _ship_key:
            _ship_key[key] = len(ship)
            ship.append(a)
        return _ship_key[key]

    def _materialize(val):
        if isinstance(val, _Lazy):
            es = [1] * len(val.shape)
            for i, bd in enumerate(val.bdims):
                es[bd] = val.base.shape[i]
            return np.broadcast_to(val.base.reshape(es), val.shape)
        return np.asarray(val)

    def _enc(val):
        """Encode a partial-eval value as an in-kernel replay operand."""
        if isinstance(val, _Sym):
            return ("var", val)
        if isinstance(val, _Lazy):
            base, shape, bdims = val.base, val.shape, val.bdims
            if base.size == 1:
                return ("splat", base.reshape(()).item(), shape,
                        base.dtype.str, base.dtype == np.bool_)
            keep = [i for i, s in enumerate(base.shape) if s != 1]
            nb = base.reshape([base.shape[i] for i in keep])
            nbd = tuple(bdims[i] for i in keep)
            if nb.ndim == 1:
                # ship 1-D bases 2-D ([n, 1], n on sublanes) — a 1-D
                # vector input would need an in-kernel rank change; map
                # the appended unit axis to any later output dim
                free = [j for j in range(len(shape))
                        if j > nbd[0] and j not in nbd]
                if free:
                    nb = nb.reshape(-1, 1)
                    nbd = (nbd[0], free[0])
            was_bool = nb.dtype == np.bool_
            return ("binp", _ship_arr(nb), tuple(shape), nbd, was_bool)
        a = np.asarray(val)
        if a.size == 1:
            return ("splat", a.reshape(()).item(), a.shape, a.dtype.str,
                    a.dtype == np.bool_)
        return ("inp", _ship_arr(a), a.dtype == np.bool_)

    def _eager(eqn, ivals):
        args = [jnp.asarray(_materialize(iv)) for iv in ivals]
        subfuns, bp = eqn.primitive.get_bind_params(eqn.params)
        outs = eqn.primitive.bind(*subfuns, *args, **bp)
        if not eqn.primitive.multiple_results:
            outs = [outs]
        return [np.asarray(o) for o in outs]

    def _peval(jaxpr, consts, invals):
        env = {}
        for v, c in zip(jaxpr.constvars, consts):
            env[v] = np.asarray(c)
        for v, a in zip(jaxpr.invars, invals):
            env[v] = a

        def read(v):
            if isinstance(v, jax_core.Literal):
                return np.asarray(v.val)
            return env[v]

        for eqn in jaxpr.eqns:
            ivals = [read(v) for v in eqn.invars]
            name = eqn.primitive.name
            has_sym = any(isinstance(iv, _Sym) for iv in ivals)
            if not has_sym:
                if name == "broadcast_in_dim":
                    base = _materialize(ivals[0])
                    shape = tuple(eqn.params["shape"])
                    if base.size * 4 <= int(np.prod(shape)):
                        env[eqn.outvars[0]] = _Lazy(
                            base, shape,
                            tuple(eqn.params["broadcast_dimensions"]))
                        continue
                outs = _eager(eqn, ivals)
            elif name in _call_prims:
                inner = (eqn.params.get("jaxpr")
                         or eqn.params.get("call_jaxpr"))
                if isinstance(inner, jax_core.ClosedJaxpr):
                    outs = _peval(inner.jaxpr, inner.consts, ivals)
                else:
                    outs = _peval(inner, (), ivals)
            else:
                syms = [None if type(v).__name__ == "DropVar" else _Sym()
                        for v in eqn.outvars]
                residual.append((eqn, [_enc(iv) for iv in ivals], syms))
                outs = syms
            for v, o in zip(eqn.outvars, outs):
                if type(v).__name__ != "DropVar":
                    env[v] = o
        return [read(v) for v in jaxpr.outvars]

    _root = _Sym()
    _root_nz = _Sym() if stochastic else None
    _roots = [_root] + ([_root_nz] if stochastic else [])
    # the folding's primitive binds must execute EAGERLY (their outputs
    # feed np.asarray) even when the kernel builds inside an outer jit
    # trace — the resample path constructs kernels lazily at trace time
    # (the history slab count is a run property)
    with jax.ensure_compile_time_eval():
        (_lp_out,) = _peval(closed.jaxpr, closed.consts, _roots)
    _lp_out_op = _enc(_lp_out)

    # Heavy densities do not belong in the kernel UNCHUNKED: an
    # intermediate much larger than the vector register file streams
    # through VMEM on every op (Mosaic materializes each op's result — no
    # cross-op loop fusion), which measured ~1.6x SLOWER than the XLA
    # step's properly-fused density (unchunked LBA: 93 vs 57 µs/step).
    # Models opt into observation chunking via ``chunk_obs`` (see
    # ``_ll``); whatever remains oversized here falls back.
    _max_out = max(
        (int(np.prod(v.aval.shape)) * v.aval.dtype.itemsize
         for eqn, _, _ in residual for v in eqn.outvars
         if type(v).__name__ != "DropVar"), default=0)
    if _max_out > 1 << 20:
        raise ValueError(
            f"a density intermediate is {_max_out / 2**20:.1f} MiB "
            "(register-file working set exceeded); using the XLA step — "
            "consider DEModel.chunk_obs")

    def lp_conv(prop_val, ship_vals, noise_val=None):
        """Replay the residual density program in-kernel."""
        env2 = {_root: prop_val}
        if stochastic:
            env2[_root_nz] = noise_val

        def dec(op):
            kind = op[0]
            if kind == "var":
                return env2[op[1]]
            if kind == "splat":
                _, v, shape, dts, wb = op
                if wb:
                    return jnp.full(shape, np.int32(bool(v))) != 0
                dtype = np.dtype(dts)
                # weak python-scalar literals read back as 64-bit numpy
                # scalars; the kernel is 32-bit throughout
                if dtype == np.float64:
                    dtype = np.float32
                elif dtype in (np.int64, np.uint64):
                    dtype = np.int32
                return jnp.full(shape, v, dtype)
            if kind == "inp":
                _, i, wb = op
                v = ship_vals[i]
                return (v != 0) if wb else v
            _, i, shape, bdims, wb = op
            v = jax.lax.broadcast_in_dim(ship_vals[i], shape, bdims)
            return (v != 0) if wb else v

        for eqn, ops, syms in residual:
            invals = [dec(op) for op in ops]
            name = eqn.primitive.name
            if name in _overrides:
                outs = _overrides[name](invals, eqn.params)
            else:
                subfuns, bp = eqn.primitive.get_bind_params(eqn.params)
                outs = eqn.primitive.bind(*subfuns, *invals, **bp)
                if not eqn.primitive.multiple_results:
                    outs = [outs]
            for s, o in zip(syms, outs):
                if s is not None:
                    env2[s] = o
        return dec(_lp_out_op)


    # bit-consumption rows per iteration, [W, C] uint32 — mirrors the
    # kernel's static draw order (used by the interpret path, which feeds
    # threefry bits from outside: the Mosaic interpreter stubs the
    # hardware PRNG to zeros).  All draws are UNCONDITIONAL — pl.when
    # gates only compute, never draws — so the stream layout is static
    # regardless of migration fires or the burnin phase.
    n_words = 0
    if mig_in_kernel:
        n_words += 3                                  # ranks, N, gumbel
    # resample mode: partner/snooker-triple indices come from SMEM
    # (precomputed in XLA), not from in-kernel draws.  One "sub-sweep" =
    # one masked pass (sequential mode runs n_members of them per sweep;
    # the β-mutation gate is then drawn ONCE per sweep, per group, like
    # main.jl:199-207)
    per_sub = 0 if resample else 2                    # partner draws
    if is_random_gamma:
        per_sub += 3                                  # u_base, g1, g2
    if theta_s > 0.0:
        per_sub += 2 if resample else 5               # [z/m/n,] γ, gate
    if eps > 0.0:
        per_sub += d
    if kappa < 1.0:
        per_sub += d
    gate_words = 1 if beta > 0.0 else 0
    if beta > 0.0:
        per_sub += 2 * d                              # Box-Muller
    if not seq:
        per_sub += gate_words                         # gate inside sweep
    per_sub += noise_words                            # pseudo-marginal
    per_sub += 1                                      # accept
    n_words += (per_sub * n_members
                + (gate_words if seq else 0)) * n_sweeps
    n_words += 1                                      # fire look-ahead

    tiny = np.float32(np.finfo(np.float32).tiny)
    inf32 = np.float32(np.inf)


    n_scratch = 4 if is_random_gamma else 3

    # compact-sort compress/widen constants for the sorted migration
    # variant, shipped as kernel inputs: one-hot gemm matrices where
    # Gr % 128 == 0 (MXU geometry — tiny code footprint), else the
    # packed widening-scatter masks (numpy-simulated at build time)
    mig_spread_T = mig_word_idx = mig_gemm_idx = None
    if (mig_in_kernel or mig_replay) and mig_variant == "sorted":
        if Gr % COMPACT_MIN_GR == 0:
            mig_gemm_idx = len(ship)
            ship.extend(_compress_mats(Np))
        elif Gr & (Gr - 1):
            mig_spread_T, _word_np = _spread_word(Gr, Np, Cf)
            mig_word_idx = len(ship)
            ship.append(_word_np)

    # wide-resample window gather: identity matrix for the transpose-
    # free one-hot lane permute (see fetch_hist), shipped once per
    # launch instead of materialized per fetch
    res_ident_idx = None
    if resample and wide:
        res_ident_idx = len(ship)
        ship.append(np.eye(Cf, dtype=np.float32))

    def kernel(it_ref, key_ref, fire_in_ref, *refs):
        if resample:
            idx_ref, refs = refs[0], refs[1:]     # SMEM flat [K·slots·C]
        if stream:
            pre_ref, refs = refs[0], refs[1:]     # VMEM [n_pre, d, Cf]
        if interpret:
            bits_ref, refs = refs[0], refs[1:]
        ship_refs = refs[:len(ship)]
        refs = refs[len(ship):]
        theta_ref, w_ref, refs = refs[0], refs[1], refs[2:]
        if resample:
            # vmem engine: the FULL history in HBM (whole-ref DMA);
            # stream engine: the launch's write WINDOW [W, d, Cf],
            # sliced out in XLA and shipped as a normal VMEM input
            hist_in_ref, refs = refs[0], refs[1:]
        out_t_ref, out_w_ref, out_acc_ref, out_fire_ref = refs[:4]
        refs = refs[4:]
        if resample:
            hist_out_ref, refs = refs[0], refs[1:]
        scratch = refs
        if wide:
            wfetch_sc, scratch = scratch[-1], scratch[:-1]
        if stream:
            # the window OUTPUT block (constant index map) is the
            # persistent VMEM store itself — no scratch, no manual DMA
            hist_sc = hist_out_ref
        elif resample:
            hist_sc, dma_sem = scratch[-2:]
            scratch = scratch[:-2]
        if is_random_gamma:
            theta_sc, w_sc, bterm_sc, fire_sc = scratch
        else:
            theta_sc, w_sc, fire_sc = scratch
        k = pl.program_id(0)

        if stream:
            # base slab of this launch's write window (rows it0-1 ..
            # it0+K-2), clamped so [wb, wb+W_win) stays inside the
            # buffer — the clamp can only LOWER wb, so window-relative
            # row slabs stay in range.  The SAME formula runs in XLA
            # (kernel_call) to slice the window in and update it back:
            # the two must stay identical.
            wb = jnp.minimum((it_ref[0] - 1) // np.int32(B_hist),
                             np.int32(S_hist - W_win))

        @pl.when(k == 0)
        def _():
            theta_sc[:] = theta_ref[:]
            w_sc[:] = w_ref[:]
            if alpha > 0.0 and not mig_in_kernel and K > 1:
                # XLA-level migration with a K-window launch: fire_in
                # was consumed by the boundary exchange BEFORE this
                # launch; the scratch instead accumulates the window's
                # look-ahead gate COUNT (docstring, mesh superstep)
                fire_sc[0] = jnp.int32(0)
            else:
                fire_sc[0] = fire_in_ref[0]
            if stream:
                # seed the persistent window OUTPUT block from the
                # window input (XLA sliced it out of the HBM history;
                # partial-ref DMAs on ANY refs crash this backend —
                # probe_mosaic9b — so the window rides the normal
                # pallas input/output pipeline instead)
                hist_sc[:] = hist_in_ref[:]
            elif resample:
                # the whole packed history HBM -> VMEM once per launch;
                # per-iteration reads/writes then stay in VMEM and the
                # final state DMAs back at k == K-1 (amortized by K)
                cp = pltpu.make_async_copy(hist_in_ref, hist_sc, dma_sem)
                cp.start()
                cp.wait()

        ship_vals = [ref[:] for ref in ship_refs]
        it = it_ref[0] + k
        # (pallas kernels may not capture ARRAY constants, so lane/slot
        # indices stay in-kernel iotas; Mosaic folds iota-derived
        # predicates where it can)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 1)
        rowI = jax.lax.broadcasted_iota(jnp.int32, (R, Cf), 0)
        p = lane % Np                              # within-group slot

        row_at = [0]                               # static bit-row cursor

        def take(rows):
            # one logical "row" = C draws, packed [R, Cf] (rows > 1:
            # [rows, R, Cf]; the reshapes split leading axes on sublane-
            # tile boundaries, which is layout-preserving)
            if interpret:
                r0 = row_at[0]
                row_at[0] = r0 + rows
                flat = bits_ref[pl.ds(k * n_words + r0, rows), :]
                shape = (R, Cf) if rows == 1 else (rows, R, Cf)
                return flat.reshape(shape)
            bits = pltpu.bitcast(pltpu.prng_random_bits((rows * R, Cf)),
                                 jnp.uint32)
            return bits if rows == 1 else bits.reshape(rows, R, Cf)

        def take_flat(n):
            # n fresh words as an [n, 1] column (consumes one row)
            if interpret:
                r0 = row_at[0]
                row_at[0] = r0 + 1
                row = bits_ref[pl.ds(k * n_words + r0, 1), :]   # [1, C]
                return row[:, :n].reshape(n, 1)
            bits = pltpu.bitcast(pltpu.prng_random_bits((n, 128)),
                                 jnp.uint32)
            return bits[:, :1]

        def to_uni(bits):
            # uint32 -> f32 value casts are not a Mosaic-supported
            # conversion; build the float by bit-surgery instead
            # (mantissa | exponent-of-1 gives [1, 2), like jax.random):
            # 23-bit granularity vs the XLA pool's 24 — immaterial, the
            # two paths are different streams anyway (module docstring)
            mant = bits >> 9
            one = jnp.full(mant.shape, 0x3F800000, jnp.uint32)
            return pltpu.bitcast(mant | one, dt) - np.float32(1.0)

        def uni(rows):
            return to_uni(take(rows))

        def randint(rows, span):
            return pltpu.bitcast(take(rows) % np.uint32(span),
                                 jnp.int32)

        # ---- in-kernel COALESCED boundary replay (mig_replay mode):
        # the previous window's gate count arrives in fire_in, and its
        # events apply here — before the launch's first iteration,
        # exactly where the XLA mig_multi replay sat — via a
        # dynamic-trip fori over the verified migration machinery.
        # Draws come from a dedicated replay PRNG stream (salted seed;
        # the per-iteration stream is seeded AFTER this block, so
        # count = 0 launches stay bitwise identical), statistically the
        # same per-event law as every other migration path. ----------
        if mig_replay:
            cnt0 = fire_in_ref[0]

            @pl.when((k == 0) & (cnt0 > 0))
            def _():
                if not interpret:
                    mx0 = (it_ref[0].astype(jnp.uint32)
                           * np.uint32(0x9E3779B9))
                    pltpu.prng_seed(
                        key_ref[0] ^ mx0 ^ np.uint32(0x5EED5A17),
                        key_ref[1] + mx0 + np.uint32(2))

                def ev_body(e, carry):
                    if interpret:
                        b0 = np.int32(K * n_words)
                        row_u = bits_ref[pl.ds(b0 + 3 * e, 1),
                                         :].reshape(R, Cf)
                        row_g = bits_ref[pl.ds(b0 + 3 * e + 1, 1),
                                         :].reshape(R, Cf)
                        nb = bits_ref[pl.ds(b0 + 3 * e + 2, 1),
                                      :][:, :1]             # [1, 1]
                    else:
                        row_u = pltpu.bitcast(
                            pltpu.prng_random_bits((R, Cf)), jnp.uint32)
                        row_g = pltpu.bitcast(
                            pltpu.prng_random_bits((R, Cf)), jnp.uint32)
                        nb = pltpu.bitcast(
                            pltpu.prng_random_bits((1, 128)),
                            jnp.uint32)[:, :1]
                    u_row = to_uni(row_u)
                    na_f = (pltpu.bitcast(nb % np.uint32(G - 1),
                                          jnp.int32).astype(dt)
                            + np.float32(2.0))              # [1, 1]
                    gum = -jnp.log(-jnp.log(
                        jnp.maximum(to_uni(row_g), tiny)))
                    if mig_variant == "onehot":
                        nt, nw = _mig_apply(theta_sc[:], w_sc[:], u_row,
                                            na_f, gum, p, G=G_mig, Np=Np,
                                            Gr=Gr)
                    else:
                        sp = (None if mig_word_idx is None else
                              (mig_spread_T, ship_vals[mig_word_idx]))
                        gm = (None if mig_gemm_idx is None else
                              (ship_vals[mig_gemm_idx],
                               ship_vals[mig_gemm_idx + 1]))
                        nt, nw = _mig_apply_sorted(
                            theta_sc[:], w_sc[:], u_row, na_f, gum, p,
                            G=G_mig, Np=Np, Gr=Gr, spread=sp, gemm=gm)
                    for i in range(d):
                        theta_sc[i] = nt[i]
                    w_sc[:] = nw
                    return carry

                jax.lax.fori_loop(0, cnt0, ev_body, jnp.int32(0))

        if not interpret:
            # libtpu supports at most 2 seed words — fold the iteration
            # into both words (golden-ratio odd multiplier) instead of
            # passing it as a third; re-seeded per grid step, so a
            # K-iteration launch is bitwise identical to K launches
            mixed = (it.astype(jnp.uint32) * np.uint32(0x9E3779B9))
            pltpu.prng_seed(key_ref[0] ^ mixed,
                            key_ref[1] + mixed + np.uint32(1))

        # ---- migration BEFORE the update (main.jl:85), in-kernel under
        # the look-ahead Bernoulli(α) gate; BIT draws are unconditional
        # (the PRNG stream layout must not depend on the gate) but every
        # transform of them — especially the Gumbel double-log, ~6 µs at
        # 65k chains — runs fired-only inside the pl.when -------------
        if mig_in_kernel:
            u_bits = take(1)        # per-chain; leader lanes rank groups
            nb = take_flat(1)
            gum_bits = take(1)

            @pl.when(fire_sc[0] != 0)
            def _():
                # NOTE on unfired cost: transforms of the draw bits and
                # the migration machinery sit inside the region, but at
                # big G the dominant unfired cost was the REGION'S
                # INSTRUCTION FOOTPRINT (fetch for the branched-over
                # body), not executed work — neither moving the Gumbel
                # transform in here nor anchoring the iota roots on a
                # branch-opaque zero changed it; the loop-rolled bitonic
                # (bitonic_loop in _rank_cycle) is what fixed it.  See
                # NOTES.md "instruction-footprint cliff".
                u_row = to_uni(u_bits)
                if resample:
                    # pad groups (everything past the row-0 real-chain
                    # prefix) rank LAST: finite key > any uniform
                    u_row = jnp.where((rowI == 0) & (lane < C_real),
                                      u_row, np.float32(2.0))
                na_f = (pltpu.bitcast(nb % np.uint32(G - 1), jnp.int32)
                        .astype(dt) + np.float32(2.0))        # [1,1]
                gum = -jnp.log(-jnp.log(jnp.maximum(to_uni(gum_bits),
                                                    tiny)))
                if mig_variant == "onehot":
                    nt, nw = _mig_apply(theta_sc[:], w_sc[:], u_row, na_f,
                                        gum, p, G=G_mig, Np=Np, Gr=Gr)
                else:
                    sp = (None if mig_word_idx is None else
                          (mig_spread_T, ship_vals[mig_word_idx]))
                    gm = (None if mig_gemm_idx is None else
                          (ship_vals[mig_gemm_idx],
                           ship_vals[mig_gemm_idx + 1]))
                    nt, nw = _mig_apply_sorted(
                        theta_sc[:], w_sc[:], u_row, na_f, gum, p,
                        G=G_mig, Np=Np, Gr=Gr, spread=sp, gemm=gm)
                for i in range(d):
                    theta_sc[i] = nt[i]
                w_sc[:] = nw

        def one_sweep(theta, w, bkeep, member=None, mut_gate=None):
            """One mutate-or-crossover sub-sweep over the population
            (``crossover.jl:12-99``).  ``bkeep`` is a STATIC [d] bool
            block mask (or None): non-block dims of the proposal revert
            to current values before the snooker MH correction —
            ``reset!`` semantics (``crossover.jl:84-87,336-352``); the
            β-mutation branch ignores the mask (``main.jl:199-207``).
            ``member`` (sequential mode) masks the accept to one group
            slot; ``mut_gate`` then carries the per-group mutation gate
            drawn once per sweep."""
            # ---- partner indices: 2 distinct non-self draws (shift
            # trick, crossover.jl:138-140 semantics) ----------------------
            m = Np - 1
            a = randint(1, m)
            b = randint(1, m - 1)
            b = b + (b >= a)
            a = a + (a >= p)
            b = b + (b >= p)

            pm, pn = _seg_gather_bin_multi(theta, [a, b], p, Np)

            return _sweep_tail(theta, w, bkeep, pm, pn,
                               member=member, mut_gate=mut_gate)

        if resample:
            lane_h = jax.lax.broadcasted_iota(jnp.int32, (d, Cf), 1)

            def fetch_hist_wide(slot):
                """WIDE-layout partner fetch (C > 128, stream-only):
                the XLA pre-gather already landed each lane's partner
                column at its own lane of pre row (k·slots_tot +
                slot) — a direct [d, Cf] read — so only partners
                drawn from rows written DURING this launch need the
                in-kernel gather: the write window lane-permutes by
                the per-lane partner chain via an exact one-hot NT
                gemm (Y[l, m] = (ln_l == m), built transpose-free by
                an identity dot), then a W_win-way per-lane slab
                select by the window-relative row.  History holds
                parameter values only (finite by bounds), so no ±inf
                flag columns are needed."""
                base = k * n_slots_tot + slot
                idxv = idx_ref[pl.ds(base, 1)]        # [1, Cf] int32
                slab = idxv // np.int32(Cf)           # == row (B=1)
                ln = idxv % np.int32(Cf)
                prev = pre_ref[pl.ds(base, 1)].reshape(d, Cf)
                in_win = slab >= it_ref[0] - 1
                wfetch_sc[:] = prev
                nwin = jnp.sum(in_win.astype(jnp.int32))

                @pl.when(nwin > 0)
                def _():
                    # any in-window partner at all is ~1/it per fetch
                    # in steady state: the gather runs fired-only
                    relw = jnp.clip(slab - wb, 0, W_win - 1)
                    ident = ship_vals[res_ident_idx]  # [Cf, Cf] eye
                    ln_col = jax.lax.dot_general(     # [Cf, 1]
                        ident, ln.astype(dt), (((1,), (1,)), ((), ())),
                        precision=HIGH)
                    laneF = jax.lax.broadcasted_iota(  # (f32 iota is
                        jnp.int32, (Cf, Cf), 1).astype(dt)  # no Mosaic op)
                    Y = (ln_col == laneF).astype(dt)  # [Cf, Cf]
                    win_flat = hist_sc[:].reshape(W_win * d, Cf)
                    perm = jax.lax.dot_general(
                        win_flat, Y, (((1,), (1,)), ((), ())),
                        precision=HIGH).reshape(W_win, d, Cf)
                    val = perm[0]
                    for ws in range(1, W_win):
                        val = jnp.where(relw == np.int32(ws), perm[ws],
                                        val)
                    wfetch_sc[:] = jnp.where(in_win, val, prev)

                buf = jax.lax.broadcast_in_dim(wfetch_sc[:], (d, R, Cf),
                                               (0, 2))
                return jnp.where(rowI == 0, buf, jnp.zeros_like(buf))

            def fetch_hist_narrow(slot):
                """Partner population [d, R, Cf] from the history: each
                real chain c reads its precomputed (slab, lane) index —
                ``resample``'s (past-iteration, chain) draw flattened
                into the slab layout — via a dynamic slab load + one-hot
                lane reduction; the [d]-column lands in chain c's lane
                of sublane row 0 (pad cells stay zero, never read).
                The index array is 1-D (k-major, then slot, then chain):
                SMEM tiles the two minor dims of an N-D array to (8, 128)
                like VMEM, so a [K, slots, C] shape would claim
                K·8·128·4 bytes — the whole 1 MB SMEM at K=256 (observed
                on-chip); flat it costs its true 4·K·slots·C bytes."""
                buf = jnp.zeros((d, R, Cf), dt)
                for c in range(C_real):
                    j = (k * n_slots_tot + slot) * C_real + c
                    packed = idx_ref[j]
                    slab = packed // np.int32(Cf)
                    ln = packed % np.int32(Cf)
                    if stream:
                        # rows older than this launch (row < it0-1) were
                        # pre-gathered in XLA at flat position j; rows
                        # written DURING the launch come from the VMEM
                        # window.  Select the [d, Cf] source slab by the
                        # scalar condition, then do ONE lane reduction.
                        row = (slab * np.int32(B_hist)
                               + ln // np.int32(C_real))
                        in_win = row >= it_ref[0] - 1
                        relw = jnp.clip(slab - wb, 0, W_win - 1)
                        winv = hist_sc[pl.ds(relw, 1)].reshape(d, Cf)
                        prev = pre_ref[
                            pl.ds(j // np.int32(Cf), 1)].reshape(d, Cf)
                        slabv = jnp.where(in_win, winv, prev)
                        ln = jnp.where(in_win, ln, j % np.int32(Cf))
                    else:
                        slabv = hist_sc[pl.ds(slab, 1)].reshape(d, Cf)
                    col = jnp.sum(
                        jnp.where(lane_h == ln, slabv,
                                  jnp.zeros_like(slabv)),
                        axis=1, keepdims=True)            # [d, 1]
                    col3 = jax.lax.broadcast_in_dim(col, (d, R, Cf),
                                                    (0, 2))
                    buf = jnp.where((rowI == 0) & (lane == c), col3, buf)
                return buf

            fetch_hist = fetch_hist_wide if wide else fetch_hist_narrow

            def one_sweep_resample(theta, w, bkeep, member=None,
                                   mut_gate=None, block=0):
                """The resample-mode sub-sweep: DE partners (and the
                snooker triple) come from the HISTORY
                (crossover.jl:113-124 via the de.sample slot), not the
                current group; the softmax base-select stays group-local
                (crossover.jl:158,282-289).  The roll dictionary is only
                needed pre-burnin (base gather), so _sweep_tail builds
                it lazily inside that pl.when region.  Sequential mode:
                each member consumes its OWN slot block of the
                precomputed indices; blocked mode likewise per block
                sweep (block-major, then member — r5)."""
                base = (block * n_members
                        + (0 if member is None else member)) * n_slots
                pm = fetch_hist(base + 0)
                pn = fetch_hist(base + 1)
                sn = None
                if theta_s > 0.0:
                    sn = (fetch_hist(base + 2), fetch_hist(base + 3),
                          fetch_hist(base + 4))
                return _sweep_tail(theta, w, bkeep, pm, pn,
                                   sn_partners=sn, member=member,
                                   mut_gate=mut_gate)

        def _sweep_tail(theta, w, bkeep, pm, pn, sn_partners=None,
                        member=None, mut_gate=None):
            if is_random_gamma and post:
                # POST-BURNIN kernel variant (phase='post'): γ₂ is
                # EXACTLY 0 once it > burnin (crossover.jl:164), so the
                # whole predicated softmax/base-select region is
                # statically absent — measured 0.29 µs/iter cheaper
                # than the region's untaken pl.when form on the 4k
                # Gaussian (NOTES.md r5).  The u_b/g2 draws are still
                # CONSUMED (identical stream positions = bitwise
                # equality with the full kernel at it > burnin) and
                # anchored into the dead bterm scratch so DCE cannot
                # elide the hardware-PRNG advances (prng_random_bits
                # carries no effect annotation).
                u_b = uni(1)
                g1 = uni(1) * np.float32(0.5) + np.float32(0.5)
                g2 = uni(1) * np.float32(0.5) + np.float32(0.5)
                # bterm is exactly 0 here, but it must still flow
                # through the SAME instruction shape as the full kernel
                # (a folded-away "+ 0" changes FMA fusion → 1-ulp
                # drift, observed in A/B), and the dead u_b/g2 draws
                # must stay live (DCE would desync the hardware-PRNG
                # stream): a value-opaque select produces the zeros
                # FROM the dead draws.
                alive = (u_b < np.float32(2.0)) & (g2 < np.float32(2.0))
                bterm_sc[:] = jnp.broadcast_to(
                    jnp.where(alive, np.float32(0.0), np.float32(1.0)),
                    (d, R, Cf))
                prop = theta + g1 * (pm - pn) + bterm_sc[:]
            elif is_random_gamma:
                u_b = uni(1)
                g1 = uni(1) * np.float32(0.5) + np.float32(0.5)
                g2 = uni(1) * np.float32(0.5) + np.float32(0.5)

                # ---- base select ∝ softmax(weight) over the group
                # (crossover.jl:282-289) via segmented inverse-CDF; γ₂ = 0
                # EXACTLY once it > burnin (crossover.jl:164), so the whole
                # softmax stack is gated off in-kernel — same cost as the old
                # dedicated post-burnin kernel, without an XLA-level branch
                @pl.when(it <= burnin)
                def _():
                    # min mode can carry +inf weights (out-of-bounds scores
                    # +inf); clamp for the CDF so exp(w - mx) stays finite
                    # while preserving select_base's larger-w preference
                    w_bs = (jnp.minimum(w, np.float32(3.0e38))
                            if mode == "min" else w)
                    mx = _seg_last_bcast(_seg_scan(w_bs, p, Np, jnp.maximum),
                                         p, Np)
                    e = jnp.exp(w_bs - jnp.where(jnp.isfinite(mx), mx,
                                                 jnp.zeros_like(mx)))
                    q = _seg_scan(e, p, Np, jnp.add)   # [G, Np] group CDF
                    tot = _seg_last_bcast(q, p, Np)
                    u_bs = jnp.maximum(u_b, tiny) * tot
                    # count of group members with cdf < u — enumerate members
                    # via the roll dictionary of q
                    q_rolls = _roll_dict(q, p, Np)
                    cnt = jnp.zeros((R, Cf), jnp.int32)
                    for o in range(Np):
                        cnt = cnt + (q_rolls[o] < u_bs).astype(jnp.int32)
                    bidx = jnp.minimum(cnt, Np - 1)
                    # all of this lives inside the burnin region, so
                    # post-burnin iterations never pay for it
                    base = _seg_gather_bin(theta, bidx, p, Np)
                    bterm_sc[:] = g2 * (base - theta)

                @pl.when(it > burnin)
                def _():
                    bterm_sc[:] = jnp.zeros((d, R, Cf), dt)

                prop = theta + g1 * (pm - pn) + bterm_sc[:]
            else:
                prop = theta + np.float32(fixed_g1) * (pm - pn)

            log_adj = None
            if theta_s > 0.0:
                # ---- snooker branch, mixed per chain with prob θsnooker
                # (crossover.jl:239-257 + the (d−1)-log-norm MH correction
                # of crossover.jl:268-273).  3 distinct draws INCLUDING
                # self — from the current group (in-kernel index draws)
                # or, in resample mode, the history triple fetched by the
                # caller (crossover.jl:241 via the de.sample slot).
                if sn_partners is not None:
                    pz, pm2, pn2 = sn_partners
                else:
                    az = randint(1, Np)
                    bz = randint(1, Np - 1)
                    cz = randint(1, Np - 2)
                    bz = bz + (bz >= az)
                    lo_i = jnp.minimum(az, bz)
                    hi_i = jnp.maximum(az, bz)
                    cz = cz + (cz >= lo_i)
                    cz = cz + (cz >= hi_i)
                    pz, pm2, pn2 = _seg_gather_bin_multi(
                        theta, [az, bz, cz], p, Np)
                pd = theta - pz                         # [d, R, Cf]
                den0 = jnp.sum(pd * pd, axis=0)         # ‖θ−z‖², [R, Cf]
                degen = den0 <= tiny
                safe_pd = jnp.where(degen, np.float32(1.0), pd)
                dens = jnp.sum(safe_pd * safe_pd, axis=0)
                r1 = (jnp.sum(pm2 * safe_pd, axis=0) / dens) * safe_pd
                r2 = (jnp.sum(pn2 * safe_pd, axis=0) / dens) * safe_pd
                gsn = uni(1) + np.float32(1.2)          # γ ~ U(1.2, 2.2)
                sn_gate = uni(1) <= np.float32(theta_s)
                prop = jnp.where(sn_gate, theta + gsn * (r1 - r2), prop)

            if eps > 0.0:
                prop = prop + (uni(d) * np.float32(2 * eps)
                               - np.float32(eps))
            if kappa < 1.0:                            # recombination
                keep = uni(d) > np.float32(1.0 - kappa)
                prop = jnp.where(keep, prop, theta)

            if bkeep is not None:
                # reset! semantics (crossover.jl:336-352): non-block dims
                # revert to current values, BEFORE the snooker MH
                # correction (crossover.jl:84-87).  The mask is static —
                # iota-compare selects per retained dim (no captured
                # array constants, Mosaic-safe construct classes).
                dimI = jax.lax.broadcasted_iota(jnp.int32, (d, R, Cf), 0)
                bm = None
                for i in range(d):
                    if bkeep[i]:
                        t = dimI == i
                        bm = t if bm is None else bm | t
                prop = theta if bm is None else jnp.where(bm, prop, theta)

            if theta_s > 0.0:
                # degenerate z == θ draws propose θ exactly (explicit reject
                # via -inf adj, replacing the reference's accidental-NaN
                # reject); correction computed on the FINAL proposal like
                # crossover.jl:84-87, as 0.5(d−1)(log‖θ'−z‖² − log‖θ−z‖²)
                prop = jnp.where(sn_gate & degen, theta, prop)
                a1sq = jnp.sum((prop - pz) * (prop - pz), axis=0)
                adj = (np.float32(0.5 * (d - 1))
                       * (jnp.log(a1sq) - jnp.log(den0)))
                adj = jnp.where(degen, -jnp.inf, adj)
                log_adj = jnp.where(sn_gate, adj, np.float32(0.0))

            if beta > 0.0:                             # β-mutation per group
                if mut_gate is None:
                    gate = uni(1)
                    gate = _seg_leader_bcast(gate, p, Np)  # one per group
                else:
                    gate = mut_gate                    # sequential: per
                    # sweep (main.jl:199-207), drawn by run_sweeps
                u1 = jnp.maximum(uni(d), tiny)
                u2 = uni(d)
                nrm = jnp.sqrt(np.float32(-2.0) * jnp.log(u1)) \
                    * jnp.cos(np.float32(2.0 * np.pi) * u2)
                mut = gate <= np.float32(beta)
                prop = jnp.where(mut, theta + np.float32(sigma) * nrm, prop)
                if log_adj is not None:                # mutation: no snooker
                    log_adj = jnp.where(mut, np.float32(0.0), log_adj)

            if int_dims:
                # integer snap (utilities.jl:360-369): after the mutation
                # merge, before bounds/fitness — exactly like the XLA step
                dimI2 = jax.lax.broadcasted_iota(jnp.int32, (d, R, Cf), 0)
                im = None
                for i in int_dims:
                    t = dimI2 == i
                    im = t if im is None else im | t
                prop = jnp.where(im, jnp.round(prop), prop)

            # ---- fitness: bounds + user log posterior (utilities.jl:92-99) ---
            # per-dimension scalar-literal bounds (array bounds would be
            # captured constants, which Pallas rejects); ±inf rows skipped
            inb = jnp.ones((R, Cf), bool)
            for i in range(d):
                row = prop[i]                          # [R, Cf]
                if np.isfinite(lo_b[i, 0]):
                    inb = inb & (row >= np.float32(lo_b[i, 0]))
                if np.isfinite(hi_b[i, 0]):
                    inb = inb & (row <= np.float32(hi_b[i, 0]))
            nz = None
            if stochastic:
                # fresh pseudo-marginal noise per evaluation, from the
                # hardware PRNG (the in-kernel analogue of the XLA
                # path's per-(iteration, block) key)
                nz = uni(noise_words).reshape(noise_shape + (R, Cf))
            lp = lp_conv(prop, ship_vals, nz)          # [R, Cf]
            bad = inf32 if mode == "min" else -inf32   # evaluate_fun!'s ∓inf
            w_prop = jnp.where(inb & ~jnp.isnan(lp), lp, bad)

            # ---- accept: MH in log space (utilities.jl:201-210) or greedy
            # (maximize!/minimize!, utilities.jl:212-226; log_adj ignored).
            # The u draw is unconditional so the stream layout is static
            # across modes.
            u = jnp.maximum(uni(1), tiny)
            if mode == "mh":
                delta = w_prop - w
                if log_adj is not None:
                    delta = delta + log_adj
                acc = jnp.log(u) <= delta
            elif mode == "max":
                acc = w_prop > w
            else:
                acc = w_prop < w
            if member is not None:
                acc = acc & (p == member)   # sequential: this sub-sweep
                # commits only group slot `member` (crossover.jl:12-17)
            new_t = jnp.where(acc, prop, theta)
            new_w = jnp.where(acc, w_prop, w)
            return new_t, new_w, acc

        def run_sweeps(theta, w, bkeep, block=0):
            """One reference sweep: synchronous (one vectorized pass) or
            sequential (reference-exact: n_members masked sub-sweeps,
            partners recomputed from the partially-updated group —
            crossover.jl:12-17; the synchronous form's invariance bias
            at small Np is documented on DE.sweep)."""
            if resample:
                def do(t, ww, m=None, g=None):
                    return one_sweep_resample(t, ww, bkeep, member=m,
                                              mut_gate=g, block=block)
            else:
                def do(t, ww, m=None, g=None):
                    return one_sweep(t, ww, bkeep, member=m, mut_gate=g)
            if not seq:
                return do(theta, w)
            mg = None
            if beta > 0.0:
                mg = _seg_leader_bcast(uni(1), p, Np)
            acc_tot = jnp.zeros((R, Cf), jnp.bool_)
            for p0 in range(Np):
                theta, w, acc = do(theta, w, p0, mg)
                acc_tot = acc_tot | acc     # acc already member-masked
            return theta, w, acc_tot

        theta = theta_sc[:]                        # [d, R, Cf]
        w = w_sc[:]                                # [R, Cf]
        if blocks_flat is None:
            new_t, new_w, acc = run_sweeps(theta, w, None)
        else:
            # block_update! (main.jl:174-179): one full sweep per block,
            # later blocks see earlier blocks' accepts; accept/lp of the
            # LAST block are what gets recorded (utilities.jl:201-210
            # overwrites once per block)
            for bi, bkeep in enumerate(blocks_flat):
                new_t, new_w, acc = run_sweeps(theta, w, bkeep, bi)
                theta, w = new_t, new_w
        theta_sc[:] = new_t
        w_sc[:] = new_w
        out_t_ref[0] = new_t
        out_w_ref[0] = new_w
        out_acc_ref[0] = acc
        if resample:
            # store_samples! (utilities.jl:161-180): the updated real
            # chains land in history row it-1 — slab (it-1)//B, lane
            # window ((it-1)%B)·C.  Row 0 of the population scratch is
            # read back as a REF load (address math, no value relayout)
            # and shifted to the window by a dynamic lane roll.
            roww = it - 1
            slab_w = roww // np.int32(B_hist)
            if stream:
                # window-relative slab; clamped so a driver running
                # iterations past the grown history (out of contract —
                # sample() always grows H >= n_iter) corrupts the last
                # window slab instead of writing far outside the VMEM
                # buffer and FAULTING the device (observed on-chip r5)
                slab_w = jnp.clip(slab_w - wb, 0, W_win - 1)
            else:
                slab_w = jnp.minimum(slab_w, np.int32(S_hist - 1))
            off = (roww % np.int32(B_hist)) * np.int32(C_real)
            row0 = theta_sc[:, 0, :]                      # [d, Cf]
            moved = pltpu.roll(row0, off, axis=1)
            cur = hist_sc[pl.ds(slab_w, 1)].reshape(d, Cf)
            win = (lane_h >= off) & (lane_h < off + np.int32(C_real))
            hist_sc[pl.ds(slab_w, 1)] = jnp.where(
                win, moved, cur).reshape(1, d, Cf)
        # migration gate for the NEXT iteration (main.jl:85's rand() <= α,
        # drawn one step ahead so the decision costs no extra kernel)
        u_fire = uni(1)
        if alpha > 0.0:
            gbit = ((u_fire <= np.float32(alpha))
                    & (rowI == 0) & (lane == 0))
            nfire = jnp.sum(gbit.astype(jnp.int32))
            if not mig_in_kernel and K > 1:
                # window-accumulated count (mesh superstep: every
                # coalesced event replays at the next boundary)
                fire_sc[0] = fire_sc[0] + nfire
            else:
                fire_sc[0] = nfire
        else:
            fire_sc[0] = jnp.int32(0)

        @pl.when(k == K - 1)
        def _():
            out_fire_ref[0] = fire_sc[0]
            if resample and not stream:
                cp = pltpu.make_async_copy(hist_sc, hist_out_ref, dma_sem)
                cp.start()
                cp.wait()
            # stream: the window output block flushes itself (normal
            # pallas output pipeline); XLA dynamic_update_slices it
            # back into the HBM history after the launch

    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)

    def vfull():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs = ([smem(), smem(), smem()]           # it0, key, fire_in
                # partner indices: flat SMEM scalars (narrow) or one
                # [K·slots, Cf] VMEM row per (iteration, slot) (wide)
                + ([vfull() if wide else smem()] if resample else [])
                + ([vfull()] if stream else [])    # pre-gathered rows
                + ([vfull()] if interpret else [])
                + [vfull() for _ in ship] + [vfull(), vfull()]
                + ([vfull()] if stream else          # window [W, d, Cf]
                   [pl.BlockSpec(memory_space=pl.ANY)]   # history HBM
                   if resample else []))
    if emit == "all":
        T_out = K
        t_idx, w_idx = (lambda k: (k, 0, 0, 0)), (lambda k: (k, 0, 0))
    elif isinstance(emit, tuple) and emit[0] == "stride":
        # every stride-th iteration's values reach HBM: the output block
        # index advances once per stride window, so the window's LAST
        # write is what flushes — device-side thinning at K ≫ thin (one
        # launch per K/stride stored draws instead of per draw)
        stride = int(emit[1])
        if K % stride:
            raise ValueError(f"emit stride {stride} must divide K={K}")
        T_out = K // stride
        t_idx = (lambda k, s=stride: (k // s, 0, 0, 0))
        w_idx = (lambda k, s=stride: (k // s, 0, 0))
    else:                # 'last': constant block — final grid step wins
        T_out = 1
        t_idx, w_idx = (lambda k: (0, 0, 0, 0)), (lambda k: (0, 0, 0))
    out_specs = ((pl.BlockSpec((1, d, R, Cf), t_idx),
                  pl.BlockSpec((1, R, Cf), w_idx),
                  pl.BlockSpec((1, R, Cf), w_idx),
                  smem())
                 + (((pl.BlockSpec((W_win, d, Cf),
                                   lambda k: (0, 0, 0)),) if stream else
                     (pl.BlockSpec(memory_space=pl.ANY),))
                    if resample else ()))
    out_shape = ((jax.ShapeDtypeStruct((T_out, d, R, Cf), dt),
                  jax.ShapeDtypeStruct((T_out, R, Cf), dt),
                  jax.ShapeDtypeStruct((T_out, R, Cf), bool),
                  jax.ShapeDtypeStruct((1,), jnp.int32))
                 + ((jax.ShapeDtypeStruct(
                         ((W_win if stream else S_hist), d, Cf), dt),)
                    if resample else ()))
    scratch_shapes = [pltpu.VMEM((d, R, Cf), dt), pltpu.VMEM((R, Cf), dt)]
    if is_random_gamma:
        scratch_shapes.append(pltpu.VMEM((d, R, Cf), dt))   # bterm
    scratch_shapes.append(pltpu.SMEM((1,), jnp.int32))      # fire
    if resample and not stream:
        # in-VMEM engine only: whole-history scratch + DMA semaphore
        # (the stream engine's window lives in its OUTPUT block)
        scratch_shapes.append(pltpu.VMEM((S_hist, d, Cf), dt))
        scratch_shapes.append(pltpu.SemaphoreType.DMA)
    if wide:
        # wide fetch staging row: lets the one-hot window gather run
        # under pl.when(any partner in window) — ~never in steady state
        scratch_shapes.append(pltpu.VMEM((d, Cf), dt))
    vmem_budget = 64 * 1024 * 1024
    io_aliases = {}
    if resample:
        # history window/scratch (+ pre-gather input) on top of the
        # standard budget
        vmem_budget += ((W_win + n_pre) if stream else S_hist) * d * Cf * 4
        # the history input updates in place (only rows < it are ever
        # read and only row it-1 is written, so the k==0 DMA-in never
        # races the k==K-1 DMA-out of the same launch).  Stream mode:
        # the window input/output pair aliases the same way.
        n_inputs = (3 + 1 + (1 if stream else 0)
                    + (1 if interpret else 0) + len(ship) + 2 + 1)
        io_aliases = {n_inputs - 1: 4}
    call = pl.pallas_call(
        kernel,
        grid=(K,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        input_output_aliases=io_aliases,
        # the TPU-specific interpreter (plain interpret=True lacks rules
        # for pltpu primitives: prng_seed, roll, ...)
        interpret=pltpu.InterpretParams() if interpret else False,
        # heavy densities (e.g. LBA: ~13 live [n_obs, R, Cf] blocks) blow
        # the default 16 MiB scoped-vmem budget; physical VMEM is larger
        # on v5e+.  If the chip can't honor it, compilation fails at the
        # lower() below and the caller falls back to the XLA step.
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=vmem_budget),
    )

    def _resample_idx(key2, it32):
        """Per-launch partner indices [K, n_slots, C_real] int32, packed
        slab·Cf + lane.  Slots 0-1: the DE pair; 2-4: the snooker triple
        (each tuple without replacement over the flat (row, chain) space
        — resample_flat_indices, the same draw semantics as the XLA
        path, on its own tagged key stream).  The key is folded PER
        ITERATION (vmap over the launch's K iterations), so any mix of
        launch sizes K produces identical chains — the same bitwise
        superstep contract as the hardware PRNG's per-iteration
        re-seeding."""
        key = jax.random.wrap_key_data(key2.astype(jnp.uint32),
                                       impl="threefry2x32")
        kres = jax.random.fold_in(key, rng.RESAMPLE)

        def one_iter(it_k):
            kd = rng.KeyDraws(jax.random.fold_in(kres, it_k))
            count = jnp.maximum(it_k - 1, 1)
            # one tuple set per MEMBER (sequential mode: each sub-sweep
            # draws its own pair/triple; n_members == 1 in sync mode),
            # distinct WITHIN each (member, chain) tuple
            rows, chains_ = proposal_ops.resample_flat_indices(
                kd, 2, count, C_real, (n_blk * n_members, C_real))
            if theta_s > 0.0:
                r2, c2 = proposal_ops.resample_flat_indices(
                    kd, 3, count, C_real, (n_blk * n_members, C_real))
                rows = jnp.concatenate([rows, r2])       # [slots, M, C]
                chains_ = jnp.concatenate([chains_, c2])
            slab = rows // B_hist
            lanep = (rows % B_hist) * C_real + chains_
            packed = (slab * Cf + lanep).astype(jnp.int32)
            # (block, member)-major slot order (fetch index
            # (block·n_members + member)·n_slots + s)
            out = jnp.transpose(packed, (1, 0, 2)).reshape(
                n_slots_tot, C_real)
            if wide:
                # pad the chain axis to the Cf-lane rows the VMEM index
                # input wants (pad lanes fetch row 0/chain 0 — read by
                # pad lanes only, which are never consumed)
                out = jnp.concatenate(
                    [out, jnp.zeros((n_slots_tot, Cf - C_real),
                                    jnp.int32)], axis=1)
            return out

        its = it32 + jnp.arange(K, dtype=jnp.int32)
        arr = jax.vmap(one_iter)(its)
        if wide:
            return arr.reshape(K * n_slots_tot, Cf)
        # FLAT layout (see fetch_hist): [K·slots·C] — an N-D SMEM array
        # would be tile-padded to (8, 128) minors
        return arr.reshape(-1)

    def _resample_pre(idx_flat, hist):
        """XLA pre-gather for the streaming engine: history columns for
        every flat fetch j, lane-packed ``[n_pre, d, Cf]`` (value j at
        slab j//Cf, lane j%Cf — the kernel reads by its own static
        fetch order).  Fetches whose row falls in the launch's write
        window gather garbage here (their slab index is still in
        bounds) and are overridden in-kernel from the VMEM window."""
        S = hist.shape[0]
        # transpose-to-[S·Cf, d] + row take: O(S) per launch, but the
        # MEASURED best of three gather formulations on this backend
        # (v5e, wide C=512, n=12k, K=6): 18.2 µs/iter here vs 25.1 for
        # multi-dim advanced indexing and 61.8 for a flat scalar take —
        # XLA's TPU gather lowerings degrade far below a bulk relayout
        hist2 = jnp.transpose(hist, (0, 2, 1)).reshape(S * Cf, d)
        N = idx_flat.shape[0]
        pad = n_pre * Cf - N
        idxp = jnp.concatenate(
            [idx_flat, jnp.zeros((pad,), jnp.int32)]) if pad else idx_flat
        vals = jnp.take(hist2, idxp, axis=0)              # [n_pre·Cf, d]
        return jnp.transpose(vals.reshape(n_pre, Cf, d), (0, 2, 1))

    def kernel_call(theta3, weight3, key2, it, fire, hist=None):
        it32 = it.astype(jnp.int32)
        extra = ()
        if resample:
            idx_flat = _resample_idx(key2, it32)
            extra += (idx_flat,)
            if stream:
                extra += (_resample_pre(idx_flat.reshape(-1), hist),)
        if interpret:
            key = jax.random.wrap_key_data(key2, impl="threefry2x32")
            bits = [jax.random.bits(jax.random.fold_in(key, it32 + kk),
                                    (n_words, C), jnp.uint32)
                    for kk in range(K)]
            if mig_replay:
                # boundary-replay draw rows (3 per potential event),
                # appended past the K·n_words per-iteration rows;
                # dedicated salted namespace.  The count a launch
                # receives is bounded by the PREVIOUS launch's K (a
                # run_scan mixes superstep/thin/remainder kernels), so
                # the row budget uses a fixed cap covering every K this
                # package builds (super_k() caps at 256)
                rkey = jax.random.fold_in(
                    jax.random.fold_in(key, 0x5EED5A17 & 0x7FFFFFFF),
                    it32)
                bits.append(jax.random.bits(rkey, (3 * _REPLAY_E_CAP, C),
                                            jnp.uint32))
            extra += (jnp.concatenate(bits, axis=0),)
        if stream:
            # XLA slices the launch's write window out of the HBM
            # history and splices the kernel's updated window back —
            # the full history never round-trips (partial-ref DMAs on
            # ANY refs crash this backend, probe_mosaic9b); wb must
            # match the kernel's own formula exactly
            wb = jnp.minimum((it32 - 1) // B_hist, S_hist - W_win)
            z = jnp.int32(0)
            hist_arg = jax.lax.dynamic_slice(
                hist, (wb, z, z), (W_win, d, Cf))
        else:
            hist_arg = hist
        args = (list(extra) + [jnp.asarray(x) for x in ship]
                + [theta3, weight3] + ([hist_arg] if resample else []))
        out = call(it32.reshape(1), key2.astype(jnp.uint32),
                   fire.reshape(1).astype(jnp.int32), *args)
        if resample:
            t, wout, a, f, hist_out = out
            if stream:
                hist_out = jax.lax.dynamic_update_slice(
                    hist, hist_out, (wb, z, z))
            return t, wout, a, f.reshape(1, 1), hist_out
        t, wout, a, f = out
        return t, wout, a, f.reshape(1, 1)

    # surface unsupported-op errors at build time so the caller can fall
    # back to the XLA step: on the real path, LOWER through the Mosaic
    # pipeline (eval_shape only traces — a kernel using an op Mosaic
    # can't lower would otherwise die at first execution, deep inside the
    # driver's jitted scan); lowering is local and cheap, unlike the
    # remote backend compile
    shapes = (jax.ShapeDtypeStruct((d, R, Cf), dt),
              jax.ShapeDtypeStruct((R, Cf), dt),
              jax.ShapeDtypeStruct((2,), jnp.uint32),
              jax.ShapeDtypeStruct((), jnp.int32),
              jax.ShapeDtypeStruct((1, 1), jnp.int32))
    if resample:
        shapes += (jax.ShapeDtypeStruct((S_hist, d, Cf), dt),)
    if interpret:
        jax.eval_shape(kernel_call, *shapes)
    else:
        jax.jit(kernel_call).lower(*shapes)
    kernel_call.n_words = n_words
    kernel_call.K = K
    return kernel_call
