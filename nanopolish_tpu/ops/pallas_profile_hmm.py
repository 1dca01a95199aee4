"""Pallas TPU kernel: profile-HMM Forward scoring (kernel #2 fast path).

The XLA `lax.scan` implementation (ops/profile_hmm.py) is semantically
exact but compiles per (T, K, flags) bucket — minutes per bucket on
remote-attached chips — and pays scan-step overhead.  This kernel runs the
whole Forward pass as one Pallas program with ONE compiled shape:

  * kmer blocks on the 256-lane axis (every reference call site fits:
    eventalign segments ~105 kmers, methylation groups <= 221, variant
    windows <= 261 clipped by span checks);
  * segments batched on sublanes; events stream as 128-row grid blocks;
  * soft-clip flags enter as runtime 0/1 vectors, so pre/post-clip
    combinations do not recompile;
  * the K-state skip chain collapses via the (logsumexp,+) linear
    recurrence: K = logcumsumexp(c - k*lp_kk) + k*lp_kk — O(log W) rolls
    (src/hmm/nanopolish_profile_hmm_r9.inl:148-162 semantics).

Emission/transition math mirrors ops/profile_hmm.py exactly
(r9.inl:17-76, :199-260); parity is tested against the scan kernel and the
cell-by-cell NumPy port.  Known divergence: the collapsed K-chain computes
path scores as (c - j*lp_kk) + k*lp_kk, whose float rounding can resolve
exactly-tied Viterbi optima differently than incremental addition — only
observable in degenerate few-event segments; NPT_HMM_IMPL=scan selects the
bit-exact path.
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .emissions import LOG_INV_SQRT_2PI
from .profile_hmm import (HAF_ALLOW_POST_CLIP, HAF_ALLOW_PRE_CLIP, LOG_BG,
                          TRANS_CLIP_SELF, TRANS_START_TO_CLIP)

KP = 256         # kmer lanes
R = 128          # rows per grid step
NEG = -1.0e30

_LOG1M_CLIP = math.log(1.0 - TRANS_START_TO_CLIP)
_CLIP_BASE = math.log(TRANS_START_TO_CLIP) + LOG_BG + \
    math.log(1.0 - TRANS_CLIP_SELF)
_CLIP_STEP = math.log(TRANS_CLIP_SELF) + LOG_BG


def _iota(n):
    return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)


def _iota_b(b, n):
    return jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)


def _shr1(x, fill):
    r = pltpu.roll(x, 1, 1)
    return jnp.where(_iota(x.shape[1]) == 0, fill, r)


def _logaddexp(a, b):
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    return mx + jnp.log(1.0 + jnp.exp(jnp.maximum(mn - mx, -80.0)))


def _logcumsumexp(x):
    """Inclusive prefix logsumexp along lanes.

    Linear-space formulation: one exp + one log per row with a plain
    prefix-sum between (terms >80 nats below the row max underflow to 0,
    exactly as exact logsumexp would round them away in f32).
    """
    m = jnp.max(x, axis=1, keepdims=True)
    e = jnp.exp(jnp.maximum(x - m, -80.0))
    n = x.shape[1]
    d = 1
    while d < n:
        shifted = pltpu.roll(e, d, 1)
        shifted = jnp.where(_iota(n) < d, 0.0, shifted)
        e = e + shifted
        d *= 2
    return jnp.log(e) + m


def _flank(i_f):
    """pre_flank[i] / post_flank reversed (r9.inl:199-260); i_f float."""
    return jnp.where(i_f == 0.0, _LOG1M_CLIP,
                     _CLIP_BASE + (i_f - 1.0) * _CLIP_STEP)


def _fwd_kernel(ev_ref, a_ref, b2_ref, c0_ref, nev_ref, nk_ref, tr_ref,
                clip_ref, out_ref, m_st, b_st, k_st, end_st):
    """NOTE on shapes: Mosaic scalarizes [B,1]-shaped logical/select ops
    (~16us each at B=512), so every mask/select here is computed at full
    [B,KP] width; [B,1] values only ever feed arithmetic broadcasts."""
    i = pl.program_id(0)
    B = ev_ref.shape[0]
    Rb = ev_ref.shape[1]       # rows per grid step (64 for short-event
    #                            buckets, else the default R)
    KP = a_ref.shape[1]        # kmer lanes (shadows the default width)
    lanes = _iota(KP)
    lanes_b = _iota_b(B, KP)
    lanes_fb = lanes_b.astype(jnp.float32)

    nev = nev_ref[:, 0:1]
    nk = nk_ref[:, 0:1]
    lp_mk = tr_ref[:, 0:1]
    lp_mb = tr_ref[:, 1:2]
    lp_mm_self = tr_ref[:, 2:3]
    lp_mm_next = tr_ref[:, 3:4]
    lp_bb = tr_ref[:, 4:5]
    lp_b3 = tr_ref[:, 5:6]
    lp_kk = tr_ref[:, 6:7]
    lp_km = tr_ref[:, 7:8]

    # full-width per-segment constants (hoisted; avoids [B,1] logical ops)
    nev_w = jnp.broadcast_to(nev, (B, KP))
    nev_wf = nev_w.astype(jnp.float32)
    last_w = lanes_b == (jnp.broadcast_to(nk, (B, KP)) - 1)
    pre_w = jnp.broadcast_to(clip_ref[:, 0:1] > 0.5, (B, KP))
    post_w = jnp.broadcast_to(clip_ref[:, 1:2] > 0.5, (B, KP))
    k0_w = lanes_b == 0

    @pl.when(i == 0)
    def _():
        m_st[:] = jnp.full((B, KP), NEG, jnp.float32)
        b_st[:] = jnp.full((B, KP), NEG, jnp.float32)
        k_st[:] = jnp.full((B, KP), NEG, jnp.float32)
        end_st[:] = jnp.full((B, KP), NEG, jnp.float32)

    def row(r, _):
        t = i * Rb + r + 1                                   # 1-based row
        t_f = jnp.float32(t)
        active_w = t <= nev_w                                # [B,KP]
        ev = jnp.max(jnp.where(_iota_b(B, Rb) == r, ev_ref[:, :], NEG),
                     axis=1, keepdims=True)                  # [B,1] (arith only)

        M, Bs, Ks = m_st[:], b_st[:], k_st[:]
        Mp = _shr1(M, NEG)
        Bp = _shr1(Bs, NEG)
        Kp = _shr1(Ks, NEG)

        dev = a_ref[:] * ev - b2_ref[:]
        em = c0_ref[:] - 0.5 * dev * dev

        soft_ok_w = pre_w | (t == 1)
        s_soft = jnp.where(k0_w & soft_ok_w & active_w,
                           _flank(t_f - 1.0), NEG)

        x0 = lp_mm_self + M
        x1 = lp_mm_next + Mp
        x2 = lp_b3 + Bs
        x3 = lp_b3 + Bp
        x4 = lp_km + Kp
        x5 = s_soft
        mx = jnp.maximum(jnp.maximum(jnp.maximum(x0, x1),
                                     jnp.maximum(x2, x3)),
                         jnp.maximum(x4, x5))
        esum = (jnp.exp(jnp.maximum(x0 - mx, -80.0))
                + jnp.exp(jnp.maximum(x1 - mx, -80.0))
                + jnp.exp(jnp.maximum(x2 - mx, -80.0))
                + jnp.exp(jnp.maximum(x3 - mx, -80.0))
                + jnp.exp(jnp.maximum(x4 - mx, -80.0))
                + jnp.exp(jnp.maximum(x5 - mx, -80.0)))
        M_new = mx + jnp.log(esum) + em

        B_new = _logaddexp(lp_mb + M, lp_bb + Bs)

        c = _logaddexp(lp_mk + _shr1(M_new, NEG), lp_b3 + _shr1(B_new, NEG))
        z = c - lanes_fb * lp_kk
        K_new = _logcumsumexp(z) + lanes_fb * lp_kk

        # end contributions at full width, accumulated on the last-kmer lane
        post_flank = _flank(nev_wf - t_f)                    # [B,KP]
        s3 = _logaddexp(_logaddexp(M_new, B_new), K_new)
        allowed_w = active_w & (post_w | (t == nev_w))
        cand = jnp.where(last_w & allowed_w, s3 + post_flank, NEG)
        end_st[:] = _logaddexp(end_st[:], cand)

        m_st[:] = jnp.where(active_w, M_new, M)
        b_st[:] = jnp.where(active_w, B_new, Bs)
        k_st[:] = jnp.where(active_w, K_new, Ks)
        return 0

    jax.lax.fori_loop(0, Rb, row, 0, unroll=False)
    out_ref[:] = jnp.max(end_st[:], axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=())
def _profile_hmm_forward_call(ev, a_tab, b2_tab, c0_tab, nev, nk, trans,
                              clips):
    B, TP = ev.shape
    KP = a_tab.shape[1]
    Rb = min(R, TP)            # short-event buckets ride one 64-row step
    grid = TP // Rb
    return pl.pallas_call(
        _fwd_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((B, Rb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, KP), jnp.float32),
            pltpu.VMEM((B, KP), jnp.float32),
            pltpu.VMEM((B, KP), jnp.float32),
            pltpu.VMEM((B, KP), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(ev, a_tab, b2_tab, c0_tab, nev, nk, trans, clips)


def _np_transitions(events_per_base, indel_bias: float,
                    p_skip=None, p_bad=None, p_skip_self=None,
                    p_bad_self=None):
    """make_transitions in pure numpy (r9.inl:17-76): jnp here would issue
    a device dispatch per op — hundreds of ms of RTT on remote chips.
    Defaults follow the process-wide TransitionKnobs overrides."""
    from .profile_hmm import TransitionKnobs
    p_skip = TransitionKnobs.p_skip if p_skip is None else p_skip
    p_bad = TransitionKnobs.p_bad if p_bad is None else p_bad
    p_skip_self = (TransitionKnobs.p_skip_self if p_skip_self is None
                   else p_skip_self)
    if p_bad_self is None:
        p_bad_self = TransitionKnobs.p_bad_self
    if p_bad_self is None:
        p_bad_self = p_bad
    epb = np.maximum(1.25, np.asarray(events_per_base, np.float64) * indel_bias)
    p_stay = 1.0 - 1.0 / epb
    p_mm_next = 1.0 - p_stay - p_skip - p_bad
    p_b3 = (1.0 - p_bad_self) / 3.0
    cols = [np.full_like(p_stay, np.log(p_skip)),        # lp_mk
            np.full_like(p_stay, np.log(p_bad)),         # lp_mb
            np.log(p_stay),                              # lp_mm_self
            np.log(p_mm_next),                           # lp_mm_next
            np.full_like(p_stay, np.log(p_bad_self)),    # lp_bb
            np.full_like(p_stay, np.log(p_b3)),          # lp_b3 (= lp_bk)
            np.full_like(p_stay, np.log(p_skip_self)),   # lp_kk
            np.full_like(p_stay, np.log(1 - p_skip_self))]  # lp_km
    return np.stack(cols, axis=1).astype(np.float32)


def _pad_to(n, q):
    return max(q, -(-n // q) * q)


def _pad_to_pow2(n, lo=8):
    p = lo
    while p < n:
        p *= 2
    return p


def _pack_hmm_inputs(levels, n_events, mu, sigma, log_sigma, n_kmers,
                     events_per_base, flags, indel_bias, kp=None,
                     r_min=R):
    """One [B, TP+3*KP+12] f32 array holding every kernel input — a single
    host->device transfer per call instead of eight (each transfer costs a
    relay round trip on remotely-attached chips).  Layout: ev | a | b2 |
    c0 | nev (i32 bitcast) | nk (i32 bitcast) | trans[8] | clips[2]."""
    levels = np.asarray(levels, np.float32)
    mu = np.asarray(mu, np.float32)
    sigma = np.asarray(sigma, np.float32)
    log_sigma = np.asarray(log_sigma, np.float32)
    n_events = np.asarray(n_events, np.int32)
    n_kmers = np.asarray(n_kmers, np.int32)
    flags = np.broadcast_to(np.asarray(flags, np.int32), n_events.shape)

    B0, T0 = levels.shape
    K0 = mu.shape[1]
    # per-call kmer-lane bucket: small windows (e.g. variants screening,
    # ~13 kmers) ride a 128-lane kernel instead of the 256-lane maximum,
    # halving the wire format and the per-row VPU work; one compile per
    # (TP, KP) bucket.  256 is a hard ceiling: the Viterbi trace packs
    # K-skip distances into uint8 clipped at 126, so wider kernels would
    # backtrack wrong silently (callers split windows above 256 kmers —
    # segments.py guards this).
    KP = kp if kp is not None else _pad_to_pow2(K0, lo=128)
    assert K0 <= KP <= 256, f"kmer width {K0} exceeds the 256-lane ceiling"
    # pad B to a power of two (not just x8): remainder chunks otherwise
    # compile a fresh kernel per arbitrary batch size, and remote compiles
    # cost minutes each
    B = _pad_to_pow2(B0)
    # Forward-only callers pass r_min=64: a 64-row bucket halves the row
    # work for short-event segments (variants screening windows run ~42
    # events).  The Viterbi kernels keep the 128-row grid (their packed
    # trace blocks are R-row-major), so their callers leave the default.
    TP = 64 if (T0 <= 64 and r_min <= 64) else _pad_to(T0, R)

    packed = np.zeros((B, TP + 3 * KP + 12), np.float32)
    packed[:B0, :T0] = levels
    kmask = _iota_np(B0, K0) < n_kmers[:, None]
    inv = 1.0 / np.maximum(sigma, 1e-30)
    o = TP
    packed[:B0, o:o + K0] = np.where(kmask, inv, 0.0)
    o += KP
    packed[:B0, o:o + K0] = np.where(kmask, mu * inv, 0.0)
    o += KP
    packed[:, o:o + KP] = NEG
    packed[:B0, o:o + K0] = np.where(kmask, LOG_INV_SQRT_2PI - log_sigma, NEG)
    o += KP
    nev = np.ones((B,), np.int32)
    nev[:B0] = np.maximum(n_events, 1)
    nk = np.ones((B,), np.int32)
    nk[:B0] = np.maximum(n_kmers, 1)
    packed[:, o] = nev.view(np.float32)
    packed[:, o + 1] = nk.view(np.float32)
    trans = _np_transitions(
        np.pad(np.asarray(events_per_base, np.float32), (0, B - B0),
               constant_values=2.0), indel_bias)
    packed[:, o + 2:o + 10] = trans
    packed[:B0, o + 10] = (flags & HAF_ALLOW_PRE_CLIP) > 0
    packed[:B0, o + 11] = (flags & HAF_ALLOW_POST_CLIP) > 0
    return packed, TP, B0, nev, nk


def _unpack_hmm_inputs(packed, TP):
    KP = (packed.shape[1] - TP - 12) // 3
    o = TP
    ev = packed[:, :TP]
    a_tab = packed[:, o:o + KP]; o += KP
    b2_tab = packed[:, o:o + KP]; o += KP
    c0_tab = packed[:, o:o + KP]; o += KP
    nev = jax.lax.bitcast_convert_type(packed[:, o:o + 1], jnp.int32)
    nk = jax.lax.bitcast_convert_type(packed[:, o + 1:o + 2], jnp.int32)
    trans = packed[:, o + 2:o + 10]
    clips = packed[:, o + 10:o + 12]
    return ev, a_tab, b2_tab, c0_tab, nev, nk, trans, clips


@functools.partial(jax.jit, static_argnames=("TP",))
def _profile_hmm_forward_call_packed(packed, TP):
    return _profile_hmm_forward_call(*_unpack_hmm_inputs(packed, TP))


@functools.partial(jax.jit, static_argnames=("TP",))
def _profile_hmm_viterbi_call_packed(packed, TP):
    return _profile_hmm_viterbi_call(*_unpack_hmm_inputs(packed, TP))


@functools.partial(jax.jit, static_argnames=("TP", "KP", "S"))
def _assemble_windows(wire_i, lev_buf, tabs_flat, TP, KP, S):
    """Device-side assembly of the flat packed wire from the compact
    'windows' wire (csrc npt_build_hmm_wire_compact layout): level
    windows gather from whole-read rows, a/b2/c0 gather from per-read
    tables.  f32-identical to _pack_hmm_inputs over the host-gathered
    matrices (b2 = mu*inv is the same f32 product; everything else is
    value copies) — pinned by tests."""
    ranks = wire_i[:, :KP]
    nev = wire_i[:, KP]
    nk = wire_i[:, KP + 1]
    trans_clips = jax.lax.bitcast_convert_type(
        wire_i[:, KP + 2:KP + 12], jnp.float32)
    lev_pos = wire_i[:, KP + 12]
    estep = wire_i[:, KP + 13]
    tab = wire_i[:, KP + 14]

    ti = jnp.arange(TP, dtype=jnp.int32)
    tidx = lev_pos[:, None] + ti[None, :] * estep[:, None]
    tmask = ti[None, :] < nev[:, None]
    levels = jnp.where(
        tmask, lev_buf[jnp.clip(tidx, 0, lev_buf.shape[0] - 1)], 0.0)
    ki = jnp.arange(KP, dtype=jnp.int32)
    kmask = ki[None, :] < nk[:, None]
    fidx = tab[:, None] * S + ranks        # padded ranks are 0: in-range
    mu = tabs_flat[0][fidx]
    inv = tabs_flat[1][fidx]
    c0v = tabs_flat[2][fidx]
    a = jnp.where(kmask, inv, jnp.float32(0.0))
    b2 = jnp.where(kmask, mu * inv, jnp.float32(0.0))
    c0 = jnp.where(kmask, c0v, jnp.float32(NEG))
    tail = jnp.concatenate(
        [jax.lax.bitcast_convert_type(nev[:, None], jnp.float32),
         jax.lax.bitcast_convert_type(nk[:, None], jnp.float32),
         trans_clips], axis=1)
    return jnp.concatenate([levels, a, b2, c0, tail], axis=1)


@functools.partial(jax.jit, static_argnames=("TP", "KP", "S"))
def _forward_windows_call(wire_i, lev_buf, tabs_flat, TP, KP, S):
    packed = _assemble_windows(wire_i, lev_buf, tabs_flat, TP, KP, S)
    return _profile_hmm_forward_call(*_unpack_hmm_inputs(packed, TP))


def profile_hmm_forward_pallas(levels, n_events, mu, sigma, log_sigma,
                               n_kmers, events_per_base, flags,
                               indel_bias: float = 1.0) -> np.ndarray:
    """Batched Forward scores via the Pallas kernel.

    Args match ops.profile_hmm.profile_hmm_forward, except `flags` may be
    a per-segment int array (mixed clip flags share one compile).
    Requires n_kmers <= 256.
    """
    packed, TP, B0, _, _ = _pack_hmm_inputs(
        levels, n_events, mu, sigma, log_sigma, n_kmers, events_per_base,
        flags, indel_bias, r_min=64)
    out = _profile_hmm_forward_call_packed(packed, TP)
    return np.asarray(out)[:B0, 0]


def _iota_np(b, n):
    return np.broadcast_to(np.arange(n)[None, :], (b, n))


# ---------------------------------------------------------------------------
# Indexed Forward drain: device-side segment assembly
# ---------------------------------------------------------------------------
# High-volume scoring callers (variants screening: ~200k segments per
# 1.2 kb window) were transfer-bound: the flat wire format ships
# TP + 3*KP + 12 floats per segment (~2.1 kB) although a segment's
# unique data is 3 small integers — its event range, its read's model
# tables, and its kmer-rank row are all SHARED with hundreds of sibling
# segments.  The indexed wire transfers each unique piece once:
#
#   levels_unique [E, Tc]   drift-corrected event slices (one per unique
#                           (read, strand, e1, e2) range)
#   tabs [3, R, S]          per-(read, strand, model) mu / sigma /
#                           log-sigma tables (log computed on HOST so
#                           scores stay bit-identical to the flat path)
#   rank_mat [U, Kc]        unique kmer-rank rows
#   trans_u [R2, 8]         per-(read, strand) transition rows
#   ids [n, 4]              per-segment (ev_id, tab_id, rank_id, trans_id)
#   n_ev_u [E], n_km_u [U], clips [n, 2]
#
# and the jitted program gathers + pads on device, then runs the SAME
# Forward kernel.  Everything rides ONE h2d array (ints bitcast into the
# f32 payload).

def _pack_indexed(levels_unique, n_ev_u, tabs, rank_mat, n_km_u, trans_u,
                  ids, clips):
    parts = [levels_unique.ravel(),
             n_ev_u.view(np.float32),
             tabs.ravel(),
             rank_mat.view(np.float32).ravel(),
             n_km_u.view(np.float32),
             trans_u.ravel(),
             ids.view(np.float32).ravel(),
             clips.ravel()]
    return np.concatenate(parts)


@functools.partial(jax.jit, static_argnames=("E", "Tc", "R", "S", "U", "Kc",
                                             "R2", "n", "TP", "KP"))
def _forward_indexed_call(wire, E, Tc, R, S, U, Kc, R2, n, TP, KP):
    o = 0

    def take(count, shape, dtype=jnp.float32):
        nonlocal o
        flat = jax.lax.dynamic_slice(wire, (o,), (count,))
        o += count
        if dtype != jnp.float32:
            flat = jax.lax.bitcast_convert_type(flat, dtype)
        return flat.reshape(shape)

    levels_u = take(E * Tc, (E, Tc))
    n_ev_u = take(E, (E,), jnp.int32)
    tabs = take(3 * R * S, (3, R, S))
    rank_mat = take(U * Kc, (U, Kc), jnp.int32)
    n_km_u = take(U, (U,), jnp.int32)
    trans_u = take(R2 * 8, (R2, 8))
    ids = take(n * 4, (n, 4), jnp.int32)
    clips = take(n * 2, (n, 2))

    ev_id, tab_id, rank_id, trans_id = (ids[:, 0], ids[:, 1], ids[:, 2],
                                        ids[:, 3])
    ranks = rank_mat[rank_id]                      # [n, Kc]
    mu = tabs[0][tab_id[:, None], ranks]
    sig = tabs[1][tab_id[:, None], ranks]
    logsig = tabs[2][tab_id[:, None], ranks]
    n_km = n_km_u[rank_id]
    kmask = jax.lax.broadcasted_iota(jnp.int32, (n, Kc), 1) < n_km[:, None]
    # identical expressions to _pack_hmm_inputs (f32 elementwise ops are
    # bit-deterministic, so scores match the flat wire path)
    inv = 1.0 / jnp.maximum(sig, 1e-30)
    a_tab = jnp.where(kmask, inv, 0.0)
    b2_tab = jnp.where(kmask, mu * inv, 0.0)
    c0_tab = jnp.where(kmask, np.float32(LOG_INV_SQRT_2PI) - logsig, NEG)
    pad_k = ((0, 0), (0, KP - Kc))
    a_tab = jnp.pad(a_tab, pad_k)
    b2_tab = jnp.pad(b2_tab, pad_k)
    c0_tab = jnp.pad(c0_tab, pad_k, constant_values=NEG)

    ev = jnp.pad(levels_u[ev_id], ((0, 0), (0, TP - Tc)))
    nev = jnp.maximum(n_ev_u[ev_id], 1)[:, None]
    nk = jnp.maximum(n_km, 1)[:, None]
    trans = trans_u[trans_id]
    return _profile_hmm_forward_call(ev, a_tab, b2_tab, c0_tab, nev, nk,
                                     trans, clips)


def _pad_rows(x, n, fill=0):
    if x.shape[0] == n:
        return x
    pad = np.full((n - x.shape[0],) + x.shape[1:], fill, x.dtype)
    return np.concatenate([x, pad], axis=0)


def _pad_cols(x, w, fill=0):
    if x.shape[1] == w:
        return x
    if x.shape[1] > w:
        return x[:, :w]
    pad = np.full((x.shape[0], w - x.shape[1]), fill, x.dtype)
    return np.concatenate([x, pad], axis=1)


def forward_indexed(levels_unique, n_ev_u, tabs, rank_mat, n_km_u, trans_u,
                    ids, flags, indel_bias_applied=True):
    """Score n segments given the indexed wire pieces (see block comment).

    levels_unique [E, Tc] f32, n_ev_u [E] i32, tabs [3, R, S] f32
    (mu/sigma/log-sigma), rank_mat [U, Kc] i32, n_km_u [U] i32,
    trans_u [R2, 8] f32 (already indel-bias adjusted), ids [n, 4] i32,
    flags [n] i32.  Returns [n] f32 Forward scores.  Dispatches one
    device call per (TP, KP) bucket; every input rides one h2d array.
    """
    n = ids.shape[0]
    out = np.zeros(n, np.float32)
    if n == 0:
        return out
    n_ev = n_ev_u[ids[:, 0]]
    n_km = n_km_u[ids[:, 2]]
    tp_all = np.maximum(64, np.exp2(np.ceil(np.log2(
        np.maximum(n_ev, 1)))).astype(np.int64))
    kp_all = np.maximum(128, np.exp2(np.ceil(np.log2(
        np.maximum(n_km, 1)))).astype(np.int64))
    clips = np.stack([(flags & HAF_ALLOW_PRE_CLIP) > 0,
                      (flags & HAF_ALLOW_POST_CLIP) > 0],
                     axis=1).astype(np.float32)

    import jax.numpy as jnp

    pending = []
    for key in {(int(t), int(k)) for t, k in zip(tp_all, kp_all)}:
        TP, KP = key
        sel = np.flatnonzero((tp_all == TP) & (kp_all == KP))
        # VMEM-derived batch cap (same budget as the flat drain: the
        # kernel's scratch is 4 x [B, KP] f32 and its row blocks are
        # [B, 128] — an uncapped B would blow past physical VMEM)
        bytes_per_seg = 4 * (TP + 3 * KP + 12) + 16 * KP
        cap = 512
        while cap * 2 * bytes_per_seg <= (45 << 20) and cap < 4096:
            cap *= 2
        # sub-select the unique rows this bucket touches so the wire
        # stays proportional to the bucket
        for lo in range(0, len(sel), cap):
            ii = sel[lo:lo + cap]
            sub = ids[ii]
            ue, ue_inv = np.unique(sub[:, 0], return_inverse=True)
            ur, ur_inv = np.unique(sub[:, 2], return_inverse=True)
            # quantize the compact widths (they are STATIC compile
            # shapes — unquantized, every flush with a new max length
            # would compile a fresh program, minutes each on
            # remotely-attached chips)
            Tc = min(_pad_to(int(n_ev_u[ue].max()), 64), TP)
            Kc = min(_pad_to(int(n_km_u[ur].max()), 32), KP)
            lev_b = np.ascontiguousarray(
                _pad_cols(levels_unique[ue], Tc))
            rank_b = np.ascontiguousarray(_pad_cols(rank_mat[ur], Kc))
            sub2 = np.stack([ue_inv, sub[:, 1], ur_inv, sub[:, 3]],
                            axis=1).astype(np.int32)
            # pad row counts to powers of two (compile-shape hygiene:
            # E/U/B/R/R2 are static shapes, so arbitrary counts would
            # compile fresh programs).  E and U further pad UP to B —
            # uniques never exceed segment count, the extra wire is
            # ~Tc*4 bytes/row, and tying the three collapses the
            # compile-shape space to (B, Tc, Kc, TP, KP) (remote
            # compiles cost minutes each)
            B = _pad_to_pow2(sub2.shape[0])
            E = U = B          # uniques <= segments <= B (cap 4096)
            Rp = _pad_to_pow2(tabs.shape[1])
            R2 = _pad_to_pow2(trans_u.shape[0])
            S = _pad_to_pow2(tabs.shape[2], lo=1024)
            tabs_p = np.zeros((3, Rp, S), np.float32)
            tabs_p[1] += 1.0
            tabs_p[:, :tabs.shape[1], :tabs.shape[2]] = tabs
            wire = _pack_indexed(
                _pad_rows(lev_b, E), _pad_rows(n_ev_u[ue], E, 1),
                tabs_p,
                _pad_rows(rank_b, U), _pad_rows(n_km_u[ur], U, 1),
                _pad_rows(trans_u.astype(np.float32), R2),
                _pad_rows(sub2, B),
                _pad_rows(clips[ii].astype(np.float32), B))
            dev = _forward_indexed_call(
                jnp.asarray(wire), E, Tc, Rp, S, U, Kc, R2, B, TP, KP)
            pending.append((ii, dev, len(ii)))
    from ..utils.syncstats import timed_fetch
    flat = timed_fetch(jnp.concatenate([d[:b, 0] for _, d, b in pending])) \
        if len(pending) > 1 else timed_fetch(pending[0][1][:pending[0][2], 0])
    off = 0
    for ii, _d, b in pending:
        out[ii] = flat[off:off + b]
        off += b
    return out


# ---------------------------------------------------------------------------
# Viterbi + trace kernels (profile_hmm_align fast path)
# ---------------------------------------------------------------------------
# Trace encoding per cell:
#   tr1 byte: low 3 bits = M-state move (HMT_* 0..5), bit 3 = B-state move
#             (1 = FROM_SAME_B, 0 = FROM_SAME_M)
#   trk byte: K-state collapsed chain: ((distance to head) << 1) | head_is_B
#             distance = #PREV_K hops (0 = this lane's direct entry won)
# Rows are entered at M/B (from the row above) or K (via M's FROM_PREV_K);
# one chain resolve + one M/B move happens per row — the backtrack kernel
# emits per-row (k_entry, st_entry, d, head_b, mv) and the host expands the
# reference's HMMAlignmentState list (r9.cpp:73-204 semantics).

HMT_FROM_SAME_M = 0
HMT_FROM_PREV_M = 1
HMT_FROM_SAME_B = 2
HMT_FROM_PREV_B = 3
HMT_FROM_PREV_K = 4
HMT_FROM_SOFT = 5

ST_K, ST_B, ST_M = 0, 1, 2


def _vit_kernel(ev_ref, a_ref, b2_ref, c0_ref, nev_ref, nk_ref, tr_ref,
                clip_ref, tr1_ref, trk_ref, out_ref,
                m_st, b_st, k_st):
    i = pl.program_id(0)
    B = ev_ref.shape[0]
    KP = a_ref.shape[1]        # kmer lanes (shadows the default width)
    lanes = _iota(KP)
    lanes_f = lanes.astype(jnp.float32)

    nev = nev_ref[:, 0:1]
    nk = nk_ref[:, 0:1]
    lp_mk = tr_ref[:, 0:1]
    lp_mb = tr_ref[:, 1:2]
    lp_mm_self = tr_ref[:, 2:3]
    lp_mm_next = tr_ref[:, 3:4]
    lp_bb = tr_ref[:, 4:5]
    lp_b3 = tr_ref[:, 5:6]
    lp_kk = tr_ref[:, 6:7]
    lp_km = tr_ref[:, 7:8]
    pre_clip = clip_ref[:, 0:1]

    @pl.when(i == 0)
    def _():
        m_st[:] = jnp.full((B, KP), NEG, jnp.float32)
        b_st[:] = jnp.full((B, KP), NEG, jnp.float32)
        k_st[:] = jnp.full((B, KP), NEG, jnp.float32)

    k0 = lanes == 0

    def row(r, _):
        t = i * R + r + 1
        t_f = jnp.float32(t)
        active = t <= nev
        ev = jnp.max(jnp.where(_iota_b(B, R) == r, ev_ref[:, :], NEG),
                     axis=1, keepdims=True)

        M, Bs, Ks = m_st[:], b_st[:], k_st[:]
        Mp = _shr1(M, NEG)
        Bp = _shr1(Bs, NEG)
        Kp = _shr1(Ks, NEG)

        dev = a_ref[:] * ev - b2_ref[:]
        em = c0_ref[:] - 0.5 * dev * dev

        soft_ok = (pre_clip > 0.5) | (t == 1)
        s_soft = jnp.where(k0 & soft_ok & active, _flank(t_f - 1.0), NEG)

        x0 = lp_mm_self + M
        x1 = lp_mm_next + Mp
        x2 = lp_b3 + Bs
        x3 = lp_b3 + Bp
        x4 = lp_km + Kp
        x5 = s_soft
        m_in = jnp.maximum(jnp.maximum(jnp.maximum(x0, x1),
                                       jnp.maximum(x2, x3)),
                           jnp.maximum(x4, x5))
        # LAST equal index wins (r9.inl:140-146)
        trM = jnp.zeros((B, KP), jnp.int32)
        trM = jnp.where(x1 == m_in, HMT_FROM_PREV_M, trM)
        trM = jnp.where(x2 == m_in, HMT_FROM_SAME_B, trM)
        trM = jnp.where(x3 == m_in, HMT_FROM_PREV_B, trM)
        trM = jnp.where(x4 == m_in, HMT_FROM_PREV_K, trM)
        trM = jnp.where(x5 == m_in, HMT_FROM_SOFT, trM)
        M_new = m_in + em

        b0 = lp_mb + M
        b2v = lp_bb + Bs
        B_new = jnp.maximum(b0, b2v)
        trB = (b2v == B_new).astype(jnp.int32)

        cM = lp_mk + _shr1(M_new, NEG)
        cB = lp_b3 + _shr1(B_new, NEG)
        c = jnp.maximum(cM, cB)
        head_b = (cB >= cM).astype(jnp.int32)
        z = c - lanes_f * lp_kk
        # (max,+) prefix with leftmost-strict-winner head recovery
        p_inc = z
        d = 1
        while d < KP:
            sh = pltpu.roll(p_inc, d, 1)
            sh = jnp.where(_iota(KP) < d, NEG, sh)
            p_inc = jnp.maximum(p_inc, sh)
            d *= 2
        p_exc = _shr1(p_inc, NEG)
        K_new = jnp.maximum(z, p_exc) + lanes_f * lp_kk
        head = z > p_exc
        hsrc = jnp.where(head, lanes, -1)
        d = 1
        while d < KP:
            sh = pltpu.roll(hsrc, d, 1)
            sh = jnp.where(_iota(KP) < d, -1, sh)
            hsrc = jnp.maximum(hsrc, sh)
            d *= 2
        # distance from each lane to its chain head (clamped to 126)
        dist = jnp.clip(lanes - hsrc, 0, 126)

        # head_b must be sampled AT the head lane; gather-by-roll:
        # head_b_chain[k] = head_b[hsrc[k]].  hsrc = k - dist, so roll
        # head_b right by each power of two where the distance bit is set.
        hbv = head_b
        bit = 1
        while bit < KP:
            rolled = pltpu.roll(hbv, bit, 1)
            rolled = jnp.where(_iota(KP) < bit, 0, rolled)
            hbv = jnp.where((dist & bit) > 0, rolled, hbv)
            bit *= 2

        tr1 = (trM | (trB << 3)).astype(jnp.uint8)
        trk = ((dist << 1) | hbv).astype(jnp.uint8)
        tr1_ref[r, :, :] = tr1
        trk_ref[r, :, :] = trk

        m_st[:] = jnp.where(active, M_new, M)
        b_st[:] = jnp.where(active, B_new, Bs)
        k_st[:] = jnp.where(active, K_new, Ks)
        return 0

    jax.lax.fori_loop(0, R, row, 0, unroll=False)
    out_ref[:] = m_st[:, 0:1]


def _vit_backtrack_kernel(tr1_ref, trk_ref, nev_ref, nk_ref,
                          ke_ref, meta_ref,
                          cur_k, cur_st, cur_e, done):
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    B = nev_ref.shape[0]
    KP = tr1_ref.shape[2]      # kmer lanes (shadows the default width)
    lanes = _iota_b(B, KP)

    @pl.when(i == 0)
    def _():
        cur_k[:] = nk_ref[:, 0:1] - 1
        cur_st[:] = jnp.full((B, 1), ST_M, jnp.int32)
        cur_e[:] = nev_ref[:, 0:1]
        done[:] = nev_ref[:, 0:1] < 1

    def row(r_rev, _):
        r = R - 1 - r_rev
        t = (n_steps - 1 - i) * R + r + 1
        act = jnp.logical_not(done[:]) & (cur_e[:] == t)

        tr1_row = tr1_ref[r, :, :].astype(jnp.int32)
        trk_row = trk_ref[r, :, :].astype(jnp.int32)

        k_entry = cur_k[:]
        st_entry = cur_st[:]

        # --- resolve a K-chain entry (same row) ---
        is_k = act & (st_entry == ST_K)
        trk_v = jnp.max(jnp.where(lanes == k_entry, trk_row, 0),
                        axis=1, keepdims=True)
        dist = trk_v >> 1
        head_b = trk_v & 1
        k_mb = jnp.where(is_k, k_entry - dist - 1, k_entry)
        st_mb = jnp.where(is_k, jnp.where(head_b > 0, ST_B, ST_M), st_entry)

        # --- one M/B move (consumes the row) ---
        tr1_v = jnp.max(jnp.where(lanes == jnp.clip(k_mb, 0, KP - 1),
                                  tr1_row, 0), axis=1, keepdims=True)
        trM = tr1_v & 7
        trB = (tr1_v >> 3) & 1
        is_m = st_mb == ST_M
        mv = jnp.where(is_m, trM,
                       jnp.where(trB > 0, HMT_FROM_SAME_B, HMT_FROM_SAME_M))
        soft = act & is_m & (mv == HMT_FROM_SOFT)

        nxt_st = jnp.where((mv == HMT_FROM_SAME_M) | (mv == HMT_FROM_PREV_M),
                           ST_M,
                           jnp.where((mv == HMT_FROM_SAME_B)
                                     | (mv == HMT_FROM_PREV_B), ST_B, ST_K))
        dec = (mv == HMT_FROM_PREV_M) | (mv == HMT_FROM_PREV_B) | \
            (mv == HMT_FROM_PREV_K)
        nxt_k = k_mb - dec.astype(jnp.int32)

        ke_ref[r, :] = jnp.where(act, k_entry, -1)[:, 0]
        meta = (st_entry | (jnp.where(is_k, dist, 0) << 2)
                | (jnp.where(is_k, head_b, 0) << 10)
                | (soft.astype(jnp.int32) << 11)
                | (jnp.where(act, mv, 0) << 12))
        meta_ref[r, :] = jnp.where(act, meta, -1)[:, 0]

        step = act & jnp.logical_not(soft)
        cur_e[:] = jnp.where(step, cur_e[:] - 1, cur_e[:])
        cur_k[:] = jnp.where(step, nxt_k, cur_k[:])
        cur_st[:] = jnp.where(step, nxt_st, cur_st[:])
        done[:] = done[:] | soft | (step & (nxt_k < 0)) | \
            (step & (cur_e[:] < 1))
        return 0

    jax.lax.fori_loop(0, R, row, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=())
def _profile_hmm_viterbi_call(ev, a_tab, b2_tab, c0_tab, nev, nk, trans,
                              clips):
    B, TP = ev.shape
    KP = a_tab.shape[1]
    grid = TP // R
    vmem = pltpu.VMEM
    tr1, trk, _ = pl.pallas_call(
        _vit_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((B, R), lambda i: (0, i), memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
        ],
        out_specs=(
            pl.BlockSpec((R, B, KP), lambda i: (i, 0, 0), memory_space=vmem),
            pl.BlockSpec((R, B, KP), lambda i: (i, 0, 0), memory_space=vmem),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=vmem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((TP, B, KP), jnp.uint8),
            jax.ShapeDtypeStruct((TP, B, KP), jnp.uint8),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, KP), jnp.float32),
            pltpu.VMEM((B, KP), jnp.float32),
            pltpu.VMEM((B, KP), jnp.float32),
        ],
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(ev, a_tab, b2_tab, c0_tab, nev, nk, trans, clips)

    grid_b = TP // R
    rev3 = lambda i: (grid_b - 1 - i, 0, 0)
    rev2 = lambda i: (grid_b - 1 - i, 0)
    ke, meta = pl.pallas_call(
        _vit_backtrack_kernel,
        grid=(grid_b,),
        in_specs=[
            pl.BlockSpec((R, B, KP), rev3, memory_space=vmem),
            pl.BlockSpec((R, B, KP), rev3, memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
        ],
        out_specs=(
            pl.BlockSpec((R, B), rev2, memory_space=vmem),
            pl.BlockSpec((R, B), rev2, memory_space=vmem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((TP, B), jnp.int32),
            jax.ShapeDtypeStruct((TP, B), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, 1), jnp.int32),
            pltpu.VMEM((B, 1), jnp.int32),
            pltpu.VMEM((B, 1), jnp.int32),
            pltpu.VMEM((B, 1), jnp.bool_),
        ],
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(tr1, trk, nev, nk)
    return ke, meta


def _expand_backtrack(ke, meta, n_events, n_kmers):
    """Per-segment (event_offsets, kmer_idxs, state_string) in forward
    order from the kernel's per-row (k_entry, meta) emissions.

    The expansion of each row is independent (the kernel already did the
    serial walk), so it runs vectorized per segment: the scalar loop's
    descending scan + final reverse is equivalent to ascending valid
    rows, where a K row contributes its landing entry (B/M) followed by
    its skipped kmers ascending, and the scan stops below the highest
    valid row whose soft bit is set (the scalar `break` fires only for
    rows that pass the k_entry >= 0 guard)."""
    out = []
    T, B = ke.shape
    ke = np.asarray(ke)
    meta = np.asarray(meta)
    st_all = meta & 3
    dist_all = (meta >> 2) & 0xFF
    head_all = (meta >> 10) & 1
    soft_all = (meta >> 11) & 1
    for b in range(B):
        ne = int(n_events[b])
        keb = ke[:ne, b]
        valid = keb >= 0
        softs = np.flatnonzero((soft_all[:ne, b] == 1) & valid)
        t0 = int(softs[-1]) if softs.size else 0
        sel = np.flatnonzero(valid[t0:]) + t0
        if sel.size == 0:
            out.append((np.zeros(0, np.int32), np.zeros(0, np.int32), ""))
            continue
        kes = keb[sel].astype(np.int64)
        sts = st_all[sel, b]
        ds = dist_all[sel, b].astype(np.int64)
        hs = head_all[sel, b]
        isk = sts == ST_K
        cnt = np.where(isk, ds + 2, 1)
        off = np.concatenate([[0], np.cumsum(cnt)])
        total = int(off[-1])
        evs = np.repeat(sel, cnt).astype(np.int32)
        kms = np.empty(total, np.int64)
        chars = np.full(total, 75, np.uint8)                  # 'K'
        first = off[:-1]
        base_km = np.where(isk, kes - ds - 1, kes)
        kms[first] = base_km
        chars[first] = np.where(isk, np.where(hs == 1, 66, 77),
                                np.where(sts == ST_M, 77, 66))
        tail = np.ones(total, bool)
        tail[first] = False
        if tail.any():
            blk = np.repeat(np.arange(sel.size), cnt)
            j = np.arange(total) - off[blk]
            kms[tail] = base_km[blk[tail]] + j[tail]
        out.append((evs, kms.astype(np.int32),
                    chars.tobytes().decode("ascii")))
    return out


def profile_hmm_viterbi_pallas(levels, n_events, mu, sigma, log_sigma,
                               n_kmers, events_per_base, flags,
                               indel_bias: float = 1.0):
    """Batched Viterbi alignment via the Pallas kernels; returns the same
    per-segment backtracks as ops.profile_hmm.viterbi_backtrack."""
    packed, TP, B0, nev, nk = _pack_hmm_inputs(
        levels, n_events, mu, sigma, log_sigma, n_kmers, events_per_base,
        flags, indel_bias)
    ke, meta = _profile_hmm_viterbi_call_packed(packed, TP)
    return _expand_backtrack(np.asarray(ke), np.asarray(meta),
                             nev, nk)[:B0]


# ---------------------------------------------------------------------------
# Packed Forward drain: many small segments per lane row
# ---------------------------------------------------------------------------
# The screening workloads score ~16-kmer windows: one segment per
# 128-lane row leaves 87% of the VPU idle, and the reference shape —
# ~10 sequence alternatives (base + 9 candidate edits) scored against
# the SAME event slice of the same read (call_variants.cpp:288-361) —
# means rows could carry many segments.  forward_packed bin-packs the
# segments of each (event range, read transitions, flags) group onto one
# lane row and runs a Forward kernel whose kmer-axis recurrences are
# SEGMENTED: the K-state skip chain's prefix logsumexp, its per-segment
# max, and the shift-by-one-kmer all reset at segment boundaries carried
# as within-segment position / distance-to-end lane maps.  Each row
# shares its event stream, transitions, and nev, so the event-axis loop
# is unchanged.  Scores are exact within the same tolerance as the flat
# kernel vs the scan oracle (the per-segment logsumexp max differs in
# f32 rounding from the flat row-wide max, like the flat kernel's
# collapsed K-chain differs from scan's incremental addition).

def _fwd_packed_kernel(ev_ref, a_ref, b2_ref, c0_ref, nev_ref, tr_ref,
                       clip_ref, pos_ref, rev_ref, out_ref,
                       m_st, b_st, k_st, end_st, *, scan_hi):
    # grid (row_blocks, time_blocks), row-major: each row block's DP
    # carry lives in scratch across its time blocks.  Row blocking
    # bounds VMEM by the block, not the batch, so one dispatch can take
    # ~8x more rows — each dispatch costs a fixed ~80 ms of relay
    # enqueue latency on remotely-attached chips (round-5 measurement)
    i = pl.program_id(1)
    B = a_ref.shape[0]
    Rb = ev_ref.shape[1]
    KP = a_ref.shape[1]

    nev = nev_ref[:, 0:1]
    lp_mk = tr_ref[:, 0:1]
    lp_mb = tr_ref[:, 1:2]
    lp_mm_self = tr_ref[:, 2:3]
    lp_mm_next = tr_ref[:, 3:4]
    lp_bb = tr_ref[:, 4:5]
    lp_b3 = tr_ref[:, 5:6]
    lp_kk = tr_ref[:, 6:7]
    lp_km = tr_ref[:, 7:8]

    pos = pos_ref[:]                       # [B,KP] within-segment index,
    rev = rev_ref[:]                       #        -1 on dead lanes
    live_w = pos >= 0
    start_w = pos == 0
    last_w = live_w & (rev == 0)
    pos_f = jnp.maximum(pos, 0).astype(jnp.float32)
    # loop-invariant scan masks (hoisted out of the row loop)
    ds = []
    d = 1
    while d < max(scan_hi, 2):
        ds.append((d, pos >= d, rev >= d))
        d *= 2

    nev_w = jnp.broadcast_to(nev, (B, KP))
    nev_wf = nev_w.astype(jnp.float32)
    pre_w = jnp.broadcast_to(clip_ref[:, 0:1] > 0.5, (B, KP))
    post_w = jnp.broadcast_to(clip_ref[:, 1:2] > 0.5, (B, KP))

    @pl.when(i == 0)
    def _():
        m_st[:] = jnp.full((B, KP), NEG, jnp.float32)
        b_st[:] = jnp.full((B, KP), NEG, jnp.float32)
        k_st[:] = jnp.full((B, KP), NEG, jnp.float32)
        end_st[:] = jnp.full((B, KP), NEG, jnp.float32)

    def seg_shr1(x):
        return jnp.where(start_w, NEG, pltpu.roll(x, 1, 1))

    def row(r, _):
        t = i * Rb + r + 1
        t_f = jnp.float32(t)
        active_w = t <= nev_w
        ev = jnp.max(jnp.where(_iota_b(B, Rb) == r, ev_ref[:, :], NEG),
                     axis=1, keepdims=True)

        M, Bs, Ks = m_st[:], b_st[:], k_st[:]
        Mp = seg_shr1(M)
        Bp = seg_shr1(Bs)
        Kp = seg_shr1(Ks)

        dev = a_ref[:] * ev - b2_ref[:]
        em = c0_ref[:] - 0.5 * dev * dev

        soft_ok_w = pre_w | (t == 1)
        s_soft = jnp.where(start_w & soft_ok_w & active_w,
                           _flank(t_f - 1.0), NEG)

        x0 = lp_mm_self + M
        x1 = lp_mm_next + Mp
        x2 = lp_b3 + Bs
        x3 = lp_b3 + Bp
        x4 = lp_km + Kp
        x5 = s_soft
        mx = jnp.maximum(jnp.maximum(jnp.maximum(x0, x1),
                                     jnp.maximum(x2, x3)),
                         jnp.maximum(x4, x5))
        esum = (jnp.exp(jnp.maximum(x0 - mx, -80.0))
                + jnp.exp(jnp.maximum(x1 - mx, -80.0))
                + jnp.exp(jnp.maximum(x2 - mx, -80.0))
                + jnp.exp(jnp.maximum(x3 - mx, -80.0))
                + jnp.exp(jnp.maximum(x4 - mx, -80.0))
                + jnp.exp(jnp.maximum(x5 - mx, -80.0)))
        M_new = mx + jnp.log(esum) + em

        B_new = _logaddexp(lp_mb + M, lp_bb + Bs)

        c = _logaddexp(lp_mk + seg_shr1(M_new), lp_b3 + seg_shr1(B_new))
        z = c - pos_f * lp_kk
        # segmented logcumsumexp: per-segment max via prefix-max then
        # suffix-max, then a segmented prefix sum in linear space
        pm = jnp.where(live_w, z, NEG)
        for d_, mp_, mr_ in ds:
            pm = jnp.maximum(pm, jnp.where(mp_, pltpu.roll(pm, d_, 1), NEG))
        sm = pm
        for d_, mp_, mr_ in ds:
            # leftward pull: roll right by KP - d (pltpu.roll is rotate,
            # negative shifts are rejected)
            sm = jnp.maximum(sm, jnp.where(mr_, pltpu.roll(sm, KP - d_, 1),
                                           NEG))
        e = jnp.exp(jnp.maximum(z - sm, -80.0))
        for d_, mp_, mr_ in ds:
            e = e + jnp.where(mp_, pltpu.roll(e, d_, 1), 0.0)
        K_new = jnp.log(e) + sm + pos_f * lp_kk

        post_flank = _flank(nev_wf - t_f)
        s3 = _logaddexp(_logaddexp(M_new, B_new), K_new)
        allowed_w = active_w & (post_w | (t == nev_w))
        cand = jnp.where(last_w & allowed_w, s3 + post_flank, NEG)
        end_st[:] = _logaddexp(end_st[:], cand)

        m_st[:] = jnp.where(active_w, M_new, M)
        b_st[:] = jnp.where(active_w, B_new, Bs)
        k_st[:] = jnp.where(active_w, K_new, Ks)
        return 0

    jax.lax.fori_loop(0, Rb, row, 0, unroll=False)
    out_ref[:] = end_st[:]


def _packed_call(ev, a_tab, b2_tab, c0_tab, nev, trans, clips, pos, rev,
                 scan_hi):
    B, TP = ev.shape
    KP = a_tab.shape[1]
    Rb = min(R, TP)
    grid_t = TP // Rb
    Bb = min(B, 2048)
    grid_b = B // Bb

    def blk(w):
        return pl.BlockSpec((Bb, w), lambda r, t: (r, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_fwd_packed_kernel, scan_hi=scan_hi),
        grid=(grid_b, grid_t),
        in_specs=[
            pl.BlockSpec((Bb, Rb), lambda r, t: (r, t),
                         memory_space=pltpu.VMEM),
            blk(KP), blk(KP), blk(KP), blk(1), blk(8), blk(2),
            blk(KP), blk(KP),
        ],
        out_specs=blk(KP),
        out_shape=jax.ShapeDtypeStruct((B, KP), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Bb, KP), jnp.float32)
                        for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(ev, a_tab, b2_tab, c0_tab, nev, trans, clips, pos, rev)


@functools.partial(jax.jit, static_argnames=(
    "E", "Tc", "U", "Kc", "B", "R2", "n", "TP", "KP",
    "scan_hi"))
def _forward_packed_call(wire, tabs, E, Tc, U, Kc, B, R2, n, TP, KP,
                         scan_hi):
    # tabs [3, Rtab, S] rides as its own (device-resident) argument:
    # shipping it inside the wire re-transferred ~25 MB per dispatch at
    # 50 kb screening volume
    o = 0

    def take(count, shape, dtype=jnp.float32):
        nonlocal o
        flat = jax.lax.dynamic_slice(wire, (o,), (count,))
        o += count
        if dtype != jnp.float32:
            flat = jax.lax.bitcast_convert_type(flat, dtype)
        return flat.reshape(shape)

    levels_u = take(E * Tc, (E, Tc))
    n_ev_u = take(E, (E,), jnp.int32)
    rank_mat = take(U * Kc, (U, Kc), jnp.int32)
    trans_u = take(R2 * 8, (R2, 8))
    row_ev = take(B, (B,), jnp.int32)
    row_tr = take(B, (B,), jnp.int32)
    row_clip = take(B * 2, (B, 2))
    lane_rank = take(B * KP, (B, KP), jnp.int32)
    lane_tab = take(B * KP, (B, KP), jnp.int32)
    pos = take(B * KP, (B, KP), jnp.int32)
    rev = take(B * KP, (B, KP), jnp.int32)
    seg_idx = take(n, (n,), jnp.int32)

    live = pos >= 0
    ranks = rank_mat[lane_rank, jnp.minimum(jnp.maximum(pos, 0), Kc - 1)]
    mu = tabs[0][lane_tab, ranks]
    sig = tabs[1][lane_tab, ranks]
    logsig = tabs[2][lane_tab, ranks]
    # identical f32 expressions to _pack_hmm_inputs
    inv = 1.0 / jnp.maximum(sig, 1e-30)
    a_tab = jnp.where(live, inv, 0.0)
    b2_tab = jnp.where(live, mu * inv, 0.0)
    c0_tab = jnp.where(live, np.float32(LOG_INV_SQRT_2PI) - logsig, NEG)

    ev = jnp.pad(levels_u[row_ev], ((0, 0), (0, TP - Tc)))
    nev = jnp.maximum(n_ev_u[row_ev], 1)[:, None]
    trans = trans_u[row_tr]
    out = _packed_call(ev, a_tab, b2_tab, c0_tab, nev, trans, row_clip,
                       pos, rev, scan_hi)
    return out.reshape(-1)[seg_idx]


def _pack_rows(ids, widths, KP):
    """Sequential first-fit of segments into KP-lane rows, new row on
    group change — segments are pre-sorted by group key.  Returns
    (row_id, lane_off) int64 arrays.  Native when available (the Python
    loop ran at millions of segments per 50 kb window)."""
    from ..utils.native import get_native_lib
    lib = get_native_lib()
    if lib is not None and lib._pack_rows is not None:
        return lib.pack_rows(ids[:, 0], ids[:, 3], widths, KP)
    n = len(widths)
    row_id = np.zeros(n, np.int64)
    lane_off = np.zeros(n, np.int64)
    row = 0
    cur = 0
    prev_e = prev_x = -1
    ev_c, tr_c = ids[:, 0], ids[:, 3]
    for s in range(n):
        w = widths[s]
        if ev_c[s] != prev_e or tr_c[s] != prev_x or cur + w > KP:
            if s:
                row += 1
            cur = 0
            prev_e, prev_x = ev_c[s], tr_c[s]
        row_id[s] = row
        lane_off[s] = cur
        cur += w
    return row_id, lane_off




_FP_SCRATCH: dict = {}
_FP_LOCK = __import__("threading").Lock()


def _fp_scratch(n_rank_rows: int):
    """Epoch-stamped dedup scratch for the native packed-wire assembler,
    grown as needed and shared across calls (use under _FP_LOCK)."""
    with _FP_LOCK:
        st = _FP_SCRATCH.get("st")
        if st is None or len(st[0]) < n_rank_rows:
            st = (np.zeros(max(n_rank_rows, 1024), np.int32),
                  np.zeros(max(n_rank_rows, 1024), np.int32), [0])
            _FP_SCRATCH["st"] = st
        return st


def _nat_assemble(nat, sub, w, rid, loff, levels_unique, n_ev_u, rank_mat,
                  n_km_u, trans_u, clips_sub, scratch, B0, KP, TP, dims,
                  wire_buf):
    """Call csrc npt_fp_assemble, growing the shared wire buffer to fit
    (two-pass on overflow: the first call computes the exact size)."""
    import ctypes

    global _FP_WIRE
    mark, slot, epoch_box = scratch
    epoch_box[0] += 1
    epoch = epoch_box[0]
    n = sub.shape[0]
    ev_c = np.ascontiguousarray(sub[:, 0], np.int32)
    tab_c = np.ascontiguousarray(sub[:, 1], np.int32)
    rk_c = np.ascontiguousarray(sub[:, 2], np.int32)
    tr_c = np.ascontiguousarray(sub[:, 3], np.int32)
    wq = np.ascontiguousarray(w, np.int64)
    ridq = np.ascontiguousarray(rid, np.int64)
    loffq = np.ascontiguousarray(loff, np.int64)
    clipsq = np.ascontiguousarray(clips_sub, np.float32)
    lev = np.ascontiguousarray(levels_unique, np.float32)
    rkm = np.ascontiguousarray(rank_mat, np.int32)
    nev32 = np.ascontiguousarray(n_ev_u, np.int32)
    nkm32 = np.ascontiguousarray(n_km_u, np.int32)
    trq = np.ascontiguousarray(trans_u, np.float32)
    ue_buf = np.empty(n, np.int32)
    ur_buf = np.empty(n, np.int32)
    ue_inv = np.empty(n, np.int32)
    ur_inv = np.empty(n, np.int32)
    P32 = ctypes.POINTER(ctypes.c_int32)
    P64 = ctypes.POINTER(ctypes.c_int64)
    PF = ctypes.POINTER(ctypes.c_float)

    def call(buf):
        return nat._fp_assemble(
            ev_c.ctypes.data_as(P32), tab_c.ctypes.data_as(P32),
            rk_c.ctypes.data_as(P32), tr_c.ctypes.data_as(P32),
            wq.ctypes.data_as(P64), ridq.ctypes.data_as(P64),
            loffq.ctypes.data_as(P64), n,
            lev.ctypes.data_as(PF), lev.shape[1],
            nev32.ctypes.data_as(P32),
            rkm.ctypes.data_as(P32), rkm.shape[1],
            nkm32.ctypes.data_as(P32),
            trq.ctypes.data_as(PF), trq.shape[0],
            clipsq.ctypes.data_as(PF),
            mark.ctypes.data_as(P32), slot.ctypes.data_as(P32),
            len(mark), np.int32(epoch),
            B0, KP, TP,
            ue_buf.ctypes.data_as(P32), ur_buf.ctypes.data_as(P32),
            ue_inv.ctypes.data_as(P32), ur_inv.ctypes.data_as(P32),
            buf.ctypes.data_as(PF), len(buf),
            dims.ctypes.data_as(P64))

    buf = _FP_WIRE
    total = call(buf)
    if total < 0:
        _FP_WIRE = buf = np.empty(int(dims[9] * 1.5) + 1024, np.float32)
        epoch_box[0] += 1
        epoch = epoch_box[0]
        total = call(buf)
        assert total > 0
    return int(total)


_FP_WIRE = np.empty(0, np.float32)

def forward_packed(levels_unique, n_ev_u, tabs, rank_mat, n_km_u, trans_u,
                   ids, flags):
    """Score n segments given the indexed wire pieces (same contract as
    forward_indexed), packing the segments of each (event range,
    transition row) group onto shared lane rows.  Caller guarantees one
    flags value per flush (ScoreBatcher scores one flag set)."""
    n = ids.shape[0]
    out = np.zeros(n, np.float32)
    if n == 0:
        return out
    widths = n_km_u[ids[:, 2]].astype(np.int64)
    n_ev = n_ev_u[ids[:, 0]]
    tp_all = np.maximum(64, np.exp2(np.ceil(np.log2(
        np.maximum(n_ev, 1)))).astype(np.int64))
    clips = np.stack([(flags & HAF_ALLOW_PRE_CLIP) > 0,
                      (flags & HAF_ALLOW_POST_CLIP) > 0],
                     axis=1).astype(np.float32)

    import jax.numpy as jnp

    Rp = _pad_to_pow2(tabs.shape[1])
    S = _pad_to_pow2(tabs.shape[2], lo=1024)
    tabs_p = np.zeros((3, Rp, S), np.float32)
    tabs_p[1] += 1.0
    tabs_p[:, :tabs.shape[1], :tabs.shape[2]] = tabs
    tabs_dev = jnp.asarray(tabs_p)     # ONE h2d for every dispatch

    from ..utils.native import get_native_lib
    _nat = get_native_lib()
    _scratch = _fp_scratch(rank_mat.shape[0]) if _nat is not None else None
    _dims = np.zeros(10, np.int64)
    _wire_buf = np.empty(0, np.float32)

    pending = []
    _disp_pool = None
    _disp_futs = []

    def _stage(idx, sel_ss, nss, wire, dims):
        E_, Tc_, U_, Kc_, B_, R2_, npad_, TPl, KPl = dims
        dev = _forward_packed_call(
            jnp.asarray(wire), tabs_dev, E_, Tc_, U_, Kc_, B_, R2_,
            npad_, TPl, KPl, scan_hi)
        pending[idx] = (sel_ss, dev, nss)

    for TP in sorted({int(t) for t in tp_all}):
        sel = np.flatnonzero(tp_all == TP)
        # group-major order so _pack_rows sees groups contiguously;
        # arange tiebreak keeps packing deterministic
        order = np.lexsort((np.arange(len(sel)), ids[sel, 3], ids[sel, 0]))
        sel = sel[order]
        KP = max(128, _pad_to_pow2(int(widths[sel].max()), lo=8))
        if KP > 256:
            # wider than the lane ceiling: ride the indexed drain
            out[sel] = forward_indexed(
                levels_unique, n_ev_u, tabs, rank_mat, n_km_u, trans_u,
                ids[sel], flags[sel])
            continue
        scan_hi = _pad_to_pow2(int(widths[sel].max()), lo=2)
        row_id, lane_off = _pack_rows(ids[sel], widths[sel], KP)
        n_rows = int(row_id[-1]) + 1

        # row cap per dispatch: the kernel row-blocks its grid (VMEM is
        # bounded by the 2048-row block), so the cap is set by the wire
        # h2d size; each dispatch costs a fixed ~80 ms of relay enqueue
        # latency (round-5 measurement), so bigger is better
        bytes_per_row = 4 * (TP + 8 * KP + 13)
        cap = 256
        while cap * bytes_per_row <= (128 << 20) and cap < 32768:
            cap *= 2
        from ..utils.profiler import profile_scope
        lo_row = 0
        while lo_row < n_rows:
            hi_row = min(lo_row + cap, n_rows)
            _sc = profile_scope("fp.build"); _sc.__enter__()
            smask = (row_id >= lo_row) & (row_id < hi_row)
            ss = np.flatnonzero(smask)
            sub = ids[sel[ss]]
            rid = row_id[ss] - lo_row
            loff = lane_off[ss]
            w = widths[sel[ss]]
            B0 = hi_row - lo_row

            if _nat is not None and _nat._fp_assemble is not None:
                # native one-pass assembly (csrc npt_fp_assemble); ur
                # rows come in first-seen order (a consistent
                # relabeling of np.unique's sorted order — identical
                # gathered values, hence identical scores)
                nseg = len(ss)
                # the native assembler's dedup scratch + shared wire
                # buffer are module globals; serialize assembly so
                # worker-thread dispatch cannot corrupt an in-flight
                # wire (the copy happens under the same lock)
                with _FP_LOCK:
                    total = _nat_assemble(
                        _nat, sub, w, rid, loff, levels_unique, n_ev_u,
                        rank_mat, n_km_u, trans_u, clips[sel[ss]],
                        _scratch, B0, KP, TP, _dims, None)
                    (E0, U0, Tc, Kc, B, E, U, R2, npad,
                     _tot) = (int(x) for x in _dims)
                    wire = _FP_WIRE[:total].copy()
                _sc.__exit__(None, None, None)
                # h2d + dispatch on a small pool: jnp.asarray of a big
                # wire blocks on the relay write; staged off-thread it
                # overlaps the next chunk's assembly and other stagings
                if _disp_pool is None:
                    from concurrent.futures import ThreadPoolExecutor
                    _disp_pool = ThreadPoolExecutor(3)
                _disp_futs.append(_disp_pool.submit(
                    _stage, len(pending), sel[ss], len(ss), wire,
                    (E, Tc, U, Kc, B, R2, npad, TP, KP)))
                pending.append(None)
                lo_row = hi_row
                continue

            ue, ue_inv = np.unique(sub[:, 0], return_inverse=True)
            ur, ur_inv = np.unique(sub[:, 2], return_inverse=True)
            Tc = min(_pad_to(int(n_ev_u[ue].max()), 64), TP)
            Kc = _pad_to(int(n_km_u[ur].max()), 32)
            lev_b = np.ascontiguousarray(_pad_cols(levels_unique[ue], Tc))
            rank_b = np.ascontiguousarray(_pad_cols(rank_mat[ur], Kc))

            B = _pad_to_pow2(B0)
            E = _pad_to_pow2(len(ue))
            U = _pad_to_pow2(len(ur))     # uniques can exceed the ROW
            #                               count (many segments per row)
            R2 = _pad_to_pow2(trans_u.shape[0])

            # per-row metadata (rows of one group share ev/trans/clips)
            row_ev = np.zeros(B, np.int32)
            row_tr = np.zeros(B, np.int32)
            row_clip = np.zeros((B, 2), np.float32)
            row_ev[rid] = ue_inv
            row_tr[rid] = sub[:, 3]
            row_clip[rid] = clips[sel[ss]]
            # lane maps built from flat per-lane scatters
            tot = int(w.sum())
            rows_flat = np.repeat(rid, w)
            cw = np.concatenate([[0], np.cumsum(w)[:-1]])
            pos_flat = np.arange(tot, dtype=np.int64) - np.repeat(cw, w)
            lanes_flat = np.repeat(loff, w) + pos_flat
            lane_rank = np.zeros((B, KP), np.int32)
            lane_tab = np.zeros((B, KP), np.int32)
            pos_w = np.full((B, KP), -1, np.int32)
            rev_w = np.full((B, KP), -1, np.int32)
            lane_rank[rows_flat, lanes_flat] = np.repeat(ur_inv, w)
            lane_tab[rows_flat, lanes_flat] = np.repeat(sub[:, 1], w)
            pos_w[rows_flat, lanes_flat] = pos_flat
            rev_w[rows_flat, lanes_flat] = np.repeat(w, w) - 1 - pos_flat
            seg_idx = (rid * KP + loff + w - 1).astype(np.int32)
            npad = _pad_to_pow2(len(ss))
            seg_idx = np.concatenate(
                [seg_idx, np.zeros(npad - len(ss), np.int32)])

            wire = np.concatenate([
                _pad_rows(lev_b, E).ravel(),
                _pad_rows(n_ev_u[ue], E, 1).view(np.float32),
                _pad_rows(rank_b, U).view(np.float32).ravel(),
                _pad_rows(trans_u.astype(np.float32), R2).ravel(),
                row_ev.view(np.float32),
                row_tr.view(np.float32),
                row_clip.ravel(),
                lane_rank.view(np.float32).ravel(),
                lane_tab.view(np.float32).ravel(),
                pos_w.view(np.float32).ravel(),
                rev_w.view(np.float32).ravel(),
                seg_idx.view(np.float32),
            ])
            _sc.__exit__(None, None, None)
            with profile_scope("fp.dispatch"):
                dev = _forward_packed_call(
                    jnp.asarray(wire), tabs_dev, E, Tc, U, Kc, B, R2,
                    npad, TP, KP, scan_hi)
            pending.append((sel[ss], dev, len(ss)))
            lo_row = hi_row
    if _disp_pool is not None:
        from ..utils.profiler import profile_scope as _psd
        with _psd("fp.dispatch"):
            for f in _disp_futs:
                f.result()
            _disp_pool.shutdown()
    from ..utils.syncstats import timed_fetch
    flat = timed_fetch(jnp.concatenate([d[:b] for _, d, b in pending])) \
        if len(pending) > 1 else \
        timed_fetch(pending[0][1][:pending[0][2]])
    off = 0
    for ii, _d, b in pending:
        out[ii] = flat[off:off + b]
        off += b
    return out
