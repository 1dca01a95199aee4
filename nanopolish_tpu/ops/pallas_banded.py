"""Pallas TPU kernel: adaptive banded event alignment (row-major).

The throughput-critical per-read load-time DP
(spec: src/nanopolish_raw_loader.cpp:77-379).  The XLA `lax.scan` version
(ops/banded_align.py) is semantically exact but pays large per-step scan
overhead; this kernel runs the whole fill as one Pallas program.

TPU-native reformulation
------------------------
The reference fills 100-wide anti-diagonal bands with adaptive down/right
placement.  Here the DP runs **event-row-major** with a 256-wide kmer
window per row (batch B on sublanes, window on lanes):

  S(t, k) = max( em(t,k) + max(S(t-1,k-1)+lp_step, S(t-1,k)+lp_stay),
                 max_{j<k}(S(t,j) - j*lp_skip) + k*lp_skip )

The within-row skip chain (the reference's FROM_L moves, one anti-diagonal
band each) collapses into a prefix-max scan in the (max,+) semiring —
O(log W) rolls instead of O(W) bands — and rows shrink the sequential
length from n_events+n_kmers bands to n_events rows.

Adaptive banding becomes **epoch shifts**: the window start c stays fixed
for a 128-row grid step, then shifts right by 128 when the score mass has
moved into the right half (Suzuki-style edge comparison).  Keeping c a
multiple of 128 makes every kmer-table load a lane-aligned dynamic slice,
which is the only dynamic addressing Mosaic can vectorize; per-read
divergence costs one 128-wide block load per read per epoch instead of
per-row gathers (which TPUs cannot do fast).

Trace encoding per cell (uint8): 0 = diag step, 1 = stay/up, 2+d = skip
chain whose head is d-1 lanes to the left (d <= 252; longer chains clamp
and always exceed the max-gap QC), 255 = chain into the leading-trim
column.  Backtrack (second Pallas kernel) walks rows top-down: each row on
the path has exactly one emitting (D/U) cell plus at most one collapsed
chain hop, emitting per-row (enter_k, emit_k) that the host expands into
the reference's AlignedPair list, base-to-event map, and QC verdicts.

Documented divergence vs the reference: bandwidth 256 (not 100) and
epoch-wise (not per-band) placement.  Both regions contain the optimal
unrestricted path for well-behaved reads, giving identical alignments —
validated against the NumPy port of the reference algorithm in tests.
When divergence does occur (measured on noisy synthetic runs) it is a
different leading-trim entry point: base-to-event maps agree >=97% with
the exact port, re-converge within the first few kmers, and flip no
downstream methylation calls; `NPT_BANDED_IMPL=scan` selects the exact
reference banding when bit-parity matters more than throughput.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded_align import LP_SKIP, LP_TRIM, MAX_GAP_THRESHOLD, MIN_AVG_LOG_EMISSION
from .emissions import LOG_INV_SQRT_2PI

W = 256          # kmer window width (lanes)
EP = 128         # epoch shift quantum == rows per grid step
R = 128          # rows per grid step
NEG = -1.0e30

TR_D = 0
TR_U = 1
TR_CHAIN0 = 2     # 2 + (distance to chain head - 1), distance 1..253
TR_MAXDIST = 253
TR_TRIM = 255


def _iota(n):
    return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)


def _iota_b(b, n):
    """Full [B, n] lane iota — comparisons against [B,1] vectors need a
    non-replicated layout on TPU."""
    return jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)


def _shift_right1(x, fill):
    """out[:, k] = x[:, k-1]; lane 0 <- fill ([B,1] or scalar)."""
    r = pltpu.roll(x, 1, 1)
    return jnp.where(_iota(x.shape[1]) == 0, fill, r)


def _prefix_max(x, neutral):
    """Inclusive prefix max along lanes (log2 W roll-max steps)."""
    n = x.shape[1]
    d = 1
    while d < n:
        shifted = pltpu.roll(x, d, 1)
        shifted = jnp.where(_iota(n) < d, neutral, shifted)
        x = jnp.maximum(x, shifted)
        d *= 2
    return x


def _fill_kernel(ev_ref, a_ref, b2_ref, c0_ref, nev_ref, nk_ref,
                 lp_stay_ref, lp_step_ref,
                 trace_ref, crow_ref, best_ref, bei_ref,
                 s_prev, wa, wb, wc, cvec, best_s, best_e, shift_f):
    i = pl.program_id(0)
    B = ev_ref.shape[0]
    lanes = _iota(W)
    lanes_f = lanes.astype(jnp.float32)
    lanes_b = _iota_b(B, W)

    nev = nev_ref[:, 0:1]
    nk = nk_ref[:, 0:1]
    lp_stay = lp_stay_ref[:, 0:1]
    lp_step = lp_step_ref[:, 0:1]

    @pl.when(i == 0)
    def _():
        s_prev[:] = jnp.full((B, W), NEG, jnp.float32)
        wa[:] = a_ref[:, 0:W]
        wb[:] = b2_ref[:, 0:W]
        wc[:] = c0_ref[:, 0:W]
        cvec[:] = jnp.zeros((B, 1), jnp.int32)
        best_s[:] = jnp.full((B, 1), NEG, jnp.float32)
        best_e[:] = jnp.zeros((B, 1), jnp.int32)

    # ---- epoch shift: move the window right by 128 when the best-scoring
    # lane is in the right half.  The path advances at most 1 lane/row
    # between epochs (plus rare long skips), so best-lane >= 128 keeps the
    # realigned path in [0, 255] for the whole next epoch. ----
    @pl.when(i > 0)
    def _():
        sp = s_prev[:]
        m = jnp.max(sp, axis=1, keepdims=True)
        best_lane = jnp.min(jnp.where(sp == m, lanes_b, W), axis=1,
                            keepdims=True)
        shift = (best_lane >= EP) & (cvec[:] + W < nk) & (m > NEG / 2)
        shift_f[:] = shift.astype(jnp.int32)

        # scalar per-read side: reload window halves (lane-aligned DMA)
        for b in range(B):
            @pl.when(shift_f[b, 0] > 0)
            def _():
                start = pl.multiple_of(cvec[b, 0] + W, EP)
                wa[b, 0:EP] = wa[b, EP:W]
                wb[b, 0:EP] = wb[b, EP:W]
                wc[b, 0:EP] = wc[b, EP:W]
                wa[b, EP:W] = a_ref[b, pl.ds(start, EP)]
                wb[b, EP:W] = b2_ref[b, pl.ds(start, EP)]
                wc[b, EP:W] = c0_ref[b, pl.ds(start, EP)]

        # vector side: realign scores + window start
        rolled = pltpu.roll(sp, W - EP, 1)      # left by 128
        rolled = jnp.where(_iota(W) >= W - EP, NEG, rolled)
        s_prev[:] = jnp.where(shift, rolled, sp)
        cvec[:] = cvec[:] + jnp.where(shift, EP, 0)

    def row(r, _):
        t = i * R + r
        active = t < nev                                     # [B,1]
        # column r of the event block — masked reduce, since Mosaic only
        # vectorizes lane-dim dynamic slices at 128-aligned offsets
        ev = jnp.max(jnp.where(_iota_b(B, R) == r, ev_ref[:, :], NEG),
                     axis=1, keepdims=True)                  # [B,1]
        sp = s_prev[:]
        c = cvec[:]
        t_f = jnp.float32(t)
        at_left = c == 0

        up = sp + lp_stay
        diag_fill = jnp.where(at_left, LP_TRIM * t_f, NEG)
        diag = _shift_right1(sp, diag_fill) + lp_step
        dev = wa[:] * ev - wb[:]
        em = wc[:] - 0.5 * dev * dev
        du_u = up >= diag                                    # tie -> U
        direct = em + jnp.maximum(up, diag)

        z = direct - lanes_f * LP_SKIP
        p_inc = _prefix_max(z, NEG)
        z_trim = jnp.where(at_left, LP_TRIM * (t_f + 1.0) + LP_SKIP, NEG)
        p_exc = _shift_right1(p_inc, z_trim)
        chain_v = p_exc + lanes_f * LP_SKIP
        l_wins = chain_v >= direct                           # tie -> L
        s_new = jnp.where(l_wins, chain_v, direct)

        # nearest chain head to the left (== the reference's L-walk target)
        head = z > p_exc
        hsrc = _prefix_max(jnp.where(head, lanes, -1), -1)
        src = _shift_right1(hsrc, jnp.int32(-1))

        # trace byte computed in int32 (masks keep the f32-native layout;
        # a single cast packs to uint8 at the end)
        dist = jnp.minimum(lanes - src, TR_MAXDIST)
        tr = jnp.where(du_u, TR_U, TR_D)
        tr_chain = jnp.where(src >= 0, dist + 1, TR_TRIM)
        tr = jnp.where(l_wins, tr_chain, tr)
        trace_ref[r, :, :] = tr.astype(jnp.uint8)
        crow_ref[r, :] = c[:, 0]

        lane_last = (nk - 1) - c
        inw = (lane_last >= 0) & (lane_last < W)
        vlast = jnp.max(jnp.where(lanes_b == lane_last, s_new, NEG),
                        axis=1, keepdims=True)
        endsc = vlast + (nev - t).astype(jnp.float32) * LP_TRIM
        better = active & inw & (endsc > best_s[:])
        best_s[:] = jnp.where(better, endsc, best_s[:])
        best_e[:] = jnp.where(better, t, best_e[:])

        s_prev[:] = jnp.where(active, s_new, sp)
        return 0

    jax.lax.fori_loop(0, R, row, 0, unroll=False)

    best_ref[:] = best_s[:]
    bei_ref[:] = best_e[:]


def _backtrack_kernel(trace_ref, crow_ref, ev_ref, a_ref, b2_ref, c0_ref,
                      nk_ref, bei_ref, bok_ref,
                      enter_ref, emit_ref, sum_em_ref, stats_ref,
                      cur_k, cur_e, done, wa2, wb2, wc2,
                      em_acc, npair, mgap, slo, tmin):
    """Reverse row walk + on-device QC: emission sums are recomputed for
    every visited cell (incl. collapsed skip chains) by replaying the
    window params — the window start is constant within a grid step, so
    the reload is one lane-aligned DMA per read per step."""
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    B = nk_ref.shape[0]
    lanes = _iota_b(B, W)

    @pl.when(i == 0)
    def _():
        cur_k[:] = nk_ref[:, 0:1] - 1
        cur_e[:] = bei_ref[:, 0:1]
        done[:] = jnp.logical_not(bok_ref[:, 0:1])
        em_acc[:] = jnp.zeros((B, 1), jnp.float32)
        npair[:] = jnp.zeros((B, 1), jnp.int32)
        mgap[:] = jnp.zeros((B, 1), jnp.int32)
        slo[:] = jnp.full((B, 1), -1, jnp.int32)
        tmin[:] = bei_ref[:, 0:1]

    # window params of this grid step (c is per-step constant by design)
    for b in range(B):
        cb = pl.multiple_of(crow_ref[0, b], EP)
        wa2[b, :] = a_ref[b, pl.ds(cb, W)]
        wb2[b, :] = b2_ref[b, pl.ds(cb, W)]
        wc2[b, :] = c0_ref[b, pl.ds(cb, W)]

    def row(r_rev, _):
        r = R - 1 - r_rev
        t = (n_steps - 1 - i) * R + r
        act = jnp.logical_not(done[:]) & (cur_e[:] == t)

        tr_row = trace_ref[r, :, :].astype(jnp.int32)
        c = crow_ref[r, :].reshape(B, 1)

        lane1 = cur_k[:] - c
        tr1 = jnp.max(jnp.where(lanes == lane1, tr_row, 0),
                      axis=1, keepdims=True)

        is_chain = act & (tr1 >= TR_CHAIN0)
        is_trim = act & (tr1 == TR_TRIM)
        norm_chain = is_chain & jnp.logical_not(is_trim)
        k2 = jnp.where(norm_chain, cur_k[:] - (tr1 - 1), cur_k[:])

        lane2 = k2 - c
        tr2 = jnp.max(jnp.where(lanes == lane2, tr_row, 0),
                      axis=1, keepdims=True)
        tr2 = jnp.where(norm_chain, tr2, tr1)

        enter_ref[r, :] = jnp.where(act, cur_k[:], -1)[:, 0]
        emit_ref[r, :] = jnp.where(is_trim, -2, jnp.where(act, k2, -1))[:, 0]

        # --- QC accumulation over all visited cells of this row ---
        ev_t = jnp.max(jnp.where(_iota_b(B, R) == r, ev_ref[:, :], NEG),
                       axis=1, keepdims=True)
        dev = wa2[:] * ev_t - wb2[:]
        em = wc2[:] - 0.5 * dev * dev
        lo = jnp.where(is_trim, 0, k2)
        hi = cur_k[:]
        cmask = act & (lanes >= lo - c) & (lanes <= hi - c)
        em_acc[:] = em_acc[:] + jnp.sum(jnp.where(cmask, em, 0.0),
                                        axis=1, keepdims=True)
        npair[:] = npair[:] + jnp.where(act, hi - lo + 1, 0)
        gap = jnp.where(is_trim, hi + 1, hi - lo)
        mgap[:] = jnp.maximum(mgap[:], jnp.where(act, gap, 0))
        slo[:] = jnp.where(act, lo, slo[:])
        tmin[:] = jnp.where(act, t, tmin[:])

        step = act & jnp.logical_not(is_trim)
        is_d = step & (tr2 == TR_D)
        cur_e[:] = jnp.where(step, cur_e[:] - 1, cur_e[:])
        cur_k[:] = jnp.where(step, k2 - is_d.astype(jnp.int32), cur_k[:])
        done[:] = done[:] | is_trim | (step & (cur_k[:] < 0)) \
            | (step & (cur_e[:] < 0))
        return 0

    jax.lax.fori_loop(0, R, row, 0, unroll=False)

    sum_em_ref[:] = em_acc[:]
    stats_ref[:, 0:1] = npair[:]
    stats_ref[:, 1:2] = mgap[:]
    stats_ref[:, 2:3] = slo[:]
    stats_ref[:, 3:4] = tmin[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _banded_fill_call(events, a_tab, b2_tab, c0_tab, n_events, n_kmers,
                      lp_stay, lp_step, interpret=False):
    B, T = events.shape
    grid = T // R
    out_shape = (
        jax.ShapeDtypeStruct((T, B, W), jnp.uint8),
        jax.ShapeDtypeStruct((T, B), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
    )
    return pl.pallas_call(
        _fill_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((B, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((R, B, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((B, W), jnp.float32),    # s_prev
            pltpu.VMEM((B, W), jnp.float32),    # wa
            pltpu.VMEM((B, W), jnp.float32),    # wb
            pltpu.VMEM((B, W), jnp.float32),    # wc
            pltpu.VMEM((B, 1), jnp.int32),      # cvec
            pltpu.VMEM((B, 1), jnp.float32),    # best_s
            pltpu.VMEM((B, 1), jnp.int32),      # best_e
            pltpu.VMEM((B, 1), jnp.int32),      # shift_f
        ],
        interpret=interpret,
    )(events, a_tab, b2_tab, c0_tab, n_events, n_kmers, lp_stay, lp_step)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _banded_backtrack_call(trace, crow, events, a_tab, b2_tab, c0_tab,
                           n_kmers, best_ei, best_ok, interpret=False):
    T, B, _ = trace.shape
    grid = T // R
    out_shape = (
        jax.ShapeDtypeStruct((T, B), jnp.int32),        # enter_k
        jax.ShapeDtypeStruct((T, B), jnp.int32),        # emit_k
        jax.ShapeDtypeStruct((B, 1), jnp.float32),      # sum_emission
        jax.ShapeDtypeStruct((B, 4), jnp.int32),        # n_pairs/max_gap/span_lo/t_min
    )
    rev3 = lambda i: (grid - 1 - i, 0, 0)
    rev2 = lambda i: (grid - 1 - i, 0)
    revev = lambda i: (0, grid - 1 - i)
    return pl.pallas_call(
        _backtrack_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((R, B, W), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, B), rev2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, R), revev, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((R, B), rev2, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, B), rev2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((B, 1), jnp.int32),      # cur_k
            pltpu.VMEM((B, 1), jnp.int32),      # cur_e
            pltpu.VMEM((B, 1), jnp.bool_),      # done
            pltpu.VMEM((B, W), jnp.float32),    # wa2
            pltpu.VMEM((B, W), jnp.float32),    # wb2
            pltpu.VMEM((B, W), jnp.float32),    # wc2
            pltpu.VMEM((B, 1), jnp.float32),    # em_acc
            pltpu.VMEM((B, 1), jnp.int32),      # npair
            pltpu.VMEM((B, 1), jnp.int32),      # mgap
            pltpu.VMEM((B, 1), jnp.int32),      # slo
            pltpu.VMEM((B, 1), jnp.int32),      # tmin
        ],
        interpret=interpret,
    )(trace, crow, events, a_tab, b2_tab, c0_tab, n_kmers, best_ei, best_ok)


# ---------------------------------------------------------------------------
# Device-side assembly + host wrapper
# ---------------------------------------------------------------------------

class PallasBandedResult(NamedTuple):
    """Same payload as ops.banded_align.BandedAlignResult.  Arrays are jax
    device arrays; np.asarray() them only if host access is needed (the
    d2h path through remote-attached TPUs is slow — downstream kernels
    should consume b2e on device)."""

    b2e_start: "jnp.ndarray"
    b2e_stop: "jnp.ndarray"
    failed: "jnp.ndarray"
    avg_log_emission: "jnp.ndarray"
    spanned: "jnp.ndarray"
    max_gap: "jnp.ndarray"
    events_per_base: "jnp.ndarray"
    n_pairs: "jnp.ndarray"


def _pad_to_pow2(n, lo=8):
    # bound the number of compiled batch shapes: remainder chunks would
    # otherwise compile a fresh kernel per arbitrary B (minutes each on
    # remotely-attached chips)
    p = lo
    while p < n:
        p *= 2
    return p


def _pad_to(n, q):
    return max(q, int(math.ceil(n / q)) * q)


@functools.partial(jax.jit, static_argnames=("K0",))
def _b2e_from_rows(enter, emit, failed, K0):
    """Scatter the per-row (enter, emit) walk into base->event maps.

    b2e only needs the first-occurrence-of-event pairs (the D/U emit of
    each row; terminal trim rows emit at kmer 0) — skipped kmers repeat
    the previous event and are no-ops in the reference's map builder
    (src/nanopolish_squiggle_read.cpp:283-295).
    """
    T, B = enter.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, B), 0)
    valid = (enter >= 0) & jnp.logical_not(failed[None, :])
    kidx = jnp.clip(jnp.where(emit == -2, 0, emit), 0, K0 - 1)
    bidx = jax.lax.broadcasted_iota(jnp.int32, (T, B), 1)
    flat = jnp.where(valid, bidx * K0 + kidx, B * K0)
    big = jnp.iinfo(jnp.int32).max
    starts = jnp.full((B * K0 + 1,), big, jnp.int32).at[flat.ravel()].min(rows.ravel())
    stops = jnp.full((B * K0 + 1,), -1, jnp.int32).at[flat.ravel()].max(rows.ravel())
    b2e_start = jnp.where(starts[:-1] == big, -1, starts[:-1]).reshape(B, K0)
    b2e_stop = stops[:-1].reshape(B, K0)
    return b2e_start, b2e_stop


@functools.partial(jax.jit, static_argnames=("interpret", "K0"))
def _banded_align_device(ev, a_tab, b2_tab, c0_tab, nev, nk,
                         lp_stay, lp_step, K0, interpret=False):
    """fill -> backtrack -> QC verdicts -> b2e scatter, all on device."""
    trace, crow, best_s, best_ei = _banded_fill_call(
        ev, a_tab, b2_tab, c0_tab, nev, nk, lp_stay, lp_step,
        interpret=interpret)
    best_ok = best_s > NEG / 2
    enter, emit, sum_em, stats = _banded_backtrack_call(
        trace, crow, ev, a_tab, b2_tab, c0_tab, nk, best_ei, best_ok,
        interpret=interpret)
    n_pairs = stats[:, 0]
    max_gap = stats[:, 1]
    span_lo = stats[:, 2]
    t_min = stats[:, 3]
    avg_em = sum_em[:, 0] / jnp.maximum(n_pairs, 1).astype(jnp.float32)
    spanned = (span_lo == 0) & best_ok[:, 0]
    events_per_base = (best_ei[:, 0] - t_min).astype(jnp.float32) / \
        jnp.maximum(nk[:, 0], 1).astype(jnp.float32)
    failed = (~best_ok[:, 0]) | (avg_em < MIN_AVG_LOG_EMISSION) | \
        (~spanned) | (max_gap > MAX_GAP_THRESHOLD) | (n_pairs == 0)
    b2e_start, b2e_stop = _b2e_from_rows(enter, emit, failed, K0)
    return PallasBandedResult(
        b2e_start=b2e_start, b2e_stop=b2e_stop, failed=failed,
        avg_log_emission=avg_em, spanned=spanned, max_gap=max_gap,
        events_per_base=events_per_base, n_pairs=n_pairs)


def prepare_tables(mu, sigma, log_sigma, n_kmers, Kp=None):
    """Host-side padded emission tables (inv-sigma form) for the kernels."""
    mu = np.asarray(mu, np.float32)
    sigma = np.asarray(sigma, np.float32)
    log_sigma = np.asarray(log_sigma, np.float32)
    B, K0 = mu.shape
    if Kp is None:
        Kp = _pad_to(K0, 128) + 3 * EP
    kmask = np.arange(K0)[None, :] < np.asarray(n_kmers)[:, None]
    a_tab = np.zeros((B, Kp), np.float32)
    b2_tab = np.zeros((B, Kp), np.float32)
    c0_tab = np.full((B, Kp), NEG, np.float32)
    inv_sigma = np.where(kmask, 1.0 / np.maximum(sigma, 1e-30), 0.0)
    a_tab[:, :K0] = inv_sigma
    b2_tab[:, :K0] = np.where(kmask, mu, 0.0) * inv_sigma
    c0_tab[:, :K0] = np.where(kmask, LOG_INV_SQRT_2PI - log_sigma, NEG)
    return a_tab, b2_tab, c0_tab


def transition_params(n_events, n_kmers):
    """Per-read lp_stay/lp_step (raw_loader.cpp:98-107)."""
    epk = np.asarray(n_events, np.float64) / np.maximum(np.asarray(n_kmers), 1)
    p_stay = 1.0 - 1.0 / (epk + 1.0)
    lp_stay = np.log(np.maximum(p_stay, 1e-30)).astype(np.float32)[:, None]
    lp_step = np.log(np.maximum(1.0 - p_stay - math.exp(LP_SKIP), 1e-30)
                     ).astype(np.float32)[:, None]
    return lp_stay, lp_step


def banded_align_pallas(event_mean, n_events, mu, sigma, log_sigma, n_kmers,
                        interpret=None):
    """Batched adaptive banded event alignment via the Pallas kernels.

    Args match ops.banded_align.banded_align_batch: event_mean [B, T] f32,
    mu/sigma/log_sigma [B, K] f32 *scaled* gaussians, n_events/n_kmers [B].
    Returns PallasBandedResult of device arrays (sliced to [B, K]).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    event_mean = np.asarray(event_mean, np.float32)
    n_events = np.asarray(n_events, np.int32)
    n_kmers = np.asarray(n_kmers, np.int32)
    B, T0 = event_mean.shape
    K0 = mu.shape[1]
    Bp = _pad_to_pow2(B)
    Tp = _pad_to(T0, R)

    ev = np.zeros((Bp, Tp), np.float32)
    ev[:B, :T0] = event_mean
    a_tab, b2_tab, c0_tab = prepare_tables(mu, sigma, log_sigma, n_kmers)
    if Bp != B:
        pad = ((0, Bp - B), (0, 0))
        a_tab = np.pad(a_tab, pad)
        b2_tab = np.pad(b2_tab, pad)
        c0_tab = np.pad(c0_tab, pad, constant_values=NEG)
    nev = np.zeros((Bp, 1), np.int32)
    nev[:B, 0] = n_events
    nk = np.full((Bp, 1), 2, np.int32)
    nk[:B, 0] = np.maximum(n_kmers, 2)
    lp_stay, lp_step = transition_params(nev[:, 0], nk[:, 0])

    res = _banded_align_device(ev, a_tab, b2_tab, c0_tab, nev, nk,
                               lp_stay, lp_step, K0, interpret=interpret)
    if Bp != B:
        res = PallasBandedResult(*(v[:B] for v in res))
    return res


@functools.partial(jax.jit, static_argnames=("Tp", "Kp", "K0", "interpret"))
def _banded_align_device_packed(packed, Tp, Kp, K0, interpret=False):
    """Unpack one [Bp, Tp+3*Kp+4] f32 array into the kernel inputs on
    device.  Slicing/bitcasting on device is free next to the DP; the
    point is ONE host->device transfer per call instead of eight (each
    transfer costs a relay round trip on remotely-attached chips)."""
    o = 0
    ev = packed[:, o:o + Tp]; o += Tp
    a_tab = packed[:, o:o + Kp]; o += Kp
    b2_tab = packed[:, o:o + Kp]; o += Kp
    c0_tab = packed[:, o:o + Kp]; o += Kp
    nev = jax.lax.bitcast_convert_type(packed[:, o:o + 1], jnp.int32); o += 1
    nk = jax.lax.bitcast_convert_type(packed[:, o:o + 1], jnp.int32); o += 1
    lp_stay = packed[:, o:o + 1]; o += 1
    lp_step = packed[:, o:o + 1]
    return _banded_align_device(ev, a_tab, b2_tab, c0_tab, nev, nk,
                                lp_stay, lp_step, K0, interpret=interpret)


def pack_banded_inputs(event_mean, n_events, mu, sigma, log_sigma, n_kmers):
    """Host-side packing for banded_align_pallas_packed: returns
    (packed [Bp, Tp+3*Kp+4] f32, Tp, Kp, K0)."""
    event_mean = np.asarray(event_mean, np.float32)
    n_events = np.asarray(n_events, np.int32)
    n_kmers = np.asarray(n_kmers, np.int32)
    B, T0 = event_mean.shape
    K0 = mu.shape[1]
    Bp = _pad_to_pow2(B)
    Tp = _pad_to(T0, R)
    a_tab, b2_tab, c0_tab = prepare_tables(mu, sigma, log_sigma, n_kmers)
    Kp = a_tab.shape[1]
    packed = np.zeros((Bp, Tp + 3 * Kp + 4), np.float32)
    packed[:B, :T0] = event_mean
    packed[:B, Tp:Tp + Kp] = a_tab
    packed[:B, Tp + Kp:Tp + 2 * Kp] = b2_tab
    packed[:, Tp + 2 * Kp:Tp + 3 * Kp] = NEG
    packed[:B, Tp + 2 * Kp:Tp + 3 * Kp] = c0_tab
    o = Tp + 3 * Kp
    nev = np.zeros((Bp,), np.int32)
    nev[:B] = n_events
    nk = np.full((Bp,), 2, np.int32)
    nk[:B] = np.maximum(n_kmers, 2)
    packed[:, o] = nev.view(np.float32)
    packed[:, o + 1] = nk.view(np.float32)
    lp_stay, lp_step = transition_params(nev, nk)
    packed[:, o + 2] = lp_stay[:, 0]
    packed[:, o + 3] = lp_step[:, 0]
    return packed, Tp, Kp, K0


def banded_align_pallas_packed(packed, Tp, Kp, K0, B=None, interpret=None):
    """Single-transfer variant of banded_align_pallas: feed the output of
    pack_banded_inputs.  Numerically identical (device-side slicing)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    res = _banded_align_device_packed(packed, Tp, Kp, K0, interpret=interpret)
    if B is not None and B != packed.shape[0]:
        res = PallasBandedResult(*(v[:B] for v in res))
    return res
