"""Pallas TPU kernel: reference-exact adaptive banded event alignment.

Implements the banding of ``adaptive_banded_simple_event_align``
(reference: src/nanopolish_raw_loader.cpp:77-379) *exactly*: a 100-wide
anti-diagonal band whose per-band down/right placement follows Suzuki's
rule on the two band-edge scores, f32 scoring in the reference's
operation order, and the reference's tie-breaking (L > U > D).  This
kernel byte-matches the `lax.scan` port (ops/banded_align) and the
NumPy reference port cell for cell; it is the sole production banded
backend (the round-1 approximate epoch-window kernel was deleted once
this one became both faster and reference-exact).

TPU-native formulation
----------------------
Bands live on the 128-lane axis (offsets 0..99 valid), a batch of B
reads on the sublane axis, and a single grid loop walks the n_bands =
(T+1)+(K+1) anti-diagonals.  The two data streams the DP consumes are
kept in *rolling register windows* so no per-read gather ever happens:

 * events enter one at a time when a read's band moves down — a
   [B, 256] window holds the band-aligned events (lanes 128..255) plus
   128 future events, rolled right by one lane on down-moves;
 * k-mer gaussians (mu, sigma, log-term) enter on right-moves — three
   [B, 256] windows rolled left, band-aligned at lanes 0..127.

The rolls are circular, so between the per-chunk refills (once per 128
bands, a per-read 128-aligned load + dynamic lane rotate) stale lanes
never reach the 100 live offsets.  Out-of-range cells are handled with
*pad values* instead of masks: events outside [0, n_events) read as
1e17 and k-mer log-constants outside [0, n_kmers) as -1e35, which makes
every invalid cell's score < -1e30.  The adaptive-placement rule treats
any score below that threshold as the reference's -inf ("out of band"),
so placement decisions are bit-identical while the per-cell valid-range
masks of the scan implementation disappear from the inner loop.

Traceback moves are packed 2 bits x 16 bands into int32 rows (lane 127,
unused by the 100-wide band, carries the band's down/right decision so
the backtrack can replay band positions without a stored ll_e array).
The backtrack kernel replays the walk band-by-band (one visited cell per
band); since the visited (event, kmer) coordinates each decrease by 0/1
per band, the QC emission at the visited cell is recomputed from two
rolling scalar *streams* (current event at lane 0 of an event stream,
current kmer gaussian at lane 255 of three kmer streams), refilled per
chunk like the fill windows — no stored emission rows, no gathers.  The
(kmer, event) pairs land as rows that an XLA scatter folds into the
base->event map exactly like ops/banded_align.py does.
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

from .banded_align import (BANDWIDTH, HALF_BANDWIDTH, LP_SKIP, LP_TRIM,
                           MAX_GAP_THRESHOLD, MIN_AVG_LOG_EMISSION,
                           BandedAlignResult)
from .emissions import LOG_INV_SQRT_2PI

LANES = 128
WIN = 256            # rolling window width (band + one chunk of lookahead)
CHUNK = 128          # bands per grid step == max window consumption per step
PACK = 16            # trace cells packed per int32 (2 bits each)

# Trace-time ablation switches for kernel cost attribution (perf work
# only — ablated kernels return wrong results).  Comma-separated subset
# of {rows,streams,stats} (backtrack) and {fwin,femit,ftrace} (fill)
# in NPT_ABLATE.
import os as _os
_ABLATE = frozenset(
    s for s in _os.environ.get("NPT_ABLATE", "").split(",") if s)

NEG_INF = float("-inf")
OB = -1.0e30         # scores below this are the reference's -inf ("out of band")
EV_PAD = 1.0e17      # event pad: emission becomes ~-1e34 (< OB) at any kmer
C_PAD = -1.0e35      # kmer log-const pad: emission < OB at any event

FROM_D, FROM_U, FROM_L = 0, 1, 2


def _iota_b(b, n):
    return jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)


def _roll_l(x, n=1):
    """Circular roll left by n lanes (pltpu.roll only takes shifts >= 0)."""
    return pltpu.roll(x, x.shape[1] - n, 1)


# ---------------------------------------------------------------------------
# Host-side input preparation
# ---------------------------------------------------------------------------

def _pad_to(n, q):
    return max(q, int(math.ceil(n / q)) * q)


def prepare_exact_inputs(event_mean, n_events, mu, sigma, log_sigma, n_kmers):
    """Build the padded device arrays for the exact banded kernels.

    Returns dict of np arrays: evr [B, Tp+768] (reversed, padded events),
    tmu/tsig/tc [B, Kp+768] (lead-256 padded tables), nev/nk [B,1] i32,
    plus the static dims (Tp, Kp).  The generous pads let both the fill
    windows and the backtrack streams use 128-aligned 384-lane loads at
    any position either kernel can reach.
    """
    event_mean = np.asarray(event_mean, np.float32)
    n_events = np.asarray(n_events, np.int32).reshape(-1)
    mu = np.asarray(mu, np.float32)
    sigma = np.asarray(sigma, np.float32)
    log_sigma = np.asarray(log_sigma, np.float32)
    n_kmers = np.asarray(n_kmers, np.int32).reshape(-1)
    B, T0 = event_mean.shape
    K0 = mu.shape[1]
    Tp = _pad_to(T0, CHUNK)
    Kp = _pad_to(K0, CHUNK)

    # evr[b, j] = event[b, EOFF - j], EV_PAD outside [0, n_events)
    EOFF = Tp + 255
    Lev = Tp + 768
    ivals = EOFF - np.arange(Lev)                       # event index per column
    valid = (ivals >= 0) & (ivals[None, :] < n_events[:, None])
    gath = np.take(np.pad(event_mean, ((0, 0), (0, Tp - T0 + 1))),
                   np.clip(ivals, 0, Tp), axis=1)
    evr = np.where(valid, gath, EV_PAD).astype(np.float32)

    # forward tables with a 256-lane lead pad: tab[b, 256 + k]
    Lk = Kp + 768
    kvals = np.arange(Lk) - 256
    kmask = (kvals >= 0) & (kvals[None, :] < n_kmers[:, None])
    kc = np.clip(kvals, 0, K0 - 1)
    tmu = np.where(kmask, np.take(mu, kc, axis=1), 0.0).astype(np.float32)
    tsig = np.where(kmask, np.take(sigma, kc, axis=1), 1.0).astype(np.float32)
    # f32 arithmetic to match the scan path's weak-typed f32 subtraction
    c_full = np.float32(LOG_INV_SQRT_2PI) - log_sigma.astype(np.float32)
    tc = np.where(kmask, np.take(c_full, kc, axis=1), C_PAD).astype(np.float32)

    return dict(evr=evr, tmu=tmu, tsig=tsig, tc=tc,
                nev=n_events.reshape(B, 1), nk=n_kmers.reshape(B, 1),
                Tp=Tp, Kp=Kp, K0=K0)


def transition_params_f32(n_events, n_kmers):
    """lp_stay/lp_step per read (raw_loader.cpp:98-107), f64 math -> f32."""
    epk = np.asarray(n_events, np.float64).reshape(-1) / np.maximum(
        np.asarray(n_kmers, np.float64).reshape(-1), 1)
    p_stay = 1.0 - 1.0 / (epk + 1.0)
    lp_stay = np.log(p_stay)
    lp_step = np.log(1.0 - math.exp(LP_SKIP) - np.exp(lp_stay))
    return (lp_stay.astype(np.float32)[:, None],
            lp_step.astype(np.float32)[:, None])


# ---------------------------------------------------------------------------
# Fill kernel
# ---------------------------------------------------------------------------

def _align_left(stage, r_vec):
    """Vectorized left-rotate of stage [B, 384] by per-read r_vec [B, 1]
    (0..127), as 7 conditional static rolls.  pltpu.roll with a *traced*
    shift miscompiles on this toolchain (verified on hardware), so the
    rotate is decomposed into static power-of-two rolls gated per read."""
    x = stage
    for bit in (64, 32, 16, 8, 4, 2, 1):
        x = jnp.where((r_vec & bit) != 0, _roll_l(x, bit), x)
    return x


def _refill_windows(evr_ref, tmu_ref, tsig_ref, tc_ref, nev_ref, nk_ref,
                    ll_e, bi0, ew, kmu, ksig, kc, stage, Tp):
    """Per-read window reload (start of each grid step).  Loads are
    128-aligned (the only lane-dim dynamic slice Mosaic vectorizes);
    the sub-128 realignment happens vectorized across the batch."""
    B = ew.shape[0]

    # vector side: window start columns (j >= 0 by construction).  The
    # windows are positioned for the band *before* bi0, whose lower-left
    # kmer is ll_k = (bi0 - 1) - 2 - ll_e.
    j0e = (Tp + 127) - jnp.minimum(ll_e[:], nev_ref[:] + 127)
    j0k = 256 + jnp.minimum((bi0 - 3) - ll_e[:], nk_ref[:])

    def scalar_j0e(b):
        return (Tp + 127) - jnp.minimum(ll_e[b, 0], nev_ref[b, 0] + 127)

    def scalar_j0k(b):
        return 256 + jnp.minimum((bi0 - 3) - ll_e[b, 0], nk_ref[b, 0])

    if "frefill" in _ABLATE:                 # perf attribution only
        return
    for j0, scalar_j0, srcs in (
            (j0e, scalar_j0e, ((evr_ref, ew),)),
            (j0k, scalar_j0k, ((tmu_ref, kmu), (tsig_ref, ksig),
                               (tc_ref, kc)))):
        r_vec = j0 & 127
        for src_ref, w in srcs:
            if "floads" not in _ABLATE:       # perf attribution only
                for b in range(B):
                    jb = scalar_j0(b)
                    ab = pl.multiple_of(jb - (jb & 127), 128)
                    stage[b, :] = src_ref[b, pl.ds(ab, 384)]
            w[:] = _align_left(stage[:], r_vec)[:, :WIN]


def _fill_kernel(evr_ref, tmu_ref, tsig_ref, tc_ref, nev_ref, nk_ref,
                 lps_ref, lpt_ref,
                 trace_ref, lle_ref, bests_ref, beste_ref,
                 s_prev, s_prev2, ew, kmu, ksig, kc,
                 ll_e, up_prev, best_s, best_e, stage, Tp, nsplit):
    i = pl.program_id(0)
    B = s_prev.shape[0]
    Bs = B // nsplit                                   # reads per chain
    lanes = _iota_b(Bs, LANES)
    lane_hi = lanes >= BANDWIDTH                       # offsets >= 100

    @pl.when(i == 0)
    def _():
        off = _iota_b(B, LANES)
        # band 0: score 0 at the start cell (kmer -1, offset 50)
        s_prev2[:] = jnp.where(off == HALF_BANDWIDTH, 0.0, NEG_INF)
        # band 1 (= move_down): first-event trim at offset 50
        s_prev[:] = jnp.where(off == HALF_BANDWIDTH, LP_TRIM, NEG_INF)
        ll_e[:] = jnp.full((B, 1), HALF_BANDWIDTH, jnp.int32)
        # up(band 1) = band 0 scores unshifted (band 1 is a down move)
        up_prev[:] = jnp.where(off == HALF_BANDWIDTH, 0.0, NEG_INF)
        best_s[:] = jnp.full((B, 1), NEG_INF, jnp.float32)
        best_e[:] = jnp.zeros((B, 1), jnp.int32)

    bi0 = 2 + i * CHUNK
    _refill_windows(evr_ref, tmu_ref, tsig_ref, tc_ref, nev_ref, nk_ref,
                    ll_e, bi0, ew, kmu, ksig, kc, stage, Tp)

    # Chunk-level gating: ll_k = (bi - 2) - ll_e is non-decreasing (each
    # band adds 1 to bi and 0/1 to ll_e), so whether any read can touch
    # the ki == -1 trim column or the ki == nk-1 end column during this
    # chunk is decidable from the value entering the chunk.  ~97% of the
    # chunks of a full-length read need neither block.
    nk_full = nk_ref[:, 0:1]
    prev_llk = (bi0 - 3) - ll_e[:]                     # ll_k of last band done
    need_trim = jnp.min(prev_llk) < 0
    need_end = jnp.any((prev_llk + CHUNK >= nk_full - BANDWIDTH) &
                       (prev_llk <= nk_full - 1))

    def band(bi, parity, shift, with_trim_end, ctx, st):
        """One band as a pure function of the carried state tuple — no
        scratch access inside the unrolled group, so consecutive bands
        chain through registers instead of VMEM store->load turnarounds
        (measured: the ablated-to-nothing kernel ran at ~88% of the full
        kernel's time when every band round-tripped scratch).  bi is
        traced, parity and shift are Python constants.  Returns the
        pre-shifted 2-bit trace (so the packer needs no per-band shift
        op) and the new state.

        ctx carries the split's loop-invariant rows (nev/nk columns and
        the lane-broadcast transition terms, hoisted once per grid step
        so no [Bs,1]->[Bs,LANES] relayout rides the per-band chain)."""
        nev, nk, lp_stay_w, lp_step_w = ctx
        (sp, sp2, ew_v, kmu_v, ksig_v, kc_v,
         ll_e_v, up_prev_v, best_s_v, best_e_v) = st

        # --- adaptive placement (raw_loader.cpp:175-195) ---
        ll = sp[:, 0:1]
        ur = sp[:, BANDWIDTH - 1:BANDWIDTH]
        both_ob = (ll < OB) & (ur < OB)
        r_i = jnp.where(both_ob, parity, (ll < ur).astype(jnp.int32))
        right = r_i > 0                                # [Bs,1] bool
        ll_e_new = ll_e_v + (1 - r_i)
        # one column->lane broadcast per mask, reused by every select
        right_w = jnp.broadcast_to(right, (right.shape[0], WIN))
        right_b = right_w[:, :LANES]

        # --- window maintenance ---
        if "fwin" not in _ABLATE:
            ew_v = jnp.where(right_w, ew_v, pltpu.roll(ew_v, 1, 1))
            kmu_v = jnp.where(right_w, _roll_l(kmu_v), kmu_v)
            ksig_v = jnp.where(right_w, _roll_l(ksig_v), ksig_v)
            kc_v = jnp.where(right_w, _roll_l(kc_v), kc_v)

        # --- neighbor alignment (circular roll junk only reaches the
        # masked lanes >= 100, which hold -inf in s_prev/s_prev2).
        # left and diag derive from `up` and the carried previous band's
        # `up` by exact circular-roll algebra (left = right ? sp :
        # roll_r(sp) == roll_r(up) in both cases since roll_r(roll_l(x))
        # == x; diag's 3-way amt select == right ? up_prev :
        # roll_r(up_prev) by the same identities), which drops two rolls,
        # two selects and the amt column->lane broadcast per band ---
        up = jnp.where(right_b, _roll_l(sp), sp)
        left = pltpu.roll(up, 1, 1)
        diag = jnp.where(right_b, up_prev_v, pltpu.roll(up_prev_v, 1, 1))

        # --- emission in the reference's f32 operation order ---
        if "femit" not in _ABLATE:
            ev_band = ew_v[:, LANES:WIN]
            a = (ev_band - kmu_v[:, 0:LANES]) / ksig_v[:, 0:LANES]
            em = kc_v[:, 0:LANES] + (-0.5 * a) * a
        else:
            em = kc_v[:, 0:LANES]

        sd = (diag + lp_step_w) + em
        su = (up + lp_stay_w) + em
        sl = left + LP_SKIP
        m2 = jnp.maximum(sd, su)
        m3 = jnp.maximum(m2, sl)
        if "ftrace" not in _ABLATE:
            # 2-bit codes pre-shifted to this band's slot in the packed
            # int32 (select-of-constants with int32 wraparound at
            # shift=30; L > U > D tie-break)
            cL = np.int32(np.uint32((FROM_L << shift) & 0xFFFFFFFF))
            cU = np.int32(np.uint32((FROM_U << shift) & 0xFFFFFFFF))
            tr = jnp.where(sl >= m2, cL, jnp.where(su >= sd, cU, 0))
        else:
            tr = jnp.zeros((Bs, LANES), jnp.int32)
        cell = m3

        if with_trim_end:
            ll_k_new = (bi - 2) - ll_e_new

            # --- trim column ki == -1 (raw_loader.cpp:215-225) ---
            o_trim = -1 - ll_k_new
            ei_trim = ll_e_new - o_trim
            off_ok = (o_trim >= 0) & (o_trim < BANDWIDTH)
            ei_ok = (ei_trim >= 0) & (ei_trim < nev)
            trim_val = LP_TRIM * (ei_trim.astype(jnp.float32) + 1.0)
            m_tr = (lanes == o_trim) & off_ok
            cell = jnp.where(m_tr, jnp.where(ei_ok, trim_val, NEG_INF), cell)
            tr = jnp.where(
                m_tr & ei_ok,
                np.int32(np.uint32((FROM_U << shift) & 0xFFFFFFFF)), tr)

        cell = jnp.where(lane_hi, NEG_INF, cell)

        if with_trim_end:
            # --- trailing-trim end tracking (raw_loader.cpp:313-324):
            # each band holds at most one (event, last-kmer) cell ---
            o_end = (nk - 1) - ll_k_new
            ei_end = ll_e_new - o_end
            v_end = jnp.max(jnp.where(lanes == o_end, cell, NEG_INF),
                            axis=1, keepdims=True)
            end_ok = (o_end >= 0) & (o_end < BANDWIDTH) & \
                (ei_end >= 0) & (ei_end < nev)
            endsc = v_end + (nev - ei_end).astype(jnp.float32) * LP_TRIM
            better = end_ok & (endsc > best_s_v)
            best_s_v = jnp.where(better, endsc, best_s_v)
            best_e_v = jnp.where(better, ei_end, best_e_v)

        # band decision bit rides lane 127 (unused by the 100-wide band)
        if "ftrace" not in _ABLATE:
            tr = jnp.where(lanes == LANES - 1,
                           jnp.where(right_b, 1 << shift, 0), tr)

        return tr, (cell, sp, ew_v, kmu_v, ksig_v, kc_v,
                    ll_e_new, up, best_s_v, best_e_v)

    scratches = (s_prev, s_prev2, ew, kmu, ksig, kc,
                 ll_e, up_prev, best_s, best_e)

    def split_ctx(s):
        a, b = s * Bs, (s + 1) * Bs
        return (nev_ref[a:b, 0:1], nk_ref[a:b, 0:1],
                jnp.broadcast_to(lps_ref[a:b, 0:1], (Bs, LANES)),
                jnp.broadcast_to(lpt_ref[a:b, 0:1], (Bs, LANES)))

    ctxs = tuple(split_ctx(s) for s in range(nsplit))

    def load_state():
        return tuple(
            tuple(r[s * Bs:(s + 1) * Bs, :] for r in scratches)
            for s in range(nsplit))

    def store_state(sts):
        for s, st in enumerate(sts):
            for r, v in zip(scratches, st):
                r[s * Bs:(s + 1) * Bs, :] = v

    def group(g, sts, with_trim_end):
        """PACK bands, statically unrolled: parity and the 2-bit shift
        are Python constants, the packed trace accumulates in registers
        with one store per group, and the full DP state (score rows,
        windows, placement bookkeeping) flows band-to-band as loop-
        carried values.  The nsplit sub-batches are independent DP
        chains interleaved band-by-band so the scheduler can hide one
        chain's op latency under the others' (the band loop is latency-
        bound, not issue-bound — see PERF.md cost attribution)."""
        c0 = g * PACK
        sts = list(sts)
        accs = [jnp.zeros((Bs, LANES), jnp.int32) for _ in range(nsplit)]
        for m in range(PACK):
            # bi0, g*PACK and PACK are all even, so rem(bi, 2) == m & 1
            for s in range(nsplit):
                tr, sts[s] = band(bi0 + c0 + m, m & 1, 2 * m, with_trim_end,
                                  ctxs[s], sts[s])
                if "ftrace" not in _ABLATE:
                    accs[s] = accs[s] | tr
        for s in range(nsplit):
            trace_ref[g, s * Bs:(s + 1) * Bs, :] = accs[s]
        return tuple(sts)

    full = need_trim | need_end

    @pl.when(full)
    def _():
        store_state(jax.lax.fori_loop(
            0, CHUNK // PACK,
            functools.partial(group, with_trim_end=True), load_state()))

    @pl.when(jnp.logical_not(full))
    def _():
        store_state(jax.lax.fori_loop(
            0, CHUNK // PACK,
            functools.partial(group, with_trim_end=False), load_state()))

    lle_ref[:] = ll_e[:]
    bests_ref[:] = best_s[:]
    beste_ref[:] = best_e[:]


# ---------------------------------------------------------------------------
# Backtrack kernel
# ---------------------------------------------------------------------------

def _align_up(x, r_row):
    """Vectorized up-rotate of x [n, B] by per-lane r_row [1, B] (0..127):
    out[j, b] = x[(j + r) % n, b].  Sublane analogue of _align_left,
    decomposed into static power-of-two rolls gated per lane."""
    n = x.shape[0]
    for bit in (64, 32, 16, 8, 4, 2, 1):
        x = jnp.where((r_row & bit) != 0, pltpu.roll(x, n - bit, 0), x)
    return x


def _roll_up(x, n=1):
    """Circular roll towards row 0 by n sublanes: out[j] = x[(j + n) % N]."""
    return pltpu.roll(x, x.shape[0] - n, 0)


def _backtrack_kernel(trace_ref, evr_ref, tmu_ref, tsig_ref, tc_ref,
                      nk_ref, lle_ref, beste_ref, bok_ref,
                      rows_k_ref, rows_e_ref, sumem_ref, stats_ref,
                      cur_e, cur_k, ll_e, active, sum_em,
                      n_pairs, cur_gap, max_gap, last_ki, min_ev,
                      es, kmu, ksig, kc, stage, Tp, nsplit):
    """Walk-replay backtrack, lane-major: the walk state lives in [1, B]
    rows (reads on the lane axis — every per-band scalar op is one vreg
    instead of the 16 a [B, 1] column costs), and the data streams live
    TRANSPOSED as [LANES, B] blocks rolled along sublanes, so the current
    element of each stream is the natural [1, B] row slice with no
    per-band relayout.

    NPT_BT_SPLIT > 1 splits the B lanes into independent 128-lane walk
    chains interleaved band-by-band.  Measured NEUTRAL at B=256 (164.3
    vs 164.9 us/read full pipeline back-to-back): the [1,256] walk ops
    already carry 2-vreg ILP and the per-band row-store concat eats the
    rest.  Kept env-selectable (default 1), hardware-validated 256/256."""
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    B = cur_e.shape[1]

    @pl.when(i == 0)
    def _():
        cur_k[:] = nk_ref[:] - 1
        cur_e[:] = beste_ref[:]
        ll_e[:] = lle_ref[:]
        active[:] = bok_ref[:]
        sum_em[:] = jnp.zeros((1, B), jnp.float32)
        n_pairs[:] = jnp.zeros((1, B), jnp.int32)
        cur_gap[:] = jnp.zeros((1, B), jnp.int32)
        max_gap[:] = jnp.zeros((1, B), jnp.int32)
        last_ki[:] = jnp.full((1, B), -1, jnp.int32)
        # min_ev / last_ki are captured at walk termination (the walk's
        # event coordinate is non-increasing, so min == value at the last
        # active band); max_ev == best_e and is derived in the wrapper.
        min_ev[:] = jnp.full((1, B), jnp.iinfo(jnp.int32).max, jnp.int32)

    # --- stream refills: es[j, b] = event[cur_e - j] (current at row 0,
    # rolled up on event decrements); k*[j, b] = table[cur_k - 127 + j]
    # (current at row 127, rolled down on kmer decrements).  A chunk
    # reads at most 127 rows past the refill position (the walk advances
    # each stream at most once per band, and the last band's advance is
    # never read within the chunk), so 128-row streams suffice — circular
    # roll garbage only enters rows already consumed.  The per-read
    # 128-aligned loads stage row-major; one [B, 256] -> [256, B]
    # transpose per stream per chunk moves them into the walk layout.
    for scalar_j0, j0_row, srcs in (
            (lambda b: (Tp + 255) - cur_e[0, b], (Tp + 255) - cur_e[:],
             ((evr_ref, es),)),
            (lambda b: cur_k[0, b] + 129, cur_k[:] + 129,
             ((tmu_ref, kmu), (tsig_ref, ksig), (tc_ref, kc)))):
        r_row = j0_row & 127
        for src_ref, w in srcs:
            if "bloads" not in _ABLATE:       # perf attribution only
                for b in range(B):
                    jb = scalar_j0(b)
                    ab = pl.multiple_of(jb - (jb & 127), 128)
                    stage[b, :] = src_ref[b, pl.ds(ab, 256)]
            if "balign" not in _ABLATE:       # perf attribution only
                w[:] = _align_up(jnp.transpose(stage[:]), r_row)[:LANES, :]

    bi0 = 2 + (n_steps - 1 - i) * CHUNK

    walk_scr = (cur_e, cur_k, ll_e, active, sum_em,
                n_pairs, cur_gap, max_gap, last_ki, min_ev,
                es, kmu, ksig, kc)
    spans = [(s * (B // nsplit), (s + 1) * (B // nsplit))
             for s in range(nsplit)]

    def load_walk():
        return tuple(tuple(r[:, a:b] for r in walk_scr) for a, b in spans)

    def store_walk(sts):
        for (a, b), st in zip(spans, sts):
            for r, v in zip(walk_scr, st):
                r[:, a:b] = v

    def group(gg, sts):
        g = (CHUNK // PACK - 1) - gg
        # Align each chain's packed block to its walk: the visited
        # offset's 2-bit codes live at row 0 for the whole group.  The
        # offset moves by {-1,0,+1} per band, so alignment is maintained
        # with one conditional roll; circular wraparound matches the
        # mod-128 arithmetic of `off & 127`, so pre-activation garbage
        # offsets stay consistent and harmless (act is false there).
        rbits_l, inits = [], []
        for (a, b), st in zip(spans, sts):
            packed = jnp.transpose(trace_ref[g, a:b, :])   # [LANES, Bsl]
            rbits_l.append(packed[LANES - 1:LANES, :])     # decision bits
            off0 = (st[2] - st[0]) & 127                   # ll_e - cur_e
            inits.append((_align_up(packed, off0),) + st)

        def band(mm, carry, rbits):
            (pk, cur_e_v, cur_k_v, ll_e_v, active_v, sum_em_v, n_pairs_v,
             cur_gap_v, max_gap_v, last_ki_v, min_ev_v,
             es_v, kmu_v, ksig_v, kc_v) = carry
            m = (PACK - 1) - mm
            c = g * PACK + m
            bi = bi0 + c
            right = jnp.right_shift(rbits, 2 * m) & 3   # band decision bit
            code = jnp.right_shift(pk[0:1, :], 2 * m) & 3

            act = (active_v > 0) & ((cur_e_v + cur_k_v + 2) == bi)

            # emission at the visited cell, reference f32 op order
            # (same elementwise ops as the scan oracle)
            ev0 = es_v[0:1, :]
            a = (ev0 - kmu_v[LANES - 1:LANES, :]) / ksig_v[LANES - 1:LANES, :]
            em = kc_v[LANES - 1:LANES, :] + (-0.5 * a) * a

            is_l = code == FROM_L
            dec_k = (act & (code != FROM_U)).astype(jnp.int32)   # D or L
            dec_e = (act & (~is_l)).astype(jnp.int32)            # D or U

            if "stats" not in _ABLATE:
                sum_em_v = jnp.where(act, sum_em_v + em, sum_em_v)
                n_pairs_v = n_pairs_v + act.astype(jnp.int32)
                cur_gap_v = jnp.where(act,
                                      jnp.where(is_l, cur_gap_v + 1, 0),
                                      cur_gap_v)
                max_gap_v = jnp.maximum(max_gap_v, cur_gap_v)

            k_next = cur_k_v - dec_k
            e_next = cur_e_v - dec_e
            terminates = (k_next < 0) | (e_next < 0)
            cap = act & terminates
            # walk coordinates are non-increasing: the stats the scan port
            # tracks with per-band min/max resolve to the termination cell
            last_ki_v = jnp.where(cap, cur_k_v, last_ki_v)
            min_ev_v = jnp.where(cap, cur_e_v, min_ev_v)
            # a pair enters the base->event map iff its event differs from
            # the previous (forward-order) pair's event
            # (squiggle_read.cpp:284-299)
            map_valid = act & ((~is_l) | terminates)

            # b2e rows are returned to band_all, which stores the
            # chains' halves as ONE full-width row (Mosaic has no dynamic
            # store at a nonzero lane offset)
            rowk = jnp.where(map_valid, cur_k_v, -1)
            rowe = jnp.where(map_valid, cur_e_v, -1)

            if "streams" not in _ABLATE:
                # stream advances follow the walk
                es_v = jnp.where(dec_e > 0, _roll_up(es_v), es_v)
                kroll = dec_k > 0
                kmu_v = jnp.where(kroll, pltpu.roll(kmu_v, 1, 0), kmu_v)
                ksig_v = jnp.where(kroll, pltpu.roll(ksig_v, 1, 0), ksig_v)
                kc_v = jnp.where(kroll, pltpu.roll(kc_v, 1, 0), kc_v)

            active_v = jnp.where(cap, 0, active_v)
            ll_e_v = ll_e_v - (1 - right)

            # maintain the walk alignment of the packed block: the visited
            # offset moves by dec_e - (1 - right) in {-1, 0, +1} per band
            delta = dec_e - (1 - right)
            pk = jnp.where(delta == 1, _roll_up(pk), pk)
            pk = jnp.where(delta == -1, pltpu.roll(pk, 1, 0), pk)
            return rowk, rowe, (
                pk, e_next, k_next, ll_e_v, active_v, sum_em_v,
                n_pairs_v, cur_gap_v, max_gap_v, last_ki_v, min_ev_v,
                es_v, kmu_v, ksig_v, kc_v)

        def band_all(mm, carrys):
            # the chains are independent: their ops interleave inside one
            # loop iteration, hiding each other's latency
            outs = [band(mm, carrys[s], rbits_l[s])
                    for s in range(nsplit)]
            if "rows" not in _ABLATE:
                c = g * PACK + (PACK - 1) - mm
                rows_k_ref[c, :] = jnp.concatenate(
                    [o[0] for o in outs], axis=1)[0, :]
                rows_e_ref[c, :] = jnp.concatenate(
                    [o[1] for o in outs], axis=1)[0, :]
            return tuple(o[2] for o in outs)

        outs = jax.lax.fori_loop(0, PACK, band_all, tuple(inits))
        return tuple(o[1:] for o in outs)

    sts = jax.lax.fori_loop(0, CHUNK // PACK, group, load_walk())
    store_walk(sts)

    for (a, b), st in zip(spans, sts):
        sumem_ref[:, a:b] = st[4]
        stats_ref[0:1, a:b] = st[5]
        stats_ref[1:2, a:b] = st[7]
        stats_ref[2:3, a:b] = st[8]
        stats_ref[3:4, a:b] = st[9]


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("Tp", "interpret", "nsplit"))
def _fill_call(evr, tmu, tsig, tc, nev, nk, lps, lpt, Tp, interpret=False,
               nsplit=None):
    B = evr.shape[0]
    if nsplit is None:
        nsplit = int(_os.environ.get("NPT_FILL_SPLIT", "2"))
    while nsplit > 1 and B % (8 * nsplit):  # sublane-aligned sub-batches
        nsplit //= 2
    # NOTE: when this runs under an outer jit, env vars are read at trace
    # time; callers that must honor a changed env (tests, sweeps) pass
    # nsplit explicitly (banded_align_exact does)
    Kp = tmu.shape[1] - 768
    n_steps = (Tp + Kp) // CHUNK
    out_shape = (
        jax.ShapeDtypeStruct((n_steps * CHUNK // PACK, B, LANES), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),       # ll_e final
        jax.ShapeDtypeStruct((B, 1), jnp.float32),     # best_s
        jax.ShapeDtypeStruct((B, 1), jnp.int32),       # best_e
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    fixed = pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fill_kernel, Tp=Tp, nsplit=nsplit),
        grid=(n_steps,),
        in_specs=[full] * 4 + [fixed] * 4,
        out_specs=(
            pl.BlockSpec((CHUNK // PACK, B, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            fixed, fixed, fixed,
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((B, LANES), jnp.float32),   # s_prev
            pltpu.VMEM((B, LANES), jnp.float32),   # s_prev2
            pltpu.VMEM((B, WIN), jnp.float32),     # ew
            pltpu.VMEM((B, WIN), jnp.float32),     # kmu
            pltpu.VMEM((B, WIN), jnp.float32),     # ksig
            pltpu.VMEM((B, WIN), jnp.float32),     # kc
            pltpu.VMEM((B, 1), jnp.int32),         # ll_e
            pltpu.VMEM((B, LANES), jnp.float32),   # up_prev
            pltpu.VMEM((B, 1), jnp.float32),       # best_s
            pltpu.VMEM((B, 1), jnp.int32),         # best_e
            pltpu.VMEM((B, 384), jnp.float32),     # refill staging
        ],
        # the VMEM-resident inputs exceed the default 16 MB scoped limit
        # beyond B=64; v5e has 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(120 if B > 256 else 100) * 1024 * 1024),
        interpret=interpret,
    )(evr, tmu, tsig, tc, nev, nk, lps, lpt)


@functools.partial(jax.jit,
                   static_argnames=("Tp", "interpret", "nsplit"))
def _backtrack_call(trace, evr, tmu, tsig, tc, nk, lle, best_e, best_ok,
                    Tp, interpret=False, nsplit=None):
    n_rows, B, _ = trace.shape
    n_steps = n_rows * PACK // CHUNK
    out_shape = (
        jax.ShapeDtypeStruct((n_steps * CHUNK, B), jnp.int32),   # rows_k
        jax.ShapeDtypeStruct((n_steps * CHUNK, B), jnp.int32),   # rows_e
        jax.ShapeDtypeStruct((1, B), jnp.float32),               # sum_em
        jax.ShapeDtypeStruct((8, B), jnp.int32),                 # stats
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    fixed = pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM)
    rev3t = lambda i: (n_steps - 1 - i, 0, 0)
    rev2 = lambda i: (n_steps - 1 - i, 0)
    # independent 128-lane walk chains (see _backtrack_kernel docstring);
    # below 2x128 lanes there is nothing to split
    nsplit = int(_os.environ.get("NPT_BT_SPLIT", "1"))
    while nsplit > 1 and B % (128 * nsplit):
        nsplit //= 2
    return pl.pallas_call(
        functools.partial(_backtrack_kernel, Tp=Tp, nsplit=nsplit),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((CHUNK // PACK, B, LANES), rev3t,
                         memory_space=pltpu.VMEM),
            full, full, full, full,
            fixed, fixed, fixed, fixed,
        ],
        out_specs=(
            pl.BlockSpec((CHUNK, B), rev2, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, B), rev2, memory_space=pltpu.VMEM),
            fixed,
            pl.BlockSpec((8, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((1, B), jnp.int32) for _ in range(4)] +
        [pltpu.VMEM((1, B), jnp.float32)] +
        [pltpu.VMEM((1, B), jnp.int32) for _ in range(5)] +
        [pltpu.VMEM((LANES, B), jnp.float32) for _ in range(4)] +
        [pltpu.VMEM((B, 256), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(120 if B > 256 else 100) * 1024 * 1024),
        interpret=interpret,
    )(trace, evr, tmu, tsig, tc,
      jnp.transpose(nk), jnp.transpose(lle), jnp.transpose(best_e),
      jnp.transpose(best_ok))


@functools.partial(jax.jit, static_argnames=("K0",))
def _b2e_from_pairs(rows_k, rows_e, failed, K0):
    """Scatter backtrack pairs into per-kmer first/last event maps."""
    nB, B = rows_k.shape
    valid = (rows_k >= 0) & jnp.logical_not(failed[None, :])
    bidx = jax.lax.broadcasted_iota(jnp.int32, (nB, B), 1)
    flat = jnp.where(valid, bidx * K0 + jnp.clip(rows_k, 0, K0 - 1), B * K0)
    ev = jnp.where(valid, rows_e, 0)
    big = jnp.iinfo(jnp.int32).max
    starts = jnp.full((B * K0 + 1,), big, jnp.int32).at[flat.ravel()].min(ev.ravel())
    stops = jnp.full((B * K0 + 1,), -1, jnp.int32).at[flat.ravel()].max(ev.ravel())
    b2e_start = jnp.where(starts[:-1] == big, -1, starts[:-1]).reshape(B, K0)
    b2e_stop = stops[:-1].reshape(B, K0)
    return b2e_start, b2e_stop


@functools.partial(jax.jit, static_argnames=(
    "Tp", "K0", "interpret", "fill_nsplit", "bt_nsplit"))
def _exact_align_device(evr, tmu, tsig, tc, nev, nk, lps, lpt,
                        Tp, K0, interpret=False,
                        fill_nsplit=None, bt_nsplit=None):
    trace, lle, best_s, best_e = _fill_call(
        evr, tmu, tsig, tc, nev, nk, lps, lpt, Tp, interpret=interpret,
        nsplit=fill_nsplit)
    best_ok = (best_s > OB).astype(jnp.int32)
    rows_k, rows_e, sum_em, stats = _backtrack_call(
        trace, evr, tmu, tsig, tc, nk, lle, best_e, best_ok, Tp,
        interpret=interpret, nsplit=bt_nsplit)
    n_pairs = stats[0, :]
    max_gap = stats[1, :]
    last_ki = stats[2, :]
    min_ev = stats[3, :]
    # the walk starts at best_e whenever it activates at all, so the scan
    # port's running max_ev is best_e for activated reads, -1 otherwise
    max_ev = jnp.where(best_ok[:, 0] > 0, best_e[:, 0], -1)
    avg = sum_em[0, :] / jnp.maximum(n_pairs, 1).astype(jnp.float32)
    spanned = (last_ki == 0) & (n_pairs > 0)
    failed = ((avg < MIN_AVG_LOG_EMISSION) | (~spanned) |
              (max_gap > MAX_GAP_THRESHOLD) | (n_pairs == 0))
    b2e_start, b2e_stop = _b2e_from_pairs(rows_k, rows_e, failed, K0)
    epb = (max_ev - min_ev).astype(jnp.float32) / jnp.maximum(
        nk[:, 0], 1).astype(jnp.float32)
    return BandedAlignResult(
        b2e_start=jnp.where(failed[:, None], -1, b2e_start),
        b2e_stop=jnp.where(failed[:, None], -1, b2e_stop),
        failed=failed,
        avg_log_emission=avg,
        spanned=spanned,
        max_gap=max_gap,
        events_per_base=epb,
        n_pairs=n_pairs,
    )


@functools.partial(jax.jit, static_argnames=(
    "Tp", "K0", "interpret", "fill_nsplit", "bt_nsplit"))
def _exact_align_device_packed(evr, tmu, tsig, tc, nev, nk, lps, lpt,
                               Tp, K0, interpret=False,
                               fill_nsplit=None, bt_nsplit=None):
    """One int32 [B, 2*K0+6] wire array holding the whole result —
    a single device->host transfer per sub-batch (each transfer costs a
    relay round trip on remotely-attached chips)."""
    r = _exact_align_device(evr, tmu, tsig, tc, nev, nk, lps, lpt,
                            Tp, K0, interpret=interpret,
                            fill_nsplit=fill_nsplit, bt_nsplit=bt_nsplit)
    fbits = lambda x: jax.lax.bitcast_convert_type(  # noqa: E731
        x.astype(jnp.float32), jnp.int32)
    return jnp.concatenate([
        r.b2e_start, r.b2e_stop,
        r.failed.astype(jnp.int32)[:, None],
        fbits(r.avg_log_emission)[:, None],
        r.spanned.astype(jnp.int32)[:, None],
        r.max_gap[:, None],
        fbits(r.events_per_base)[:, None],
        r.n_pairs[:, None],
    ], axis=1)


def _unpack_result(arr, K0):
    """Host-side inverse of _exact_align_device_packed (np arrays)."""
    arr = np.asarray(arr)
    t = np.ascontiguousarray(arr[:, 2 * K0:])
    return BandedAlignResult(
        b2e_start=arr[:, :K0],
        b2e_stop=arr[:, K0:2 * K0],
        failed=t[:, 0].astype(bool),
        avg_log_emission=t[:, 1].copy().view(np.float32),
        spanned=t[:, 2].astype(bool),
        max_gap=t[:, 3],
        events_per_base=t[:, 4].copy().view(np.float32),
        n_pairs=t[:, 5])


def _pad_batch(n, lo=8):
    p = lo
    while p < n:
        p *= 2
    return p


def banded_align_exact(event_mean, n_events, mu, sigma, log_sigma, n_kmers,
                       lp_stay=None, lp_step=None, interpret=None):
    """Reference-exact batched adaptive banded event alignment (Pallas).

    Same signature/result as ops.banded_align.banded_align_batch; batch is
    processed in VMEM-sized chunks (up to 256 reads per kernel batch).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    event_mean = np.asarray(event_mean, np.float32)
    n_events = np.asarray(n_events, np.int32)
    n_kmers = np.asarray(n_kmers, np.int32)
    B = event_mean.shape[0]
    if lp_stay is None:
        lp_stay, lp_step = transition_params_f32(n_events, n_kmers)
    lp_stay = np.asarray(lp_stay, np.float32).reshape(B, 1)
    lp_step = np.asarray(lp_step, np.float32).reshape(B, 1)

    # per-chunk batch: inputs are VMEM-resident (v5e: 128 MB physical,
    # raised scoped limit in the pallas_call); bigger batches amortize
    # the band loop's B-independent structural cost (~8.6 ms/batch of
    # the fill measured at B=32 vs 64), so go as wide as fits
    T0 = event_mean.shape[1]
    K0w = mu.shape[1]
    bytes_per_read = 4 * ((_pad_to(T0, CHUNK) + 768)
                          + 3 * (_pad_to(K0w, CHUNK) + 768))
    bmax = max(8, min(256, int(70e6 // max(bytes_per_read, 1)) // 8 * 8))
    # two passes: dispatch every sub-batch (async), then materialize each
    # as ONE packed transfer — serialized per-field syncs would pay a
    # relay round trip per array
    pending = []
    for lo in range(0, B, bmax):
        hi = min(lo + bmax, B)
        Bc = _pad_batch(hi - lo)
        sl = slice(lo, hi)
        pad = Bc - (hi - lo)

        def padded(x, fill=0):
            x = np.asarray(x)
            if pad:
                shape = (pad,) + x.shape[1:]
                x = np.concatenate([x, np.full(shape, fill, x.dtype)], axis=0)
            return x

        prep = prepare_exact_inputs(
            padded(event_mean[sl]), padded(n_events[sl], 1),
            padded(mu[sl]), padded(sigma[sl], 1.0), padded(log_sigma[sl]),
            padded(n_kmers[sl], 2))
        dev = _exact_align_device_packed(
            prep["evr"], prep["tmu"], prep["tsig"], prep["tc"],
            prep["nev"], prep["nk"], padded(lp_stay[sl]), padded(lp_step[sl]),
            prep["Tp"], prep["K0"], interpret=interpret,
            fill_nsplit=int(_os.environ.get("NPT_FILL_SPLIT", "2")),
            bt_nsplit=int(_os.environ.get("NPT_BT_SPLIT", "1")))
        pending.append((dev, prep["K0"], hi - lo))
    outs = []
    for dev, K0c, n in pending:
        res = _unpack_result(dev, K0c)
        outs.append(BandedAlignResult(*(v[:n] for v in res)))
    if len(outs) == 1:
        return outs[0]
    return BandedAlignResult(*(np.concatenate(vs, axis=0)
                               for vs in zip(*outs)))
