"""Adaptive banded event alignment — the per-read load-time DP kernel.

Behavioral spec: ``adaptive_banded_simple_event_align``
(reference: src/nanopolish_raw_loader.cpp:77-379), a Suzuki-Kasahara-style
anti-diagonal banded Viterbi aligning raw events to the basecalled sequence
with a 100-wide adaptive band.

TPU design
----------
The reference fills one (event,kmer) anti-diagonal band of 100 cells at a
time, choosing the next band's placement (down/right) from the two band-edge
scores.  Here:

  * the band lives on the 128-lane axis (lanes 100..127 permanently -inf);
  * a batch of B reads occupies the sublane/batch axis;
  * a single `lax.scan` over band index performs the whole DP; the band
    placement decision, band shifts, and 3-way max are vectorized over
    [B, 128];
  * the uint8 traceback is written to HBM as scan output and the backtrack
    itself runs as a second reverse `lax.scan` on device, so only O(K)
    per-read results (base->event map + QC stats) ever leave the chip.

Reads are bucketed by (n_events, n_kmers) padding on the host; masking makes
padded lanes/reads inert.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .emissions import LOG_INV_SQRT_2PI

BANDWIDTH = 100          # ALN_BANDWIDTH (raw_loader.cpp:72)
LANES = 128              # band padded to the TPU lane width
HALF_BANDWIDTH = BANDWIDTH // 2

# transition/trim constants (raw_loader.cpp:98-108)
LP_SKIP = math.log(1e-10)
LP_TRIM = math.log(0.01)

# QC constants (raw_loader.cpp:90-92)
MIN_AVG_LOG_EMISSION = -5.0
MAX_GAP_THRESHOLD = 50

FROM_D, FROM_U, FROM_L = 0, 1, 2

NEG_INF = -jnp.inf


class BandedAlignResult(NamedTuple):
    """Per-read outputs of the batched banded alignment (device arrays)."""

    b2e_start: jnp.ndarray       # [B, K] int32, first event per kmer, -1 if none
    b2e_stop: jnp.ndarray        # [B, K] int32
    failed: jnp.ndarray          # [B] bool (QC: emission/spanned/max-gap)
    avg_log_emission: jnp.ndarray  # [B] f32
    spanned: jnp.ndarray         # [B] bool
    max_gap: jnp.ndarray         # [B] int32
    events_per_base: jnp.ndarray  # [B] f32 ((max_ev-min_ev)/n_kmers)
    n_pairs: jnp.ndarray         # [B] int32


def _log_normal(x, mu, sigma, log_sigma):
    a = (x - mu) / sigma
    return (LOG_INV_SQRT_2PI - log_sigma) + (-0.5 * a * a)


def _shift_left(x, fill):
    # out[o] = x[o+1]
    return jnp.concatenate([x[:, 1:], jnp.full((x.shape[0], 1), fill, x.dtype)], axis=1)


def _shift_right(x, fill):
    # out[o] = x[o-1]
    return jnp.concatenate([jnp.full((x.shape[0], 1), fill, x.dtype), x[:, :-1]], axis=1)


@functools.partial(jax.jit, static_argnames=("n_bands",))
def _banded_forward(event_mean, n_events, mu, sigma, log_sigma, n_kmers,
                    lp_stay, lp_step, n_bands: int):
    """Forward band-filling scan.

    Returns (trace [n_bands, B, LANES] uint8, ll_event [n_bands, B] i32,
    best_event [B] i32): per-band traceback moves, band lower-left event
    coordinates, and the best trailing-trim end event for the last kmer.
    """
    B, T = event_mean.shape
    K = mu.shape[1]
    offsets = jnp.arange(LANES, dtype=jnp.int32)[None, :]          # [1, LANES]
    lane_valid = offsets < BANDWIDTH                                 # [1, LANES]

    n_events_f = n_events.astype(jnp.float32)

    # band 0: score 0 at the central cell (offset 50); ll = (49, -51)
    ll_e0 = jnp.full((B,), HALF_BANDWIDTH - 1, jnp.int32)
    ll_k0 = jnp.full((B,), -1 - HALF_BANDWIDTH, jnp.int32)
    s0 = jnp.where((offsets == HALF_BANDWIDTH) & lane_valid, 0.0, NEG_INF)
    s0 = jnp.broadcast_to(s0, (B, LANES))
    # band 1 = move_down(band 0): ll = (50, -51); trim cell at offset 50
    ll_e1 = ll_e0 + 1
    ll_k1 = ll_k0
    s1 = jnp.where((offsets == HALF_BANDWIDTH) & lane_valid, LP_TRIM, NEG_INF)
    s1 = jnp.broadcast_to(s1, (B, LANES))
    tr0 = jnp.zeros((B, LANES), jnp.uint8)
    tr1 = jnp.where(offsets == HALF_BANDWIDTH, jnp.uint8(FROM_U), jnp.uint8(0))
    tr1 = jnp.broadcast_to(tr1, (B, LANES))

    lp_stay_b = lp_stay[:, None]
    lp_step_b = lp_step[:, None]

    def step(carry, band_idx):
        s_prev, s_prev2, ll_e_prev, ll_k_prev, r_prev, best_score, best_event = carry

        # --- adaptive band placement (raw_loader.cpp:175-195) ---
        ll = s_prev[:, 0]
        ur = s_prev[:, BANDWIDTH - 1]
        ll_ob = jnp.isneginf(ll)
        ur_ob = jnp.isneginf(ur)
        right = jnp.where(ll_ob & ur_ob, (band_idx % 2) == 1, ll < ur)
        r_i = right.astype(jnp.int32)

        ll_e = ll_e_prev + (1 - r_i)
        ll_k = ll_k_prev + r_i

        # --- neighbor bands re-indexed into this band's offsets ---
        # RIGHT: up = s_prev[o+1], left = s_prev[o]
        # DOWN:  up = s_prev[o],   left = s_prev[o-1]
        s_prev_l = _shift_left(s_prev, NEG_INF)
        s_prev_r = _shift_right(s_prev, NEG_INF)
        up = jnp.where(right[:, None], s_prev_l, s_prev)
        left = jnp.where(right[:, None], s_prev, s_prev_r)
        # diag = s_prev2[o - 1 + r_prev + r_i]
        amt = (r_prev + r_i - 1)[:, None]                 # in {-1, 0, 1}
        s2_l = _shift_left(s_prev2, NEG_INF)
        s2_r = _shift_right(s_prev2, NEG_INF)
        diag = jnp.where(amt == 1, s2_l, jnp.where(amt == 0, s_prev2, s2_r))

        # --- cell coordinates + gathers ---
        ei = ll_e[:, None] - offsets                       # [B, LANES]
        ki = ll_k[:, None] + offsets
        ev = jnp.take_along_axis(event_mean, jnp.clip(ei, 0, T - 1), axis=1)
        kidx = jnp.clip(ki, 0, K - 1)
        mu_g = jnp.take_along_axis(mu, kidx, axis=1)
        sg_g = jnp.take_along_axis(sigma, kidx, axis=1)
        ls_g = jnp.take_along_axis(log_sigma, kidx, axis=1)

        valid = ((ei >= 0) & (ei < n_events[:, None]) &
                 (ki >= 0) & (ki < n_kmers[:, None]) & lane_valid)

        lp_emission = _log_normal(ev, mu_g, sg_g, ls_g)

        score_d = diag + lp_step_b + lp_emission
        score_u = up + lp_stay_b + lp_emission
        score_l = left + LP_SKIP

        # 3-way max with the reference's tie-break (last winner)
        m2 = jnp.maximum(score_d, score_u)
        f2 = jnp.where(m2 == score_u, jnp.uint8(FROM_U), jnp.uint8(FROM_D))
        m3 = jnp.maximum(m2, score_l)
        f3 = jnp.where(m3 == score_l, jnp.uint8(FROM_L), f2)

        cell = jnp.where(valid, m3, NEG_INF)
        trace = jnp.where(valid, f3, jnp.uint8(0))

        # --- trim state column (ki == -1), raw_loader.cpp:215-225 ---
        trim_mask = (ki == -1) & (ei >= 0) & (ei < n_events[:, None]) & lane_valid
        trim_val = LP_TRIM * (ei.astype(jnp.float32) + 1.0)
        cell = jnp.where(trim_mask, trim_val, cell)
        trace = jnp.where(trim_mask, jnp.uint8(FROM_U), trace)

        # --- track the best end cell: ki == n_kmers-1, plus trailing trim ---
        end_mask = valid & (ki == (n_kmers[:, None] - 1))
        end_score = cell + (n_events_f[:, None] - ei.astype(jnp.float32)) * LP_TRIM
        end_score = jnp.where(end_mask, end_score, NEG_INF)
        cand = jnp.max(end_score, axis=1)
        cand_ev = jnp.take_along_axis(
            ei, jnp.argmax(end_score, axis=1)[:, None], axis=1)[:, 0]
        better = cand > best_score                      # strict: earliest event wins
        best_score = jnp.where(better, cand, best_score)
        best_event = jnp.where(better, cand_ev, best_event)

        new_carry = (cell, s_prev, ll_e, ll_k, r_i, best_score, best_event)
        return new_carry, (trace, ll_e)

    init = (s1, s0, ll_e1, ll_k1, jnp.zeros((B,), jnp.int32),
            jnp.full((B,), NEG_INF, jnp.float32), jnp.zeros((B,), jnp.int32))
    band_indices = jnp.arange(2, n_bands, dtype=jnp.int32)
    carry, (traces, ll_es) = jax.lax.scan(step, init, band_indices)
    best_event = carry[6]

    trace_all = jnp.concatenate([tr0[None], tr1[None], traces], axis=0)
    ll_e_all = jnp.concatenate([ll_e0[None], ll_e1[None], ll_es], axis=0)
    return trace_all, ll_e_all, best_event


@functools.partial(jax.jit, static_argnames=())
def _banded_backtrack(trace_all, ll_e_all, best_event,
                      event_mean, n_events, mu, sigma, log_sigma, n_kmers):
    """Reverse scan over bands, walking the traceback for all reads at once.

    Spec: raw_loader.cpp:302-362.  Emits per-band (ki, ei, emit, map_valid)
    and accumulates QC stats in the carry.
    """
    n_bands, B, _ = trace_all.shape
    T = event_mean.shape[1]
    K = mu.shape[1]

    def step(carry, xs):
        ki, ei, active, sum_em, n_pairs, cur_gap, max_gap, min_ev, max_ev, last_ki = carry
        trace_b, ll_e_b, band_idx = xs

        here = active & ((ei + ki + 2) == band_idx)

        offset = jnp.clip(ll_e_b - ei, 0, LANES - 1)
        mv = jnp.take_along_axis(trace_b, offset[:, None], axis=1)[:, 0]

        # emission at the visited cell, for QC (raw_loader.cpp:339-342)
        ev = jnp.take_along_axis(event_mean, jnp.clip(ei, 0, T - 1)[:, None], axis=1)[:, 0]
        kc = jnp.clip(ki, 0, K - 1)[:, None]
        lp = _log_normal(ev,
                         jnp.take_along_axis(mu, kc, axis=1)[:, 0],
                         jnp.take_along_axis(sigma, kc, axis=1)[:, 0],
                         jnp.take_along_axis(log_sigma, kc, axis=1)[:, 0])

        sum_em = jnp.where(here, sum_em + lp, sum_em)
        n_pairs = jnp.where(here, n_pairs + 1, n_pairs)
        min_ev = jnp.where(here, jnp.minimum(min_ev, ei), min_ev)
        max_ev = jnp.where(here, jnp.maximum(max_ev, ei), max_ev)
        last_ki = jnp.where(here, ki, last_ki)

        is_d = mv == FROM_D
        is_u = mv == FROM_U
        is_l = mv == FROM_L
        cur_gap = jnp.where(here, jnp.where(is_l, cur_gap + 1, 0), cur_gap)
        max_gap = jnp.where(here, jnp.maximum(max_gap, cur_gap), max_gap)

        # a pair contributes to the base->event map iff its event differs
        # from the previous (forward-order) pair's event, i.e. the move out
        # of this cell is not a kmer-skip — except for the first forward
        # pair (backtrack terminates right after it)
        terminates = (jnp.where(is_u, ki, ki - 1) < 0) | (jnp.where(is_l, ei, ei - 1) < 0)
        map_valid = here & ((~is_l) | terminates)

        out = (jnp.where(here, ki, -1), jnp.where(here, ei, -1), map_valid)

        ki_n = jnp.where(here & (is_d | is_l), ki - 1, ki)
        ei_n = jnp.where(here & (is_d | is_u), ei - 1, ei)
        active_n = active & ~(here & terminates)

        return (ki_n, ei_n, active_n, sum_em, n_pairs, cur_gap, max_gap,
                min_ev, max_ev, last_ki), out

    init = (
        n_kmers - 1,                                      # ki
        best_event,                                       # ei
        jnp.ones((B,), bool),                             # active
        jnp.zeros((B,), jnp.float32),                     # sum_emission
        jnp.zeros((B,), jnp.int32),                       # n_pairs
        jnp.zeros((B,), jnp.int32),                       # cur_gap
        jnp.zeros((B,), jnp.int32),                       # max_gap
        jnp.full((B,), jnp.iinfo(jnp.int32).max, jnp.int32),  # min_event
        jnp.full((B,), -1, jnp.int32),                    # max_event
        jnp.full((B,), -1, jnp.int32),                    # last_ki
    )
    band_idx = jnp.arange(n_bands, dtype=jnp.int32)
    xs = (trace_all, ll_e_all, band_idx)
    carry, (kis, eis, map_valids) = jax.lax.scan(step, init, xs, reverse=True)
    (_, _, _, sum_em, n_pairs, _, max_gap, min_ev, max_ev, last_ki) = carry

    # scatter the (ki -> ei) pairs into the base->event map
    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[None, :], kis.shape)
    flat = b_idx * K + jnp.clip(kis, 0, K - 1)
    flat = jnp.where(map_valids, flat, B * K)            # dump slot
    big = jnp.iinfo(jnp.int32).max
    starts = jnp.full((B * K + 1,), big, jnp.int32).at[flat.ravel()].min(eis.ravel())
    stops = jnp.full((B * K + 1,), -1, jnp.int32).at[flat.ravel()].max(eis.ravel())
    b2e_start = jnp.where(starts[:-1] == big, -1, starts[:-1]).reshape(B, K)
    b2e_stop = stops[:-1].reshape(B, K)

    avg_log_emission = sum_em / jnp.maximum(n_pairs, 1).astype(jnp.float32)
    spanned = last_ki == 0                                 # first fwd pair at kmer 0
    failed = ((avg_log_emission < MIN_AVG_LOG_EMISSION) | (~spanned) |
              (max_gap > MAX_GAP_THRESHOLD) | (n_pairs == 0))
    events_per_base = (max_ev - min_ev).astype(jnp.float32) / jnp.maximum(
        n_kmers, 1).astype(jnp.float32)

    return BandedAlignResult(
        b2e_start=jnp.where(failed[:, None], -1, b2e_start),
        b2e_stop=jnp.where(failed[:, None], -1, b2e_stop),
        failed=failed,
        avg_log_emission=avg_log_emission,
        spanned=spanned,
        max_gap=max_gap,
        events_per_base=events_per_base,
        n_pairs=n_pairs,
    )


def banded_align_batch(event_mean, n_events, mu, sigma, log_sigma, n_kmers,
                       lp_stay=None, lp_step=None) -> BandedAlignResult:
    """Batched adaptive banded event alignment.

    Args:
      event_mean: [B, T] float32 event current levels (drift-free, raw pA).
      n_events:   [B] int32 valid event counts.
      mu/sigma/log_sigma: [B, K] float32 *scaled* per-kmer gaussians
        (scale*level_mean+shift, level_stdv*var, log thereof).
      n_kmers:    [B] int32 valid kmer counts.
      lp_stay/lp_step: optional [B] overrides; defaults follow
        raw_loader.cpp:98-107 (p_stay = 1 - 1/(events_per_kmer + 1)).
    """
    event_mean = jnp.asarray(event_mean, jnp.float32)
    n_events = jnp.asarray(n_events, jnp.int32)
    mu = jnp.asarray(mu, jnp.float32)
    sigma = jnp.asarray(sigma, jnp.float32)
    log_sigma = jnp.asarray(log_sigma, jnp.float32)
    n_kmers = jnp.asarray(n_kmers, jnp.int32)

    if lp_stay is None:
        epk = n_events.astype(jnp.float32) / jnp.maximum(n_kmers, 1).astype(jnp.float32)
        p_stay = 1.0 - 1.0 / (epk + 1.0)
        lp_stay = jnp.log(p_stay)
        lp_step = jnp.log(1.0 - jnp.exp(lp_stay) - math.exp(LP_SKIP))

    T = event_mean.shape[1]
    K = mu.shape[1]
    n_bands = (T + 1) + (K + 1)

    trace_all, ll_e_all, best_event = _banded_forward(
        event_mean, n_events, mu, sigma, log_sigma, n_kmers,
        jnp.asarray(lp_stay, jnp.float32), jnp.asarray(lp_step, jnp.float32),
        n_bands)
    return _banded_backtrack(trace_all, ll_e_all, best_event,
                             event_mean, n_events, mu, sigma, log_sigma, n_kmers)


# --------------------------------------------------------------------------
# NumPy reference implementation (direct port of the algorithm semantics,
# for validating the TPU kernel; raw_loader.cpp:77-379)
# --------------------------------------------------------------------------

def banded_align_reference(event_mean, mu, sigma, log_sigma):
    """Single-read reference implementation. Returns (pairs, stats)."""
    n_events = len(event_mean)
    n_kmers = len(mu)
    bw = BANDWIDTH
    events_per_kmer = n_events / n_kmers
    p_stay = 1 - 1 / (events_per_kmer + 1)
    lp_skip = LP_SKIP
    lp_stay = math.log(p_stay)
    lp_step = math.log(1.0 - math.exp(lp_skip) - math.exp(lp_stay))
    lp_trim = LP_TRIM

    n_bands = (n_events + 1) + (n_kmers + 1)
    bands = np.full((n_bands, bw), -np.inf, np.float32)
    trace = np.zeros((n_bands, bw), np.uint8)
    ll = np.zeros((n_bands, 2), np.int64)  # (event_idx, kmer_idx)

    ll[0] = (bw // 2 - 1, -1 - bw // 2)
    ll[1] = (ll[0][0] + 1, ll[0][1])
    bands[0][ll[0][1] * -1 - 1] = 0.0     # offset of kmer -1
    # band 0 start cell: offset = (-1) - ll_k
    start_off = -1 - ll[0][1]
    bands[0, :] = -np.inf
    bands[0, start_off] = 0.0
    first_trim_off = ll[1][0] - 0
    bands[1, first_trim_off] = lp_trim
    trace[1, first_trim_off] = FROM_U

    def emission(ei, ki):
        a = (event_mean[ei] - mu[ki]) / sigma[ki]
        return np.float32(LOG_INV_SQRT_2PI - log_sigma[ki] - 0.5 * a * a)

    for bi in range(2, n_bands):
        llv = bands[bi - 1, 0]
        ur = bands[bi - 1, bw - 1]
        ll_ob = llv == -np.inf
        ur_ob = ur == -np.inf
        if ll_ob and ur_ob:
            right = bi % 2 == 1
        else:
            right = llv < ur
        if right:
            ll[bi] = (ll[bi - 1][0], ll[bi - 1][1] + 1)
        else:
            ll[bi] = (ll[bi - 1][0] + 1, ll[bi - 1][1])

        trim_off = -1 - ll[bi][1]
        if 0 <= trim_off < bw:
            ei = ll[bi][0] - trim_off
            if 0 <= ei < n_events:
                bands[bi, trim_off] = lp_trim * (ei + 1)
                trace[bi, trim_off] = FROM_U
            else:
                bands[bi, trim_off] = -np.inf

        kmer_min_off = 0 - ll[bi][1]
        kmer_max_off = n_kmers - ll[bi][1]
        event_min_off = ll[bi][0] - (n_events - 1)
        event_max_off = ll[bi][0] + 1
        min_off = max(kmer_min_off, event_min_off, 0)
        max_off = min(kmer_max_off, event_max_off, bw)

        for off in range(min_off, max_off):
            ei = ll[bi][0] - off
            ki = ll[bi][1] + off
            off_up = ll[bi - 1][0] - (ei - 1)
            off_left = (ki - 1) - ll[bi - 1][1]
            off_diag = (ki - 1) - ll[bi - 2][1]
            up = bands[bi - 1, off_up] if 0 <= off_up < bw else -np.inf
            left = bands[bi - 1, off_left] if 0 <= off_left < bw else -np.inf
            diag = bands[bi - 2, off_diag] if 0 <= off_diag < bw else -np.inf
            lp_e = emission(ei, ki)
            sd = diag + lp_step + lp_e
            su = up + lp_stay + lp_e
            sl = left + lp_skip
            mx, fr = sd, FROM_D
            if su > mx:
                mx = su
            if mx == su:
                fr = FROM_U
            if sl > mx:
                mx = sl
            if mx == sl:
                fr = FROM_L
            bands[bi, off] = mx
            trace[bi, off] = fr

    # backtrack start
    max_score = -np.inf
    curr_event_idx = 0
    curr_kmer_idx = n_kmers - 1
    for ei in range(n_events):
        bi = (ei + 1) + (curr_kmer_idx + 1)
        off = ll[bi][0] - ei
        if 0 <= off < bw:
            s = bands[bi, off] + (n_events - ei) * lp_trim
            if s > max_score:
                max_score = s
                curr_event_idx = ei

    pairs = []
    sum_emission = 0.0
    n_aligned = 0
    curr_gap = 0
    max_gap = 0
    ei, ki = curr_event_idx, curr_kmer_idx
    while ki >= 0 and ei >= 0:
        pairs.append((ki, ei))
        sum_emission += emission(ei, ki)
        n_aligned += 1
        bi = (ei + 1) + (ki + 1)
        off = ll[bi][0] - ei
        fr = trace[bi, off]
        if fr == FROM_D:
            ki -= 1
            ei -= 1
            curr_gap = 0
        elif fr == FROM_U:
            ei -= 1
            curr_gap = 0
        else:
            ki -= 1
            curr_gap += 1
            max_gap = max(max_gap, curr_gap)
    pairs.reverse()

    avg = sum_emission / n_aligned if n_aligned else -np.inf
    spanned = bool(pairs) and pairs[0][0] == 0 and pairs[-1][0] == n_kmers - 1
    failed = avg < MIN_AVG_LOG_EMISSION or not spanned or max_gap > MAX_GAP_THRESHOLD
    stats = dict(avg_log_emission=avg, spanned=spanned, max_gap=max_gap,
                 failed=failed, n_pairs=n_aligned)
    return ([] if failed else pairs), stats


def base_to_event_map_from_pairs(pairs, n_kmers):
    """pairs -> per-kmer (start,stop) with the reference's distinct-event rule
    (squiggle_read.cpp:284-299)."""
    b2e = np.full((n_kmers, 2), -1, np.int64)
    prev_event = None
    for ki, ei in pairs:
        if ei != prev_event:
            if b2e[ki, 0] == -1:
                b2e[ki, 0] = ei
            b2e[ki, 1] = ei
        prev_event = ei
    return b2e
