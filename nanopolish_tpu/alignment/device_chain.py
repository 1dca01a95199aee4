"""eventalign's segment chain ON DEVICE: one dispatch for the whole read.

The reference's align_read_to_ref chains ~100 bp Viterbi windows, each
anchored by the previous window's last emitted row
(src/alignment/nanopolish_eventalign.cpp:612-827).  The host wavefront
(alignment/eventalign.py) pays one device round trip per chain step —
~67 per 1.8 kb read — which on a remotely-attached chip puts a hard
rounds x RTT floor under the app (measured 43-60 ms/round in slow relay
moods).  This module runs the WHOLE chain inside one jitted
lax.while_loop: every per-round quantity the host computed (end-pair
search, window bounds, closest-event lookup, QC aborts, the kept-row
selection and the re-anchoring) is a [B]-vectorized device op around
the same Pallas Viterbi kernel, and the only fetch is the final packed
row buffers.

Exactness: every step mirrors the host path's arithmetic on the same
arrays — the end-pair search is the same lower-bound over ascending
ref positions, the closest-event array is precomputed host-side with
get_closest_event_to's exact (+-1000, boundary-exclusive) semantics,
and the kept-row rule is _consume's (drop K rows and the re-emitted
anchor, cut at OUTPUT_STRIDE unless final section).  TSV byte equality
with the host wavefront is pinned by tests (the chain runs in pallas
interpret mode off-TPU).

Jobs the fast path cannot express fall back to the host wavefront:
multi-segment (spliced) alignments, reads whose closest-event map has
holes, windows whose event span overflows the padded kernel shape
(aborted mid-chain, detected on drain), and chains that exceed the
round budget.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

ALIGN_STRIDE = 100   # eventalign.cpp:668
OUTPUT_STRIDE = 50   # eventalign.cpp:669

# fallback-share accounting (read by the perf tools): how many jobs the
# chain took vs sent back to the host wavefront, and why
CHAIN_STATS = {"chained": 0, "ineligible": 0, "aborted": 0}


def reset_chain_stats():
    for k in CHAIN_STATS:
        CHAIN_STATS[k] = 0

TP = 512             # padded event rows per window
KP = 128             # padded kmer lanes per window (l <= 101 => nk <= 96)
CHAIN_W = 64         # per-round output block (regular rounds keep <= 50)
NEG = -1.0e30


# ---------------------------------------------------------------------------
# host-side precomputation
# ---------------------------------------------------------------------------

def closest_event_array(b2e: np.ndarray) -> np.ndarray:
    """get_closest_event_to for every k-mer index, vectorized with the
    scalar's exact quirks (squiggle.py get_closest_event_to /
    get_next_event): the backward scan covers stop_before < j <= k and
    the forward scan k <= j < stop_after, both boundary-EXCLUSIVE."""
    m = b2e[:, 0].astype(np.int64)
    n = len(m)
    idx = np.arange(n)
    has = m != -1
    # last mapped index <= k
    prev_i = np.maximum.accumulate(np.where(has, idx, -1))
    # first mapped index >= k
    next_i = np.minimum.accumulate(np.where(has, idx, n)[::-1])[::-1]
    stop_before = np.maximum(0, idx - 1000)
    stop_after = np.minimum(idx + 1000, n - 1)
    prev_ok = (prev_i >= 0) & (prev_i > stop_before)
    next_ok = (next_i < n) & (next_i < stop_after)
    out = np.where(prev_ok, m[np.clip(prev_i, 0, n - 1)],
                   np.where(next_ok, m[np.clip(next_i, 0, n - 1)], -1))
    return out.astype(np.int32)


class DeviceJob:
    """Host-side staging for one (read, strand) chain job."""

    __slots__ = ("job", "pairs_ref", "pairs_read", "ranks", "levels",
                 "closest", "mu_tab", "sig_tab", "epb", "start_ev",
                 "start_ref", "last_event", "forward", "ref_offset",
                 "max_range")

    def __init__(self, job, pairs_ref, pairs_read, ranks, levels, closest,
                 mu_tab, sig_tab, epb, start_ev, start_ref, last_event,
                 forward, ref_offset, max_range):
        self.job = job
        self.pairs_ref = pairs_ref
        self.pairs_read = pairs_read
        self.ranks = ranks
        self.levels = levels
        self.closest = closest
        self.mu_tab = mu_tab
        self.sig_tab = sig_tab
        self.epb = epb
        self.start_ev = start_ev
        self.start_ref = start_ref
        self.last_event = last_event
        self.forward = forward
        self.ref_offset = ref_offset
        self.max_range = max_range


def stage_job(job) -> Optional[DeviceJob]:
    """Build a DeviceJob from a host _Job, or None if ineligible (the
    caller keeps it on the host wavefront)."""
    from ..alignment.segments import _model_tables, read_drift_levels
    from .eventalign import _start_segment

    if job.done or len(job.pair_segments) != 1:
        return None
    read = job.read
    k = job.model.k
    # chain start state (the host helper; mutates job, which is fine —
    # the host path would do the identical initialization)
    if job.pairs is None:
        if not _start_segment(job):
            return None                  # nothing to align: already done
    pairs = job.pairs
    do_base_rc = job.record.is_reverse
    refs = np.ascontiguousarray(pairs[:, 0], np.int64)
    reads_col = pairs[:, 1].astype(np.int64)
    if do_base_rc:
        reads_col = len(read.read_sequence) - reads_col - k
    b2e = read.base_to_event_map[job.strand]
    closest = closest_event_array(b2e)
    if (closest < 0).any():
        return None                      # holes: host path handles those
    input_rc = (do_base_rc, not do_base_rc)[job.strand]
    ranks = job.wranks_rc[::-1] if input_rc else job.wranks_fwd
    levels = read_drift_levels(read, job.strand)
    mu_tab, sig_tab = _model_tables(read, job.strand, job.model)
    job._input_rc = input_rc             # the columns carry it
    return DeviceJob(
        job, refs, reads_col, np.ascontiguousarray(ranks, np.int32),
        levels, closest, mu_tab, sig_tab,
        float(read.events_per_base[job.strand]),
        int(job.curr_start_event), int(job.curr_start_ref),
        int(job.last_event), bool(job.forward), int(job.ref_offset),
        abs(int(job.last_event) - int(job.curr_start_event)) + 1)


# ---------------------------------------------------------------------------
# the device program
# ---------------------------------------------------------------------------

def _chain_program(wire, B, P, Rk, L, Nc, k_arr, max_rounds, max_rows):
    """jit-compiled chain: returns (packed rows, per-round anchors,
    cursor, done, aborted) after running every job's chain to
    completion (or abort).

    Inputs ride ONE packed f32 wire (ints bitcast) sliced apart here —
    each separate host->device array costs a relay round trip, and the
    chain's fixed cost was measured (tools/chain_ablate.py) to be ~0.8 s
    of a 1.08 s call at B=256 with 19 separate transfers.

    Loop-body economy (the while body runs ~rows/OUTPUT_STRIDE times, so
    its per-iteration cost IS the batch's device time):
      * emission tables ship PRE-GATHERED BY WINDOW POSITION (a/b2/c0
        per kmer position of the job's window, [B, Rk]) so the body's
        gathers are small windowed take_along_axis ops instead of
        random-rank gathers from [B, |alphabet|^k] tables;
      * each kept row scatters ONE packed int32 (ti | state | base_km)
        instead of three absolute-coordinate buffers; the absolutes are
        reconstructed host-side from the per-round anchor records
        (start_ev/stride, start_ref, cursor) written as cheap per-round
        column stores."""
    import os

    import jax
    import jax.numpy as jnp

    from ..ops.pallas_profile_hmm import (ST_K, _profile_hmm_viterbi_call)

    # trace-time ablation switches for tools/chain_ablate.py (cost
    # attribution only — never set in production)
    _abl = set(os.environ.get("NPT_CHAIN_ABLATE", "").split(","))

    def ibits(x):
        return jax.lax.bitcast_convert_type(x, jnp.int32)

    off = 0

    def take(n, shape=None, as_int=False):
        nonlocal off
        piece = wire[off:off + n]        # static offsets: plain slices
        off += n
        if as_int:
            piece = ibits(piece)
        return piece.reshape(shape) if shape is not None else piece

    pairs_ref = take(B * P, (B, P), as_int=True)
    pairs_read = take(B * P, (B, P), as_int=True)
    n_pairs = take(B, as_int=True)
    a_pos = take(B * Rk, (B, Rk))
    b2_pos = take(B * Rk, (B, Rk))
    c0_pos = take(B * Rk, (B, Rk))
    n_ranks = take(B, as_int=True)
    levels = take(B * L, (B, L))
    n_levels = take(B, as_int=True)
    closest = take(B * Nc, (B, Nc), as_int=True)
    n_closest = take(B, as_int=True)
    trans8 = take(B * 8, (B, 8))
    start_ev0 = take(B, as_int=True)
    start_ref0 = take(B, as_int=True)
    last_event = take(B, as_int=True)
    fwd = take(B, as_int=True) > 0
    ref_offset = take(B, as_int=True)
    ki = jnp.arange(KP, dtype=jnp.int32)
    ti = jnp.arange(TP, dtype=jnp.int32)
    clips0 = jnp.zeros((B, 2), jnp.float32)

    def vsearch(mat, vals):
        # first index with mat[b, i] > vals[b] (ascending rows, padded
        # with a sentinel above any query).  A broadcast compare-sum is
        # one predictable [B, P] vector op; the vmapped binary search it
        # replaces was ~5 ms/iteration at B=256 (tools/chain_ablate.py)
        return jnp.sum((mat <= vals[:, None]).astype(jnp.int32), axis=1)

    def body(carry):
        (rnd, start_ev, start_ref, done, aborted, cursor,
         out_reg, tail, tail_round, anch_ev, anch_ref, anch_cur) = carry
        active = (~done) & (~aborted)

        # loop condition (eventalign.cpp:689-690)
        cond_more = jnp.where(fwd, start_ev < last_event,
                              start_ev > last_event)
        done = done | (active & ~cond_more)
        active = (~done) & (~aborted)

        # end-pair lower bound (anchor.get_end_pair semantics over
        # ascending refs)
        if "search" in _abl:
            ep = jnp.clip(start_ref * 0 + rnd, 0, n_pairs - 1)
        else:
            ep = jnp.clip(vsearch(pairs_ref, start_ref + ALIGN_STRIDE) - 1,
                          0, n_pairs - 1)
        end_ref = jnp.take_along_axis(pairs_ref, ep[:, None],
                                      axis=1)[:, 0]
        end_read = jnp.take_along_axis(pairs_read, ep[:, None],
                                       axis=1)[:, 0]
        bad = end_read < 0
        s = start_ref - ref_offset
        l = end_ref - start_ref + 1
        bad = bad | (l < 2 * k_arr)
        ev_stop = jnp.take_along_axis(
            closest, jnp.clip(end_read, 0, n_closest - 1)[:, None],
            axis=1)[:, 0]
        bad = bad | (jnp.abs(start_ev - ev_stop) < 2)
        done = done | (active & bad)
        active = (~done) & (~aborted)
        last_sec = ep == (n_pairs - 1)

        # window shapes
        nkr = l - k_arr + 1
        stride = jnp.where(start_ev <= ev_stop, 1, -1)
        nev = jnp.abs(ev_stop - start_ev) + 1
        aborted = aborted | (active & (nev > TP))
        active = (~done) & (~aborted)
        nev_c = jnp.where(active, jnp.clip(nev, 1, TP), 1).astype(jnp.int32)
        nk_c = jnp.where(active, jnp.clip(nkr, 1, KP), 1).astype(jnp.int32)

        # this round's anchor record (host reconstruction base)
        anch_ev = anch_ev.at[:, rnd].set((start_ev << 1) | (stride > 0))
        anch_ref = anch_ref.at[:, rnd].set(start_ref)
        anch_cur = anch_cur.at[:, rnd].set(cursor)

        # kernel inputs (small windowed gathers from positional rows)
        kmask = ki[None, :] < nk_c[:, None]
        widx = jnp.clip(s[:, None] + ki[None, :], 0,
                        (n_ranks - 1)[:, None])
        if "kwin" in _abl:
            a = jnp.where(kmask, a_pos[:, :KP], 0.0)
            b2 = jnp.where(kmask, b2_pos[:, :KP], 0.0)
            c0 = jnp.where(kmask, c0_pos[:, :KP], jnp.float32(NEG))
        else:
            a = jnp.where(kmask, jnp.take_along_axis(a_pos, widx, axis=1),
                          0.0)
            b2 = jnp.where(kmask, jnp.take_along_axis(b2_pos, widx, axis=1),
                           0.0)
            c0 = jnp.where(kmask, jnp.take_along_axis(c0_pos, widx, axis=1),
                           jnp.float32(NEG))
        tmask = ti[None, :] < nev_c[:, None]
        tidx = jnp.clip(start_ev[:, None] + ti[None, :] * stride[:, None],
                        0, (n_levels - 1)[:, None])
        if "twin" in _abl:
            evw = jnp.where(tmask, levels[:, :TP], 0.0)
        else:
            evw = jnp.where(tmask, jnp.take_along_axis(levels, tidx, axis=1),
                            0.0)

        if "kernel" in _abl:
            # fake plausible backtrack rows; keep the input gathers live
            # via a cheap data dependency
            dep = (evw[:, :1].sum() + a[:, :1].sum() + b2[:, :1].sum()
                   + c0[:, :1].sum()).astype(jnp.int32) * 0
            ke = (jnp.minimum(ti[None, :] // 4, nk_c[:, None] - 1)
                  + dep).T.astype(jnp.int32)
            meta = jnp.full((TP, B), 2, jnp.int32)
        else:
            ke, meta = _profile_hmm_viterbi_call(
                evw, a, b2, c0, nev_c[:, None], nk_c[:, None], trans8,
                clips0)
        keT = ke.T
        metaT = meta.T

        # kept-row selection: _expand_backtrack emits, per valid
        # backtrack row, ONE leading entry — for K rows the LANDING
        # B/M entry at kmer (ke - dist - 1), for M/B rows themselves —
        # followed by 'K' filler rows that _consume drops.  So every
        # valid row past the soft-clip head (except the re-emitted
        # anchor at t=0) contributes exactly one output row.
        valid = (keT >= 0) & tmask
        soft = ((metaT >> 11) & 1) == 1
        t0 = jnp.maximum(
            jnp.max(jnp.where(soft & valid, ti[None, :], -1), axis=1), 0)
        st = metaT & 3
        dist = (metaT >> 2) & 0xFF
        head = ((metaT >> 10) & 1) == 1
        keep = valid & (ti[None, :] >= t0[:, None]) & (ti[None, :] != 0)
        order = jnp.cumsum(keep.astype(jnp.int32), axis=1)
        keep = keep & (last_sec[:, None] | (order <= OUTPUT_STRIDE))
        keep = keep & active[:, None]
        nkept = jnp.max(jnp.where(keep, order, 0), axis=1)
        done = done | (active & (nkept == 0))

        isk = st == ST_K
        base_km = jnp.where(isk, keT - dist - 1, keT)
        is_m = jnp.where(isk, jnp.where(head, 0, 1),
                         jnp.where(st == 2, 1, 0))
        # ti (9b) | is_m (1b) | base_km+256 (10b): absolutes derive
        # from the round's anchor record
        pk_row = (ti[None, :] | (is_m << 9)
                  | ((base_km + 256) << 10)).astype(jnp.int32)

        # Emission WITHOUT a scatter (XLA scatter was ~1/3 of the body,
        # tools/chain_ablate.py): regular rounds keep <= OUTPUT_STRIDE
        # rows, compacted to W slots via top_k over (TP - ti) (kept rows
        # in ti order) and written as one contiguous dynamic slice at
        # the round's block; the single last-section round (unbounded
        # kept count) lands raw+flagged in a [B, TP] tail buffer that
        # the host compacts.
        reg_keep = keep & (~last_sec[:, None])
        key = jnp.where(reg_keep, TP - ti[None, :], -1)
        kvals, kidx = jax.lax.top_k(key, CHAIN_W)
        slot_ok = kvals > 0
        pk64 = jnp.where(slot_ok,
                         jnp.take_along_axis(pk_row, kidx, axis=1), 0)
        out_reg = jax.lax.dynamic_update_slice_in_dim(
            out_reg, pk64, rnd * CHAIN_W, axis=1)

        emit_tail = last_sec & (nkept > 0) & active
        # a chain whose final pair window emits twice cannot use the
        # single tail buffer: host fallback
        aborted = aborted | (emit_tail & (tail_round >= 0))
        tail = jnp.where(emit_tail[:, None],
                         jnp.where(keep, pk_row, -1), tail)
        tail_round = jnp.where(emit_tail, rnd, tail_round)

        # re-anchor from the last kept row (_consume tail)
        t_last = jnp.max(jnp.where(keep, ti[None, :], -1), axis=1)
        t_last_c = jnp.clip(t_last, 0, TP - 1)
        new_ev = start_ev + t_last_c * stride
        new_ref = start_ref + jnp.take_along_axis(
            base_km, t_last_c[:, None], axis=1)[:, 0]
        upd = ((~done) & (~aborted)) & (nkept > 0)
        start_ev = jnp.where(upd, new_ev, start_ev)
        start_ref = jnp.where(upd, new_ref, start_ref)
        cursor = jnp.where(upd, cursor + nkept, cursor)
        return (rnd + 1, start_ev, start_ref, done, aborted, cursor,
                out_reg, tail, tail_round, anch_ev, anch_ref, anch_cur)

    def cond(carry):
        import jax.numpy as jnp
        rnd, _, _, done, aborted, *_ = carry
        return (rnd < max_rounds) & jnp.any((~done) & (~aborted))

    import jax.numpy as jnp
    init = (jnp.int32(0), start_ev0, start_ref0,
            jnp.zeros(B, bool), jnp.zeros(B, bool),
            jnp.zeros(B, jnp.int32),
            jnp.zeros((B, max_rounds * CHAIN_W), jnp.int32),
            jnp.zeros((B, TP), jnp.int32),
            jnp.full(B, -1, jnp.int32),
            jnp.zeros((B, max_rounds), jnp.int32),
            jnp.zeros((B, max_rounds), jnp.int32),
            jnp.zeros((B, max_rounds), jnp.int32))
    import jax
    (rnd, _, _, done, aborted, cursor, out_reg, tail, tail_round,
     anch_ev, anch_ref, anch_cur) = jax.lax.while_loop(cond, body, init)
    # chains that exhausted the round budget fall back to the host path
    aborted = aborted | (~done)
    # rounds past the loop's exit hold their zero init; close the cursor
    # chain so host-side per-round row counts (diffs) are exact
    colsr = jnp.arange(max_rounds, dtype=jnp.int32)[None, :]
    anch_cur = jnp.where(colsr >= rnd, cursor[:, None], anch_cur)

    # one post-loop gather compacts the round blocks to cursor layout
    # (tail-round positions hold junk the host patches from `tail`)
    j = jnp.arange(max_rows + 1, dtype=jnp.int32)
    jq = jnp.broadcast_to(j[None, :], (B, max_rows + 1))
    r_of_j = jax.vmap(
        lambda c, q: jnp.searchsorted(c, q, side="right"))(anch_cur, jq) - 1
    r_of_j = jnp.clip(r_of_j, 0, max_rounds - 1)
    base = jnp.take_along_axis(anch_cur, r_of_j, axis=1)
    off_j = jnp.clip(jq - base, 0, CHAIN_W - 1)
    out_pk = jnp.take_along_axis(out_reg, r_of_j * CHAIN_W + off_j, axis=1)
    return (out_pk, tail, tail_round, anch_ev, anch_ref, anch_cur,
            cursor, done, aborted)


_chain_jit = None


def _get_chain_jit():
    global _chain_jit
    if _chain_jit is None:
        import jax
        _chain_jit = jax.jit(
            _chain_program,
            static_argnames=("B", "P", "Rk", "L", "Nc", "k_arr",
                             "max_rounds", "max_rows"))
    return _chain_jit


def _pad2(n: int, lo: int = 8) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def run_device_chain(djobs: List[DeviceJob]) -> List[bool]:
    """Run the staged jobs' chains on device; fill each underlying host
    _Job's output columns and mark it done.  Returns per-job success
    flags (False = caller re-runs that job on the host wavefront)."""
    import jax.numpy as jnp

    from ..ops.pallas_profile_hmm import LOG_INV_SQRT_2PI
    from ..utils.syncstats import timed_fetch

    from ..utils.profiler import profile_scope
    _b = profile_scope("ea.chain_build"); _b.__enter__()
    B0 = len(djobs)
    B = _pad2(B0)
    P = _pad2(max(len(d.pairs_ref) for d in djobs))
    Rk = _pad2(max(len(d.ranks) for d in djobs))
    L = _pad2(max(len(d.levels) for d in djobs))
    Nc = _pad2(max(len(d.closest) for d in djobs))
    max_range = max(d.max_range for d in djobs)
    max_rows = max_range + 64
    max_rounds = max_range // 20 + 32

    pairs_ref = np.full((B, P), np.int64(1) << 40, np.int64)
    pairs_read = np.full((B, P), -1, np.int64)
    n_pairs = np.ones(B, np.int64)
    n_ranks = np.ones(B, np.int64)
    levels = np.zeros((B, L), np.float32)
    n_levels = np.ones(B, np.int64)
    closest = np.zeros((B, Nc), np.int32)
    n_closest = np.ones(B, np.int64)
    # emission tables pre-gathered by window position (see
    # _chain_program's docstring): a/b2/c0 at each kmer position of the
    # job's whole window
    a_pos = np.zeros((B, Rk), np.float32)
    b2_pos = np.zeros((B, Rk), np.float32)
    c0_pos = np.full((B, Rk), NEG, np.float32)
    epb = np.full(B, 2.0, np.float32)
    start_ev = np.zeros(B, np.int32)
    start_ref = np.zeros(B, np.int32)
    last_event = np.zeros(B, np.int32)
    fwd = np.zeros(B, bool)
    ref_offset = np.zeros(B, np.int32)
    for i, d in enumerate(djobs):
        np_ = len(d.pairs_ref)
        pairs_ref[i, :np_] = d.pairs_ref
        pairs_read[i, :np_] = d.pairs_read
        n_pairs[i] = np_
        nr = len(d.ranks)
        n_ranks[i] = nr
        levels[i, :len(d.levels)] = d.levels
        n_levels[i] = len(d.levels)
        closest[i, :len(d.closest)] = d.closest
        n_closest[i] = len(d.closest)
        sig = np.maximum(d.sig_tab, 1e-30)
        inv = 1.0 / sig
        rk = d.ranks
        a_pos[i, :nr] = inv[rk]
        b2_pos[i, :nr] = (d.mu_tab * inv)[rk]
        c0_pos[i, :nr] = (LOG_INV_SQRT_2PI - np.log(sig))[rk]
        epb[i] = d.epb
        start_ev[i] = d.start_ev
        start_ref[i] = d.start_ref
        last_event[i] = d.last_event
        fwd[i] = d.forward
        ref_offset[i] = d.ref_offset
    from ..ops.pallas_profile_hmm import _np_transitions
    trans8 = _np_transitions(epb, 1.0).astype(np.float32)
    # refs clipped to int32 range for the device search (positions are
    # genomic, < 2^31; the pad value must exceed any query)
    pairs_ref32 = np.minimum(pairs_ref, (1 << 31) - 2).astype(np.int32)

    # ONE h2d transfer: ints bitcast into the f32 wire (layout mirrors
    # _chain_program's take() sequence)
    fi = np.float32
    wire = np.concatenate([
        pairs_ref32.view(fi).ravel(),
        pairs_read.astype(np.int32).view(fi).ravel(),
        n_pairs.astype(np.int32).view(fi),
        a_pos.ravel(), b2_pos.ravel(), c0_pos.ravel(),
        n_ranks.astype(np.int32).view(fi),
        levels.ravel(),
        n_levels.astype(np.int32).view(fi),
        closest.view(fi).ravel(),
        n_closest.astype(np.int32).view(fi),
        trans8.ravel(),
        start_ev.view(fi), start_ref.view(fi), last_event.view(fi),
        fwd.astype(np.int32).view(fi), ref_offset.view(fi),
    ])

    _b.__exit__(None, None, None)
    fn = _get_chain_jit()
    (packed, tail, tail_round, anch_ev, anch_ref, anch_cur, cursor, done,
     aborted) = fn(jnp.asarray(wire), B, P, Rk, L, Nc,
                   int(djobs[0].job.model.k), max_rounds, max_rows)
    flat = timed_fetch(jnp.concatenate(
        [packed.reshape(-1), tail.reshape(-1), anch_ev.reshape(-1),
         anch_ref.reshape(-1), anch_cur.reshape(-1), tail_round,
         cursor.astype(jnp.int32), done.astype(jnp.int32),
         aborted.astype(jnp.int32)]))
    sz = B * (max_rows + 1)
    tz = B * TP
    az = B * max_rounds
    pk = flat[:sz].reshape(B, max_rows + 1)
    tl = flat[sz:sz + tz].reshape(B, TP)
    o = sz + tz
    aev = flat[o:o + az].reshape(B, max_rounds)
    aref = flat[o + az:o + 2 * az].reshape(B, max_rounds)
    acur = flat[o + 2 * az:o + 3 * az].reshape(B, max_rounds)
    o += 3 * az
    trnd = flat[o:o + B]
    cur = flat[o + B:o + 2 * B]
    ab = flat[o + 3 * B:o + 4 * B]

    _u = profile_scope("ea.chain_unpack"); _u.__enter__()
    ok = []
    for i, d in enumerate(djobs):
        if ab[i]:
            CHAIN_STATS["aborted"] += 1
            ok.append(False)
            continue
        try:
            n = int(cur[i])
            if n > max_rows:
                raise ValueError("cursor overflow")
            p = pk[i, :n].astype(np.int64)
            # row -> round via the cursor chain; absolutes from anchors
            counts = np.diff(np.append(acur[i], n))
            tr = int(trnd[i])
            reg_counts = counts if tr < 0 else \
                np.delete(counts, tr)
            if reg_counts.size and reg_counts.max() > CHAIN_W:
                # a regular round can never keep more than the block
                # (OUTPUT_STRIDE <= CHAIN_W); anything else means a
                # corrupt record
                raise ValueError("regular-round count overflow")
            if tr >= 0:
                # patch the tail round's rows from the flagged buffer
                traw = tl[i]
                trows = traw[traw >= 0].astype(np.int64)
                seg0 = int(acur[i][tr])
                if len(trows) != counts[tr]:
                    raise ValueError("tail count mismatch")
                p[seg0:seg0 + counts[tr]] = trows
            t_of = p & 0x1FF
            is_m = (p >> 9) & 1
            bkm = ((p >> 10) & 0x3FF) - 256
            rof = np.repeat(np.arange(len(counts)), counts)
            ae = aev[i][rof]
            stride = 2 * (ae & 1) - 1
            out_ev = (ae >> 1) + t_of * stride
            out_ref = aref[i][rof] + bkm
            out_st = np.where(is_m, 77, 66).astype(np.uint8)
        except ValueError:
            # inconsistent chain record: re-run this job on the host
            # wavefront instead of crashing the batch
            CHAIN_STATS["aborted"] += 1
            ok.append(False)
            continue
        CHAIN_STATS["chained"] += 1
        job = d.job
        job.out_ev.append(out_ev)
        job.out_ref.append(out_ref)
        job.out_st.append(out_st)
        job.done = True
        ok.append(True)
    _u.__exit__(None, None, None)
    return ok
