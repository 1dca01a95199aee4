"""Batched HMM segment execution: the device dispatch layer.

Every analysis module reduces to scoring/aligning batches of "segments":
(event slice, kmer window) pairs with per-read scalings.  This module packs
heterogeneous segments into padded (T, K) buckets, runs the profile-HMM
kernel batched, and unpacks per-segment results — the TPU replacement for
the reference's per-call profile_hmm_score/align
(src/hmm/nanopolish_profile_hmm.cpp:14-65).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..models.squiggle import SquiggleRead
from ..ops.profile_hmm import (
    HAF_ALLOW_POST_CLIP, HAF_ALLOW_PRE_CLIP, make_transitions,
    profile_hmm_forward, profile_hmm_viterbi, viterbi_backtrack,
)

import threading

_CACHE_INIT_LOCK = threading.Lock()


def _read_cache(read, attr: str) -> dict:
    """Get-or-create a per-read cache dict with double-checked locking:
    jobs sharing a SquiggleRead can run on different wavefront threads,
    and an unguarded getattr-then-set could overwrite a freshly
    populated dict."""
    cache = getattr(read, attr, None)
    if cache is None:
        with _CACHE_INIT_LOCK:
            cache = getattr(read, attr, None)
            if cache is None:
                cache = {}
                setattr(read, attr, cache)
    return cache


@dataclass
class HMMSegment:
    """One profile-HMM call: events [n_events] against kmers [n_kmers].

    levels are drift-scaled event means in traversal order; mu/sigma are the
    read-scaled gaussians of the window's kmers (scale*level_mean + shift,
    level_stdv * var).
    """

    levels: np.ndarray
    mu: np.ndarray
    sigma: np.ndarray
    events_per_base: float
    flags: int = 0


def read_drift_levels(read: SquiggleRead, strand: int) -> np.ndarray:
    """Whole-read drift-corrected event levels, cached on the read:
    level[i] = mean[i] - (start_time[i] - start_time[0]) * drift.
    Identity-keyed on the scalings object (calibration REPLACES
    read.scalings[strand], calibration.py), so a stale cache is
    impossible."""
    cache = _read_cache(read, "_drift_levels_cache")
    s = read.scalings[strand]
    entry = cache.get(strand)
    if entry is None or entry[0] is not s:
        ev = read.events[strand]
        levels = np.asarray(
            ev.mean - (ev.start_time - ev.start_time[0]) * s.drift,
            np.float32)
        entry = (s, levels)
        cache[strand] = entry
    return entry[1]


def segment_levels(read: SquiggleRead, strand: int,
                   event_start: int, event_stop: int) -> np.ndarray:
    """Drift-corrected event levels over [start..stop] (either
    direction) — shared by every segment scoring the same event range
    (e.g. a group's unmethylated/methylated pair).  A slice of the
    cached whole-read array (bit-identical: the per-range expression
    subtracts the same start_time[0])."""
    stride = 1 if event_stop >= event_start else -1
    stop = event_stop + stride
    if stop < 0:
        stop = None                      # reversed slice reaching index 0
    return read_drift_levels(read, strand)[event_start:stop:stride]


def _model_tables(read: SquiggleRead, strand: int, model
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Read-calibrated Gaussian tables (mu, sigma) hoisted per (read,
    strand, model): every segment of the same read then costs one gather
    per array.  Identity keys are sound because calibration REPLACES
    read.scalings[strand] (calibration.py:56) rather than mutating it."""
    s = read.scalings[strand]
    cache = _read_cache(read, "_segment_model_cache")
    entry = cache.get(strand)
    if entry is None or entry[0] is not model or entry[1] is not s:
        entry = (model, s,
                 (s.scale * model.level_mean + s.shift).astype(np.float32),
                 (model.level_stdv * s.var).astype(np.float32))
        cache[strand] = entry
    return entry[2], entry[3]


def make_segment(read: SquiggleRead, strand: int, ranks: np.ndarray,
                 event_start: int, event_stop: int, model=None,
                 flags: int = 0, levels: Optional[np.ndarray] = None
                 ) -> HMMSegment:
    """Build a segment from a read's event range [start..stop] (either
    direction) and a window's kmer ranks."""
    if model is None:
        model = read.base_model[strand]
    if levels is None:
        levels = segment_levels(read, strand, event_start, event_stop)
    mu_tab, sig_tab = _model_tables(read, strand, model)
    mu = mu_tab[ranks]
    sigma = sig_tab[ranks]
    return HMMSegment(levels=levels,
                      mu=np.asarray(mu, np.float32),
                      sigma=np.asarray(sigma, np.float32),
                      events_per_base=float(read.events_per_base[strand]),
                      flags=flags)


def _pad_dim(n: int, quantum: int) -> int:
    return max(quantum, int(math.ceil(n / quantum)) * quantum)


def _bucket_indices(segments: Sequence[HMMSegment], tq: int, kq: int):
    """Group segment indices by (padded_T, padded_K, flags)."""
    buckets = {}
    for i, s in enumerate(segments):
        key = (_pad_dim(len(s.levels), tq), _pad_dim(len(s.mu), kq), s.flags)
        buckets.setdefault(key, []).append(i)
    return buckets


def _pow2_chunks(segments, chunk_cap, vmem_budget: int = 0,
                 viterbi: bool = False):
    """Bucket segment indices by power-of-two padded event length AND
    kmer-lane width, then cut each bucket into dispatch chunks (shared
    by the forward and viterbi Pallas drains).  Bucketing by kmer width
    keeps small windows (variants screening, ~13 kmers) on the 128-lane
    kernel even when a batch also holds wide windows.

    When vmem_budget (bytes) is given, the per-call batch cap is derived
    from it instead of the fixed chunk_cap: every dispatch costs a full
    relay round trip on remotely-attached chips, so one bucket should
    ride as FEW calls as VMEM allows (chunk_cap then acts as a floor so
    remainder batches keep power-of-two compiled shapes)."""
    buckets = {}
    tp_floor = 128 if viterbi else 64    # forward kernel rides 64-row
    for i, s in enumerate(segments):     # grids for short-event buckets
        tp = tp_floor
        while tp < len(s.levels):
            tp *= 2
        kp = 128
        while kp < len(s.mu):
            kp *= 2
        buckets.setdefault((tp, kp), []).append(i)
    for (tp, kp), idxs in buckets.items():
        cap = chunk_cap
        if vmem_budget:
            if viterbi:
                # the Viterbi traces dominate per-step VMEM: two
                # (128, B, kp) uint8 grid blocks, double-buffered
                bytes_per_seg = 4 * 128 * kp + 4 * (tp + 3 * kp + 12)
            else:
                # wire row (tp + 3*kp + 12 f32) + 4 [1, kp] f32 scratch
                bytes_per_seg = 4 * (tp + 3 * kp + 12) + 16 * kp
            while cap * 2 * bytes_per_seg <= vmem_budget and cap < 4096:
                cap *= 2
            while cap > 8 and cap * bytes_per_seg > vmem_budget:
                cap //= 2
        for lo in range(0, len(idxs), cap):
            yield tp, kp, idxs[lo:lo + cap]


def _pack_chunk(segments, chunk, tp, kp, indel_bias, r_min=128):
    """Pad one chunk into the profile-HMM packed wire format.  kp is the
    bucket's kmer-lane width from _pow2_chunks — passed through so the
    kernel shape is derived exactly once.  Forward callers pass r_min=64
    (64-row grids for short-event buckets); the Viterbi drain keeps the
    128-row grid its trace blocks require."""
    from ..ops.pallas_profile_hmm import _pack_hmm_inputs

    B = len(chunk)
    K = max(len(segments[si].mu) for si in chunk)
    levels = np.zeros((B, tp), np.float32)
    mu = np.zeros((B, K), np.float32)
    sigma = np.ones((B, K), np.float32)
    n_events = np.zeros(B, np.int32)
    n_kmers = np.zeros(B, np.int32)
    epb = np.full(B, 2.0, np.float32)
    flags = np.zeros(B, np.int32)
    for bi, si in enumerate(chunk):
        s = segments[si]
        ne, nk = len(s.levels), len(s.mu)
        levels[bi, :ne] = s.levels
        mu[bi, :nk] = s.mu
        sigma[bi, :nk] = s.sigma
        n_events[bi] = ne
        n_kmers[bi] = nk
        epb[bi] = s.events_per_base
        flags[bi] = s.flags
    return _pack_hmm_inputs(levels, n_events, mu, sigma,
                            np.log(np.maximum(sigma, 1e-30)), n_kmers,
                            epb, flags, indel_bias, kp=kp, r_min=r_min)


def _viterbi_segments_pallas(segments: Sequence[HMMSegment],
                             indel_bias: float):
    """TPU fast path (ops/pallas_profile_hmm): one compiled shape per
    power-of-two event length; clip flags are runtime inputs.  All
    chunks are dispatched before any is materialized (each sync costs a
    relay round trip on remotely-attached chips)."""
    import jax.numpy as jnp

    from ..ops.pallas_profile_hmm import (_expand_backtrack,
                                          _profile_hmm_viterbi_call_packed)

    results: List[Optional[Tuple]] = [None] * len(segments)
    pending = []
    for tp, kp, chunk in _pow2_chunks(segments, 256, vmem_budget=45 << 20,
                                      viterbi=True):
        packed, TP, B0, nev, nk = _pack_chunk(segments, chunk, tp, kp,
                                              indel_bias)
        ke, meta = _profile_hmm_viterbi_call_packed(packed, TP)
        pending.append((chunk, ke.shape, jnp.concatenate(
            [ke.reshape(-1), meta.reshape(-1)]), nev, nk, B0))
    if not pending:
        return results
    # ONE device->host fetch for all chunks (each materialization pays a
    # relay round trip even when the dispatches were pipelined)
    from ..utils.syncstats import timed_fetch
    flat = timed_fetch(jnp.concatenate([p[2] for p in pending]))
    off = 0
    for chunk, shape, _dev, nev, nk, B0 in pending:
        sz = shape[0] * shape[1]
        ke = flat[off:off + sz].reshape(shape)
        meta = flat[off + sz:off + 2 * sz].reshape(shape)
        off += 2 * sz
        backs = _expand_backtrack(ke, meta, nev, nk)[:B0]
        for bi, si in enumerate(chunk):
            results[si] = backs[bi]
    return results


def viterbi_segments(segments: Sequence[HMMSegment],
                     indel_bias: float = 1.0,
                     t_quantum: int = 128, k_quantum: int = 32,
                     max_batch: int = 128,
                     ) -> List[Tuple[np.ndarray, np.ndarray, str]]:
    """Viterbi-align each segment; returns per-segment
    (event_offsets, kmer_idxs, state_string) in forward order
    (profile_hmm_align_r9 semantics, r9.cpp:73-204)."""
    import os

    import jax

    impl = os.environ.get("NPT_HMM_IMPL", "auto")
    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.default_backend() in ("tpu", "axon"))
    if use_pallas and segments and all(len(s.mu) <= 256 for s in segments):
        return _viterbi_segments_pallas(segments, indel_bias)

    results: List[Optional[Tuple]] = [None] * len(segments)
    for (T, K, flags), idxs in _bucket_indices(segments, t_quantum, k_quantum).items():
        for lo in range(0, len(idxs), max_batch):
            chunk = idxs[lo:lo + max_batch]
            B = len(chunk)
            levels = np.zeros((B, T), np.float32)
            mu = np.zeros((B, K), np.float32)
            sigma = np.ones((B, K), np.float32)
            n_events = np.zeros(B, np.int32)
            n_kmers = np.zeros(B, np.int32)
            epb = np.zeros(B, np.float32)
            for bi, si in enumerate(chunk):
                s = segments[si]
                ne, nk = len(s.levels), len(s.mu)
                levels[bi, :ne] = s.levels
                mu[bi, :nk] = s.mu
                sigma[bi, :nk] = s.sigma
                n_events[bi] = ne
                n_kmers[bi] = nk
                epb[bi] = s.events_per_base
            _, traces = profile_hmm_viterbi(
                levels, n_events, mu, sigma, np.log(sigma), n_kmers, epb,
                flags=flags, indel_bias=indel_bias, with_trace=True)
            backs = viterbi_backtrack(np.asarray(traces), n_events, n_kmers)
            for bi, si in enumerate(chunk):
                results[si] = backs[bi]
    return results  # type: ignore[return-value]


def _forward_segments_pallas(segments: Sequence[HMMSegment],
                             indel_bias: float) -> np.ndarray:
    """TPU fast path: one Pallas kernel shape per power-of-two event
    length, mixed clip flags share a compile (ops/pallas_profile_hmm)."""
    import jax.numpy as jnp

    from ..ops.pallas_profile_hmm import _profile_hmm_forward_call_packed
    from ..utils.profiler import profile_scope

    out = np.zeros(len(segments), np.float32)
    # two passes: DISPATCH every bucket chunk first (jax dispatch is
    # async, so the kernels and their d2h transfers pipeline), then
    # materialize — on remotely-attached chips each sync costs a full
    # relay round trip, which serialized syncs would pay per chunk
    pending = []
    for tp, kp, chunk in _pow2_chunks(segments, 512, vmem_budget=45 << 20):
        with profile_scope("segments.forward_pallas_dispatch"):
            packed, TP, B0, _, _ = _pack_chunk(segments, chunk, tp, kp,
                                               indel_bias, r_min=64)
            dev = _profile_hmm_forward_call_packed(packed, TP)
        pending.append((chunk, dev, B0))
    if not pending:
        return out
    # ONE device->host fetch for the whole batch: concatenate the chunk
    # results on device first (each separate materialization pays a full
    # relay round trip even when the dispatches were pipelined)
    from ..utils.syncstats import timed_fetch
    with profile_scope("segments.forward_pallas_sync"):
        flat = timed_fetch(jnp.concatenate(
            [dev[:B0, 0] for chunk, dev, B0 in pending]))
    off = 0
    for chunk, _dev, B0 in pending:
        out[np.asarray(chunk)] = flat[off:off + B0]
        off += B0
    return out


def forward_arrays(levels_mat: np.ndarray, n_events: np.ndarray,
                   mu_mat: np.ndarray, sigma_mat: np.ndarray,
                   n_kmers: np.ndarray, epb: np.ndarray,
                   flags: np.ndarray, indel_bias: float = 1.0) -> np.ndarray:
    """Array-level forward_segments: score n segments given already
    padded/stacked inputs (levels_mat [n, Tmax], mu/sigma_mat [n, Kmax],
    n_events/n_kmers [n] i32, epb [n] f32, flags [n] i32) with NO
    per-segment Python objects — the fast path for high-volume callers
    (variants screening builds these with batched gathers).  Scores are
    bit-identical to forward_segments on equivalent HMMSegments: the
    kernel is row-independent per segment and buckets by the same
    power-of-two (TP, KP) shapes."""
    return forward_arrays_async(levels_mat, n_events, mu_mat, sigma_mat,
                                n_kmers, epb, flags, indel_bias)()


def forward_arrays_async(levels_mat: np.ndarray, n_events: np.ndarray,
                         mu_mat: np.ndarray, sigma_mat: np.ndarray,
                         n_kmers: np.ndarray, epb: np.ndarray,
                         flags: np.ndarray, indel_bias: float = 1.0):
    """forward_arrays split into dispatch/materialize: all kernel chunks
    are dispatched before returning; the returned zero-arg closure pays
    the device->host fetch.  Callers pipeline the fetch (a full relay
    round trip on remotely-attached chips) against the next batch's host
    prep by resolving the closure on a worker thread."""
    import os

    import jax

    n = len(n_events)
    out = np.zeros(n, np.float32)
    if n == 0:
        return lambda: out
    impl = os.environ.get("NPT_HMM_IMPL", "auto")
    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.default_backend() in ("tpu", "axon"))

    # bucket rows by power-of-two padded event length / kmer width
    tp_all = np.maximum(64, np.exp2(np.ceil(np.log2(
        np.maximum(n_events, 1)))).astype(np.int64))
    kp_all = np.maximum(128, np.exp2(np.ceil(np.log2(
        np.maximum(n_kmers, 1)))).astype(np.int64))
    buckets: dict = {}
    for i in range(n):
        buckets.setdefault((int(tp_all[i]), int(kp_all[i])), []).append(i)

    if not use_pallas:
        from ..ops.profile_hmm import profile_hmm_forward
        for (tp, kp), idxs in buckets.items():
            ii = np.asarray(idxs)
            T = min(levels_mat.shape[1], tp)
            K = min(mu_mat.shape[1], kp)
            # the scan port buckets by flags too
            for fl in np.unique(flags[ii]):
                jj = ii[flags[ii] == fl]
                lp = profile_hmm_forward(
                    levels_mat[jj, :T], n_events[jj], mu_mat[jj, :K],
                    sigma_mat[jj, :K],
                    np.log(np.maximum(sigma_mat[jj, :K], 1e-30)),
                    n_kmers[jj], epb[jj], flags=int(fl),
                    indel_bias=indel_bias)
                out[jj] = np.asarray(lp)
        return lambda: out

    import jax.numpy as jnp

    from ..ops.pallas_profile_hmm import (_pack_hmm_inputs,
                                          _profile_hmm_forward_call_packed)

    pending = []
    for (tp, kp), idxs in buckets.items():
        bytes_per_seg = 4 * (tp + 3 * kp + 12) + 16 * kp
        cap = 512
        while cap * 2 * bytes_per_seg <= (45 << 20) and cap < 4096:
            cap *= 2
        from ..utils.profiler import profile_scope
        for lo in range(0, len(idxs), cap):
            ii = np.asarray(idxs[lo:lo + cap])
            T = min(levels_mat.shape[1], tp)
            K = min(mu_mat.shape[1], kp)
            with profile_scope("segments.fa_pack"):
                sig = sigma_mat[ii, :K]
                packed, TP, B0, _, _ = _pack_hmm_inputs(
                    levels_mat[ii, :T], n_events[ii], mu_mat[ii, :K], sig,
                    np.log(np.maximum(sig, 1e-30)), n_kmers[ii], epb[ii],
                    flags[ii], indel_bias, kp=kp, r_min=64)
            with profile_scope("segments.fa_dispatch"):
                dev = _profile_hmm_forward_call_packed(packed, TP)
            pending.append((ii, dev, B0))
    # concatenate on device now (a dispatch), defer the fetch
    cat = jnp.concatenate([dev[:B0, 0] for _, dev, B0 in pending])

    def materialize() -> np.ndarray:
        from ..utils.syncstats import timed_fetch
        flat = timed_fetch(cat)
        off = 0
        for ii, _dev, B0 in pending:
            out[ii] = flat[off:off + B0]
            off += B0
        return out

    return materialize


def forward_segments(segments: Sequence[HMMSegment],
                     indel_bias: float = 1.0,
                     t_quantum: int = 128, k_quantum: int = 32,
                     max_batch: int = 512) -> np.ndarray:
    """Forward-score each segment; returns [n_segments] float32 lp."""
    import os

    import jax

    impl = os.environ.get("NPT_HMM_IMPL", "auto")
    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.default_backend() in ("tpu", "axon"))
    if use_pallas and segments and \
            all(len(s.mu) <= 256 for s in segments):
        return _forward_segments_pallas(segments, indel_bias)

    out = np.zeros(len(segments), np.float32)
    for (T, K, flags), idxs in _bucket_indices(segments, t_quantum, k_quantum).items():
        for lo in range(0, len(idxs), max_batch):
            chunk = idxs[lo:lo + max_batch]
            B = len(chunk)
            levels = np.zeros((B, T), np.float32)
            mu = np.zeros((B, K), np.float32)
            sigma = np.ones((B, K), np.float32)
            n_events = np.zeros(B, np.int32)
            n_kmers = np.zeros(B, np.int32)
            epb = np.zeros(B, np.float32)
            for bi, si in enumerate(chunk):
                s = segments[si]
                ne, nk = len(s.levels), len(s.mu)
                levels[bi, :ne] = s.levels
                mu[bi, :nk] = s.mu
                sigma[bi, :nk] = s.sigma
                n_events[bi] = ne
                n_kmers[bi] = nk
                epb[bi] = s.events_per_base
            lp = profile_hmm_forward(
                levels, n_events, mu, sigma, np.log(sigma), n_kmers, epb,
                flags=flags, indel_bias=indel_bias)
            out[np.asarray(chunk)] = np.asarray(lp)
    return out


def seq_set_key(sequences) -> tuple:
    """Memo-key fragment for a sequence set (cached per HMMInputSequence:
    they are immutable in production — swap() has no callers)."""
    frags = []
    for hs in sequences:
        f = getattr(hs, "_seq_key", None)
        if f is None:
            f = hs._seq_key = (hs.seq, hs.alphabet.name)
        frags.append(f)
    return tuple(frags)


class ScoreBatcher:
    """Pools (sequence-set, event-range) scoring units; flush() runs one
    padded device sweep and resolves every unit to its
    profile_hmm_score_set value (log-mean over alternative sequences,
    profile_hmm.cpp:32-56).

    With a `memo` dict (AlignmentDB.score_memo), resolved unit scores
    are cached by (sequence set, read, strand, event range): the
    polishing loop re-screens every candidate each round and scores the
    shared base haplotype once per candidate edit at a position — both
    are deterministic for a loaded region, so repeats skip the device
    entirely."""

    MEMO_HITS = 0          # process-global visibility (perf tools)
    MEMO_MISSES = 0

    def __init__(self, indel_bias: float = 1.0,
                 memo: Optional[dict] = None,
                 flags: int = HAF_ALLOW_PRE_CLIP | HAF_ALLOW_POST_CLIP):
        self._flags = flags
        # per-SEGMENT lightweight tuples (hs, data); everything heavy
        # (rank gathers, level slices, padding) happens ONCE in flush()
        # at array level — the per-segment-object path measured 41 us of
        # host Python per segment at variants-screening volume (184k
        # segments/window)
        self._pend: List[Tuple] = []
        # unit -> (start, count, memo_key) pending, or (None, value, None)
        self._units: List[Tuple] = []
        self._results: Optional[np.ndarray] = None
        self._indel_bias = indel_bias
        self._memo = memo
        # in-flight dedup: identical (sequence set, event range) units
        # added before the flush resolve to ONE unit.  The screening
        # loop adds the shared base haplotype once per candidate EDIT at
        # a position (9x per read) — without this the drain scores the
        # same segments 9 times.  Identical scores either way: the
        # kernel is row-deterministic for identical inputs.
        self._inflight: dict = {}

    def add(self, sequences: List[HMMInputSequence], data: EventSequence,
            frags: Optional[tuple] = None) -> int:
        """Enqueue one scoring unit.  `frags` is an optional precomputed
        seq_set_key(sequences) — high-volume callers (variants screening)
        hoist it out of their per-read loops."""
        key = None
        if self._memo is not None:
            if frags is None:
                frags = seq_set_key(sequences)
            dk = getattr(data, "_memo_frag", None)
            if dk is None:
                dk = data._memo_frag = (
                    data.sr.read_name, data.strand, data.rc,
                    data.event_start_idx, data.event_stop_idx)
            key = (frags, dk, self._indel_bias)
            hit = self._memo.get(key)
            if hit is not None:
                ScoreBatcher.MEMO_HITS += 1
                self._units.append((None, hit, None))
                return len(self._units) - 1
            prev = self._inflight.get(key)
            if prev is not None:
                ScoreBatcher.MEMO_HITS += 1
                return prev
            ScoreBatcher.MEMO_MISSES += 1
        start = len(self._pend)
        for hs in sequences:
            self._pend.append((hs, data))
        self._units.append((start, len(sequences), key))
        idx = len(self._units) - 1
        if key is not None:
            self._inflight[key] = idx
        return idx

    def flush(self):
        scores = self._score_pending() if self._pend \
            else np.zeros(0, np.float32)
        out = np.zeros(len(self._units), np.float64)
        memo = self._memo
        single = all(count == 1 for start, count, _ in self._units
                     if start is not None)
        if single:
            # common case (no methylation alternatives): the log-mean of
            # one value is the value — one vectorized scatter
            starts = np.array([s if s is not None else -1
                               for s, _, _ in self._units], np.int64)
            pend_mask = starts >= 0
            out[~pend_mask] = [c for s, c, _ in self._units if s is None]
            out[pend_mask] = scores[starts[pend_mask]].astype(np.float64)
            if memo is not None:
                for i in np.flatnonzero(pend_mask):
                    memo[self._units[i][2]] = out[i]
        else:
            for i, (start, count, key) in enumerate(self._units):
                if start is None:           # memo hit recorded in add()
                    out[i] = count
                    continue
                vals = scores[start:start + count].astype(np.float64)
                m = vals.max()
                out[i] = m + math.log(np.exp(vals - m).sum()) - math.log(count)
                if memo is not None:
                    memo[key] = out[i]
        self._results = out

    def _score_pending(self) -> np.ndarray:
        """Score all pending segments.  On TPU backends this builds the
        INDEXED wire (ops/pallas_profile_hmm.forward_indexed): unique
        level slices, per-read model tables, and unique rank rows ship
        once, plus four small ids per segment — at variants-screening
        volume the flat format's h2d traffic (2.1 kB/segment of mostly
        shared or padded data) dominated the whole app.  Off-TPU, the
        flat array path (forward_arrays) keeps CPU runs on the scan
        kernels.  Scores are identical either way: the device gathers
        reproduce _pack_hmm_inputs' exact f32 expressions from the same
        host-computed tables."""
        import jax

        on_tpu = jax.default_backend() in ("tpu", "axon")
        idx_env = os.environ.get("NPT_HMM_INDEXED", "auto")

        n = len(self._pend)
        ids_list: List[Tuple[int, int, int, int]] = []
        ev_rows: List[Tuple] = []      # (sr, strand, e1, e2)
        tab_rows: List[Tuple] = []     # (sr, strand, model)
        rank_rows: List[np.ndarray] = []
        trans_rows: List[float] = []   # epb per (sr, strand)
        ev_ids: dict = {}
        tab_ids: dict = {}
        trans_ids: dict = {}
        # the dedup dicts are hit once per OBJECT; repeat sightings of the
        # same EventSequence / HMMInputSequence (the common case: a
        # position's ~18 screening units share one event list, a read set
        # shares each sequence) resolve through an epoch-tagged attribute
        # cache instead of rebuilding+hashing key tuples per unit — this
        # loop ran at variants-screening volume (200k+ units/window)
        epoch = object()
        for hs, data in self._pend:
            st = getattr(data, "_flush_st", None)
            if st is None or st[0] is not epoch:
                ekey = (id(data.sr), data.strand, data.event_start_idx,
                        data.event_stop_idx)
                ei = ev_ids.get(ekey)
                if ei is None:
                    ei = ev_ids[ekey] = len(ev_rows)
                    ev_rows.append((data.sr, data.strand,
                                    data.event_start_idx,
                                    data.event_stop_idx))
                xkey = (id(data.sr), data.strand)
                xi = trans_ids.get(xkey)
                if xi is None:
                    xi = trans_ids[xkey] = len(trans_rows)
                    trans_rows.append(
                        float(data.sr.events_per_base[data.strand]))
                st = data._flush_st = (epoch, ei, xi, {})
            _, ei, xi, tmap = st
            aname = hs.alphabet.name
            tm = tmap.get(aname)
            if tm is None:
                model = data.sr.get_model(data.strand, aname) \
                    if aname != "nucleotide" \
                    else data.sr.base_model[data.strand]
                tkey = (id(data.sr), data.strand, id(model))
                ti = tab_ids.get(tkey)
                if ti is None:
                    ti = tab_ids[tkey] = len(tab_rows)
                    tab_rows.append((data.sr, data.strand, model))
                tm = tmap[aname] = (ti, model)
            ti, model = tm
            rst = getattr(hs, "_flush_rids", None)
            if rst is None or rst[0] is not epoch:
                rst = hs._flush_rids = (epoch, {})
            rkey = (data.rc, model.k)
            ri = rst[1].get(rkey)
            if ri is None:
                ri = rst[1][rkey] = len(rank_rows)
                rank_rows.append(hs.kmer_ranks(model.k, data.rc))
            ids_list.append((ei, ti, ri, xi))
        # one array build instead of 4n scalar numpy writes (this loop
        # runs at variants-screening volume, 200k+ units/window)
        ids = np.asarray(ids_list, np.int32).reshape(n, 4)

        n_ev_u = np.array([abs(e2 - e1) + 1 for _, _, e1, e2 in ev_rows],
                          np.int32)
        n_km_u = np.array([len(r) for r in rank_rows], np.int32)
        # wire selection: the indexed format only wins when uniques are
        # genuinely SHARED (variants screening: ~10 sequences per event
        # range, ~7 reads per rank row -> ratio ~0.2).  Workloads where
        # every segment is its own unique (call-methylation: ratio ~1.5)
        # measured 2.2x SLOWER indexed — the device-gather cost isn't
        # bought back by volume.  NPT_HMM_INDEXED=1/0 overrides.
        share_ratio = (len(ev_rows) + len(rank_rows)) / max(n, 1)
        use_indexed = on_tpu and (
            idx_env == "1" or (idx_env == "auto" and share_ratio < 0.5))
        Tc = int(n_ev_u.max())
        Kc = int(n_km_u.max())
        levels_u = np.zeros((len(ev_rows), Tc), np.float32)
        for e, (sr, strand, e1, e2) in enumerate(ev_rows):
            lv = segment_levels(sr, strand, e1, e2)
            levels_u[e, :len(lv)] = lv
        rank_mat = np.zeros((len(rank_rows), Kc), np.int32)
        for r, rk in enumerate(rank_rows):
            rank_mat[r, :len(rk)] = rk

        if not use_indexed:
            # flat path: expand per-segment matrices (scan kernels off-TPU)
            mu_mat = np.zeros((n, Kc), np.float32)
            sigma_mat = np.ones((n, Kc), np.float32)
            tab_pairs = [_model_tables(sr, strand, model)
                         for sr, strand, model in tab_rows]
            for i in range(n):
                rk = rank_rows[ids[i, 2]]
                mu_t, sig_t = tab_pairs[ids[i, 1]]
                mu_mat[i, :len(rk)] = mu_t[rk]
                sigma_mat[i, :len(rk)] = sig_t[rk]
            epb = np.array(trans_rows, np.float32)[ids[:, 3]]
            return forward_arrays(
                levels_u[ids[:, 0]], n_ev_u[ids[:, 0]], mu_mat, sigma_mat,
                n_km_u[ids[:, 2]], epb, np.full(n, self._flags, np.int32),
                indel_bias=self._indel_bias)

        from ..ops.pallas_profile_hmm import (_np_transitions,
                                              forward_indexed,
                                              forward_packed)

        S = max(len(model.level_mean) for _, _, model in tab_rows)
        tabs = np.zeros((3, len(tab_rows), S), np.float32)
        tabs[1] += 1.0
        for t, (sr, strand, model) in enumerate(tab_rows):
            mu_t, sig_t = _model_tables(sr, strand, model)
            tabs[0, t, :len(mu_t)] = mu_t
            tabs[1, t, :len(sig_t)] = sig_t
            tabs[2, t, :len(sig_t)] = np.log(np.maximum(sig_t, 1e-30))
        trans_u = _np_transitions(np.array(trans_rows, np.float32),
                                  self._indel_bias)
        # packed drain by default: segments of one (event range,
        # transitions) group — the base + 9 candidate edits at a
        # position per read — share a lane row, so ~16-kmer screening
        # windows fill the VPU instead of leaving 87% of a 128-lane row
        # idle.  NPT_HMM_INDEXED=1 keeps the one-segment-per-row indexed
        # wire for A/B comparison.
        if idx_env != "1" and \
                os.environ.get("NPT_HMM_PACKED", "1") != "0":
            return forward_packed(levels_u, n_ev_u, tabs, rank_mat,
                                  n_km_u, trans_u, ids,
                                  np.full(n, self._flags, np.int32))
        return forward_indexed(levels_u, n_ev_u, tabs, rank_mat, n_km_u,
                               trans_u, ids,
                               np.full(n, self._flags, np.int32))

    def get(self, unit_idx: int) -> float:
        return float(self._results[unit_idx])

    @property
    def scores(self) -> np.ndarray:
        """All unit scores (valid after flush)."""
        return self._results
