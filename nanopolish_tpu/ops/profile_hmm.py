"""Profile HMM (R9) Forward / Viterbi — the core scoring kernel.

Behavioral spec: ``profile_hmm_fill_generic_r9``
(reference: src/hmm/nanopolish_profile_hmm_r9.{h,inl,cpp}): a 3-state-per-
kmer-block profile HMM over (events x kmers) with states K=kmer-skip,
B=bad-event, M=match, soft-clip flanks, and 6 movement types.

TPU design
----------
The reference fills the DP matrix cell-by-cell, row-major.  Here one
`lax.scan` over event rows advances all kmer blocks at once on the lane
axis, batched over (reads x windows x haplotypes) on the leading axis:

  * M and B rows depend only on row t-1: pure elementwise + static shifts.
  * The K row's within-row dependency K[t,k] = op(c[k], K[t,k-1] + lp_kk)
    is a first-order linear recurrence in the (max,+) / (logsumexp,+)
    semiring, computed in O(log K) with `jax.lax.associative_scan` —
    this is what makes the whole HMM a single scan over events.
  * Soft-clip pre/post flanks are affine in the row index (background
    emission is the constant -3), computed in closed form.

Numeric note: Forward uses exact logaddexp by default; NPT_LOGSUM=table
switches both the scan and the NumPy port to a bit-faithful emulation of
hmmer3's 0.001-nat quantized table (src/common/logsum.h) with the
reference's sequential accumulation order (the quantized op is neither
exact nor associative, so grouping matters) — for comparisons against
the reference binary's scores.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .emissions import LOG_INV_SQRT_2PI

# movement types (nanopolish_profile_hmm_r9.h:61-71)
HMT_FROM_SAME_M = 0
HMT_FROM_PREV_M = 1
HMT_FROM_SAME_B = 2
HMT_FROM_PREV_B = 3
HMT_FROM_PREV_K = 4
HMT_FROM_SOFT = 5

# states (nanopolish_profile_hmm_r9.h:52-59)
PSR9_KMER_SKIP = 0
PSR9_BAD_EVENT = 1
PSR9_MATCH = 2

# flags (nanopolish_profile_hmm.h:34-38)
HAF_ALLOW_PRE_CLIP = 1
HAF_ALLOW_POST_CLIP = 2

# soft clip constants (r9.inl:12-13) + background emission (-3 nats)
TRANS_CLIP_SELF = 0.9
TRANS_START_TO_CLIP = 0.5
LOG_BG = -3.0

NEG_INF = -jnp.inf


class BlockTransitions(NamedTuple):
    """Per-read log transition probabilities (r9.inl:17-76). Identical for
    every kmer block, so scalars per read."""

    lp_mk: jnp.ndarray
    lp_mb: jnp.ndarray
    lp_mm_self: jnp.ndarray
    lp_mm_next: jnp.ndarray
    lp_bb: jnp.ndarray
    lp_bk: jnp.ndarray
    lp_bm_next: jnp.ndarray
    lp_bm_self: jnp.ndarray
    lp_kk: jnp.ndarray
    lp_km: jnp.ndarray


class TransitionKnobs:
    """Process-wide transition-probability overrides, mirroring the
    reference's `g_p_skip/g_p_skip_self/g_p_bad/g_p_bad_self` globals
    (call_variants.cpp:57,1050-1053; consumed in r9.inl:30-41).  In the
    reference these only take effect when compiled with
    USE_EXTERNAL_PARAMS; here `--p-skip` etc. always take effect."""

    p_skip: float = 0.0025
    p_bad: float = 0.001
    p_bad_self: float = None       # None -> follows p_bad
    p_skip_self: float = 0.3

    @classmethod
    def set(cls, p_skip=None, p_bad=None, p_bad_self=None, p_skip_self=None):
        if p_skip is not None:
            cls.p_skip = p_skip
        if p_bad is not None:
            cls.p_bad = p_bad
        if p_bad_self is not None:
            cls.p_bad_self = p_bad_self
        if p_skip_self is not None:
            cls.p_skip_self = p_skip_self

    @classmethod
    def reset(cls):
        cls.p_skip, cls.p_bad = 0.0025, 0.001
        cls.p_bad_self, cls.p_skip_self = None, 0.3


def make_transitions(events_per_base, indel_bias: float = 1.0,
                     p_skip: float = None, p_bad: float = None,
                     p_bad_self: float = None, p_skip_self: float = None):
    """r9.inl:17-76. events_per_base is [B] float32."""
    if p_skip is None:
        p_skip = TransitionKnobs.p_skip
    if p_bad is None:
        p_bad = TransitionKnobs.p_bad
    if p_bad_self is None:
        p_bad_self = TransitionKnobs.p_bad_self
    if p_skip_self is None:
        p_skip_self = TransitionKnobs.p_skip_self
    if p_bad_self is None:
        p_bad_self = p_bad
    epb = jnp.maximum(1.25, jnp.asarray(events_per_base, jnp.float32) * indel_bias)
    p_stay = 1.0 - 1.0 / epb
    p_mk = jnp.full_like(p_stay, p_skip)
    p_mb = jnp.full_like(p_stay, p_bad)
    p_mm_self = p_stay
    p_mm_next = 1.0 - p_mm_self - p_mk - p_mb
    p_bb = jnp.full_like(p_stay, p_bad_self)
    p_b3 = (1.0 - p_bb) / 3.0
    p_kk = jnp.full_like(p_stay, p_skip_self)
    p_km = 1.0 - p_kk
    return BlockTransitions(
        lp_mk=jnp.log(p_mk), lp_mb=jnp.log(p_mb),
        lp_mm_self=jnp.log(p_mm_self), lp_mm_next=jnp.log(p_mm_next),
        lp_bb=jnp.log(p_bb), lp_bk=jnp.log(p_b3),
        lp_bm_next=jnp.log(p_b3), lp_bm_self=jnp.log(p_b3),
        lp_kk=jnp.log(p_kk), lp_km=jnp.log(p_km))


def _flank_fn(i):
    """pre_flank[i] (r9.inl:200-227); post_flank[i] = same fn of n-1-i
    (r9.inl:231-260).  Affine because the background emission is constant."""
    i = i.astype(jnp.float32)
    base = math.log(TRANS_START_TO_CLIP) + LOG_BG + math.log(1 - TRANS_CLIP_SELF)
    step = math.log(TRANS_CLIP_SELF) + LOG_BG
    return jnp.where(i == 0, math.log(1 - TRANS_START_TO_CLIP),
                     base + (i - 1.0) * step)


def _log_normal(x, mu, sigma, log_sigma):
    a = (x - mu) / sigma
    return (LOG_INV_SQRT_2PI - log_sigma) + (-0.5 * a * a)


def _shift_prev(x):
    """out[:, k] = x[:, k-1], -inf at k=0 (reads from the previous block)."""
    return jnp.concatenate(
        [jnp.full((x.shape[0], 1), NEG_INF, x.dtype), x[:, :-1]], axis=1)


def _kstate_scan(c, lp_kk, viterbi: bool, add=None):
    """K[t,k] = op(c[k], K[t,k-1] + lp_kk) via associative scan (semiring
    linear recurrence).  c: [B, K]; lp_kk: [B].  When a quantized `add` is
    given (logsum-table emulation), the recurrence runs SEQUENTIALLY left
    to right — the table op is not associative, and bit-faithfulness to
    the reference's k-loop (r9.inl) requires its exact grouping."""
    if add is not None and not viterbi:
        def f(prev, ck):
            v = add(ck, prev + lp_kk)
            return v, v
        _, vs = jax.lax.scan(f, jnp.full(c.shape[0], NEG_INF, c.dtype), c.T)
        return vs.T

    a = jnp.broadcast_to(lp_kk[:, None], c.shape)

    if viterbi:
        def combine(x, y):
            ax, vx = x
            ay, vy = y
            return ax + ay, jnp.maximum(vx + ay, vy)
    else:
        def combine(x, y):
            ax, vx = x
            ay, vy = y
            return ax + ay, jnp.logaddexp(vx + ay, vy)

    _, v = jax.lax.associative_scan(combine, (a, c), axis=1)
    return v


@functools.partial(jax.jit,
                   static_argnames=("flags", "viterbi", "with_trace",
                                    "logsum"))
def _profile_hmm_scan(levels, n_events, mu, sigma, log_sigma, n_kmers,
                      trans: BlockTransitions, flags: int, viterbi: bool,
                      with_trace: bool, logsum: str = "exact"):
    B, T = levels.shape
    K = mu.shape[1]
    pre_clip = bool(flags & HAF_ALLOW_PRE_CLIP)
    post_clip = bool(flags & HAF_ALLOW_POST_CLIP)
    if logsum == "table":
        from ..utils.logsum import add_logs_table as _add
        k_add = _add              # sequential, reference-grouped K chain
    else:
        _add = jnp.logaddexp
        k_add = None              # associative logsumexp scan

    def lse(vals):
        # left fold in the reference's accumulation order (r9.inl) — the
        # quantized table op is order-sensitive
        r = vals[0]
        for v in vals[1:]:
            r = _add(r, v)
        return r

    last_col = jnp.clip(n_kmers - 1, 0, K - 1)[:, None]
    n_events_f = n_events.astype(jnp.float32)

    neg = jnp.full((B, K), NEG_INF, jnp.float32)
    init_end = jnp.full((B,), NEG_INF, jnp.float32)

    lp_mm_self = trans.lp_mm_self[:, None]
    lp_mm_next = trans.lp_mm_next[:, None]
    lp_bm_self = trans.lp_bm_self[:, None]
    lp_bm_next = trans.lp_bm_next[:, None]
    lp_km = trans.lp_km[:, None]
    lp_mb = trans.lp_mb[:, None]
    lp_bb = trans.lp_bb[:, None]
    lp_mk = trans.lp_mk[:, None]
    lp_bk = trans.lp_bk[:, None]

    k0 = (jnp.arange(K, dtype=jnp.int32) == 0)[None, :]

    def step(carry, xs):
        M_prev, B_prev, K_prev, lp_end, end_row, end_state = carry
        level_t, row = xs                                   # level_t [B], row scalar
        t = row                                             # 1-based row index

        em = _log_normal(level_t[:, None], mu, sigma, log_sigma)   # [B, K]

        Mp = _shift_prev(M_prev)
        Bp = _shift_prev(B_prev)
        Kp = _shift_prev(K_prev)

        # soft-clip entry into the first kmer's match state
        soft_ok = jnp.asarray(True) if pre_clip else (t == 1)
        pre_val = _flank_fn(jnp.full((B,), t - 1, jnp.int32))
        s_soft = jnp.where(k0 & soft_ok & (t <= n_events[:, None]),
                           pre_val[:, None], NEG_INF)

        x0 = lp_mm_self + M_prev        # FROM_SAME_M
        x1 = lp_mm_next + Mp            # FROM_PREV_M
        x2 = lp_bm_self + B_prev        # FROM_SAME_B
        x3 = lp_bm_next + Bp            # FROM_PREV_B
        x4 = lp_km + Kp                 # FROM_PREV_K
        x5 = s_soft                     # FROM_SOFT

        if viterbi:
            m_in = jnp.maximum(jnp.maximum(jnp.maximum(x0, x1), jnp.maximum(x2, x3)),
                               jnp.maximum(x4, x5))
        else:
            m_in = lse([x0, x1, x2, x3, x4, x5])
        M_new = m_in + em

        b0 = lp_mb + M_prev             # FROM_SAME_M
        b2 = lp_bb + B_prev             # FROM_SAME_B
        B_new = jnp.maximum(b0, b2) if viterbi else _add(b0, b2)
        # BAD_EVENT_PENALTY = 0 emission

        cM = lp_mk + _shift_prev(M_new)  # FROM_PREV_M (same row!)
        cB = lp_bk + _shift_prev(B_new)  # FROM_PREV_B
        c = jnp.maximum(cM, cB) if viterbi else _add(cM, cB)
        K_new = _kstate_scan(c, trans.lp_kk, viterbi, add=k_add)

        if with_trace:
            # tie-break: the reference takes the LAST equal index (r9.inl:140-146)
            trM = jnp.full((B, K), HMT_FROM_SAME_M, jnp.uint8)
            for idx, x in ((HMT_FROM_PREV_M, x1), (HMT_FROM_SAME_B, x2),
                           (HMT_FROM_PREV_B, x3), (HMT_FROM_PREV_K, x4),
                           (HMT_FROM_SOFT, x5)):
                trM = jnp.where(x == m_in, jnp.uint8(idx), trM)
            trB = jnp.where(b2 == B_new, jnp.uint8(HMT_FROM_SAME_B),
                            jnp.uint8(HMT_FROM_SAME_M))
            kk_prev = _shift_prev(K_new) + trans.lp_kk[:, None]
            trK = jnp.full((B, K), HMT_FROM_PREV_M, jnp.uint8)
            trK = jnp.where(cB == K_new, jnp.uint8(HMT_FROM_PREV_B), trK)
            trK = jnp.where(kk_prev == K_new, jnp.uint8(HMT_FROM_PREV_K), trK)
            trace = jnp.stack([trK, trB, trM], axis=-1)     # [B, K, 3] (K,B,M order)
        else:
            trace = jnp.zeros((B, 0, 3), jnp.uint8)

        # end contributions (r9.inl:385-396); lp_ms = 0
        m_last = jnp.take_along_axis(M_new, last_col, axis=1)[:, 0]
        b_last = jnp.take_along_axis(B_new, last_col, axis=1)[:, 0]
        k_last = jnp.take_along_axis(K_new, last_col, axis=1)[:, 0]
        post = _flank_fn(n_events_f - t)                     # post_flank[t-1]
        allowed = (t <= n_events) if post_clip else (t == n_events)
        if viterbi:
            cand = jnp.maximum(jnp.maximum(m_last, b_last), k_last) + post
            cand = jnp.where(allowed, cand, NEG_INF)
            better = cand > lp_end
            st = jnp.where(m_last >= jnp.maximum(b_last, k_last), PSR9_MATCH,
                           jnp.where(b_last >= k_last, PSR9_BAD_EVENT, PSR9_KMER_SKIP))
            lp_end = jnp.where(better, cand, lp_end)
            end_row = jnp.where(better, t, end_row)
            end_state = jnp.where(better, st.astype(jnp.int32), end_state)
        else:
            cand = lse([m_last, b_last, k_last]) + post
            lp_end = jnp.where(allowed, _add(lp_end, cand), lp_end)

        return (M_new, B_new, K_new, lp_end, end_row, end_state), trace

    rows = jnp.arange(1, T + 1, dtype=jnp.int32)
    init = (neg, neg, neg, init_end,
            jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32))
    carry, traces = jax.lax.scan(step, init, (levels.T, rows))
    _, _, _, lp_end, end_row, end_state = carry
    return lp_end, end_row, end_state, traces


def profile_hmm_forward(levels, n_events, mu, sigma, log_sigma, n_kmers,
                        events_per_base, flags: int = 0,
                        indel_bias: float = 1.0,
                        trans: BlockTransitions = None):
    """Batched Forward score (profile_hmm_score_r9, r9.cpp:35-65).

    Args:
      levels: [B, T] f32 drift-scaled event levels in traversal order
        (host applies event_stride; padded rows ignored).
      n_events: [B] i32; mu/sigma/log_sigma: [B, K] f32 scaled gaussians of
        the window's kmers; n_kmers: [B] i32; events_per_base: [B] f32.
    Returns lp_end [B] f32.
    """
    if trans is None:
        trans = make_transitions(events_per_base, indel_bias)
    import os
    logsum = os.environ.get("NPT_LOGSUM", "exact")
    lp_end, _, _, _ = _profile_hmm_scan(
        jnp.asarray(levels, jnp.float32), jnp.asarray(n_events, jnp.int32),
        jnp.asarray(mu, jnp.float32), jnp.asarray(sigma, jnp.float32),
        jnp.asarray(log_sigma, jnp.float32), jnp.asarray(n_kmers, jnp.int32),
        trans, flags, viterbi=False, with_trace=False, logsum=logsum)
    return lp_end


def profile_hmm_viterbi(levels, n_events, mu, sigma, log_sigma, n_kmers,
                        events_per_base, flags: int = 0,
                        indel_bias: float = 1.0, with_trace: bool = True,
                        trans: BlockTransitions = None):
    """Batched Viterbi; returns (lp_end [B], trace [T, B, K, 3] uint8)."""
    if trans is None:
        trans = make_transitions(events_per_base, indel_bias)
    lp_end, end_row, end_state, traces = _profile_hmm_scan(
        jnp.asarray(levels, jnp.float32), jnp.asarray(n_events, jnp.int32),
        jnp.asarray(mu, jnp.float32), jnp.asarray(sigma, jnp.float32),
        jnp.asarray(log_sigma, jnp.float32), jnp.asarray(n_kmers, jnp.int32),
        trans, flags, viterbi=True, with_trace=with_trace)
    return lp_end, traces


_STATE_CHAR = "KBMNS"


def viterbi_backtrack(traces, n_events, n_kmers):
    """Host backtrack of the Viterbi trace, batched over reads.

    Spec: profile_hmm_align_r9 (r9.cpp:73-204): start at
    (row=n_events, kmer=n_kmers-1, state=M), walk moves; K states are
    silent (row does not decrement).

    Args:
      traces: [T, B, K, 3] uint8 from profile_hmm_viterbi (state order K,B,M)
      n_events, n_kmers: [B] int arrays
    Returns: list of (event_offsets, kmer_idxs, state_chars) per read, in
      forward order; event_offset is 0-based within the window (row-1).
    """
    traces = np.asarray(traces)
    T, B, K, _ = traces.shape
    out = []
    for b in range(B):
        row = int(n_events[b])
        ki = int(n_kmers[b]) - 1
        st = PSR9_MATCH
        evs, kms, chars = [], [], []
        while row > 0:
            evs.append(row - 1)
            kms.append(ki)
            chars.append(_STATE_CHAR[st])
            mv = int(traces[row - 1, b, ki, st])
            if mv == HMT_FROM_SOFT:
                break
            if mv == HMT_FROM_SAME_M:
                nxt_ki, nxt_st = ki, PSR9_MATCH
            elif mv == HMT_FROM_PREV_M:
                nxt_ki, nxt_st = ki - 1, PSR9_MATCH
            elif mv == HMT_FROM_SAME_B:
                nxt_ki, nxt_st = ki, PSR9_BAD_EVENT
            elif mv == HMT_FROM_PREV_B:
                nxt_ki, nxt_st = ki - 1, PSR9_BAD_EVENT
            else:  # HMT_FROM_PREV_K
                nxt_ki, nxt_st = ki - 1, PSR9_KMER_SKIP
            if st != PSR9_KMER_SKIP:
                row -= 1
            ki, st = nxt_ki, nxt_st
        evs.reverse()
        kms.reverse()
        chars.reverse()
        out.append((np.asarray(evs, np.int32), np.asarray(kms, np.int32),
                    "".join(chars)))
    return out


# --------------------------------------------------------------------------
# NumPy reference implementation (cell-by-cell port of the DP semantics,
# r9.inl:265-433) for kernel validation.
# --------------------------------------------------------------------------

def profile_hmm_reference(levels, mu, sigma, log_sigma, events_per_base,
                          flags=0, indel_bias=1.0, viterbi=False):
    n_events = len(levels)
    n_kmers = len(mu)
    epb = max(1.25, events_per_base * indel_bias)
    p_stay = 1 - 1 / epb
    p_skip, p_bad = TransitionKnobs.p_skip, TransitionKnobs.p_bad
    p_skip_self = TransitionKnobs.p_skip_self
    p_bad_self = TransitionKnobs.p_bad_self
    if p_bad_self is None:
        p_bad_self = p_bad
    lp_mk = math.log(p_skip)
    lp_mb = math.log(p_bad)
    lp_mm_self = math.log(p_stay)
    lp_mm_next = math.log(1.0 - p_stay - p_skip - p_bad)
    lp_bb = math.log(p_bad_self)
    lp_b3 = math.log((1.0 - p_bad_self) / 3)
    lp_kk = math.log(p_skip_self)
    lp_km = math.log(1 - p_skip_self)

    pre = np.zeros(n_events + 1)
    pre[0] = math.log(1 - TRANS_START_TO_CLIP)
    if n_events >= 1:
        pre[1] = math.log(TRANS_START_TO_CLIP) + LOG_BG + math.log(1 - TRANS_CLIP_SELF)
    for i in range(2, n_events + 1):
        pre[i] = math.log(TRANS_CLIP_SELF) + LOG_BG + pre[i - 1]
    post = np.zeros(n_events)
    post[n_events - 1] = math.log(1 - TRANS_START_TO_CLIP)
    if n_events > 1:
        post[n_events - 2] = (math.log(TRANS_START_TO_CLIP) + LOG_BG
                              + math.log(1 - TRANS_CLIP_SELF))
        for i in range(n_events - 3, -1, -1):
            post[i] = math.log(TRANS_CLIP_SELF) + LOG_BG + post[i + 1]

    import os
    if viterbi:
        op = max
    elif os.environ.get("NPT_LOGSUM", "exact") == "table":
        from ..utils.logsum import add_logs_np
        op = functools.partial(add_logs_np, table=True)
    else:
        op = np.logaddexp

    def lse(vals):
        r = vals[0]
        for v in vals[1:]:
            r = op(r, v)
        return r

    M = np.full((n_events + 1, n_kmers), -np.inf)
    Bd = np.full((n_events + 1, n_kmers), -np.inf)
    Ks = np.full((n_events + 1, n_kmers), -np.inf)
    lp_end = -np.inf

    def em(t, k):
        a = (levels[t - 1] - mu[k]) / sigma[k]
        return LOG_INV_SQRT_2PI - log_sigma[k] - 0.5 * a * a

    for t in range(1, n_events + 1):
        for k in range(n_kmers):
            Mp = M[t - 1, k - 1] if k > 0 else -np.inf
            Bp = Bd[t - 1, k - 1] if k > 0 else -np.inf
            Kp = Ks[t - 1, k - 1] if k > 0 else -np.inf
            soft = (pre[t - 1] if (k == 0 and (t == 1 or (flags & HAF_ALLOW_PRE_CLIP)))
                    else -np.inf)
            M[t, k] = lse([lp_mm_self + M[t - 1, k], lp_mm_next + Mp,
                           lp_b3 + Bd[t - 1, k], lp_b3 + Bp,
                           lp_km + Kp, soft]) + em(t, k)
            Bd[t, k] = lse([lp_mb + M[t - 1, k], lp_bb + Bd[t - 1, k]])
            cM = lp_mk + (M[t, k - 1] if k > 0 else -np.inf)
            cB = lp_bk_val = lp_b3 + (Bd[t, k - 1] if k > 0 else -np.inf)
            cK = lp_kk + (Ks[t, k - 1] if k > 0 else -np.inf)
            Ks[t, k] = lse([cM, cB, cK])
            if k == n_kmers - 1 and ((flags & HAF_ALLOW_POST_CLIP) or t == n_events):
                contrib = lse([M[t, k], Bd[t, k], Ks[t, k]]) + post[t - 1]
                lp_end = op(lp_end, contrib)
    return lp_end
