"""Sample-level segmentation Viterbi for poly(A)/poly(I) tail calling.

Rebuild of SegmentationHMM (reference:
src/nanopolish_polya_estimator.cpp:176-520): a 6-state HMM
(START->LEADER->ADAPTER->[POLYA<->CLIFF]->TRANSCRIPT) decoded over RAW
samples with per-read scaled Gaussian/uniform/mixture emissions.

TPU design: one `lax.scan` over samples with the 6 state scores per read
as the carry ([B, 6]); backpointers stream out per step and a reverse scan
recovers the label sequence.  Reads are batched on the leading axis.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

S, L, A, P, C, T = range(6)
NEG = -1.0e30


@dataclass(frozen=True)
class SegmentationParams:
    """Emission/transition constants (polya_estimator.cpp:209-250).
    detect-polyi overrides a subset (nanopolish_detect_polyi.cpp).
    Frozen/hashable so it can be a jit static argument."""

    # transitions (dense rows: S, L, A, P, C, T)
    trans: Tuple = (
        (0.10, 0.90, 0.00, 0.00, 0.00, 0.00),
        (0.00, 0.90, 0.10, 0.00, 0.00, 0.00),
        (0.00, 0.00, 0.95, 0.05, 0.00, 0.00),
        (0.00, 0.00, 0.00, 0.89, 0.01, 0.10),
        (0.00, 0.00, 0.00, 0.99, 0.01, 0.00),
        (0.00, 0.00, 0.00, 0.00, 0.00, 1.00),
    )
    s_emission: Tuple[float, float] = (70.2737, 3.7743)
    s_prob: float = 0.00476
    s_norm_coeff: float = 0.50
    s_unif_coeff: float = 0.50
    l_emission: Tuple[float, float] = (110.973, 5.237)
    a0_emission: Tuple[float, float] = (79.347, 8.3702)
    a1_emission: Tuple[float, float] = (63.3126, 2.7464)
    a0_coeff: float = 0.874
    a1_coeff: float = 0.126
    p_emission: Tuple[float, float] = (108.883, 3.257)
    # detect-polyi models P as a two-Gaussian mixture; p1_emission=None
    # selects the single-Gaussian polya behavior
    p1_emission: Tuple[float, float] = None
    p0_coeff: float = 0.5
    p1_coeff: float = 0.5
    c_begin: float = 70.0
    c_end: float = 140.0
    c_log_prob: float = -4.2485
    t0_emission: Tuple[float, float] = (79.679, 6.966)
    t1_emission: Tuple[float, float] = (105.784, 16.022)
    t0_coeff: float = 0.346
    t1_coeff: float = 0.654


class Segmentation(NamedTuple):
    """Final sample index of each region (polya_estimator.cpp:176-183)."""

    start: int
    leader: int
    adapter: int
    polya: int
    cliffs: int


def _scaled(emission, scale, shift, var):
    """mean' = shift + scale*mean; stdv' = var*stdv  [B]-vectorized."""
    mean, stdv = emission
    return shift + scale * mean, var * stdv


@functools.partial(jax.jit, static_argnames=("params",))
def _segmentation_viterbi(samples, n_samples, scale, shift, var,
                          params: SegmentationParams):
    """samples [B, N] f32 raw pA; scale/shift/var [B] f32.
    Returns bptrs [N, B, 6] uint8 and final scores [B, 6]."""
    B, N = samples.shape
    lt = [[math.log(p) if p > 0 else NEG for p in row] for row in params.trans]

    def emissions(x):
        """x [B,1] -> [B, 6] log emission probs."""
        xx = jnp.where((x > 200.0) | (x < 40.0), 100.0, x)

        def norm_pdf(em):
            mu, sd = _scaled(em, scale[:, None], shift[:, None], var[:, None])
            z = (xx - mu) / sd
            return jnp.exp(-0.5 * z * z) / (sd * math.sqrt(2 * math.pi))

        def log_norm_pdf(em):
            mu, sd = _scaled(em, scale[:, None], shift[:, None], var[:, None])
            z = (xx - mu) / sd
            return -0.5 * z * z - jnp.log(sd) - 0.5 * math.log(2 * math.pi)

        e_s = jnp.log(params.s_norm_coeff * norm_pdf(params.s_emission)
                      + params.s_unif_coeff * params.s_prob)
        e_l = log_norm_pdf(params.l_emission)
        e_a = jnp.log(params.a0_coeff * norm_pdf(params.a0_emission)
                      + params.a1_coeff * norm_pdf(params.a1_emission))
        if params.p1_emission is not None:
            e_p = jnp.log(params.p0_coeff * norm_pdf(params.p_emission)
                          + params.p1_coeff * norm_pdf(params.p1_emission))
        else:
            e_p = log_norm_pdf(params.p_emission)
        e_c = jnp.where((xx > params.c_begin) & (xx < params.c_end),
                        params.c_log_prob, -jnp.inf)
        e_t = jnp.log(params.t0_coeff * norm_pdf(params.t0_emission)
                      + params.t1_coeff * norm_pdf(params.t1_emission))
        return jnp.concatenate([e_s, e_l, e_a, e_p, e_c, e_t], axis=1)

    # init (polya_estimator.cpp:385-387; the reference initializes with the
    # LAST sample's emission -- quirk preserved)
    last = jnp.take_along_axis(samples, jnp.maximum(n_samples - 1, 0)[:, None],
                               axis=1)
    e0 = emissions(last)
    v0 = jnp.full((B, 6), NEG)
    v0 = v0.at[:, S].set(e0[:, S])          # log_start_probs[S] = 0
    v0 = v0.at[:, L].set(NEG)               # start prob 0 for L

    def step(carry, x):
        v = carry
        em = emissions(x[:, None])
        s_to_s = v[:, S] + lt[S][S]
        s_to_l = v[:, S] + lt[S][L]
        l_to_l = v[:, L] + lt[L][L]
        l_to_a = v[:, L] + lt[L][A]
        a_to_a = v[:, A] + lt[A][A]
        a_to_p = v[:, A] + lt[A][P]
        p_to_p = v[:, P] + lt[P][P]
        p_to_c = v[:, P] + lt[P][C]
        p_to_t = v[:, P] + lt[P][T]
        c_to_c = v[:, C] + lt[C][C]
        c_to_p = v[:, C] + lt[C][P]
        t_to_t = v[:, T] + lt[T][T]

        ns = s_to_s + em[:, S]
        nl = jnp.maximum(l_to_l, s_to_l) + em[:, L]
        na = jnp.maximum(a_to_a, l_to_a) + em[:, A]
        np_ = jnp.maximum(p_to_p, jnp.maximum(a_to_p, c_to_p)) + em[:, P]
        nc = jnp.maximum(c_to_c, p_to_c) + em[:, C]
        nt = jnp.maximum(p_to_t, t_to_t) + em[:, T]

        # backpointers with the reference's strict-< tie rules
        bl = jnp.where(s_to_l < l_to_l, L, S)
        ba = jnp.where(l_to_a < a_to_a, A, L)
        bp = jnp.where((a_to_p < p_to_p) & (c_to_p < p_to_p), P,
                       jnp.where((p_to_p < a_to_p) & (c_to_p < a_to_p), A, C))
        bc = jnp.where(p_to_c < c_to_c, C, P)
        bt = jnp.where(p_to_t < t_to_t, T, P)
        bs = jnp.full_like(bl, S)
        bptr = jnp.stack([bs, bl, ba, bp, bc, bt], axis=1).astype(jnp.uint8)
        nv = jnp.stack([ns, nl, na, np_, nc, nt], axis=1)
        return nv, bptr

    v_final, bptrs = jax.lax.scan(step, v0, samples.T[1:])
    # prepend a dummy bptr row for t=0
    bptrs = jnp.concatenate(
        [jnp.zeros((1, B, 6), jnp.uint8), bptrs], axis=0)
    return bptrs, v_final


@jax.jit
def _backward_labels(bptrs, n_samples):
    """Reverse pass (polya_estimator.cpp:446-456): clamp last state to T,
    follow backpointers.  Returns labels [N, B] uint8."""
    N, B, _ = bptrs.shape

    def step(carry, x):
        state = carry                      # [B]
        bptr_row, t = x
        # the reference's backward loop: regions[j] = bptr[j][regions[j+1]]
        prev = jnp.take_along_axis(bptr_row, state[:, None].astype(jnp.int32),
                                   axis=1)[:, 0]
        active = (t >= 1) & (t <= n_samples - 2)
        new_state = jnp.where(active, prev, state).astype(jnp.uint8)
        # label at time t: for t == n-1 it is T, for t in [1, n-2] new_state
        label = jnp.where(t == n_samples - 1, jnp.uint8(T),
                          jnp.where(t == 0, jnp.uint8(S), new_state))
        nxt = jnp.where(t == n_samples - 1, jnp.uint8(T), new_state)
        return nxt, label

    ts = jnp.arange(N, dtype=jnp.int32)
    init = jnp.full((B,), T, jnp.uint8)
    _, labels = jax.lax.scan(step, init, (bptrs[::-1], ts[::-1]))
    return labels[::-1]


def segment_reads(samples_list: List[np.ndarray], scalings_list,
                  params: SegmentationParams = None) -> List[Segmentation]:
    """Batched segmentation of raw sample arrays.

    scalings_list: per-read (scale, shift, var).
    """
    import os

    if params is None:
        params = SegmentationParams()
    B = len(samples_list)
    N = max(len(s) for s in samples_list)
    N = max(N, 8)

    impl = os.environ.get("NPT_SEG_IMPL", "auto")
    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.default_backend() in ("tpu", "axon"))
    if use_pallas:
        # Any batch size rides the device-summary path: the kernel is
        # lane-major (128 reads per dispatch), so larger batches split
        # into 128-read chunks.  All chunks are DISPATCHED before any is
        # fetched, so each chunk's [128, 5] fetch overlaps later chunks'
        # kernels — B=512 costs 4 queued kernels + 4 tiny pipelined d2h,
        # not a [N, B] label fetch + a per-read host loop.
        from .pallas_segmentation import segmentation_summaries_pallas_async
        from ..utils.syncstats import timed_fetch
        CH = 128
        pend = []
        for c0 in range(0, B, CH):
            chunk = samples_list[c0:c0 + CH]
            Bc = len(chunk)
            Nc = max(8, max(len(s) for s in chunk))
            # pad N to a power of two so the kernel compiles once per
            # bucket instead of once per batch shape (remote compiles
            # cost minutes)
            Np = 1024
            while Np < Nc:
                Np *= 2
            samples = np.full((Bc, Np), 100.0, np.float32)
            n_samples = np.zeros(Bc, np.int32)
            sc = np.zeros((Bc, 3), np.float32)
            for i, (s, scals) in enumerate(
                    zip(chunk, scalings_list[c0:c0 + CH])):
                samples[i, :len(s)] = s
                n_samples[i] = len(s)
                sc[i] = scals
            summ_dev = segmentation_summaries_pallas_async(
                samples, n_samples, sc[:, 0], sc[:, 1], sc[:, 2], params)
            pend.append((summ_dev, n_samples))
        # one [n_chunks*LB, 5] fetch instead of one d2h round-trip per
        # chunk (each ~a full relay latency)
        summ_all = timed_fetch(jnp.concatenate([p[0] for p in pend], axis=0))
        lb = pend[0][0].shape[0]
        out = []
        for ci, (_, n_samples) in enumerate(pend):
            summ = summ_all[ci * lb:ci * lb + len(n_samples)]
            for i in range(len(n_samples)):
                n = int(n_samples[i])
                s_, l_, a_, p_, cliffs = (int(x) for x in summ[i])
                seg_start = s_ if s_ >= 0 else 0
                leader = l_ if l_ >= 0 else 1
                adapter = a_ if a_ >= 0 else 2
                polya = p_ if p_ >= 0 else 3
                # identical defaulting quirk to _extract_segmentation:
                # the fallback keys on the VALUES (a real transition at
                # index 1/2/3 triggers it exactly like the scalar loop)
                if leader == 1 or adapter == 2 or polya == 3:
                    leader = n - 3
                    adapter = n - 2
                    polya = n - 1
                out.append(Segmentation(start=seg_start, leader=leader,
                                        adapter=adapter, polya=polya,
                                        cliffs=cliffs))
        return out

    samples = np.full((B, N), 100.0, np.float32)
    n_samples = np.zeros(B, np.int32)
    sc = np.zeros((B, 3), np.float32)
    for i, (s, (scale, shift, var)) in enumerate(
            zip(samples_list, scalings_list)):
        samples[i, :len(s)] = s
        n_samples[i] = len(s)
        sc[i] = (scale, shift, var)

    bptrs, _ = _segmentation_viterbi(
        jnp.asarray(samples), jnp.asarray(n_samples),
        jnp.asarray(sc[:, 0]), jnp.asarray(sc[:, 1]), jnp.asarray(sc[:, 2]),
        params)
    labels = np.asarray(_backward_labels(bptrs, jnp.asarray(n_samples)))

    out = []
    for i in range(B):
        n = int(n_samples[i])
        lab = labels[:n, i]
        seg = _extract_segmentation(lab)
        out.append(seg)
    return out


def _extract_segmentation(labels: np.ndarray) -> Segmentation:
    """polya_estimator.cpp:466-508."""
    start, leader, adapter, polya = 0, 1, 2, 3
    cliffs = int((labels == C).sum())
    nxt = labels[1:]
    cur = labels[:-1]
    idx = np.arange(len(cur))
    m = (cur == S) & (nxt == L)
    if m.any():
        start = int(idx[m][-1])
    m = (cur == L) & (nxt == A)
    if m.any():
        leader = int(idx[m][-1])
    m = (cur == A) & (nxt == P)
    if m.any():
        adapter = int(idx[m][-1])
    m = (cur == P) & (nxt == T)
    if m.any():
        polya = int(idx[m][-1])
    if leader == 1 or adapter == 2 or polya == 3:
        leader = len(labels) - 3
        adapter = len(labels) - 2
        polya = len(labels) - 1
    return Segmentation(start=start, leader=leader, adapter=adapter,
                        polya=polya, cliffs=cliffs)
