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
cell-by-cell NumPy port.
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
                          TRANS_CLIP_SELF, TRANS_START_TO_CLIP,
                          make_transitions)

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
    return mx + jnp.log1p(jnp.exp(jnp.maximum(mn - mx, -80.0)))


def _logcumsumexp(x):
    """Inclusive prefix logsumexp along lanes (doubling scan)."""
    n = x.shape[1]
    d = 1
    while d < n:
        shifted = pltpu.roll(x, d, 1)
        shifted = jnp.where(_iota(n) < d, NEG, shifted)
        x = _logaddexp(x, shifted)
        d *= 2
    return x


def _flank(i_f):
    """pre_flank[i] / post_flank reversed (r9.inl:199-260); i_f float."""
    return jnp.where(i_f == 0.0, _LOG1M_CLIP,
                     _CLIP_BASE + (i_f - 1.0) * _CLIP_STEP)


def _fwd_kernel(ev_ref, a_ref, b2_ref, c0_ref, nev_ref, nk_ref, tr_ref,
                clip_ref, out_ref, m_st, b_st, k_st, end_st):
    i = pl.program_id(0)
    B = ev_ref.shape[0]
    lanes = _iota(KP)
    lanes_f = lanes.astype(jnp.float32)
    lanes_b = _iota_b(B, KP)

    nev = nev_ref[:, 0:1]
    nev_f = nev.astype(jnp.float32)
    nk = nk_ref[:, 0:1]
    lp_mk = tr_ref[:, 0:1]
    lp_mb = tr_ref[:, 1:2]
    lp_mm_self = tr_ref[:, 2:3]
    lp_mm_next = tr_ref[:, 3:4]
    lp_bb = tr_ref[:, 4:5]
    lp_b3 = tr_ref[:, 5:6]
    lp_kk = tr_ref[:, 6:7]
    lp_km = tr_ref[:, 7:8]
    pre_clip = clip_ref[:, 0:1]          # 1.0 / 0.0
    post_clip = clip_ref[:, 1:2]

    @pl.when(i == 0)
    def _():
        m_st[:] = jnp.full((B, KP), NEG, jnp.float32)
        b_st[:] = jnp.full((B, KP), NEG, jnp.float32)
        k_st[:] = jnp.full((B, KP), NEG, jnp.float32)
        end_st[:] = jnp.full((B, 1), NEG, jnp.float32)

    k0 = lanes == 0

    def row(r, _):
        t = i * R + r + 1                                    # 1-based row
        t_f = jnp.float32(t)
        active = t <= nev                                    # [B,1]
        ev = jnp.max(jnp.where(_iota_b(B, R) == r, ev_ref[:, :], NEG),
                     axis=1, keepdims=True)

        M, Bs, Ks = m_st[:], b_st[:], k_st[:]
        Mp = _shr1(M, NEG)
        Bp = _shr1(Bs, NEG)
        Kp = _shr1(Ks, NEG)

        dev = a_ref[:] * ev - b2_ref[:]
        em = c0_ref[:] - 0.5 * dev * dev

        soft_ok = (pre_clip > 0.5) | (t == 1)
        pre_val = _flank(t_f - 1.0)
        s_soft = jnp.where(k0 & soft_ok & active, pre_val, NEG)

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
        z = c - lanes_f * lp_kk
        K_new = _logcumsumexp(z) + lanes_f * lp_kk

        # end contributions (r9.inl:385-396)
        lane_last = nk - 1
        pick = lanes_b == lane_last
        m_last = jnp.max(jnp.where(pick, M_new, NEG), axis=1, keepdims=True)
        b_last = jnp.max(jnp.where(pick, B_new, NEG), axis=1, keepdims=True)
        k_last = jnp.max(jnp.where(pick, K_new, NEG), axis=1, keepdims=True)
        post = _flank(nev_f - t_f)
        cand = _logaddexp(_logaddexp(m_last, b_last), k_last) + post
        allowed = active & ((post_clip > 0.5) | (t == nev))
        end_st[:] = jnp.where(allowed, _logaddexp(end_st[:], cand), end_st[:])

        m_st[:] = jnp.where(active, M_new, M)
        b_st[:] = jnp.where(active, B_new, Bs)
        k_st[:] = jnp.where(active, K_new, Ks)
        return 0

    jax.lax.fori_loop(0, R, row, 0, unroll=False)
    out_ref[:] = end_st[:]


@functools.partial(jax.jit, static_argnames=())
def _profile_hmm_forward_call(ev, a_tab, b2_tab, c0_tab, nev, nk, trans,
                              clips):
    B, TP = ev.shape
    grid = TP // R
    return pl.pallas_call(
        _fwd_kernel,
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
        out_specs=pl.BlockSpec((B, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, KP), jnp.float32),
            pltpu.VMEM((B, KP), jnp.float32),
            pltpu.VMEM((B, KP), jnp.float32),
            pltpu.VMEM((B, 1), jnp.float32),
        ],
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(ev, a_tab, b2_tab, c0_tab, nev, nk, trans, clips)


def _pad_to(n, q):
    return max(q, -(-n // q) * q)


def profile_hmm_forward_pallas(levels, n_events, mu, sigma, log_sigma,
                               n_kmers, events_per_base, flags,
                               indel_bias: float = 1.0) -> np.ndarray:
    """Batched Forward scores via the Pallas kernel.

    Args match ops.profile_hmm.profile_hmm_forward, except `flags` may be
    a per-segment int array (mixed clip flags share one compile).
    Requires n_kmers <= 256.
    """
    levels = np.asarray(levels, np.float32)
    mu = np.asarray(mu, np.float32)
    sigma = np.asarray(sigma, np.float32)
    log_sigma = np.asarray(log_sigma, np.float32)
    n_events = np.asarray(n_events, np.int32)
    n_kmers = np.asarray(n_kmers, np.int32)
    flags = np.broadcast_to(np.asarray(flags, np.int32), n_events.shape)

    B0, T0 = levels.shape
    K0 = mu.shape[1]
    assert K0 <= KP, f"segment kmer count {K0} exceeds kernel width {KP}"
    B = _pad_to(B0, 8)
    TP = _pad_to(T0, R)

    ev = np.zeros((B, TP), np.float32)
    ev[:B0, :T0] = levels
    kmask = _iota_np(B, KP) < np.pad(n_kmers, (0, B - B0))[:, None]
    a_tab = np.zeros((B, KP), np.float32)
    b2_tab = np.zeros((B, KP), np.float32)
    c0_tab = np.full((B, KP), NEG, np.float32)
    inv = 1.0 / np.maximum(sigma, 1e-30)
    a_tab[:B0, :K0] = inv
    b2_tab[:B0, :K0] = mu * inv
    c0_tab[:B0, :K0] = LOG_INV_SQRT_2PI - log_sigma
    a_tab = np.where(kmask, a_tab, 0.0)
    b2_tab = np.where(kmask, b2_tab, 0.0)
    c0_tab = np.where(kmask, c0_tab, NEG)

    nev = np.ones((B, 1), np.int32)
    nev[:B0, 0] = np.maximum(n_events, 1)
    nk = np.ones((B, 1), np.int32)
    nk[:B0, 0] = np.maximum(n_kmers, 1)

    tr = make_transitions(np.pad(np.asarray(events_per_base, np.float32),
                                 (0, B - B0), constant_values=2.0),
                          indel_bias)
    trans = np.stack([np.asarray(v, np.float32) for v in
                      (tr.lp_mk, tr.lp_mb, tr.lp_mm_self, tr.lp_mm_next,
                       tr.lp_bb, tr.lp_bk, tr.lp_kk, tr.lp_km)],
                     axis=1)
    clips = np.zeros((B, 2), np.float32)
    clips[:B0, 0] = (flags & HAF_ALLOW_PRE_CLIP) > 0
    clips[:B0, 1] = (flags & HAF_ALLOW_POST_CLIP) > 0

    out = _profile_hmm_forward_call(ev, a_tab, b2_tab, c0_tab, nev, nk,
                                    trans, clips)
    return np.asarray(out)[:B0, 0]


def _iota_np(b, n):
    return np.broadcast_to(np.arange(n)[None, :], (b, n))
