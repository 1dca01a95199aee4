"""Pallas TPU kernel: sample-level segmentation Viterbi (poly(A)/poly(I)).

Same recurrence as ops/segmentation_hmm.py (rebuild of SegmentationHMM,
reference: src/nanopolish_polya_estimator.cpp:176-520), reformulated for
the TPU:

  * reads ride the 128 LANES; the 6 HMM states ride sublanes of one
    (8, 128) f32 tile, so a whole batch's Viterbi step is a handful of
    full-tile ops (sublane extracts via masked reduces + one recombine);
  * samples stream in R=8 rows per grid step ([R, LB] blocks of the
    [N, LB] sample matrix); the sequential chain lives in VMEM scratch;
  * backpointers stream out as one (8, 128) uint8 plane per sample
    (sublane s = backpointer of state s), and a second reverse-grid
    kernel follows them to emit labels, so only [N, B] uint8 labels ever
    reach the host.

Unlike the `lax.scan` path (one XLA program per padded-N bucket — remote
compiles cost minutes each), this kernel compiles ONCE for the padded
maximum length and masks shorter reads.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .segmentation_hmm import NEG, SegmentationParams, S, L, A, P, C, T

LB = 128          # reads per batch (lanes)
R = 8             # sample rows per grid step (sublanes of the input block)
NS = 6


def _sub_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (8, LB), 0)


def _row(block, r):
    """Extract sublane r of an (8, LB) tile as a replicated (8, LB) tile."""
    m = jnp.max(jnp.where(_sub_iota() == r, block, NEG), axis=0,
                keepdims=True)
    return jnp.broadcast_to(m, (8, LB))


def _row_i32(block_i32, r):
    """Sublane-r extract for non-negative int tiles."""
    m = jnp.max(jnp.where(_sub_iota() == r, block_i32, 0), axis=0,
                keepdims=True)
    return jnp.broadcast_to(m, (8, LB))


def _assemble(rows):
    """rows: list of NS (8, LB) replicated tiles -> one (8, LB) tile with
    sublane s = rows[s]."""
    sub = _sub_iota()
    out = jnp.full((8, LB), NEG, jnp.float32)
    for s, v in enumerate(rows):
        out = jnp.where(sub == s, v, out)
    return out


def _emissions_tile(x, scale, shift, var, p: SegmentationParams):
    """x, scale/shift/var: (8, LB) replicated sample row + scalings.
    Returns (8, LB) tile whose sublane s holds state s's log emission."""
    xx = jnp.where((x > 200.0) | (x < 40.0), 100.0, x)

    def norm_pdf(em):
        mu = shift + scale * em[0]
        sd = var * em[1]
        z = (xx - mu) / sd
        return jnp.exp(-0.5 * z * z) / (sd * math.sqrt(2 * math.pi))

    def log_norm_pdf(em):
        mu = shift + scale * em[0]
        sd = var * em[1]
        z = (xx - mu) / sd
        return -0.5 * z * z - jnp.log(sd) - 0.5 * math.log(2 * math.pi)

    e_s = jnp.log(p.s_norm_coeff * norm_pdf(p.s_emission)
                  + p.s_unif_coeff * p.s_prob)
    e_l = log_norm_pdf(p.l_emission)
    e_a = jnp.log(p.a0_coeff * norm_pdf(p.a0_emission)
                  + p.a1_coeff * norm_pdf(p.a1_emission))
    if p.p1_emission is not None:
        e_p = jnp.log(p.p0_coeff * norm_pdf(p.p_emission)
                      + p.p1_coeff * norm_pdf(p.p1_emission))
    else:
        e_p = log_norm_pdf(p.p_emission)
    e_c = jnp.where((xx > p.c_begin) & (xx < p.c_end), p.c_log_prob, NEG)
    e_t = jnp.log(p.t0_coeff * norm_pdf(p.t0_emission)
                  + p.t1_coeff * norm_pdf(p.t1_emission))
    return _assemble([e_s, e_l, e_a, e_p, e_c, e_t])


def _seg_fwd_kernel(params: SegmentationParams,
                    samples_ref, scale_ref, shift_ref, var_ref, nlast_ref,
                    bptr_ref, vfin_ref, v_scr):
    i = pl.program_id(0)
    lt = [[math.log(q) if q > 0 else NEG for q in row] for row in
          params.trans]
    scale = jnp.broadcast_to(scale_ref[0:1, :], (8, LB))
    shift = jnp.broadcast_to(shift_ref[0:1, :], (8, LB))
    var = jnp.broadcast_to(var_ref[0:1, :], (8, LB))
    sub = _sub_iota()

    @pl.when(i == 0)
    def _():
        # init with the LAST sample's emission (reference quirk,
        # polya_estimator.cpp:385-387)
        last = jnp.broadcast_to(nlast_ref[0:1, :], (8, LB))
        e0 = _emissions_tile(last, scale, shift, var, params)
        v_scr[:] = jnp.where(sub == S, e0, NEG)

    def row_step(r, _):
        t = i * R + r
        v = v_scr[:]
        x = _row(samples_ref[:, :], r)
        em = _emissions_tile(x, scale, shift, var, params)

        vS = _row(v, S)
        vL = _row(v, L)
        vA = _row(v, A)
        vP = _row(v, P)
        vC = _row(v, C)
        vT = _row(v, T)

        s_to_s = vS + lt[S][S]
        s_to_l = vS + lt[S][L]
        l_to_l = vL + lt[L][L]
        l_to_a = vL + lt[L][A]
        a_to_a = vA + lt[A][A]
        a_to_p = vA + lt[A][P]
        p_to_p = vP + lt[P][P]
        p_to_c = vP + lt[P][C]
        p_to_t = vP + lt[P][T]
        c_to_c = vC + lt[C][C]
        c_to_p = vC + lt[C][P]
        t_to_t = vT + lt[T][T]

        ns = s_to_s
        nl = jnp.maximum(l_to_l, s_to_l)
        na = jnp.maximum(a_to_a, l_to_a)
        np_ = jnp.maximum(p_to_p, jnp.maximum(a_to_p, c_to_p))
        nc = jnp.maximum(c_to_c, p_to_c)
        nt = jnp.maximum(p_to_t, t_to_t)
        nv = _assemble([ns, nl, na, np_, nc, nt]) + em

        # backpointers, strict-< tie rules (polya_estimator.cpp:418-441);
        # int32 compute, single uint8 cast (TPU mask-relayout rule)
        bl = jnp.where(s_to_l < l_to_l, L, S)
        ba = jnp.where(l_to_a < a_to_a, A, L)
        bp = jnp.where((a_to_p < p_to_p) & (c_to_p < p_to_p), P,
                       jnp.where((p_to_p < a_to_p) & (c_to_p < a_to_p), A, C))
        bc = jnp.where(p_to_c < c_to_c, C, P)
        bt = jnp.where(p_to_t < t_to_t, T, P)
        btile = jnp.full((8, LB), S, jnp.int32)
        for s, bv in ((L, bl), (A, ba), (P, bp), (C, bc), (T, bt)):
            btile = jnp.where(sub == s, bv, btile)

        # row t==0 keeps the init scores and a dummy bptr (scan semantics:
        # the first processed sample is t=1)
        keep = t == 0
        v_scr[:] = jnp.where(keep, v, nv)
        bptr_ref[r] = jnp.where(keep, S, btile).astype(jnp.uint8)
        return 0

    jax.lax.fori_loop(0, R, row_step, 0, unroll=True)
    vfin_ref[:, :] = v_scr[:]


def _seg_back_kernel(nsamp_ref, bptr_ref, labels_ref, st_scr):
    """Reverse grid over R-row blocks: follow backpointers, emit labels
    (polya_estimator.cpp:446-456 semantics, matching _backward_labels)."""
    i = pl.program_id(0)
    n_grid = pl.num_programs(0)
    nsamp = jnp.broadcast_to(nsamp_ref[0:1, :], (8, LB)).astype(jnp.int32)
    sub = _sub_iota()

    @pl.when(i == 0)
    def _():
        st_scr[:] = jnp.full((8, LB), T, jnp.int32)

    def row_step(r, _):
        # reverse order within the reversed block
        rr = R - 1 - r
        t = (n_grid - 1 - i) * R + rr
        state = st_scr[:]
        bt = bptr_ref[rr].astype(jnp.int32)
        # prev = bptr_row[state]: select the sublane named by state
        prev = jnp.full((8, LB), S, jnp.int32)
        for s in range(NS):
            prev = jnp.where(state == s, _row_i32(bt, s), prev)
        active = (t >= 1) & (t <= nsamp - 2)
        new_state = jnp.where(active, prev, state)
        label = jnp.where(t == nsamp - 1, T,
                          jnp.where(t == 0, S, new_state))
        nxt = jnp.where(t == nsamp - 1, T, new_state)
        st_scr[:] = nxt
        labels_ref[rr] = label.astype(jnp.uint8)   # (8, LB) replicated
        return 0

    jax.lax.fori_loop(0, R, row_step, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def _segmentation_viterbi_pallas_call(samples_nb, scale, shift, var,
                                      last_sample, n_samples,
                                      params: SegmentationParams,
                                      interpret=False):
    """samples_nb [N, LB] f32 (N multiple of R); per-read vectors [1, LB].
    Returns labels [N, LB] uint8 and final scores [8, LB] (sublane=state)."""
    N = samples_nb.shape[0]
    grid = N // R
    vmem = pltpu.VMEM
    bptr, vfin = pl.pallas_call(
        functools.partial(_seg_fwd_kernel, params),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((R, LB), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
        ],
        out_specs=(
            pl.BlockSpec((R, 8, LB), lambda i: (i, 0, 0), memory_space=vmem),
            pl.BlockSpec((8, LB), lambda i: (0, 0), memory_space=vmem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, 8, LB), jnp.uint8),
            jax.ShapeDtypeStruct((8, LB), jnp.float32),
        ),
        scratch_shapes=[vmem((8, LB), jnp.float32)],
        interpret=interpret,
    )(samples_nb, scale, shift, var, last_sample)

    n_grid = N // R
    labels = pl.pallas_call(
        _seg_back_kernel,
        grid=(n_grid,),
        in_specs=[
            pl.BlockSpec(memory_space=vmem),
            pl.BlockSpec((R, 8, LB), lambda i: (n_grid - 1 - i, 0, 0),
                         memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((R, 8, LB), lambda i: (n_grid - 1 - i, 0, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((N, 8, LB), jnp.uint8),
        scratch_shapes=[vmem((8, LB), jnp.int32)],
        interpret=interpret,
    )(n_samples, bptr)
    return labels, vfin


def segmentation_labels_pallas(samples, n_samples, scale, shift, var,
                               params: SegmentationParams = None,
                               interpret=None):
    """Drop-in device path: samples [B, N] f32 (padded), n_samples [B] i32,
    scalings [B] f32 each.  Returns labels [B, N] uint8 (valid up to
    n_samples per read).  B <= 128; one compile per padded N."""
    if params is None:
        params = SegmentationParams()
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    samples = np.asarray(samples, np.float32)
    B, N0 = samples.shape
    assert B <= LB, f"batch {B} exceeds kernel lane width {LB}"
    n_samples = np.asarray(n_samples, np.int32)
    Np = max(R, -(-N0 // R) * R)

    s_nb = np.full((Np, LB), 100.0, np.float32)
    s_nb[:N0, :B] = samples.T
    vec = lambda x, fill: np.full((1, LB), fill, np.float32)
    sc = vec(scale, 1.0)
    sh = vec(shift, 0.0)
    va = vec(var, 1.0)
    sc[0, :B] = scale
    sh[0, :B] = shift
    va[0, :B] = var
    last = np.full((1, LB), 100.0, np.float32)
    last[0, :B] = samples[np.arange(B), np.maximum(n_samples - 1, 0)]
    ns = np.full((1, LB), 8, np.float32)
    ns[0, :B] = n_samples
    labels, _ = _segmentation_viterbi_pallas_call(
        s_nb, sc, sh, va, last, ns.astype(np.int32), params,
        interpret=interpret)
    return np.asarray(labels)[:, 0, :].T[:B]


@jax.jit
def _seg_summary(labels, n_samples):
    """Device-side reduction of the label matrix to the five quantities
    _extract_segmentation consumes: last S->L / L->A / A->P / P->T
    transition index (-1 if none) and the cliff count — fetching [B, 5]
    ints instead of the [N, B] label matrix (~20 MB at RNA sample
    counts, the warm polya app's dominant d2h)."""
    lab = labels[:, 0, :].astype(jnp.int32)        # [Np, LB]
    N = lab.shape[0]
    ns = n_samples[None, :]
    i = jnp.arange(N - 1, dtype=jnp.int32)[:, None]
    tmask = (i + 1) < ns                            # transitions in [0, n-1)
    cur = lab[:-1]
    nxt = lab[1:]

    def lastidx(a, b):
        m = (cur == a) & (nxt == b) & tmask
        return jnp.max(jnp.where(m, i, -1), axis=0)

    vmask = jnp.arange(N, dtype=jnp.int32)[:, None] < ns
    cliffs = jnp.sum(((lab == C) & vmask).astype(jnp.int32), axis=0)
    return jnp.stack([lastidx(S, L), lastidx(L, A), lastidx(A, P),
                      lastidx(P, T), cliffs], axis=1)    # [LB, 5]


def segmentation_summaries_pallas_async(samples, n_samples, scale, shift,
                                        var,
                                        params: SegmentationParams = None,
                                        interpret=None):
    """Dispatch-only variant of segmentation_summaries_pallas: returns the
    [LB, 5] summary as a DEVICE array (caller slices [:B] after fetching).
    Lets segment_reads queue several 128-lane chunks before blocking on
    any fetch, so chunk fetches overlap later chunks' kernels."""
    if params is None:
        params = SegmentationParams()
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    samples = np.asarray(samples, np.float32)
    B, N0 = samples.shape
    assert B <= LB, f"batch {B} exceeds kernel lane width {LB}"
    n_samples = np.asarray(n_samples, np.int32)

    s_nb = np.full((max(R, -(-N0 // R) * R), LB), 100.0, np.float32)
    s_nb[:N0, :B] = samples.T
    vec = lambda x, fill: np.full((1, LB), fill, np.float32)
    sc = vec(scale, 1.0)
    sh = vec(shift, 0.0)
    va = vec(var, 1.0)
    sc[0, :B] = scale
    sh[0, :B] = shift
    va[0, :B] = var
    last = np.full((1, LB), 100.0, np.float32)
    last[0, :B] = samples[np.arange(B), np.maximum(n_samples - 1, 0)]
    ns = np.full((1, LB), 8, np.float32)
    ns[0, :B] = n_samples
    labels, _ = _segmentation_viterbi_pallas_call(
        s_nb, sc, sh, va, last, ns.astype(np.int32), params,
        interpret=interpret)
    return _seg_summary(labels, jnp.asarray(ns[0].astype(np.int32)))


def segmentation_summaries_pallas(samples, n_samples, scale, shift, var,
                                  params: SegmentationParams = None,
                                  interpret=None):
    """Like segmentation_labels_pallas but returns the [B, 5] summary
    (see _seg_summary) with the label matrix reduced on device."""
    B = np.asarray(samples).shape[0]
    summ = segmentation_summaries_pallas_async(
        samples, n_samples, scale, shift, var, params, interpret=interpret)
    from ..utils.syncstats import timed_fetch
    return timed_fetch(summ)[:B]
