"""Per-read scaling estimation: method-of-moments init + weighted
least-squares recalibration, batched over reads.

Specs:
  * estimate_scalings_using_mom (reference: src/nanopolish_raw_loader.cpp:17-60)
  * recalibrate_model (reference: src/nanopolish_methyltrain.cpp:204-307) —
    the Eigen normal-equation solve becomes a batched [B,3,3] jnp solve.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

MIN_EVENTS_TO_RESCALE = 200  # methyltrain.cpp:242


def estimate_scalings_mom(event_mean, n_events, kmer_level_mean, n_kmers):
    """Batched method-of-moments shift/scale (raw_loader.cpp:17-60).

    Args:
      event_mean: [B, T] f32 padded event levels
      n_events:   [B] i32
      kmer_level_mean: [B, K] f32 padded model levels of the read's kmers
      n_kmers:    [B] i32
    Returns:
      shift [B], scale [B] (drift=0, var=1 implied)
    """
    event_mean = jnp.asarray(event_mean, jnp.float64) if False else jnp.asarray(event_mean, jnp.float32)
    T = event_mean.shape[1]
    K = kmer_level_mean.shape[1]
    ev_mask = jnp.arange(T)[None, :] < n_events[:, None]
    km_mask = jnp.arange(K)[None, :] < n_kmers[:, None]
    nev = n_events.astype(jnp.float32)
    nkm = n_kmers.astype(jnp.float32)

    event_sum = jnp.sum(jnp.where(ev_mask, event_mean, 0.0), axis=1)
    kmer_sum = jnp.sum(jnp.where(km_mask, kmer_level_mean, 0.0), axis=1)
    kmer_sq_sum = jnp.sum(jnp.where(km_mask, kmer_level_mean ** 2, 0.0), axis=1)
    shift = event_sum / nev - kmer_sum / nkm
    ev_sq_sum = jnp.sum(
        jnp.where(ev_mask, (event_mean - shift[:, None]) ** 2, 0.0), axis=1)
    scale = (ev_sq_sum / nev) / (kmer_sq_sum / nkm)
    return shift, scale


class RecalibrationResult(NamedTuple):
    shift: jnp.ndarray       # [B]
    scale: jnp.ndarray       # [B]
    drift: jnp.ndarray       # [B]
    var: jnp.ndarray         # [B]
    recalibrated: jnp.ndarray  # [B] bool (>= 200 usable events)


def recalibrate(levels, times, model_mean, model_stdv, mask,
                scale_var: bool = True, scale_drift: bool = False) -> RecalibrationResult:
    """Batched weighted least squares: level ~ shift + scale*mu (+ drift*t).

    Args:
      levels:     [B, N] f32 unscaled event levels ('M'-state aligned events)
      times:      [B, N] f32 event times (only used when scale_drift)
      model_mean: [B, N] f32 model level_mean per aligned event
      model_stdv: [B, N] f32 model level_stdv per aligned event
      mask:       [B, N] bool valid entries
    Matches methyltrain.cpp:246-303 (normal equations, var = sqrt of mean
    squared standardized residual).
    """
    levels = jnp.asarray(levels, jnp.float32)
    model_mean = jnp.asarray(model_mean, jnp.float32)
    model_stdv = jnp.asarray(model_stdv, jnp.float32)
    maskf = jnp.asarray(mask, jnp.float32)

    inv_var = jnp.where(mask, 1.0 / (model_stdv * model_stdv), 0.0)
    mu = model_mean
    e = levels
    n = 3 if scale_drift else 2

    ones = maskf
    if scale_drift:
        t = jnp.asarray(times, jnp.float32)
        cols = [ones, mu, t]
    else:
        cols = [ones, mu]

    # normal equations A x = b with per-row weight 1/sigma^2
    A = jnp.stack([
        jnp.stack([jnp.sum(ci * cj * inv_var, axis=1) for cj in cols], axis=-1)
        for ci in cols], axis=-2)                                   # [B, n, n]
    b = jnp.stack([jnp.sum(ci * e * inv_var, axis=1) for ci in cols], axis=-1)

    count = jnp.sum(mask, axis=1)
    ok = count >= MIN_EVENTS_TO_RESCALE
    # guard singular systems for degenerate/padded reads
    A_safe = A + (1e-6 * (~ok)[:, None, None]) * jnp.eye(n)[None]
    x = jnp.linalg.solve(A_safe, b[..., None])[..., 0]              # [B, n]

    shift = x[:, 0]
    scale = x[:, 1]
    drift = x[:, 2] if scale_drift else jnp.zeros_like(shift)

    if scale_var:
        yi = e - shift[:, None] - scale[:, None] * mu
        if scale_drift:
            yi = yi - drift[:, None] * t
        var = jnp.sum(jnp.where(mask, yi * yi / (model_stdv * model_stdv), 0.0), axis=1)
        var = jnp.sqrt(var / jnp.maximum(count, 1))
    else:
        var = jnp.ones_like(shift)

    return RecalibrationResult(shift=shift, scale=scale, drift=drift, var=var,
                               recalibrated=ok)


def mstate_mask_from_b2e(b2e_start, b2e_stop, kmer_ranks, n_kmers, max_events):
    """Expand a base->event map into per-event aligned rows with 'M'-state
    flags for recalibration (spec: get_eventalignment_for_1d_basecalls,
    squiggle_read.cpp:340-391 — 'M' iff the kmer rank differs from the
    previous kmer's rank; only 'M' rows feed recalibration).

    Host-side numpy; returns (event_idx [N], model_rank [N]) arrays of the
    'M' events for ONE read.
    """
    starts = b2e_start[:n_kmers]
    stops = b2e_stop[:n_kmers]
    ranks = kmer_ranks[:n_kmers]
    rows_ev = []
    rows_rank = []
    prev_rank = -1
    for ki in range(n_kmers):
        if starts[ki] == -1:
            continue
        for ei in range(int(starts[ki]), int(stops[ki]) + 1):
            if ranks[ki] != prev_rank:
                rows_ev.append(ei)
                rows_rank.append(int(ranks[ki]))
            prev_rank = int(ranks[ki])
    return np.asarray(rows_ev, np.int64), np.asarray(rows_rank, np.int64)


def mstate_events_batch(b2e_start, b2e_stop, kmer_ranks, n_kmers):
    """Vectorized batched 'M'-event extraction.

    For each kmer with events, the 'M' event is the FIRST event of the kmer
    (b2e_start), taken only when the kmer's rank differs from the previous
    kmer's rank (squiggle_read.cpp:384).  Subsequent events of the same kmer
    are 'E' and never counted.  Equivalent to mstate_mask_from_b2e because
    within one kmer only the first event can be 'M'.

    Note: if the previous kmer has the same rank, the first event of this
    kmer is 'E' too — handled by comparing with the previous *mapped* kmer's
    rank.  jnp ops, so usable both eagerly and under jit/shard_map.

    Args: b2e_start/stop [B, K] i32, kmer_ranks [B, K] i32, n_kmers [B]
    Returns: mask [B, K] bool ('M' kmers), event_idx = b2e_start
    """
    b2e_start = jnp.asarray(b2e_start)
    kmer_ranks = jnp.asarray(kmer_ranks)
    n_kmers = jnp.asarray(n_kmers)
    B, K = b2e_start.shape
    kpos = jnp.arange(K, dtype=jnp.int32)[None, :]
    valid = (b2e_start >= 0) & (kpos < n_kmers[:, None])
    # previous mapped kmer's rank: forward-fill ranks over valid positions
    idx = jnp.where(valid, kpos, -1)
    ff = jax.lax.cummax(idx, axis=1)                      # last valid pos <= k
    prev_ff = jnp.concatenate([jnp.full((B, 1), -1, ff.dtype), ff[:, :-1]], axis=1)
    prev_rank = jnp.where(prev_ff >= 0,
                          jnp.take_along_axis(kmer_ranks, jnp.maximum(prev_ff, 0), axis=1),
                          -1)
    m_mask = valid & (kmer_ranks != prev_rank)
    return m_mask
