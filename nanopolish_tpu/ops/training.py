"""Model-training ops: per-kmer sufficient statistics + Gaussian updates.

Behavioral spec: methyltrain's per-round accumulation of per-kmer event
observations followed by a per-kmer Gaussian (mixture) update
(reference: src/nanopolish_methyltrain.cpp:329-474, :589-719 and
src/training_core.cpp:13-135).

TPU design: instead of reservoir-sampling raw events per kmer into host
vectors (the reference's `omp critical` block, methyltrain.cpp:456-462),
each device scatter-adds weighted moment sums keyed by kmer rank —
`psum` over the data mesh axis then yields global statistics, and the
M-step is a closed-form elementwise update over the (shardable) kmer table.
Single-Gaussian updates use exact moments; the 2-component methylation
mixture EM (training_core.cpp) iterates responsibility-weighted moments and
is implemented in apps/methyltrain on top of these primitives.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# event filters (methyltrain.cpp:450-454)
MIN_EVENT_DURATION = 0.002
MIN_LEVEL = 1.0


class KmerMoments(NamedTuple):
    """Weighted moment sums per kmer rank, the cross-device payload."""

    n: jnp.ndarray    # [R] f32  sum of weights
    x: jnp.ndarray    # [R] f32  sum of w * level
    x2: jnp.ndarray   # [R] f32  sum of w * level^2


def kmer_moments(ranks, levels, weights, n_ranks: int) -> KmerMoments:
    """Scatter-add weighted level moments by kmer rank.

    Args:
      ranks:   [...] int32 kmer ranks (invalid entries may be any value)
      levels:  [...] f32 fully-scaled event levels
      weights: [...] f32 responsibility/mask weights (0 for invalid)
      n_ranks: static table size (4^k or 5^k)
    """
    r = jnp.clip(jnp.asarray(ranks, jnp.int32).ravel(), 0, n_ranks - 1)
    x = jnp.asarray(levels, jnp.float32).ravel()
    w = jnp.asarray(weights, jnp.float32).ravel()
    x = jnp.where(w > 0, x, 0.0)  # keep NaNs in masked lanes out of the sums
    n = jnp.zeros((n_ranks,), jnp.float32).at[r].add(w)
    wx = jnp.zeros((n_ranks,), jnp.float32).at[r].add(w * x)
    wx2 = jnp.zeros((n_ranks,), jnp.float32).at[r].add(w * x * x)
    return KmerMoments(n=n, x=wx, x2=wx2)


def merge_moments(a: KmerMoments, b: KmerMoments) -> KmerMoments:
    return KmerMoments(n=a.n + b.n, x=a.x + b.x, x2=a.x2 + b.x2)


def psum_moments(m: KmerMoments, axis_name: str) -> KmerMoments:
    """All-reduce moment sums across the data mesh axis."""
    return KmerMoments(*(jax.lax.psum(v, axis_name) for v in m))


def gaussian_update(m: KmerMoments, prior_mean, prior_stdv,
                    min_events: float = 100.0):
    """Closed-form single-Gaussian M-step with a keep-prior fallback.

    Kmers with fewer than `min_events` observations keep the prior model
    (methyltrain.cpp min 100 events/kmer, :146).
    """
    n = jnp.maximum(m.n, 1e-9)
    mean = m.x / n
    var = jnp.maximum(m.x2 / n - mean * mean, 1e-8)
    stdv = jnp.sqrt(var)
    ok = m.n >= min_events
    return (jnp.where(ok, mean, prior_mean),
            jnp.where(ok, stdv, prior_stdv))
