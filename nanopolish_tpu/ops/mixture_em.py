"""Batched Gaussian mixture EM over all kmers at once.

Rebuild of train_gaussian_mixture (reference: src/training_core.cpp:13-135):
per-kmer 1-2 component mixtures with per-read variance scaling folded into
the components, 10 iterations.  The reference loops kmers under OpenMP;
here ALL kmers train simultaneously as one [R, N, C] device program —
the TPU replacement for `#pragma omp parallel for` over 4^k..5^k kmers.

The reference accumulates with multiset-ordered logsum for stability; here
responsibility sums use exact float32 logsumexp / float64 moments, which
agrees to well below the stopping noise of 10-iteration EM.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class MixtureFit(NamedTuple):
    log_weights: jnp.ndarray   # [R, C]
    means: jnp.ndarray         # [R, C]
    stdvs: jnp.ndarray         # [R, C]


@functools.partial(jax.jit, static_argnames=("n_iter",))
def train_gaussian_mixture_batched(levels, scaled_read_var, mask,
                                   log_weights0, means0, stdvs0,
                                   n_iter: int = 10) -> MixtureFit:
    """EM over [R] kmers x [N] events x [C] components.

    Args:
      levels:          [R, N] f32 fully-scaled event levels (pad with 1.0)
      scaled_read_var: [R, N] f32 read var / read scale (pad with 1.0)
      mask:            [R, N] bool event validity
      log_weights0:    [R, C] f32 (-inf disables a component)
      means0, stdvs0:  [R, C] f32 initial component parameters
    """
    x = jnp.asarray(levels, jnp.float32)[:, :, None]          # [R, N, 1]
    svar = jnp.asarray(scaled_read_var, jnp.float32)[:, :, None]
    m = jnp.asarray(mask)[:, :, None]
    mf = m.astype(jnp.float32)

    def step(state, _):
        log_w, mu, sd = state                                  # [R, C]
        comp_sd = sd[:, None, :] * svar                        # [R, N, C]
        z = (x - mu[:, None, :]) / comp_sd
        log_pdf = -0.5 * z * z - jnp.log(comp_sd) \
            - 0.9189385332046727
        log_num = log_w[:, None, :] + log_pdf                  # [R, N, C]
        log_den = jax.scipy.special.logsumexp(log_num, axis=2, keepdims=True)
        resp = jnp.where(m, jnp.exp(log_num - log_den), 0.0)   # [R, N, C]

        n_j = resp.sum(axis=1)                                 # [R, C]
        n_tot = n_j.sum(axis=1, keepdims=True)
        new_log_w = jnp.log(jnp.maximum(n_j, 1e-30)) - \
            jnp.log(jnp.maximum(n_tot, 1e-30))
        new_mu = (resp * x).sum(axis=1) / jnp.maximum(n_j, 1e-30)
        dev = (x - new_mu[:, None, :]) / svar
        new_var = (resp * dev * dev).sum(axis=1) / jnp.maximum(n_j, 1e-30)
        new_sd = jnp.sqrt(jnp.maximum(new_var, 1e-12))
        # disabled components (log_w == -inf) keep their params
        enabled = jnp.isfinite(log_w)
        return (jnp.where(enabled, new_log_w, log_w),
                jnp.where(enabled, new_mu, mu),
                jnp.where(enabled, new_sd, sd)), None

    init = (jnp.asarray(log_weights0, jnp.float32),
            jnp.asarray(means0, jnp.float32),
            jnp.asarray(stdvs0, jnp.float32))
    (log_w, mu, sd), _ = jax.lax.scan(step, init, None, length=n_iter)
    return MixtureFit(log_weights=log_w, means=mu, stdvs=sd)
