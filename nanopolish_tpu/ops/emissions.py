"""Emission distributions for the HMMs, as batched JAX ops.

Rebuild of reference src/hmm/nanopolish_emissions.h.  All functions are
vectorized over arbitrary leading batch dims and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

LOG_INV_SQRT_2PI = float(np.log(0.3989422804014327))

# constant background emission (nanopolish_emissions.h:98-103)
LOG_P_BACKGROUND = -3.0


def log_normal_pdf(x, mean, stdv, log_stdv):
    """log N(x; mean, stdv) with a precomputed log stdv
    (nanopolish_emissions.h:51-55)."""
    a = (x - mean) / stdv
    return LOG_INV_SQRT_2PI - log_stdv + (-0.5 * a * a)


def scaled_gaussian(level_mean, level_stdv, level_log_stdv, shift, scale, var, log_var):
    """Fold per-read scalings into model Gaussians
    (nanopolish_squiggle_read.h:216-226): mean' = scale*mu + shift,
    stdv' = sigma * var."""
    mean = scale * level_mean + shift
    stdv = level_stdv * var
    log_stdv = level_log_stdv + log_var
    return mean, stdv, log_stdv


def log_probability_match_r9(drift_scaled_level, level_mean, level_stdv,
                             level_log_stdv, shift, scale, var, log_var):
    """log P(event level | kmer), r9 emission (nanopolish_emissions.h:57-68).

    ``drift_scaled_level`` is event_mean - t*drift; the model gaussian is
    scaled by shift/scale/var.
    """
    mean, stdv, log_stdv = scaled_gaussian(
        level_mean, level_stdv, level_log_stdv, shift, scale, var, log_var)
    return log_normal_pdf(drift_scaled_level, mean, stdv, log_stdv)


def z_score(drift_scaled_level, level_mean, level_stdv, shift, scale, var):
    """Standardized level vs the scaled model (nanopolish_emissions.h:32-41)."""
    mean = scale * level_mean + shift
    stdv = level_stdv * var
    return (drift_scaled_level - mean) / stdv


def log_probability_background(shape=()):
    return jnp.full(shape, LOG_P_BACKGROUND, dtype=jnp.float32)
