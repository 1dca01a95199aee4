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


@functools.partial(jax.jit, static_argnames=("R", "N", "C", "n_iter"))
def _train_gm_wire(wire, R, N, C, n_iter):
    o = 0
    levels = wire[o:o + R * N].reshape(R, N); o += R * N
    svar = wire[o:o + R * N].reshape(R, N); o += R * N
    mask = wire[o:o + R * N].reshape(R, N) > 0.5; o += R * N
    logw0 = wire[o:o + R * C].reshape(R, C); o += R * C
    mu0 = wire[o:o + R * C].reshape(R, C); o += R * C
    sd0 = wire[o:o + R * C].reshape(R, C)
    return train_gaussian_mixture_batched(levels, svar, mask, logw0,
                                          mu0, sd0, n_iter=n_iter)


def train_gaussian_mixture_packed(levels, scaled_read_var, mask,
                                  log_weights0, means0, stdvs0,
                                  n_iter: int = 10) -> MixtureFit:
    """train_gaussian_mixture_batched with all six inputs riding ONE
    host->device transfer (each separate array pays a relay round trip
    on remotely-attached chips)."""
    import numpy as np
    R, N = np.shape(levels)
    C = np.shape(means0)[1]
    wire = np.concatenate([
        np.asarray(levels, np.float32).ravel(),
        np.asarray(scaled_read_var, np.float32).ravel(),
        np.asarray(mask, np.float32).ravel(),
        np.asarray(log_weights0, np.float32).ravel(),
        np.asarray(means0, np.float32).ravel(),
        np.asarray(stdvs0, np.float32).ravel()])
    return _train_gm_wire(jnp.asarray(wire), R, N, C, n_iter)


class InvGaussFit(NamedTuple):
    sd_means: jnp.ndarray      # [R, C] eta (IG mean of event stdv)
    sd_lambdas: jnp.ndarray    # [R, C] shape (held fixed, as the reference)
    sd_stdvs: jnp.ndarray      # [R, C] sqrt(eta^3 / lambda)


def log_invgauss_pdf(x, log_x, eta, lam, log_lam):
    """log inverse-Gaussian density f(x; eta, lambda) =
    sqrt(lambda / (2 pi x^3)) * exp(-lambda (x - eta)^2 / (2 eta^2 x))."""
    d = x - eta
    return 0.5 * (log_lam - jnp.log(2.0 * jnp.pi) - 3.0 * log_x) \
        - lam * d * d / (2.0 * eta * eta * x)


@functools.partial(jax.jit, static_argnames=("n_iter",))
def train_invgaussian_mixture_batched(level_means, level_stdvs,
                                      scaled_read_var, var_sd_ratio, mask,
                                      log_weights0, means0, stdvs0,
                                      sd_means0, sd_lambdas0,
                                      n_iter: int = 10) -> InvGaussFit:
    """Inverse-Gaussian mixture update of the per-kmer event-noise model,
    batched over [R] kmers x [N] events x [C] components.

    Rebuild of train_invgaussian_mixture (reference:
    src/training_core.cpp:143-270 — the algorithm documented in its
    disabled body; the path is `#if 0`-dead upstream and
    `log_invgauss_pdf` has no surviving definition there, so the density
    is the standard IG log-pdf the call signature implies):

      1. gaussian responsibilities g[i,j] over level_mean, computed ONCE
         from the input mixture (weights + level params);
      2. per iteration: IG pdfs over level_stdv with per-event shape
         lambda'_ij = lambda_j * var_sd_ratio_i, responsibilities
         ig[i,j] proportional to g[i,j] * IG(x_i; eta_j, lambda'_ij), and
         the eta update  eta_j := sum_i(ig*lambda'*x) / sum_i(ig*lambda');
      3. lambda_j is held fixed and sd_stdv is re-derived as
         sqrt(eta^3/lambda) (poremodel.h update_sd_stdv semantics).

    Args:
      level_means:  [R, N] f32 fully-scaled event levels
      level_stdvs:  [R, N] f32 scaled event stdvs (IG observations)
      scaled_read_var: [R, N] f32 read var/scale (gaussian component widths)
      var_sd_ratio: [R, N] f32 read var_sd / scale_sd per event
      mask:         [R, N] bool event validity
      log_weights0, means0, stdvs0: [R, C] input gaussian mixture
      sd_means0, sd_lambdas0: [R, C] input IG noise parameters
    """
    x_mu = jnp.asarray(level_means, jnp.float32)[:, :, None]
    x_sd = jnp.asarray(level_stdvs, jnp.float32)[:, :, None]
    log_x_sd = jnp.log(jnp.maximum(x_sd, 1e-12))
    svar = jnp.asarray(scaled_read_var, jnp.float32)[:, :, None]
    ratio = jnp.asarray(var_sd_ratio, jnp.float32)[:, :, None]
    m = jnp.asarray(mask)[:, :, None]

    # gaussian responsibilities (computed once, training_core.cpp:169-196)
    mu0 = jnp.asarray(means0, jnp.float32)[:, None, :]
    comp_sd = jnp.asarray(stdvs0, jnp.float32)[:, None, :] * svar
    z = (x_mu - mu0) / comp_sd
    log_g = jnp.asarray(log_weights0, jnp.float32)[:, None, :] \
        - 0.5 * z * z - jnp.log(comp_sd) - 0.9189385332046727
    log_g = log_g - jax.scipy.special.logsumexp(log_g, axis=2, keepdims=True)
    log_g = jnp.where(m, log_g, -jnp.inf)

    lam0 = jnp.asarray(sd_lambdas0, jnp.float32)
    log_lam_ij = jnp.log(lam0)[:, None, :] + jnp.log(ratio)  # [R, N, C]
    lam_ij = lam0[:, None, :] * ratio

    def step(eta, _):
        log_pdf = log_invgauss_pdf(x_sd, log_x_sd, eta[:, None, :],
                                   lam_ij, log_lam_ij)
        log_num = log_g + jnp.where(m, log_pdf, 0.0)
        log_den = jax.scipy.special.logsumexp(log_num, axis=2, keepdims=True)
        ig = jnp.where(m, jnp.exp(log_num - log_den), 0.0)
        wl = ig * lam_ij
        num = (wl * x_sd).sum(axis=1)
        den = wl.sum(axis=1)
        new_eta = num / jnp.maximum(den, 1e-30)
        return jnp.where(den > 1e-30, new_eta, eta), None

    eta, _ = jax.lax.scan(step, jnp.asarray(sd_means0, jnp.float32),
                          None, length=n_iter)
    sd_stdv = jnp.sqrt(eta ** 3 / lam0)
    return InvGaussFit(sd_means=eta, sd_lambdas=lam0, sd_stdvs=sd_stdv)
