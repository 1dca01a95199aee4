"""Gaussian mixture EM recovery (ported behavior spec from
src/test/nanopolish_test.cpp:457-574: sample a known 2-component mixture
with per-read variance scaling, train, recover weights/means within 5%)."""

import numpy as np

from nanopolish_tpu.ops.mixture_em import train_gaussian_mixture_batched


def test_em_recovers_two_component_mixture():
    rng = np.random.default_rng(17)
    n = 1000
    true_w = [0.6, 0.4]
    true_mu = [80.0, 95.0]
    true_sd = [2.0, 3.0]
    comp = rng.choice(2, size=n, p=true_w)
    read_var = rng.uniform(0.9, 1.2, size=n)      # per-read variance factors
    levels = rng.normal(np.take(true_mu, comp),
                        np.take(true_sd, comp) * read_var).astype(np.float32)

    fit = train_gaussian_mixture_batched(
        levels[None, :], read_var[None, :].astype(np.float32),
        np.ones((1, n), bool),
        np.log([[0.5, 0.5]]).astype(np.float32),
        np.array([[78.0, 97.0]], np.float32),
        np.array([[3.0, 3.0]], np.float32))

    w = np.exp(np.asarray(fit.log_weights)[0])
    mu = np.asarray(fit.means)[0]
    sd = np.asarray(fit.stdvs)[0]
    assert abs(w[0] - true_w[0]) < 0.05
    assert abs(mu[0] - true_mu[0]) / true_mu[0] < 0.05
    assert abs(mu[1] - true_mu[1]) / true_mu[1] < 0.05
    assert abs(sd[0] - true_sd[0]) / true_sd[0] < 0.25
    assert abs(sd[1] - true_sd[1]) / true_sd[1] < 0.25


def test_em_batched_independent_kmers():
    """Two kmers trained simultaneously stay independent."""
    rng = np.random.default_rng(5)
    n = 400
    l1 = rng.normal(70.0, 1.5, n).astype(np.float32)
    l2 = rng.normal(110.0, 2.5, n).astype(np.float32)
    levels = np.stack([l1, l2])
    svar = np.ones((2, n), np.float32)
    mask = np.ones((2, n), bool)
    logw = np.zeros((2, 2), np.float32)
    logw[:, 1] = -np.inf                  # single component
    mu0 = np.array([[72.0, 1.0], [108.0, 1.0]], np.float32)
    sd0 = np.array([[2.0, 1.0], [2.0, 1.0]], np.float32)
    fit = train_gaussian_mixture_batched(levels, svar, mask, logw, mu0, sd0)
    mu = np.asarray(fit.means)
    assert abs(mu[0, 0] - 70.0) < 0.5
    assert abs(mu[1, 0] - 110.0) < 0.5


def test_invgauss_em_recovers_eta():
    """IG mixture update (training_core.cpp:143-270 semantics): sample
    event stdvs from per-component inverse gaussians with per-event shape
    scaling, run the eta update, recover sd_mean within 5% — the
    invgauss analogue of the reference's mixture recovery test
    (nanopolish_test.cpp:457-574)."""
    from scipy.stats import invgauss as scipy_ig

    from nanopolish_tpu.ops.mixture_em import (
        log_invgauss_pdf, train_invgaussian_mixture_batched)

    rng = np.random.default_rng(23)
    n = 2000
    true_w = [0.55, 0.45]
    true_mu = [82.0, 100.0]
    true_sd = [2.0, 2.5]
    true_eta = [1.3, 2.2]
    lam = [24.0, 24.0]
    comp = rng.choice(2, size=n, p=true_w)
    ratio = rng.uniform(0.8, 1.25, size=n)
    level_means = rng.normal(np.take(true_mu, comp),
                             np.take(true_sd, comp)).astype(np.float32)
    eta_i = np.take(true_eta, comp)
    lam_i = np.take(lam, comp) * ratio
    # IG(eta, lambda) == scipy invgauss(mu=eta/lambda, scale=lambda)
    level_stdvs = scipy_ig.rvs(eta_i / lam_i, scale=lam_i,
                               random_state=rng).astype(np.float32)

    fit = train_invgaussian_mixture_batched(
        level_means[None, :], level_stdvs[None, :],
        np.ones((1, n), np.float32), ratio[None, :].astype(np.float32),
        np.ones((1, n), bool),
        np.log([true_w]).astype(np.float32),
        np.array([true_mu], np.float32), np.array([true_sd], np.float32),
        np.array([[1.0, 1.0]], np.float32),        # eta init far from truth
        np.array([lam], np.float32))

    eta = np.asarray(fit.sd_means)[0]
    assert abs(eta[0] - true_eta[0]) / true_eta[0] < 0.05
    assert abs(eta[1] - true_eta[1]) / true_eta[1] < 0.05
    # lambda held fixed; sd_stdv = sqrt(eta^3/lambda) (poremodel.h:58-60)
    np.testing.assert_allclose(np.asarray(fit.sd_lambdas)[0], lam)
    np.testing.assert_allclose(np.asarray(fit.sd_stdvs)[0],
                               np.sqrt(eta ** 3 / np.array(lam)), rtol=1e-5)
    # density sanity: integrates features of scipy's logpdf
    x = np.linspace(0.2, 5.0, 50).astype(np.float32)
    ours = np.asarray(log_invgauss_pdf(x, np.log(x), 1.5, 20.0,
                                       np.log(20.0)))
    theirs = scipy_ig.logpdf(x, 1.5 / 20.0, scale=20.0)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
