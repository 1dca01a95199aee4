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
