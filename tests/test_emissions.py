"""Emission kernel tests, incl. the reference's synthetic-read scaling spec
(src/test/nanopolish_test.cpp:277-325): events sampled from the scaled model
Gaussians must score higher than under wrong scalings, and z-scores of clean
events must be ~N(0,1)."""

import numpy as np

from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.models.squiggle import SquiggleScalings, T_IDX
from nanopolish_tpu.ops.emissions import (
    log_normal_pdf,
    log_probability_match_r9,
    z_score,
)
from nanopolish_tpu.utils.synthetic import synthetic_read


def test_log_normal_pdf_matches_scipy():
    from scipy.stats import norm
    x = np.linspace(-5, 5, 31).astype(np.float32)
    got = np.asarray(log_normal_pdf(x, 1.0, 2.0, np.log(2.0)))
    want = norm.logpdf(x, 1.0, 2.0)
    assert np.allclose(got, want, atol=1e-5)


def test_gaussian_pdf_reference_value():
    # nanopolish_test.cpp:267-275: N(2; mean=4, stdv=2)
    lp = float(log_normal_pdf(np.float32(2.0), 4.0, 2.0, np.log(2.0)))
    assert abs(np.exp(lp) - 0.12098536) < 1e-6


def test_scaled_emission_recovers_truth():
    rng = np.random.default_rng(42)
    model = PoreModelSet().get_model("r9.4_450bps", "nucleotide", "template", 6)
    scalings = SquiggleScalings.from4(shift=5.0, scale=1.1, drift=0.01, var=1.05)
    read = synthetic_read(rng, model, seq_length=400, scalings=scalings,
                          events_per_base=1.0)
    ranks = model.alphabet.seq_to_kmer_ranks(read.read_sequence, model.k)
    n = min(len(ranks), len(read.events[T_IDX]))
    ev_idx = np.arange(n)
    level = np.array([read.get_drift_scaled_level(i, T_IDX) for i in ev_idx])
    r = ranks[:n]

    z = np.asarray(z_score(level, model.level_mean[r], model.level_stdv[r],
                           scalings.shift, scalings.scale, scalings.var))
    # with events_per_base=1.0 every event aligns to its own kmer
    assert abs(np.mean(z)) < 0.15
    assert abs(np.std(z) - 1.0) < 0.15

    lp_true = np.asarray(log_probability_match_r9(
        level, model.level_mean[r], model.level_stdv[r], model.level_log_stdv[r],
        scalings.shift, scalings.scale, scalings.var, np.log(scalings.var)))
    lp_wrong = np.asarray(log_probability_match_r9(
        level, model.level_mean[r], model.level_stdv[r], model.level_log_stdv[r],
        scalings.shift + 20.0, scalings.scale, scalings.var, np.log(scalings.var)))
    assert lp_true.mean() > lp_wrong.mean() + 5.0
    assert lp_true.mean() > -3.0  # clean events score well
