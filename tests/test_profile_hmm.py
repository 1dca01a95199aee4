"""Profile HMM kernel vs cell-by-cell NumPy reference port."""

import numpy as np
import pytest

from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.models.squiggle import SquiggleScalings
from nanopolish_tpu.ops.profile_hmm import (
    HAF_ALLOW_POST_CLIP,
    HAF_ALLOW_PRE_CLIP,
    profile_hmm_forward,
    profile_hmm_reference,
    profile_hmm_viterbi,
    viterbi_backtrack,
)
from nanopolish_tpu.utils.synthetic import random_sequence, synthetic_events


@pytest.fixture(scope="module")
def model():
    return PoreModelSet().get_model("r9.4_450bps", "nucleotide", "template", 6)


def _window_case(rng, model, n_bases=80, events_per_base=1.7,
                 shift=4.0, scale=1.03, var=1.05):
    seq = random_sequence(rng, n_bases + model.k - 1)
    sc = SquiggleScalings.from4(shift, scale, 0.0, var)
    ev = synthetic_events(rng, seq, model, sc, events_per_base=events_per_base)
    ranks = model.alphabet.seq_to_kmer_ranks(seq, model.k)
    mu = (sc.scale * model.level_mean[ranks] + sc.shift).astype(np.float32)
    sigma = (model.level_stdv[ranks] * sc.var).astype(np.float32)
    log_sigma = np.log(sigma)
    levels = ev.mean.astype(np.float32)   # drift = 0
    epb = len(levels) / len(ranks)
    return levels, mu, sigma, log_sigma, epb


def _pad(cases):
    B = len(cases)
    T = max(len(c[0]) for c in cases)
    K = max(len(c[1]) for c in cases)
    lv = np.zeros((B, T), np.float32)
    mu = np.full((B, K), 100.0, np.float32)
    sg = np.ones((B, K), np.float32)
    ls = np.zeros((B, K), np.float32)
    ne = np.zeros(B, np.int32)
    nk = np.zeros(B, np.int32)
    epb = np.zeros(B, np.float32)
    for i, (l, m, s, lgs, e) in enumerate(cases):
        lv[i, :len(l)] = l
        mu[i, :len(m)] = m
        sg[i, :len(s)] = s
        ls[i, :len(lgs)] = lgs
        ne[i] = len(l)
        nk[i] = len(m)
        epb[i] = e
    return lv, ne, mu, sg, ls, nk, epb


@pytest.mark.parametrize("flags", [0, HAF_ALLOW_PRE_CLIP,
                                   HAF_ALLOW_PRE_CLIP | HAF_ALLOW_POST_CLIP])
def test_forward_matches_reference(model, flags):
    rng = np.random.default_rng(100 + flags)
    cases = [_window_case(rng, model, n_bases=n) for n in (40, 60, 25)]
    lv, ne, mu, sg, ls, nk, epb = _pad(cases)
    got = np.asarray(profile_hmm_forward(lv, ne, mu, sg, ls, nk, epb, flags=flags))
    for i, c in enumerate(cases):
        want = profile_hmm_reference(c[0], c[1], c[2], c[3], c[4],
                                     flags=flags, viterbi=False)
        assert got[i] == pytest.approx(want, rel=5e-5, abs=5e-3), f"case {i}"


@pytest.mark.parametrize("flags", [0, HAF_ALLOW_PRE_CLIP | HAF_ALLOW_POST_CLIP])
def test_viterbi_matches_reference(model, flags):
    rng = np.random.default_rng(7 + flags)
    cases = [_window_case(rng, model, n_bases=n) for n in (40, 30)]
    lv, ne, mu, sg, ls, nk, epb = _pad(cases)
    got, _ = profile_hmm_viterbi(lv, ne, mu, sg, ls, nk, epb, flags=flags,
                                 with_trace=False)
    got = np.asarray(got)
    for i, c in enumerate(cases):
        want = profile_hmm_reference(c[0], c[1], c[2], c[3], c[4],
                                     flags=flags, viterbi=True)
        assert got[i] == pytest.approx(want, rel=5e-5, abs=5e-3), f"case {i}"


def test_viterbi_alignment_structure(model):
    rng = np.random.default_rng(21)
    cases = [_window_case(rng, model, n_bases=50, events_per_base=2.0)]
    lv, ne, mu, sg, ls, nk, epb = _pad(cases)
    score, traces = profile_hmm_viterbi(lv, ne, mu, sg, ls, nk, epb, flags=0)
    aligns = viterbi_backtrack(traces, ne, nk)
    evs, kms, chars = aligns[0]
    assert len(evs) > 0
    # path must end at the last kmer in the M state
    assert kms[-1] == nk[0] - 1
    assert chars[-1] == "M"
    # kmer indices never decrease; event offsets never decrease
    assert (np.diff(kms) >= 0).all()
    assert (np.diff(evs) >= 0).all()
    # every event (except possibly soft-clipped prefix) appears
    m_or_b = np.array([c in "MB" for c in chars])
    assert np.unique(evs[m_or_b]).size == evs[m_or_b][-1] - evs[m_or_b][0] + 1
    # mostly matches on clean data
    assert np.mean([c == "M" for c in chars]) > 0.7


def test_forward_discriminates_sequences(model):
    # the Forward score of the true sequence beats a random alternative
    rng = np.random.default_rng(33)
    c_true = _window_case(rng, model, n_bases=60)
    seq_alt = random_sequence(rng, 60 + model.k - 1)
    ranks_alt = model.alphabet.seq_to_kmer_ranks(seq_alt, model.k)
    sc = SquiggleScalings.from4(4.0, 1.03, 0.0, 1.05)
    mu_a = (sc.scale * model.level_mean[ranks_alt] + sc.shift).astype(np.float32)
    sg_a = (model.level_stdv[ranks_alt] * sc.var).astype(np.float32)
    c_alt = (c_true[0], mu_a, sg_a, np.log(sg_a), c_true[4])
    lv, ne, mu, sg, ls, nk, epb = _pad([c_true, c_alt])
    got = np.asarray(profile_hmm_forward(lv, ne, mu, sg, ls, nk, epb, flags=0))
    assert got[0] > got[1] + 20.0


def test_forward_logsum_table_mode(model, monkeypatch):
    """NPT_LOGSUM=table: the scan and the NumPy port share the reference's
    quantized-table semantics (logsum.h) and sequential grouping, so they
    agree with each other; the quantization shifts scores measurably but
    boundedly vs exact logaddexp."""
    rng = np.random.default_rng(321)
    cases = [_window_case(rng, model, n_bases=n) for n in (40, 30)]
    lv, ne, mu, sg, ls, nk, epb = _pad(cases)
    flags = HAF_ALLOW_PRE_CLIP | HAF_ALLOW_POST_CLIP

    exact = np.asarray(profile_hmm_forward(lv, ne, mu, sg, ls, nk, epb,
                                           flags=flags)).copy()
    monkeypatch.setenv("NPT_LOGSUM", "table")
    table = np.asarray(profile_hmm_forward(lv, ne, mu, sg, ls, nk, epb,
                                           flags=flags))
    for i, c in enumerate(cases):
        want = profile_hmm_reference(c[0], c[1], c[2], c[3], c[4],
                                     flags=flags, viterbi=False)
        assert table[i] == pytest.approx(want, rel=5e-5, abs=5e-3), f"case {i}"
    # quantization changes the result (it's a different numeric policy)...
    assert np.max(np.abs(table - exact)) > 1e-5
    # ...but only within the table's resolution accumulated over the DP
    assert np.all(np.abs(table - exact) < 0.5)
