"""Adaptive banded event alignment: JAX kernel vs NumPy reference port."""

import numpy as np
import pytest

from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.models.squiggle import SquiggleScalings
from nanopolish_tpu.ops.banded_align import (
    banded_align_batch,
    banded_align_reference,
    base_to_event_map_from_pairs,
)
from nanopolish_tpu.utils.synthetic import random_sequence, synthetic_events


def _make_case(rng, model, seq_len, events_per_base=1.8, shift=5.0, scale=1.02):
    seq = random_sequence(rng, seq_len)
    sc = SquiggleScalings.from4(shift, scale, 0.0, 1.0)
    ev = synthetic_events(rng, seq, model, sc, events_per_base=events_per_base)
    ranks = model.alphabet.seq_to_kmer_ranks(seq, model.k)
    # MoM-style scaled gaussians with the TRUE scalings (drift 0, var 1)
    mu = (scale * model.level_mean[ranks] + shift).astype(np.float32)
    sigma = model.level_stdv[ranks].astype(np.float32)
    log_sigma = np.log(sigma)
    return seq, ev.mean, mu, sigma, log_sigma


@pytest.fixture(scope="module")
def model():
    return PoreModelSet().get_model("r9.4_450bps", "nucleotide", "template", 6)


def _pad_batch(cases):
    T = max(len(c[1]) for c in cases)
    K = max(len(c[2]) for c in cases)
    B = len(cases)
    ev = np.zeros((B, T), np.float32)
    mu = np.zeros((B, K), np.float32)
    sg = np.ones((B, K), np.float32)
    ls = np.zeros((B, K), np.float32)
    ne = np.zeros(B, np.int32)
    nk = np.zeros(B, np.int32)
    for i, (_, e, m, s, l) in enumerate(cases):
        ev[i, :len(e)] = e
        mu[i, :len(m)] = m
        sg[i, :len(s)] = s
        ls[i, :len(l)] = l
        ne[i] = len(e)
        nk[i] = len(m)
    return ev, ne, mu, sg, ls, nk


def test_kernel_matches_reference_port(model):
    rng = np.random.default_rng(123)
    cases = [_make_case(rng, model, n) for n in (200, 350, 280)]
    ev, ne, mu, sg, ls, nk = _pad_batch(cases)
    res = banded_align_batch(ev, ne, mu, sg, ls, nk)

    for i, c in enumerate(cases):
        pairs, stats = banded_align_reference(c[1], c[2], c[3], c[4])
        assert not stats["failed"], f"reference port failed on case {i}: {stats}"
        assert not bool(res.failed[i]), f"kernel failed on case {i}"
        b2e_ref = base_to_event_map_from_pairs(pairs, nk[i])
        got_start = np.asarray(res.b2e_start[i][: nk[i]])
        got_stop = np.asarray(res.b2e_stop[i][: nk[i]])
        np.testing.assert_array_equal(got_start, b2e_ref[:, 0])
        np.testing.assert_array_equal(got_stop, b2e_ref[:, 1])
        assert abs(float(res.avg_log_emission[i]) - stats["avg_log_emission"]) < 2e-3
        assert int(res.max_gap[i]) == stats["max_gap"]
        assert int(res.n_pairs[i]) == stats["n_pairs"]
        assert bool(res.spanned[i]) == stats["spanned"]


def test_alignment_is_sane(model):
    rng = np.random.default_rng(7)
    cases = [_make_case(rng, model, 300, events_per_base=2.0)]
    ev, ne, mu, sg, ls, nk = _pad_batch(cases)
    res = banded_align_batch(ev, ne, mu, sg, ls, nk)
    assert not bool(res.failed[0])
    start = np.asarray(res.b2e_start[0][: nk[0]])
    stop = np.asarray(res.b2e_stop[0][: nk[0]])
    mapped = start >= 0
    # nearly all kmers get events on clean synthetic data
    assert mapped.mean() > 0.9
    # event ranges are monotonically non-decreasing over kmers
    s = start[mapped]
    assert (np.diff(s) >= 0).all()
    assert (stop[mapped] >= start[mapped]).all()
    # avg emission is good on clean data
    assert float(res.avg_log_emission[0]) > -3.0


def test_garbage_read_fails_qc(model):
    rng = np.random.default_rng(9)
    seq, ev_mean, mu, sg, ls = _make_case(rng, model, 250)
    # white-noise events unrelated to the sequence
    noise = rng.uniform(0, 200, size=len(ev_mean)).astype(np.float32)
    cases = [(seq, noise, mu, sg, ls)]
    evb, ne, mub, sgb, lsb, nk = _pad_batch(cases)
    res = banded_align_batch(evb, ne, mub, sgb, lsb, nk)
    assert bool(res.failed[0])
    assert (np.asarray(res.b2e_start[0]) == -1).all()


def test_padded_batch_mixed_lengths(model):
    # padding must not perturb the per-read results: compare a read aligned
    # solo (minimal padding) vs inside a heavily padded batch
    rng = np.random.default_rng(31)
    case = _make_case(rng, model, 220)
    big = _make_case(rng, model, 500)
    solo = _pad_batch([case])
    mixed = _pad_batch([case, big])
    r1 = banded_align_batch(*solo)
    r2 = banded_align_batch(*mixed)
    k = solo[5][0]
    np.testing.assert_array_equal(
        np.asarray(r1.b2e_start[0][:k]), np.asarray(r2.b2e_start[0][:k]))
    np.testing.assert_array_equal(
        np.asarray(r1.b2e_stop[0][:k]), np.asarray(r2.b2e_stop[0][:k]))
    assert abs(float(r1.avg_log_emission[0]) - float(r2.avg_log_emission[0])) < 1e-5
