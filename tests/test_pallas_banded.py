"""Pallas banded-align kernel vs the NumPy port of the reference algorithm
(src/nanopolish_raw_loader.cpp:77-379).  Runs in interpret mode on the CPU
test mesh; the same kernels compile natively on TPU."""

import numpy as np
import pytest

from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.ops.banded_align import (
    banded_align_reference, base_to_event_map_from_pairs)
from nanopolish_tpu.ops.pallas_banded import banded_align_pallas


def _synthetic(B, K, T, epk=2.1, seed=0, noise=1.0):
    model = PoreModelSet.instance().get_model(
        "r9.4_450bps", "nucleotide", "template", 6)
    rng = np.random.default_rng(seed)
    ranks = rng.integers(0, 4096, size=(B, K)).astype(np.int32)
    mu = model.level_mean[ranks].astype(np.float32)
    sigma = model.level_stdv[ranks].astype(np.float32)
    reps = np.minimum((np.arange(T) / epk).astype(int), K - 1)
    ev = (mu[:, reps] + rng.normal(0, noise, size=(B, T)).astype(np.float32)
          * sigma[:, reps]).astype(np.float32)
    return ev, mu, sigma


@pytest.mark.parametrize("K,T,epk", [(200, 420, 2.1), (600, 1260, 2.1),
                                     (300, 900, 3.0)])
def test_pallas_matches_reference_port(K, T, epk):
    B = 4
    ev, mu, sigma = _synthetic(B, K, T, epk)
    n_events = np.full(B, T, np.int32)
    n_kmers = np.full(B, K, np.int32)
    res = banded_align_pallas(ev, n_events, mu, sigma, np.log(sigma),
                              n_kmers, interpret=True)
    assert not res.failed.any()
    for b in range(B):
        pairs, stats = banded_align_reference(
            ev[b], mu[b], sigma[b], np.log(sigma[b]))
        assert not stats["failed"]
        b2e = base_to_event_map_from_pairs(pairs, K)
        np.testing.assert_array_equal(res.b2e_start[b], b2e[:, 0])
        np.testing.assert_array_equal(res.b2e_stop[b], b2e[:, 1])
        assert abs(res.avg_log_emission[b] - stats["avg_log_emission"]) < 1e-3
        assert res.max_gap[b] == stats["max_gap"]


def test_pallas_ragged_batch():
    """Reads of different lengths in one padded batch."""
    B = 4
    ev, mu, sigma = _synthetic(B, 500, 1100, seed=3)
    n_events = np.array([1100, 700, 900, 1100], np.int32)
    n_kmers = np.array([500, 330, 430, 500], np.int32)
    for b in range(B):
        ev[b, n_events[b]:] = 0.0
        mu[b, n_kmers[b]:] = 0.0
        sigma[b, n_kmers[b]:] = 1.0
    # regenerate consistent events for the short reads
    model = PoreModelSet.instance().get_model(
        "r9.4_450bps", "nucleotide", "template", 6)
    rng = np.random.default_rng(7)
    for b in range(B):
        K, T = int(n_kmers[b]), int(n_events[b])
        reps = np.minimum((np.arange(T) / 2.1).astype(int), K - 1)
        ev[b, :T] = mu[b, reps] + rng.normal(0, 1, T).astype(np.float32) \
            * sigma[b, reps]
    res = banded_align_pallas(ev, n_events, mu, sigma,
                              np.log(np.maximum(sigma, 1e-9)), n_kmers,
                              interpret=True)
    assert not res.failed.any()
    for b in range(B):
        K, T = int(n_kmers[b]), int(n_events[b])
        pairs, stats = banded_align_reference(
            ev[b, :T], mu[b, :K], sigma[b, :K], np.log(sigma[b, :K]))
        b2e = base_to_event_map_from_pairs(pairs, K)
        np.testing.assert_array_equal(res.b2e_start[b, :K], b2e[:, 0])
        np.testing.assert_array_equal(res.b2e_stop[b, :K], b2e[:, 1])


def test_pallas_garbage_read_fails_qc():
    """Pure-noise events must fail the avg-emission QC, as in the
    reference (raw_loader.cpp:365-372)."""
    B = 2
    rng = np.random.default_rng(9)
    K, T = 300, 640
    model = PoreModelSet.instance().get_model(
        "r9.4_450bps", "nucleotide", "template", 6)
    ranks = rng.integers(0, 4096, size=(B, K)).astype(np.int32)
    mu = model.level_mean[ranks].astype(np.float32)
    sigma = model.level_stdv[ranks].astype(np.float32)
    ev = rng.uniform(0, 200, size=(B, T)).astype(np.float32)
    res = banded_align_pallas(ev, np.full(B, T, np.int32), mu, sigma,
                              np.log(sigma), np.full(B, K, np.int32),
                              interpret=True)
    assert res.failed.all()
    assert (res.b2e_start == -1).all()


def test_packed_variant_identical():
    """banded_align_pallas_packed (single-transfer wire format) must be
    numerically identical to the multi-array wrapper."""
    from nanopolish_tpu.ops.pallas_banded import (banded_align_pallas_packed,
                                                  pack_banded_inputs)
    B = 4
    ev, mu, sigma = _synthetic(B, 300, 640, seed=9)
    n_events = np.array([640, 500, 640, 600], np.int32)
    n_kmers = np.array([300, 240, 300, 280], np.int32)
    ref = banded_align_pallas(ev, n_events, mu, sigma, np.log(sigma),
                              n_kmers, interpret=True)
    packed, Tp, Kp, K0 = pack_banded_inputs(ev, n_events, mu, sigma,
                                            np.log(sigma), n_kmers)
    got = banded_align_pallas_packed(packed, Tp, Kp, K0, B=B, interpret=True)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
