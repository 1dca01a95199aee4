"""Exact-banding Pallas kernel vs the lax.scan port and the NumPy port of
the reference algorithm (src/nanopolish_raw_loader.cpp:77-379).

Unlike the epoch-window kernel (pallas_banded.py, which may diverge on noisy
reads), pallas_banded_exact must match the reference banding byte for byte:
same band placement, same traceback, same base->event map, same QC stats —
including on the noisy corpus.
"""

import numpy as np
import pytest

from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.ops.banded_align import (
    banded_align_batch, banded_align_reference, base_to_event_map_from_pairs)
from nanopolish_tpu.ops.pallas_banded_exact import (
    banded_align_exact, transition_params_f32)


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


@pytest.mark.parametrize("K,T,epk,noise", [
    (200, 420, 2.1, 1.0),
    (300, 900, 3.0, 1.0),
    (200, 420, 2.1, 2.5),      # noisy: the corpus the epoch kernel diverged on
    (257, 530, 2.0, 3.0),      # noisy + non-pow2 dims
])
def test_exact_matches_numpy_port(K, T, epk, noise):
    B = 4
    ev, mu, sigma = _synthetic(B, K, T, epk, seed=11, noise=noise)
    n_events = np.full(B, T, np.int32)
    n_kmers = np.full(B, K, np.int32)
    res = banded_align_exact(ev, n_events, mu, sigma, np.log(sigma),
                             n_kmers, interpret=True)
    for b in range(B):
        pairs, stats = banded_align_reference(
            ev[b], mu[b], sigma[b], np.log(sigma[b]))
        assert bool(res.failed[b]) == stats["failed"]
        assert int(res.max_gap[b]) == stats["max_gap"]
        if not stats["failed"]:
            assert int(res.n_pairs[b]) == stats["n_pairs"]
            assert abs(float(res.avg_log_emission[b]) -
                       stats["avg_log_emission"]) < 1e-3
            b2e = base_to_event_map_from_pairs(pairs, K)
            np.testing.assert_array_equal(res.b2e_start[b], b2e[:, 0])
            np.testing.assert_array_equal(res.b2e_stop[b], b2e[:, 1])


@pytest.mark.parametrize("noise", [1.0, 2.5])
def test_exact_matches_scan_bytewise(noise):
    """Full-result byte equality with the scan implementation: same f32
    operation order, same accumulation order -> identical bits."""
    B = 4
    K, T = 220, 470
    ev, mu, sigma = _synthetic(B, K, T, seed=23, noise=noise)
    n_events = np.array([T, 380, T, 410], np.int32)
    n_kmers = np.array([K, 180, K, 200], np.int32)
    lp_stay, lp_step = transition_params_f32(n_events, n_kmers)
    res = banded_align_exact(ev, n_events, mu, sigma, np.log(sigma), n_kmers,
                             lp_stay=lp_stay, lp_step=lp_step, interpret=True)
    ref = banded_align_batch(ev, n_events, mu, sigma, np.log(sigma), n_kmers,
                             lp_stay=lp_stay[:, 0], lp_step=lp_step[:, 0])
    np.testing.assert_array_equal(np.asarray(res.failed), np.asarray(ref.failed))
    np.testing.assert_array_equal(np.asarray(res.max_gap), np.asarray(ref.max_gap))
    np.testing.assert_array_equal(np.asarray(res.n_pairs), np.asarray(ref.n_pairs))
    np.testing.assert_array_equal(np.asarray(res.spanned), np.asarray(ref.spanned))
    np.testing.assert_array_equal(np.asarray(res.avg_log_emission),
                                  np.asarray(ref.avg_log_emission))
    np.testing.assert_array_equal(np.asarray(res.events_per_base),
                                  np.asarray(ref.events_per_base))
    np.testing.assert_array_equal(np.asarray(res.b2e_start),
                                  np.asarray(ref.b2e_start))
    np.testing.assert_array_equal(np.asarray(res.b2e_stop),
                                  np.asarray(ref.b2e_stop))


def test_exact_garbage_read_fails_qc():
    B = 2
    rng = np.random.default_rng(9)
    K, T = 300, 640
    model = PoreModelSet.instance().get_model(
        "r9.4_450bps", "nucleotide", "template", 6)
    ranks = rng.integers(0, 4096, size=(B, K)).astype(np.int32)
    mu = model.level_mean[ranks].astype(np.float32)
    sigma = model.level_stdv[ranks].astype(np.float32)
    ev = rng.uniform(0, 200, size=(B, T)).astype(np.float32)
    res = banded_align_exact(ev, np.full(B, T, np.int32), mu, sigma,
                             np.log(sigma), np.full(B, K, np.int32),
                             interpret=True)
    assert res.failed.all()
    assert (np.asarray(res.b2e_start) == -1).all()


@pytest.mark.parametrize("K,T", [
    (40, 90),        # shorter than the 100-wide band: trim+end overlap
    (126, 130),      # n_bands straddles exactly two grid chunks
])
def test_exact_tiny_reads(K, T):
    """Reads shorter than BANDWIDTH keep every chunk in the gated
    trim/end path; byte-compare against the NumPy port."""
    B = 4
    ev, mu, sigma = _synthetic(B, K, T, epk=T / K, seed=5, noise=1.0)
    n_events = np.full(B, T, np.int32)
    n_kmers = np.full(B, K, np.int32)
    res = banded_align_exact(ev, n_events, mu, sigma, np.log(sigma),
                             n_kmers, interpret=True)
    for b in range(B):
        pairs, stats = banded_align_reference(
            ev[b], mu[b], sigma[b], np.log(sigma[b]))
        assert bool(res.failed[b]) == stats["failed"]
        if not stats["failed"]:
            assert int(res.n_pairs[b]) == stats["n_pairs"]
            b2e = base_to_event_map_from_pairs(pairs, K)
            np.testing.assert_array_equal(res.b2e_start[b], b2e[:, 0])
            np.testing.assert_array_equal(res.b2e_stop[b], b2e[:, 1])


def test_exact_mixed_batch_tiny_and_long():
    """One batch mixing a 45-kmer read with 280-kmer reads: per-read
    trim/end liveness diverges inside shared chunks, and the padded
    lanes of the short read must not perturb its QC stats."""
    B = 4
    K, T = 280, 590
    ev, mu, sigma = _synthetic(B, K, T, seed=31, noise=1.0)
    n_events = np.array([T, 95, T, 160], np.int32)
    n_kmers = np.array([K, 45, K, 80], np.int32)
    lp_stay, lp_step = transition_params_f32(n_events, n_kmers)
    res = banded_align_exact(ev, n_events, mu, sigma, np.log(sigma), n_kmers,
                             lp_stay=lp_stay, lp_step=lp_step, interpret=True)
    ref = banded_align_batch(ev, n_events, mu, sigma, np.log(sigma), n_kmers,
                             lp_stay=lp_stay[:, 0], lp_step=lp_step[:, 0])
    for f in ("failed", "max_gap", "n_pairs", "spanned", "avg_log_emission",
              "events_per_base", "b2e_start", "b2e_stop"):
        np.testing.assert_array_equal(
            np.asarray(getattr(res, f)), np.asarray(getattr(ref, f)),
            err_msg=f)


def test_exact_split_walk_chains_b256(monkeypatch):
    """B=256 exercises the backtrack's two independent 128-lane walk
    chains (NPT_BT_SPLIT=2, a measured-neutral but supported layout) and
    the fill's sub-batch chains at the production batch size (small
    reads keep interpret mode fast).  Verifies the per-read results
    against the NumPy reference port on a spot-checked subset."""
    monkeypatch.setenv("NPT_BT_SPLIT", "2")
    B, K, T = 256, 60, 130
    ev, mu, sigma = _synthetic(B, K, T, 2.1, seed=29, noise=1.5)
    n_events = np.full(B, T, np.int32)
    n_kmers = np.full(B, K, np.int32)
    res = banded_align_exact(ev, n_events, mu, sigma, np.log(sigma),
                             n_kmers, interpret=True)
    for b in (0, 1, 127, 128, 129, 254, 255):   # straddle the chain seam
        pairs, stats = banded_align_reference(
            ev[b], mu[b], sigma[b], np.log(sigma[b]))
        assert bool(res.failed[b]) == stats["failed"]
        assert int(res.max_gap[b]) == stats["max_gap"]
        if not stats["failed"]:
            assert int(res.n_pairs[b]) == stats["n_pairs"]
            b2e = base_to_event_map_from_pairs(pairs, K)
            np.testing.assert_array_equal(res.b2e_start[b], b2e[:, 0])
            np.testing.assert_array_equal(res.b2e_stop[b], b2e[:, 1])
