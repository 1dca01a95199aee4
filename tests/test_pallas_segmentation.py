"""Pallas segmentation kernel vs the lax.scan implementation
(reference: src/nanopolish_polya_estimator.cpp:176-520)."""

import numpy as np
import pytest

from nanopolish_tpu.ops import segmentation_hmm as sh
from nanopolish_tpu.ops.pallas_segmentation import segmentation_labels_pallas


def _synthetic_read(rng, n_leader=300, n_adapter=200, n_polya=400,
                    n_transcript=600):
    segs = [rng.normal(70.3, 3.8, 60),            # START-ish levels
            rng.normal(110.9, 5.2, n_leader),     # LEADER
            rng.normal(63.3, 2.7, n_adapter),     # ADAPTER (a1 component)
            rng.normal(108.9, 3.3, n_polya),      # POLYA
            rng.normal(79.7, 7.0, n_transcript)]  # TRANSCRIPT (t0)
    return np.concatenate(segs).astype(np.float32)


def _scan_labels(samples_list, scalings):
    import jax.numpy as jnp
    B = len(samples_list)
    N = max(max(len(s) for s in samples_list), 8)
    samples = np.full((B, N), 100.0, np.float32)
    n_samples = np.zeros(B, np.int32)
    for i, s in enumerate(samples_list):
        samples[i, :len(s)] = s
        n_samples[i] = len(s)
    sc = np.asarray(scalings, np.float32)
    bptrs, _ = sh._segmentation_viterbi(
        jnp.asarray(samples), jnp.asarray(n_samples), jnp.asarray(sc[:, 0]),
        jnp.asarray(sc[:, 1]), jnp.asarray(sc[:, 2]), sh.SegmentationParams())
    labels = np.asarray(sh._backward_labels(bptrs, jnp.asarray(n_samples)))
    return samples, n_samples, sc, labels.T     # [B, N]


@pytest.mark.parametrize("lengths", [(1560,), (1560, 900, 1233)])
def test_pallas_matches_scan(lengths):
    rng = np.random.default_rng(7)
    reads = []
    for n in lengths:
        r = _synthetic_read(rng)
        reads.append(r[:n])
    scalings = [(1.0, 0.0, 1.0), (1.02, 2.0, 1.1), (0.98, -1.5, 0.9)]
    scalings = scalings[:len(reads)]
    samples, n_samples, sc, want = _scan_labels(reads, scalings)
    got = segmentation_labels_pallas(samples, n_samples, sc[:, 0], sc[:, 1],
                                     sc[:, 2], interpret=True)
    for b in range(len(reads)):
        n = n_samples[b]
        np.testing.assert_array_equal(got[b, :n], want[b, :n])


def test_pallas_segmentation_regions():
    """The recovered segmentation must find the planted boundaries."""
    rng = np.random.default_rng(11)
    r = _synthetic_read(rng, n_leader=250, n_adapter=180, n_polya=350)
    samples, n_samples, sc, _ = _scan_labels([r], [(1.0, 0.0, 1.0)])
    got = segmentation_labels_pallas(samples, n_samples, sc[:, 0],
                                     sc[:, 1], sc[:, 2], interpret=True)
    lab = got[0, :len(r)]
    seg = sh._extract_segmentation(lab)
    # planted: start ~60, leader ends ~310, adapter ~490, polya ~840
    assert 20 <= seg.start <= 100
    assert 280 <= seg.leader <= 340
    assert 450 <= seg.adapter <= 530
    assert 800 <= seg.polya <= 880


def test_pallas_matches_scan_polyi_params():
    """The detect-polyi parameter variant (two-Gaussian P emission) flows
    through the same kernel via the frozen params static arg."""
    from nanopolish_tpu.apps.detect_polyi import DPI_PARAMS as POLYI_PARAMS

    rng = np.random.default_rng(3)
    r = _synthetic_read(rng, n_leader=200, n_adapter=150, n_polya=300,
                        n_transcript=400)
    import jax.numpy as jnp
    samples = r[None, :]
    n_samples = np.array([len(r)], np.int32)
    bptrs, _ = sh._segmentation_viterbi(
        jnp.asarray(samples), jnp.asarray(n_samples), jnp.ones(1),
        jnp.zeros(1), jnp.ones(1), POLYI_PARAMS)
    want = np.asarray(sh._backward_labels(bptrs, jnp.asarray(n_samples))).T
    got = segmentation_labels_pallas(samples, n_samples, np.ones(1),
                                     np.zeros(1), np.ones(1),
                                     params=POLYI_PARAMS, interpret=True)
    np.testing.assert_array_equal(got[0, :len(r)], want[0, :len(r)])
