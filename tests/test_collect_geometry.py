"""Vectorized task-geometry helpers in apps/call_methylation must match
their scalar ports element for element (the e2e golden TSV test pins the
composition; these pin the pieces on adversarial random inputs)."""

import numpy as np

from nanopolish_tpu.alignment.records import find_by_ref_bounds
from nanopolish_tpu.apps.call_methylation import (_find_by_ref_bounds_vec,
                                                  _motif_group_spans,
                                                  _spans_empty_vec,
                                                  motif_groups)


def test_motif_group_spans_matches_scalar():
    rng = np.random.default_rng(5)
    for _ in range(200):
        sites = np.unique(rng.integers(0, 500, rng.integers(1, 60)))
        min_sep = int(rng.integers(1, 30))
        gs, ge = _motif_group_spans(sites, min_sep)
        expect = motif_groups(sites.tolist(), min_sep)
        assert list(zip(gs.tolist(), ge.tolist())) == expect


def test_find_by_ref_bounds_vec_matches_scalar():
    rng = np.random.default_rng(6)
    for _ in range(100):
        n = int(rng.integers(1, 80))
        refs = np.sort(rng.integers(0, 400, n))
        vals = rng.integers(0, 10000, n)
        pairs = np.stack([refs, vals], axis=1).astype(np.int64)
        starts = rng.integers(-10, 420, 50)
        stops = starts + rng.integers(0, 60, 50)
        e1, e2, ok = _find_by_ref_bounds_vec(pairs, starts, stops)
        for i in range(50):
            b = find_by_ref_bounds(pairs, int(starts[i]), int(stops[i]))
            if b is None:
                assert not ok[i]
            else:
                assert ok[i]
                assert (int(e1[i]), int(e2[i])) == b


def test_spans_empty_vec():
    rng = np.random.default_rng(7)
    arr = np.sort(rng.integers(0, 100, 25))
    lo = rng.integers(-5, 105, 200)
    hi = lo + rng.integers(0, 10, 200)
    got = _spans_empty_vec(arr, lo, hi)
    for i in range(200):
        expect = not np.any((arr >= lo[i]) & (arr <= hi[i]))
        assert got[i] == expect
    assert _spans_empty_vec(np.zeros(0, np.int64), lo, hi).all()
