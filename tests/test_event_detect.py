"""Event detection (scrappie-equivalent) tests: native vs Python parity,
segmentation sanity on synthetic squiggles, and MAD trimming."""

import numpy as np
import pytest

from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.models.squiggle import SquiggleScalings
from nanopolish_tpu.ops.event_detect import (
    EVENT_DETECTION_DEFAULTS,
    EVENT_DETECTION_RNA,
    _peak_detect_py,
    compute_sum_sumsq,
    compute_tstat,
    create_events,
    detect_events,
    madf,
    medianf,
    quantilef,
    trim_and_segment_raw,
)
from nanopolish_tpu.utils.native import get_native_lib
from nanopolish_tpu.utils.synthetic import random_sequence, synthetic_raw_signal


def _toy_signal(rng, n_events=50, samples_per_event=12):
    levels = rng.uniform(60, 120, size=n_events)
    sig = np.repeat(levels, samples_per_event) + rng.normal(0, 0.8, size=n_events * samples_per_event)
    return sig.astype(np.float32)


def test_sum_sumsq():
    x = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    s, ss = compute_sum_sumsq(x)
    assert s.tolist() == [0.0, 1.0, 3.0, 6.0]
    assert ss.tolist() == [0.0, 1.0, 5.0, 14.0]


def test_tstat_boundaries():
    rng = np.random.default_rng(0)
    x = _toy_signal(rng)
    s, ss = compute_sum_sumsq(x)
    t = compute_tstat(s, ss, len(x), 6)
    assert (t[:6] == 0).all()
    assert (t[-5:] == 0).all()          # last w-1 zero; t[n-w] is computed
    assert t[len(x) - 6] != 0 or True   # may be 0 by value but is written
    assert np.isfinite(t).all()


def test_tstat_peaks_at_boundaries():
    # two flat segments of different mean -> t-stat maximal at the junction
    x = np.concatenate([np.full(50, 80.0), np.full(50, 100.0)]).astype(np.float32)
    s, ss = compute_sum_sumsq(x)
    t = compute_tstat(s, ss, len(x), 6)
    assert np.argmax(t) == 50


def test_native_matches_python_peaks():
    lib = get_native_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    x = _toy_signal(rng, n_events=200)
    s, ss = compute_sum_sumsq(x)
    p = EVENT_DETECTION_DEFAULTS
    t1 = compute_tstat(s, ss, len(x), p.window_length1)
    t2 = compute_tstat(s, ss, len(x), p.window_length2)
    py = _peak_detect_py(t1, t2, p)
    nat = lib.peak_detect(t1, t2, p.window_length1, p.window_length2,
                          p.threshold1, p.threshold2, p.peak_height)
    assert py.tolist() == nat.tolist()


def test_detect_events_segments_synthetic():
    rng = np.random.default_rng(3)
    n_events = 100
    x = _toy_signal(rng, n_events=n_events, samples_per_event=15)
    et = detect_events(x, EVENT_DETECTION_DEFAULTS)
    # scrappie-style detection over-segments noisy signal: expect >= 1 and
    # a small factor more events than true level segments
    assert 0.9 * n_events < len(et) < 4.0 * n_events
    # event stats are consistent with the signal
    for i in [0, len(et) // 2, len(et) - 1]:
        s = int(et.start[i])
        e = s + int(et.length[i])
        assert abs(et.mean[i] - x[s:e].mean()) < 0.5


def test_quantile_median_mad():
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0], dtype=np.float32)
    assert medianf(x) == 3.0
    assert quantilef(x, 0.0) == 1.0
    assert quantilef(x, 1.0) == 5.0
    assert abs(madf(x) - 1.0 * 1.4826) < 1e-5


def test_trim_defaults_fixed_only():
    # with the reference's varseg_thresh=0.0 the MAD threshold is the minimum
    # chunk MAD, so MAD trimming is (almost) a no-op and only the fixed
    # trim_start/trim_end apply (squiggle_read.cpp:229-233 passes 0.0)
    rng = np.random.default_rng(11)
    model = PoreModelSet().get_model("r9.4_450bps", "nucleotide", "template", 6)
    seq = random_sequence(rng, 800)
    sc = SquiggleScalings.from4(0.0, 1.0, 0.0, 1.0)
    sig = synthetic_raw_signal(rng, seq, model, sc)
    bounds = trim_and_segment_raw(sig, trim_start=200, trim_end=10, varseg_chunk=100)
    assert bounds is not None
    start, end = bounds
    assert 200 <= start <= 300
    assert end >= len(sig) - 110


def test_trim_removes_stall_with_percentile():
    rng = np.random.default_rng(11)
    model = PoreModelSet().get_model("r9.4_450bps", "nucleotide", "template", 6)
    seq = random_sequence(rng, 800)
    sc = SquiggleScalings.from4(0.0, 1.0, 0.0, 1.0)
    sig = synthetic_raw_signal(rng, seq, model, sc, leader=1500, trailer=800)
    bounds = trim_and_segment_raw(sig, trim_start=200, trim_end=10,
                                  varseg_chunk=100, varseg_thresh=0.3)
    assert bounds is not None
    start, end = bounds
    # the low-variance leader (1500 samples) should be (mostly) trimmed
    assert start >= 1400
    assert end <= len(sig) - 800 + 200


def test_full_pipeline_on_synthetic_squiggle():
    rng = np.random.default_rng(5)
    model = PoreModelSet().get_model("r9.4_450bps", "nucleotide", "template", 6)
    seq = random_sequence(rng, 500)
    sc = SquiggleScalings.from4(10.0, 1.05, 0.0, 1.0)
    sig = synthetic_raw_signal(rng, seq, model, sc, samples_per_base=10.0)
    et = detect_events(sig, EVENT_DETECTION_DEFAULTS)
    n_kmers = len(seq) - model.k + 1
    events_per_kmer = len(et) / n_kmers
    assert 0.5 < events_per_kmer < 4.0
