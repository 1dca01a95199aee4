"""End-to-end ingest pipeline: synthetic raw signal -> calibrated SquiggleRead."""

import numpy as np
import pytest

from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.models.read_builder import RawReadInput, ReadStats, build_reads
from nanopolish_tpu.models.squiggle import SquiggleScalings, T_IDX
from nanopolish_tpu.ops.scaling import estimate_scalings_mom, recalibrate
from nanopolish_tpu.utils.synthetic import random_sequence, synthetic_raw_signal


@pytest.fixture(scope="module")
def model():
    return PoreModelSet().get_model("r9.4_450bps", "nucleotide", "template", 6)


def test_mom_matches_reference_formula(model):
    # MoM (raw_loader.cpp:17-60) is intentionally crude: shift assumes
    # scale==1, so we verify the exact formula, and truth-recovery only in
    # the scale==1 regime the estimator is built for.
    rng = np.random.default_rng(1)
    seq = random_sequence(rng, 600)
    true = SquiggleScalings.from4(12.0, 1.0, 0.0, 1.0)
    from nanopolish_tpu.utils.synthetic import synthetic_events
    ev = synthetic_events(rng, seq, model, true, events_per_base=1.5)
    ranks = model.alphabet.seq_to_kmer_ranks(seq, model.k)
    lvl = model.level_mean[ranks][None, :].astype(np.float32)
    shift, scale = estimate_scalings_mom(
        ev.mean[None, :], np.array([len(ev)], np.int32),
        lvl, np.array([len(ranks)], np.int32))
    # exact formula parity
    e = ev.mean.astype(np.float64)
    want_shift = e.mean() - model.level_mean[ranks].mean()
    want_scale = ((e - want_shift) ** 2).mean() / (model.level_mean[ranks] ** 2).mean()
    assert abs(float(shift[0]) - want_shift) < 1e-3
    assert abs(float(scale[0]) - want_scale) < 1e-4
    # truth recovery at scale 1
    assert abs(float(shift[0]) - true.shift) < 2.0
    assert 0.9 < float(scale[0]) < 1.15


def test_recalibrate_recovers_truth(model):
    rng = np.random.default_rng(2)
    N = 800
    ranks = rng.integers(0, model.num_states, size=N)
    mu = model.level_mean[ranks].astype(np.float32)
    sd = model.level_stdv[ranks].astype(np.float32)
    true_shift, true_scale, true_var = 8.0, 1.05, 1.1
    levels = rng.normal(true_scale * mu + true_shift, sd * true_var).astype(np.float32)
    mask = np.ones((1, N), bool)
    r = recalibrate(levels[None], np.zeros((1, N), np.float32),
                    mu[None], sd[None], mask)
    assert bool(r.recalibrated[0])
    assert abs(float(r.shift[0]) - true_shift) < 0.5
    assert abs(float(r.scale[0]) - true_scale) < 0.01
    assert abs(float(r.var[0]) - true_var) < 0.05


def test_recalibrate_too_few_events():
    r = recalibrate(np.zeros((1, 50), np.float32), np.zeros((1, 50), np.float32),
                    np.ones((1, 50), np.float32), np.ones((1, 50), np.float32),
                    np.ones((1, 50), bool))
    assert not bool(r.recalibrated[0])


def test_build_reads_end_to_end(model):
    rng = np.random.default_rng(3)
    true = SquiggleScalings.from4(15.0, 1.1, 0.0, 1.0)
    inputs = []
    seqs = []
    for i in range(3):
        seq = random_sequence(rng, 700 + 100 * i)
        seqs.append(seq)
        raw = synthetic_raw_signal(rng, seq, model, true, samples_per_base=10.0,
                                   leader=300, trailer=60)
        inputs.append(RawReadInput(read_name=f"r{i}", sequence=seq, raw=raw))
    # an unparseable read (too short)
    inputs.append(RawReadInput(read_name="bad", sequence="ACGT", raw=np.ones(10, np.float32)))

    stats = ReadStats()
    reads = build_reads(inputs, stats=stats)
    assert stats.total_reads == 4
    assert stats.bad_fast5_file == 1

    ok = 0
    for i in range(3):
        read = reads[i]
        assert read is not None
        if not read.has_events_for_strand(T_IDX):
            continue
        ok += 1
        sc = read.scalings[T_IDX]
        # recalibration should land near the truth
        assert abs(sc.shift - true.shift) < 3.0
        assert abs(sc.scale - true.scale) < 0.05
        assert sc.var <= 2.5
        b2e = read.base_to_event_map[T_IDX]
        n_kmers = len(seqs[i]) - model.k + 1
        assert b2e.shape == (n_kmers, 2)
        mapped = b2e[:, 0] >= 0
        assert mapped.mean() > 0.8
        assert 0 < read.events_per_base[T_IDX] <= 5.0
    assert ok >= 2  # at least 2 of 3 clean reads pass QC


def test_build_reads_pallas_packed_path(model, monkeypatch):
    """The ingest pipeline through the Pallas packed wire format (interpret
    mode on CPU) must produce the same calibrated reads as the scan path."""
    monkeypatch.setenv("NPT_BANDED_IMPL", "pallas")
    rng = np.random.default_rng(11)
    true = SquiggleScalings.from4(14.0, 1.05, 0.0, 1.0)
    seq = random_sequence(rng, 500)
    raw = synthetic_raw_signal(rng, seq, model, true, samples_per_base=10.0,
                               leader=300, trailer=60)
    reads = build_reads([RawReadInput(read_name="p0", sequence=seq, raw=raw)])
    read = reads[0]
    assert read is not None and read.has_events_for_strand(T_IDX)
    sc = read.scalings[T_IDX]
    assert abs(sc.shift - true.shift) < 3.0
    assert abs(sc.scale - true.scale) < 0.05
