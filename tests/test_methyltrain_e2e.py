"""End-to-end methyltrain: start from a perturbed cpg model; training on
reads drawn from the true model over a methylated reference must pull the
M-kmer means back toward the truth."""

import io
import os

import numpy as np
import pytest

from nanopolish_tpu.apps import index as index_app
from nanopolish_tpu.apps import methyltrain as mt_app
from nanopolish_tpu.io.bam import BamRecord, BamWriter
from nanopolish_tpu.io.slow5 import Slow5Writer
from nanopolish_tpu.models.pore_model import PoreModel, PoreModelSet
from nanopolish_tpu.models.squiggle import SquiggleScalings
from nanopolish_tpu.utils.alphabet import METHYL_CPG_ALPHABET
from nanopolish_tpu.utils.synthetic import random_sequence, synthetic_raw_signal

GENOME_LEN = 600
N_READS = 30
PERTURB = 4.0


def test_methyltrain_recovers_m_kmer_means(tmp_path, monkeypatch):
    os.chdir(tmp_path)
    monkeypatch.setattr(mt_app, "MIN_NUMBER_OF_EVENTS_TO_TRAIN", 15)
    PoreModelSet.reset()
    pms = PoreModelSet.instance()
    true_cpg = pms.get_model("r9.4_450bps", "cpg", "template", 6)

    rng = np.random.default_rng(51)
    # ensure plenty of CpG sites
    genome = ""
    while genome.count("CG") < 12:
        genome = random_sequence(rng, GENOME_LEN)
    meth_genome = METHYL_CPG_ALPHABET.methylate(genome)

    ref_fa = str(tmp_path / "ref_meth.fa")
    with open(ref_fa, "w") as fh:
        fh.write(">tig1\n")
        for i in range(0, len(meth_genome), 60):
            fh.write(meth_genome[i:i + 60] + "\n")

    # perturbed starting model: M-kmer means shifted
    kmers_m = np.array(["M" in true_cpg.alphabet.rank_to_kmer(r, 6)
                        for r in range(true_cpg.level_mean.shape[0])])
    pert_mean = true_cpg.level_mean.copy()
    pert_mean[kmers_m] += PERTURB
    perturbed = true_cpg.with_states(pert_mean, true_cpg.level_stdv.copy())
    model_path = str(tmp_path / "start.model")
    perturbed.write(model_path, "r9.4_450bps.cpg.6mer.template.start")
    fofn = str(tmp_path / "models.fofn")
    with open(fofn, "w") as fh:
        fh.write(model_path + "\n")

    fastq = str(tmp_path / "reads.fastq")
    slow5 = str(tmp_path / "sig.slow5")
    with open(fastq, "w") as fq, Slow5Writer(slow5) as sw:
        for i in range(N_READS):
            name = f"r{i}"
            fq.write(f"@{name}\n{genome}\n+\n{'I' * len(genome)}\n")
            sc = SquiggleScalings.from4(0.0, 1.0, 0.0, 1.0)
            # signal from the TRUE cpg model over the methylated sequence
            pa = synthetic_raw_signal(rng, meth_genome, true_cpg, sc,
                                      samples_per_base=10.0, leader=450,
                                      trailer=90)
            adc = np.clip(pa * 8192.0 / 1400.0, -32000, 32000).astype(np.int16)
            sw.write(name, adc, 8192.0, 0.0, 1400.0, 4000.0)

    index_app.main([fastq, "--slow5", slow5])
    bam = str(tmp_path / "aln.bam")
    w = BamWriter(bam, "@HD\tVN:1.6\tSO:coordinate\n", ["tig1"], [GENOME_LEN])
    for i in range(N_READS):
        w.write(BamRecord(qname=f"r{i}", tid=0, pos=0, mapq=60,
                          cigar=[(0, GENOME_LEN)], seq=genome,
                          qual=np.full(GENOME_LEN, 30, np.uint8)))
    w.close()

    mt_app.main(["-r", fastq, "-b", bam, "-g", ref_fa, "-m", fofn,
                 "--rounds", "4", "--no-write-models"])

    trained = pms.get_model("r9.4_450bps", "cpg", "template", 6)
    # kmers that actually got training data moved back toward the truth
    summary = open("methyltrain.summary").read().splitlines()
    trained_kmers = [l.split("\t")[1] for l in summary[1:]
                     if l.split("\t")[6] == "1" and "M" in l.split("\t")[1]]
    assert len(trained_kmers) >= 3, "no methylated kmers trained"
    errs_before, errs_after = [], []
    for km in trained_kmers:
        r = true_cpg.alphabet.kmer_rank(km, 6)
        errs_before.append(abs(PERTURB))
        errs_after.append(abs(trained.level_mean[r] - true_cpg.level_mean[r]))
    # sparse per-kmer events (tens, vs the reference's 1000 cap) and the
    # contamination prior make convergence gradual; require a clear pull
    # toward the truth
    assert np.mean(errs_after) < 0.6 * np.mean(errs_before), \
        (np.mean(errs_after), trained_kmers[:5])
    # summary structure
    assert summary[0].startswith("model_short_name\tkmer\tnum_matches")
    PoreModelSet.reset()


def test_consume_columns_matches_scalar_row_loop(tmp_path, monkeypatch):
    """The vectorized event collection (_consume_columns) must reproduce
    the scalar add_aligned_events loop (row objects, per-kmer rank
    lookups, sequential reservoir) event for event."""
    os.chdir(tmp_path)
    PoreModelSet.reset()
    pms = PoreModelSet.instance()
    true_cpg = pms.get_model("r9.4_450bps", "cpg", "template", 6)
    alphabet = true_cpg.alphabet

    rng = np.random.default_rng(77)
    genome = ""
    while genome.count("CG") < 10:
        genome = random_sequence(rng, 500)
    meth_genome = METHYL_CPG_ALPHABET.methylate(genome)
    ref_fa = str(tmp_path / "ref.fa")
    with open(ref_fa, "w") as fh:
        fh.write(">tig1\n" + meth_genome + "\n")

    fastq = str(tmp_path / "r.fastq")
    slow5 = str(tmp_path / "s.slow5")
    n_reads = 6
    from nanopolish_tpu.utils.alphabet import DNA_ALPHABET
    with open(fastq, "w") as fq, Slow5Writer(slow5) as sw:
        for i in range(n_reads):
            is_rev = bool(i % 2)        # cover the rc rank path
            basecall = DNA_ALPHABET.reverse_complement(genome) if is_rev \
                else genome
            fq.write(f"@q{i}\n{basecall}\n+\n{'I' * len(genome)}\n")
            sc = SquiggleScalings.from4(0.0, 1.0, 0.0, 1.0)
            sig_seq = METHYL_CPG_ALPHABET.methylate(basecall)
            pa = synthetic_raw_signal(rng, sig_seq, true_cpg, sc,
                                      samples_per_base=10.0, leader=450,
                                      trailer=90)
            adc = np.clip(pa * 8192.0 / 1400.0, -32000,
                          32000).astype(np.int16)
            sw.write(f"q{i}", adc, 8192.0, 0.0, 1400.0, 4000.0)
    index_app.main([fastq, "--slow5", slow5])
    bam = str(tmp_path / "a.bam")
    w = BamWriter(bam, "@HD\tVN:1.6\tSO:coordinate\n", ["tig1"],
                  [len(genome)])
    for i in range(n_reads):
        w.write(BamRecord(qname=f"q{i}", flag=16 if i % 2 else 0, tid=0,
                          pos=0, mapq=60,
                          cigar=[(0, len(genome))], seq=genome,
                          qual=np.full(len(genome), 30, np.uint8)))
    w.close()

    from nanopolish_tpu.alignment.eventalign import align_reads_to_ref
    from nanopolish_tpu.io.bam import BamReader
    from nanopolish_tpu.io.fasta import FastaIndex
    from nanopolish_tpu.io.readdb import ReadDB
    from nanopolish_tpu.models.read_loader import load_squiggle_reads

    read_db = ReadDB()
    read_db.load(fastq)
    fai = FastaIndex(ref_fa)
    br = BamReader(bam)
    recs = list(br)
    reads = load_squiggle_reads(sorted({r.qname for r in recs}), read_db)
    jobs = [(reads[r.qname], r, 0, i) for i, r in enumerate(recs)
            if reads.get(r.qname) is not None]
    cols_list = align_reads_to_ref(jobs, fai, br.references,
                                   alphabet="cpg", columnar=True)

    R = true_cpg.level_mean.shape[0]
    # scalar reference (the pre-round-5 loop, methyltrain.cpp:406-474)
    events_s = [[] for _ in range(R)]
    count_s = np.zeros(R, np.int64)
    match_s = np.zeros(R, np.int64)
    stay_s = np.zeros(R, np.int64)
    rng_s = np.random.default_rng(9)
    for (sr, rec, strand, _), cols in zip(jobs, cols_list):
        ao = cols.to_rows()
        sc = sr.scalings[strand]
        n = len(ao)
        for i, ea in enumerate(ao):
            if ea.hmm_state == "B":
                continue
            try:
                rank = alphabet.kmer_rank(ea.model_kmer, 6)
            except (KeyError, ValueError):
                continue
            use = (i > mt_app.MIN_DISTANCE_FROM_ALIGNMENT_END
                   and i + mt_app.MIN_DISTANCE_FROM_ALIGNMENT_END < n
                   and ea.hmm_state == "M"
                   and sr.get_duration(ea.event_idx, strand)
                   >= mt_app.MIN_EVENT_DURATION
                   and sr.get_fully_scaled_level(ea.event_idx, strand)
                   >= 1.0)
            if use:
                level = float(sr.get_fully_scaled_level(ea.event_idx,
                                                        strand))
                svar = sc.var / sc.scale
                count_s[rank] += 1
                if count_s[rank] <= mt_app.MAX_EVENTS:
                    events_s[rank].append((level, svar))
                else:
                    loc = int(rng_s.integers(0, count_s[rank]))
                    if loc < mt_app.MAX_EVENTS:
                        events_s[rank][loc] = (level, svar)
            if ea.hmm_state == "M":
                match_s[rank] += 1
            elif ea.hmm_state == "E":
                stay_s[rank] += 1

    # vectorized path
    summaries = [mt_app.KmerSummary() for _ in range(R)]
    count_v = np.zeros(R, np.int64)
    match_v = np.zeros(R, np.int64)
    stay_v = np.zeros(R, np.int64)
    rng_v = np.random.default_rng(9)
    acc = {"count_r": [], "count_st": [], "r": [], "l": [], "sv": []}
    for (sr, rec, strand, _), cols in zip(jobs, cols_list):
        mt_app._extract_job_events(cols, sr, strand, acc)
    mt_app._finalize_events(acc, summaries, count_v, match_v, stay_v,
                            rng_v)

    assert count_s.sum() > 200, "corpus produced no training events"
    np.testing.assert_array_equal(count_s, count_v)
    np.testing.assert_array_equal(match_s, match_v)
    np.testing.assert_array_equal(stay_s, stay_v)
    for r in range(R):
        assert events_s[r] == summaries[r].events, r
    PoreModelSet.reset()


def test_finalize_events_reservoir_over_cap(monkeypatch):
    """The bulk/scalar split in _finalize_events must reproduce the
    scalar reservoir exactly when ranks exceed MAX_EVENTS — the rng
    stream only sees over-cap events, in arrival order."""
    monkeypatch.setattr(mt_app, "MAX_EVENTS", 7)
    rng = np.random.default_rng(3)
    R = 16
    n = 600
    r_arr = rng.integers(0, R, n)
    l_arr = rng.normal(90, 10, n)
    sv_arr = np.round(rng.random(n), 3)

    # scalar reference (the original per-event loop)
    events_s = [[] for _ in range(R)]
    count_s = np.zeros(R, np.int64)
    rng_s = np.random.default_rng(11)
    for rank, level, svar in zip(r_arr.tolist(), l_arr.tolist(),
                                 sv_arr.tolist()):
        c = count_s[rank] = count_s[rank] + 1
        if c <= mt_app.MAX_EVENTS:
            events_s[rank].append((level, svar))
        else:
            loc = int(rng_s.integers(0, c))
            if loc < mt_app.MAX_EVENTS:
                events_s[rank][loc] = (level, svar)

    # vectorized path, split across three finalize calls (batches) with
    # uneven boundaries so the cap is crossed mid-batch
    summaries = [mt_app.KmerSummary() for _ in range(R)]
    count_v = np.zeros(R, np.int64)
    mc = np.zeros(R, np.int64)
    sc = np.zeros(R, np.int64)
    rng_v = np.random.default_rng(11)
    for lo, hi in ((0, 70), (70, 301), (301, n)):
        acc = {"count_r": [], "count_st": [],
               "r": [r_arr[lo:hi]], "l": [l_arr[lo:hi]],
               "sv": [sv_arr[lo:hi]]}
        mt_app._finalize_events(acc, summaries, count_v, mc, sc, rng_v)

    np.testing.assert_array_equal(count_s, count_v)
    for r in range(R):
        assert summaries[r].events == events_s[r], r
