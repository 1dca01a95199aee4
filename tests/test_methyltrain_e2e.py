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
