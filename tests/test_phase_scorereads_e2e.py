"""End-to-end phase-reads and scorereads on synthetic data."""

import io

import numpy as np
import pytest

from nanopolish_tpu.apps import index as index_app
from nanopolish_tpu.apps import phase_reads as pr_app
from nanopolish_tpu.apps import scorereads as sc_app
from nanopolish_tpu.io.bam import BamRecord, BamWriter
from nanopolish_tpu.io.slow5 import Slow5Writer
from nanopolish_tpu.io.vcf import Variant, VcfWriter
from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.models.squiggle import SquiggleScalings
from nanopolish_tpu.utils.alphabet import DNA_ALPHABET
from nanopolish_tpu.utils.synthetic import random_sequence, synthetic_raw_signal

GENOME_LEN = 1500
READ_LEN = 900     # long enough for a 500-event scorereads segment


@pytest.fixture(scope="module")
def phased_pipeline(tmp_path_factory):
    d = tmp_path_factory.mktemp("phase_e2e")
    rng = np.random.default_rng(21)
    model = PoreModelSet.instance().get_model(
        "r9.4_450bps", "nucleotide", "template", 6)
    genome = random_sequence(rng, GENOME_LEN)
    ref_fa = str(d / "ref.fa")
    with open(ref_fa, "w") as fh:
        fh.write(">tig1\n")
        for i in range(0, GENOME_LEN, 60):
            fh.write(genome[i:i + 60] + "\n")

    # SNP at position 300 (within both reads)
    snp_pos = 300
    ref_base = genome[snp_pos]
    alt_base = {"A": "C", "C": "G", "G": "T", "T": "A"}[ref_base]

    vcf = str(d / "vars.vcf")
    with open(vcf, "w") as fh:
        w = VcfWriter(fh)
        w.write_variant(Variant(ref_name="tig1", ref_position=snp_pos,
                                ref_seq=ref_base, alt_seq=alt_base,
                                quality=50, genotype="0/1"))

    # hap_alt read carries the alt allele in its signal; hap_ref does not
    plan = [("hap_alt", True), ("hap_ref", False)]
    fastq = str(d / "reads.fastq")
    slow5 = str(d / "sig.slow5")
    pos0 = 50
    with open(fastq, "w") as fq, Slow5Writer(slow5) as sw:
        for name, has_alt in plan:
            seg = genome[pos0:pos0 + READ_LEN]
            true_seq = seg
            if has_alt:
                i = snp_pos - pos0
                true_seq = seg[:i] + alt_base + seg[i + 1:]
            # basecall reported as the reference-agreeing sequence, so the
            # only evidence for the allele is in the signal
            fq.write(f"@{name}\n{seg}\n+\n{'I' * READ_LEN}\n")
            sc = SquiggleScalings.from4(0.0, 1.0, 0.0, 1.0)
            pa = synthetic_raw_signal(rng, true_seq, model, sc,
                                      samples_per_base=10.0, leader=500,
                                      trailer=100)
            adc = np.clip(pa * 8192.0 / 1400.0, -32000, 32000).astype(np.int16)
            sw.write(name, adc, 8192.0, 0.0, 1400.0, 4000.0)

    index_app.main([fastq, "--slow5", slow5])
    bam = str(d / "aln.bam")
    w = BamWriter(bam, "@HD\tVN:1.6\tSO:coordinate\n", ["tig1"], [GENOME_LEN])
    for name, _ in plan:
        w.write(BamRecord(qname=name, tid=0, pos=pos0, mapq=60,
                          cigar=[(0, READ_LEN)],
                          seq=genome[pos0:pos0 + READ_LEN],
                          qual=np.full(READ_LEN, 30, np.uint8),
                          tags={"NM": ("i", 0)}))
    w.close()
    return {"fastq": fastq, "bam": bam, "ref_fa": ref_fa, "vcf": vcf,
            "snp_pos": snp_pos, "pos0": pos0, "ref": ref_base,
            "alt": alt_base}


def test_phase_reads(phased_pipeline):
    p = phased_pipeline
    out = io.StringIO()
    pr_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"],
                 p["vcf"]], stdout=out)
    lines = [l for l in out.getvalue().splitlines()
             if l and not l.startswith("@")]
    assert len(lines) == 2
    calls = {}
    for l in lines:
        f = l.split("\t")
        seq = f[9]
        qual = f[10]
        i = p["snp_pos"] - p["pos0"]
        calls[f[0]] = (seq[i], ord(qual[i]) - 33)
    assert calls["hap_alt"][0] == p["alt"], calls
    assert calls["hap_ref"][0] == p["ref"], calls
    assert calls["hap_alt"][1] > 3
    assert calls["hap_ref"][1] > 3


def test_scorereads(phased_pipeline):
    p = phased_pipeline
    out = io.StringIO()
    sc_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"]],
                stdout=out)
    lines = out.getvalue().splitlines()
    seg_lines = [l for l in lines if l.startswith("SEGMENT\t")]
    score_lines = [l for l in lines if not l.startswith("SEGMENT")]
    assert len(seg_lines) >= 2
    assert len(score_lines) == 2
    for l in score_lines:
        f = l.split()
        assert f[1] == "template"
        score = float(f[3])
        assert -4.0 < score < 0.0      # plausible per-event log-likelihood
        assert f[4] == "shift"


def test_scorereads_train_transitions(phased_pipeline, capsys):
    p = phased_pipeline
    out = io.StringIO()
    sc_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"],
                 "--train-transitions"], stdout=out)
    err = capsys.readouterr().err
    assert "Transition parameters for 0" in err
    assert "TRANSITIONS" in err
    assert "SKIP_TABLE" in err
    # template strand saw matches
    assert "matches=0" not in err.split("SUMMARY")[1].splitlines()[0]
