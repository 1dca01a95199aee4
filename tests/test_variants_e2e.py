"""End-to-end variants --consensus -> vcf2fasta: polish a draft assembly
with introduced errors back to the true genome (the reference's
quickstart_consensus workflow)."""

import io

import numpy as np
import pytest

from nanopolish_tpu.apps import index as index_app
from nanopolish_tpu.apps import variants as var_app
from nanopolish_tpu.apps import vcf2fasta as v2f_app
from nanopolish_tpu.io.bam import BamRecord, BamWriter
from nanopolish_tpu.io.slow5 import Slow5Writer
from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.models.squiggle import SquiggleScalings
from nanopolish_tpu.utils.synthetic import random_sequence, synthetic_raw_signal

N_READS = 25
DRAFT_LEN = 360


@pytest.fixture(scope="module")
def consensus_pipeline(tmp_path_factory):
    d = tmp_path_factory.mktemp("cons_e2e")
    rng = np.random.default_rng(31)
    model = PoreModelSet.instance().get_model(
        "r9.4_450bps", "nucleotide", "template", 6)

    truth = random_sequence(rng, DRAFT_LEN)
    # introduce draft errors well inside the callable window
    # (BUFFER=40 on both sides)
    sub_pos = 120
    del_pos = 180      # draft drops truth[del_pos]
    draft = list(truth)
    orig = draft[sub_pos]
    draft[sub_pos] = {"A": "G", "C": "T", "G": "A", "T": "C"}[orig]
    del draft[del_pos]
    draft = "".join(draft)

    draft_fa = str(d / "draft.fa")
    with open(draft_fa, "w") as fh:
        fh.write(">tig1\n")
        for i in range(0, len(draft), 60):
            fh.write(draft[i:i + 60] + "\n")

    # reads: full-length true sequence; alignment to draft:
    #   M sub_region ... at del_pos the read has one extra base (I)
    fastq = str(d / "reads.fastq")
    slow5 = str(d / "sig.slow5")
    cigar = [(0, del_pos), (1, 1), (0, DRAFT_LEN - del_pos - 1)]
    with open(fastq, "w") as fq, Slow5Writer(slow5) as sw:
        for i in range(N_READS):
            name = f"r{i}"
            fq.write(f"@{name}\n{truth}\n+\n{'I' * len(truth)}\n")
            sc = SquiggleScalings.from4(float(rng.uniform(-2, 2)), 1.0,
                                        0.0, 1.0)
            pa = synthetic_raw_signal(rng, truth, model, sc,
                                      samples_per_base=9.0, leader=450,
                                      trailer=90)
            adc = np.clip(pa * 8192.0 / 1400.0, -32000, 32000).astype(np.int16)
            sw.write(name, adc, 8192.0, 0.0, 1400.0, 4000.0)

    index_app.main([fastq, "--slow5", slow5])
    bam = str(d / "aln.bam")
    w = BamWriter(bam, "@HD\tVN:1.6\tSO:coordinate\n", ["tig1"], [len(draft)])
    for i in range(N_READS):
        w.write(BamRecord(qname=f"r{i}", tid=0, pos=0, mapq=60,
                          cigar=list(cigar), seq=truth,
                          qual=np.full(len(truth), 30, np.uint8)))
    w.close()
    return {"dir": d, "truth": truth, "draft": draft, "draft_fa": draft_fa,
            "fastq": fastq, "bam": bam, "sub_pos": sub_pos,
            "del_pos": del_pos, "orig": orig}


def test_variants_consensus_and_vcf2fasta(consensus_pipeline):
    p = consensus_pipeline
    vcf_path = str(p["dir"] / "polished.vcf")
    var_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["draft_fa"],
                  "-w", f"tig1:0-{DRAFT_LEN - 1}", "--consensus",
                  "-o", vcf_path, "-d", "10"])
    text = open(vcf_path).read()
    assert "##nanopolish_window=tig1:0-" in text
    lines = [l for l in text.splitlines() if l and not l.startswith("#")]
    assert lines, "no variants called"
    keys = set()
    for l in lines:
        f = l.split("\t")
        keys.add((int(f[1]) - 1, f[3], f[4]))
        assert float(f[5]) > 0
        assert "TotalReads=" in f[7]
    # the substitution must be corrected back to the truth base
    assert (p["sub_pos"], p["draft"][p["sub_pos"]], p["orig"]) in keys

    # vcf2fasta reconstructs the true sequence inside the window
    out = io.StringIO()
    v2f_app.main(["-g", p["draft_fa"], "--skip-checks", vcf_path],
                 stdout=out)
    polished = out.getvalue().splitlines()[1]
    BUF = 45
    assert p["truth"][BUF:DRAFT_LEN - BUF] in polished


def test_vcf2fasta_window_checks(consensus_pipeline, tmp_path):
    p = consensus_pipeline
    bad_vcf = tmp_path / "bad.vcf"
    bad_vcf.write_text("##fileformat=VCFv4.2\n"
                       "##nanopolish_window=tig1:100-200\n"
                       "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    with pytest.raises(SystemExit):
        v2f_app.main(["-g", p["draft_fa"], str(bad_vcf)],
                     stdout=io.StringIO())


def test_variants_consensus_fix_homopolymers_no_harm(consensus_pipeline):
    """--fix-homopolymers must not corrupt a correct consensus."""
    import io as _io
    p = consensus_pipeline
    vcf_path = str(p["dir"] / "polished_hp.vcf")
    var_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["draft_fa"],
                  "-w", f"tig1:0-{DRAFT_LEN - 1}", "--consensus",
                  "--fix-homopolymers", "-o", vcf_path, "-d", "10"])
    out = _io.StringIO()
    v2f_app.main(["-g", p["draft_fa"], "--skip-checks", vcf_path],
                 stdout=out)
    polished = out.getvalue().splitlines()[1]
    BUF = 45
    assert p["truth"][BUF:DRAFT_LEN - BUF] in polished


def test_variants_calculate_all_support(consensus_pipeline):
    import io as _io
    p = consensus_pipeline
    vcf_path = str(p["dir"] / "polished_sup.vcf")
    var_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["draft_fa"],
                  "-w", f"tig1:0-{DRAFT_LEN - 1}", "--consensus",
                  "--calculate-all-support", "-o", vcf_path, "-d", "10"])
    lines = [l for l in open(vcf_path) if not l.startswith("#")]
    snp = [l for l in lines
           if len(l.split("\t")[3]) == 1 and len(l.split("\t")[4]) == 1]
    assert snp
    info = snp[0].split("\t")[7]
    assert "SupportFractionByBase=" in info
    fracs = [float(x) for x in
             info.split("SupportFractionByBase=")[1].split(";")[0].split(",")]
    assert len(fracs) == 4 and abs(sum(fracs) - 1.0) < 0.05
    # the truth base should dominate
    alt = snp[0].split("\t")[4]
    assert fracs["ACGT".index(alt)] > 0.5


def test_event_subsequences_batch_matches_scalar(consensus_pipeline):
    """get_event_subsequences_batch must reproduce per-window
    get_event_subsequences exactly (records, order, event bounds)."""
    from nanopolish_tpu.alignment.alignment_db import AlignmentDB

    p = consensus_pipeline
    db = AlignmentDB(p["fastq"], p["draft_fa"], p["bam"])
    db.load_region("tig1", 0, DRAFT_LEN - 1)
    starts = np.arange(db.get_region_start(), db.get_region_end() - 21)
    stops = starts + 21
    batched = db.get_event_subsequences_batch("tig1", starts, stops)
    assert len(batched) == len(starts)
    for s, e, got in zip(starts, stops, batched):
        want = db.get_event_subsequences("tig1", int(s), int(e))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g.sr is w.sr and g.strand == w.strand and g.rc == w.rc
            assert g.event_start_idx == w.event_start_idx
            assert g.event_stop_idx == w.event_stop_idx
