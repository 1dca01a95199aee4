"""Golden-output fixtures: byte-frozen eventalign TSV/summary, methylation
TSV, and consensus VCF from deterministic synthetic pipelines.

The e2e tests check structure/sanity against generating truth; these tests
freeze the exact bytes (the model: the expected-output blocks in the
reference docs, e.g. quickstart_call_methylation.rst:74-88) so that any
drift in output formatting, scoring, QC gating, or candidate logic fails
CI with a one-line diff.

Goldens were produced on the CPU backend with the exact-scan kernels
(NPT_BANDED_IMPL=scan, NPT_HMM_IMPL=scan), which the fixtures force, so
the bytes are backend-stable.  Regenerate intentionally with
NPT_UPDATE_GOLDEN=1 after reviewing the diff.
"""

import difflib
import io
import os

import numpy as np
import pytest

from nanopolish_tpu.apps import call_methylation as meth_app
from nanopolish_tpu.apps import eventalign as ea_app
from nanopolish_tpu.apps import index as index_app
from nanopolish_tpu.apps import variants as var_app
from nanopolish_tpu.io.bam import BamRecord, BamWriter
from nanopolish_tpu.io.slow5 import Slow5Writer
from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.models.squiggle import SquiggleScalings
from nanopolish_tpu.utils.alphabet import DNA_ALPHABET, METHYL_CPG_ALPHABET
from nanopolish_tpu.utils.synthetic import random_sequence, synthetic_raw_signal

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(autouse=True)
def _exact_kernels(monkeypatch):
    monkeypatch.setenv("NPT_BANDED_IMPL", "scan")
    monkeypatch.setenv("NPT_HMM_IMPL", "scan")


def _check_golden(name: str, got: str):
    path = os.path.join(GOLDEN_DIR, name)
    if os.environ.get("NPT_UPDATE_GOLDEN"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as fh:
            fh.write(got)
        return
    assert os.path.exists(path), f"golden fixture {name} missing; " \
        "run with NPT_UPDATE_GOLDEN=1 to create"
    want = open(path).read()
    if got != want:
        diff = "\n".join(difflib.unified_diff(
            want.splitlines(), got.splitlines(), "golden", "got",
            lineterm="", n=1))
        raise AssertionError(f"{name} drifted from golden:\n{diff[:4000]}")


def _write_fa(path, name, seq):
    with open(path, "w") as fh:
        fh.write(f">{name}\n")
        for i in range(0, len(seq), 60):
            fh.write(seq[i:i + 60] + "\n")


def _adc(pa):
    return np.clip(pa * 8192.0 / 1400.0, -32000, 32000).astype(np.int16)


@pytest.fixture(scope="module")
def ea_pipe(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden_ea")
    rng = np.random.default_rng(1234)
    model = PoreModelSet.instance().get_model(
        "r9.4_450bps", "nucleotide", "template", 6)
    genome = random_sequence(rng, 900)
    ref_fa = str(d / "ref.fa")
    _write_fa(ref_fa, "tig1", genome)
    fastq, slow5 = str(d / "reads.fastq"), str(d / "sig.slow5")
    plan = [("gr0", 40, False), ("gr1", 420, True),
            ("gr2", 180, False), ("gr3", 560, True)]
    L = 300
    with open(fastq, "w") as fq, Slow5Writer(slow5) as sw:
        for name, pos, is_rev in plan:
            seg = genome[pos:pos + L]
            basecall = DNA_ALPHABET.reverse_complement(seg) if is_rev else seg
            fq.write(f"@{name}\n{basecall}\n+\n{'I' * L}\n")
            sc = SquiggleScalings.from4(1.5, 1.01, 0.0, 1.0)
            pa = synthetic_raw_signal(rng, basecall, model, sc,
                                      samples_per_base=10.0, leader=400,
                                      trailer=100)
            sw.write(name, _adc(pa), 8192.0, 0.0, 1400.0, 4000.0)
    index_app.main([fastq, "--slow5", slow5])
    bam = str(d / "aln.bam")
    w = BamWriter(bam, "@HD\tVN:1.6\tSO:coordinate\n", ["tig1"], [len(genome)])
    for name, pos, is_rev in plan:
        seg = genome[pos:pos + L]
        w.write(BamRecord(qname=name, flag=16 if is_rev else 0, tid=0,
                          pos=pos, mapq=60, cigar=[(0, L)], seq=seg,
                          qual=np.full(L, 30, np.uint8)))
    w.close()
    return dict(dir=d, ref_fa=ref_fa, fastq=fastq, bam=bam)


def test_golden_eventalign_tsv_and_summary(ea_pipe):
    p = ea_pipe
    out = io.StringIO()
    summary = str(p["dir"] / "summary.tsv")
    ea_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"],
                 "--print-read-names", "--summary", summary], stdout=out)
    _check_golden("eventalign.tsv", out.getvalue())
    _check_golden("eventalign_summary.tsv", open(summary).read())


@pytest.fixture(scope="module")
def meth_pipe(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden_meth")
    rng = np.random.default_rng(77)
    pms = PoreModelSet.instance()
    nuc = pms.get_model("r9.4_450bps", "nucleotide", "template", 6)
    cpg = pms.get_model("r9.4_450bps", "cpg", "template", 6)
    genome = random_sequence(rng, 1000)
    ref_fa = str(d / "ref.fa")
    _write_fa(ref_fa, "tig1", genome)
    fastq, slow5 = str(d / "reads.fastq"), str(d / "sig.slow5")
    plan = [("gm0", 60, False, True), ("gu0", 380, False, False),
            ("gm1", 600, True, True)]
    L = 320
    with open(fastq, "w") as fq, Slow5Writer(slow5) as sw:
        for name, pos, is_rev, is_meth in plan:
            seg = genome[pos:pos + L]
            basecall = DNA_ALPHABET.reverse_complement(seg) if is_rev else seg
            fq.write(f"@{name}\n{basecall}\n+\n{'I' * L}\n")
            sc = SquiggleScalings.from4(0.5, 1.0, 0.0, 1.0)
            if is_meth:
                pa = synthetic_raw_signal(rng,
                                          METHYL_CPG_ALPHABET.methylate(basecall),
                                          cpg, sc, samples_per_base=10.0,
                                          leader=400, trailer=100)
            else:
                pa = synthetic_raw_signal(rng, basecall, nuc, sc,
                                          samples_per_base=10.0, leader=400,
                                          trailer=100)
            sw.write(name, _adc(pa), 8192.0, 0.0, 1400.0, 4000.0)
    index_app.main([fastq, "--slow5", slow5])
    bam = str(d / "aln.bam")
    w = BamWriter(bam, "@HD\tVN:1.6\tSO:coordinate\n", ["tig1"], [len(genome)])
    for name, pos, is_rev, _m in sorted(plan, key=lambda t: t[1]):
        seg = genome[pos:pos + L]
        w.write(BamRecord(qname=name, flag=16 if is_rev else 0, tid=0,
                          pos=pos, mapq=60, cigar=[(0, L)], seq=seg,
                          qual=np.full(L, 30, np.uint8)))
    w.close()
    return dict(dir=d, ref_fa=ref_fa, fastq=fastq, bam=bam)


def test_golden_methylation_tsv(meth_pipe):
    p = meth_pipe
    out = io.StringIO()
    meth_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"]],
                  stdout=out)
    _check_golden("methylation.tsv", out.getvalue())


@pytest.fixture(scope="module")
def cons_pipe(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden_cons")
    rng = np.random.default_rng(31)
    model = PoreModelSet.instance().get_model(
        "r9.4_450bps", "nucleotide", "template", 6)
    truth = random_sequence(rng, 300)
    sub_pos = 130
    draft = list(truth)
    orig = draft[sub_pos]
    draft[sub_pos] = {"A": "G", "C": "T", "G": "A", "T": "C"}[orig]
    draft = "".join(draft)
    draft_fa = str(d / "draft.fa")
    _write_fa(draft_fa, "tig1", draft)
    fastq, slow5 = str(d / "reads.fastq"), str(d / "sig.slow5")
    with open(fastq, "w") as fq, Slow5Writer(slow5) as sw:
        for i in range(12):
            name = f"gc{i}"
            fq.write(f"@{name}\n{truth}\n+\n{'I' * len(truth)}\n")
            sc = SquiggleScalings.from4(float(rng.uniform(-2, 2)), 1.0,
                                        0.0, 1.0)
            pa = synthetic_raw_signal(rng, truth, model, sc,
                                      samples_per_base=9.0, leader=400,
                                      trailer=90)
            sw.write(name, _adc(pa), 8192.0, 0.0, 1400.0, 4000.0)
    index_app.main([fastq, "--slow5", slow5])
    bam = str(d / "aln.bam")
    w = BamWriter(bam, "@HD\tVN:1.6\tSO:coordinate\n", ["tig1"], [len(draft)])
    for i in range(12):
        w.write(BamRecord(qname=f"gc{i}", tid=0, pos=0, mapq=60,
                          cigar=[(0, len(truth))], seq=truth,
                          qual=np.full(len(truth), 30, np.uint8)))
    w.close()
    return dict(dir=d, draft_fa=draft_fa, fastq=fastq, bam=bam)


def test_golden_consensus_vcf(cons_pipe):
    p = cons_pipe
    vcf_path = str(p["dir"] / "polished.vcf")
    var_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["draft_fa"],
                  "-w", "tig1:0-299", "--consensus", "-o", vcf_path,
                  "-d", "5"])
    _check_golden("consensus.vcf", open(vcf_path).read())


def test_golden_eventalign_sam(ea_pipe):
    """eventalign --sam emits the reference's event-to-basecall SAM
    records (eventalign.cpp emit_event_alignment_sam)."""
    p = ea_pipe
    out = io.StringIO()
    ea_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"],
                 "--sam"], stdout=out)
    _check_golden("eventalign.sam", out.getvalue())


def _render_bam(path):
    """Stable text rendering of a BAM for byte-frozen goldens."""
    from nanopolish_tpu.io.bam import BamReader
    r = BamReader(path)
    lines = [r.header_text.rstrip("\n")]
    for rec in r:
        lines.append(rec.to_sam(r.references))
    r.close()
    return "\n".join(lines) + "\n"


@pytest.mark.parametrize("style", ["read", "reference"])
def test_golden_modbam(meth_pipe, tmp_path, style):
    """Both modbam styles (basemods.cpp:107-235) frozen as SAM text."""
    p = meth_pipe
    out = io.StringIO()
    modbam = str(tmp_path / f"mods_{style}.bam")
    meth_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"],
                   "--modbam-output-name", modbam,
                   "--modbam-style", style], stdout=out)
    _check_golden(f"modbam_{style}.sam", _render_bam(modbam))


@pytest.fixture(scope="module")
def polya_pipe(tmp_path_factory):
    from nanopolish_tpu.utils.synthetic import random_sequence as rand_seq
    from tests.test_polya_e2e import (_rna_read_signal, SAMPLE_RATE,
                                      TRANSCRIPT_LEN)

    d = tmp_path_factory.mktemp("golden_polya")
    rng = np.random.default_rng(97)
    model = PoreModelSet.instance().get_model(
        "r9.4_70bps", "u_to_t_rna", "template", 5)
    transcript = rand_seq(rng, TRANSCRIPT_LEN)
    ref_fa = str(d / "ref.fa")
    _write_fa(ref_fa, "rna1", transcript)
    fastq, slow5 = str(d / "reads.fastq"), str(d / "sig.slow5")
    n_reads = 3
    with open(fastq, "w") as fq, Slow5Writer(slow5) as sw:
        for i in range(n_reads):
            fq.write(f"@grna{i}\n{transcript}\n+\n{'I' * TRANSCRIPT_LEN}\n")
            pa = _rna_read_signal(rng, transcript, model)
            sw.write(f"grna{i}", _adc(pa), 8192.0, 0.0, 1400.0, SAMPLE_RATE)
    index_app.main([fastq, "--slow5", slow5])
    bam = str(d / "aln.bam")
    w = BamWriter(bam, "@HD\tVN:1.6\tSO:coordinate\n", ["rna1"],
                  [TRANSCRIPT_LEN])
    for i in range(n_reads):
        w.write(BamRecord(qname=f"grna{i}", tid=0, pos=0, mapq=60,
                          cigar=[(0, TRANSCRIPT_LEN)], seq=transcript,
                          qual=np.full(TRANSCRIPT_LEN, 30, np.uint8)))
    w.close()
    return dict(ref_fa=ref_fa, fastq=fastq, bam=bam)


def test_golden_polya_tsv(polya_pipe, monkeypatch):
    """polya TSV (quickstart_polya.rst output block) byte-frozen."""
    from nanopolish_tpu.apps import polya as polya_app
    from nanopolish_tpu.io.slow5 import Slow5Record

    orig = Slow5Record.to_fast5_data

    def rna_to_fast5(self, kit="", experiment_type="dna"):
        return orig(self, kit=kit, experiment_type="rna")

    monkeypatch.setattr(Slow5Record, "to_fast5_data", rna_to_fast5)
    p = polya_pipe
    out = io.StringIO()
    polya_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"]],
                   stdout=out)
    _check_golden("polya.tsv", out.getvalue())
