"""End-to-end polya: synthetic direct-RNA reads with a known poly(A) tail
length; the segmentation HMM + read-rate estimator must recover it
(reference: docs/source/quickstart_polya.rst)."""

import io

import numpy as np
import pytest

from nanopolish_tpu.apps import index as index_app
from nanopolish_tpu.apps import polya as polya_app
from nanopolish_tpu.io.bam import BamRecord, BamWriter
from nanopolish_tpu.io.slow5 import Slow5Writer
from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.utils.synthetic import random_sequence

POLYA_NT = 120
# direct RNA runs at ~70 bases/s on a 3 kHz sampler => ~30+ samples/base;
# the RNA event detector (windows 7/14) needs this density
SAMPLES_PER_BASE = 30.0
SAMPLE_RATE = 4000.0
TRANSCRIPT_LEN = 500


def _rna_read_signal(rng, transcript, model):
    """3'->5' raw signal: START | LEADER | ADAPTER | POLYA | transcript."""
    parts = [
        rng.normal(70.3, 2.0, size=300),         # START
        rng.normal(110.9, 2.0, size=400),        # LEADER
        rng.normal(79.3, 2.5, size=400),         # ADAPTER (main mode)
        rng.normal(108.9, 1.5, size=int(POLYA_NT * SAMPLES_PER_BASE)),
    ]
    # transcript portion: kmer levels in reverse order (RNA reads 3'->5')
    seq = transcript.replace("U", "T")
    ranks = model.alphabet.seq_to_kmer_ranks(seq, model.k)[::-1]
    nsamp = np.maximum(3, rng.poisson(SAMPLES_PER_BASE, size=len(ranks)))
    level = model.level_mean[ranks]
    stdv = model.level_stdv[ranks]
    parts.append(rng.normal(np.repeat(level, nsamp), np.repeat(stdv, nsamp)))
    return np.concatenate(parts).astype(np.float32)


@pytest.fixture(scope="module")
def polya_pipeline(tmp_path_factory):
    d = tmp_path_factory.mktemp("polya_e2e")
    rng = np.random.default_rng(41)
    model = PoreModelSet.instance().get_model(
        "r9.4_70bps", "u_to_t_rna", "template", 5)
    transcript = random_sequence(rng, TRANSCRIPT_LEN)

    ref_fa = str(d / "ref.fa")
    with open(ref_fa, "w") as fh:
        fh.write(">rna1\n")
        for i in range(0, TRANSCRIPT_LEN, 60):
            fh.write(transcript[i:i + 60] + "\n")

    fastq = str(d / "reads.fastq")
    slow5 = str(d / "sig.slow5")
    n_reads = 3
    with open(fastq, "w") as fq, Slow5Writer(slow5) as sw:
        for i in range(n_reads):
            name = f"rna{i}"
            fq.write(f"@{name}\n{transcript}\n+\n{'I' * TRANSCRIPT_LEN}\n")
            pa = _rna_read_signal(rng, transcript, model)
            adc = np.clip(pa * 8192.0 / 1400.0, -32000, 32000).astype(np.int16)
            sw.write(name, adc, 8192.0, 0.0, 1400.0, SAMPLE_RATE)

    index_app.main([fastq, "--slow5", slow5])
    # mark reads as RNA: slow5 loader reports experiment_type dna by
    # default; patch via aux is complex, so the test monkeypatches below.
    bam = str(d / "aln.bam")
    w = BamWriter(bam, "@HD\tVN:1.6\tSO:coordinate\n", ["rna1"],
                  [TRANSCRIPT_LEN])
    for i in range(n_reads):
        w.write(BamRecord(qname=f"rna{i}", tid=0, pos=0, mapq=60,
                          cigar=[(0, TRANSCRIPT_LEN)], seq=transcript,
                          qual=np.full(TRANSCRIPT_LEN, 30, np.uint8)))
    w.close()
    return {"fastq": fastq, "bam": bam, "ref_fa": ref_fa}


def test_polya_recovers_tail_length(polya_pipeline, monkeypatch):
    p = polya_pipeline
    # force RNA experiment type for slow5-loaded reads
    from nanopolish_tpu.io.slow5 import Slow5Record
    orig = Slow5Record.to_fast5_data

    def rna_to_fast5(self, kit="", experiment_type="dna"):
        return orig(self, kit=kit, experiment_type="rna")

    monkeypatch.setattr(Slow5Record, "to_fast5_data", rna_to_fast5)

    out = io.StringIO()
    polya_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"]],
                   stdout=out)
    lines = out.getvalue().splitlines()
    assert lines[0].startswith("readname\tcontig\tposition\tleader_start")
    rows = [l.split("\t") for l in lines[1:]]
    assert len(rows) == 3
    n_pass = 0
    for f in rows:
        assert f[1] == "rna1"
        if f[9] != "PASS":
            continue
        n_pass += 1
        polya_len = float(f[8])
        # estimator has a known modal offset; accept a generous window
        assert 80 <= polya_len <= 170, f
        # segmentation ordering sanity
        ls, as_, ps, ts = (float(f[3]), float(f[4]), float(f[5]), float(f[6]))
        assert ls < as_ < ps < ts
    assert n_pass >= 2


def test_detect_polyi_on_polya_reads(polya_pipeline, monkeypatch):
    """A pure poly(A) tail must classify as POLYA-ONLY (or NONE on short
    regions) — never POLYI-ONLY."""
    p = polya_pipeline
    from nanopolish_tpu.io.slow5 import Slow5Record
    orig = Slow5Record.to_fast5_data

    def rna_to_fast5(self, kit="", experiment_type="dna"):
        return orig(self, kit=kit, experiment_type="rna")

    monkeypatch.setattr(Slow5Record, "to_fast5_data", rna_to_fast5)
    from nanopolish_tpu.apps import detect_polyi as dpi_app
    out = io.StringIO()
    dpi_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"]],
                 stdout=out)
    lines = out.getvalue().splitlines()
    assert lines[0].endswith("detected\tqc_tag")
    rows = [l.split("\t") for l in lines[1:]]
    assert rows
    for f in rows:
        if f[-1] == "PASS":
            assert f[9] in ("POLYA-ONLY", "NONE"), f


def test_fast5_check(polya_pipeline):
    from nanopolish_tpu.apps import fast5_check as fc_app
    out = io.StringIO()
    ret = fc_app.main(["-r", polya_pipeline["fastq"]], stdout=out)
    lines = out.getvalue().splitlines()
    assert ret == 0
    assert len(lines) == 3
    assert all(l.startswith("OK\t") for l in lines)
