"""End-to-end eventalign: synthetic genome + signal -> index -> eventalign
TSV/summary/SAM, checking output structure and alignment sanity against the
generating truth (the reference's docs quickstarts are the e2e model;
reference: docs/source/quickstart_eventalign.rst)."""

import io
import os

import numpy as np
import pytest

from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.models.squiggle import SquiggleScalings
from nanopolish_tpu.utils.alphabet import DNA_ALPHABET
from nanopolish_tpu.utils.synthetic import random_sequence, synthetic_raw_signal
from nanopolish_tpu.io.bam import BamRecord, BamWriter
from nanopolish_tpu.io.slow5 import Slow5Writer
from nanopolish_tpu.apps import eventalign as ea_app
from nanopolish_tpu.apps import index as index_app

N_READS = 4
READ_LEN = 420
GENOME_LEN = 2400


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    """Build genome, reads, signal, readdb, and BAM."""
    d = tmp_path_factory.mktemp("ev_e2e")
    rng = np.random.default_rng(42)
    model = PoreModelSet.instance().get_model(
        "r9.4_450bps", "nucleotide", "template", 6)

    genome = random_sequence(rng, GENOME_LEN)
    ref_fa = str(d / "ref.fa")
    with open(ref_fa, "w") as fh:
        fh.write(">tig1\n")
        for i in range(0, GENOME_LEN, 60):
            fh.write(genome[i:i + 60] + "\n")

    truth = []
    fastq = str(d / "reads.fastq")
    slow5 = str(d / "sig.slow5")
    digitisation, offset, prange = 8192.0, 0.0, 1400.0
    with open(fastq, "w") as fq, Slow5Writer(slow5) as sw:
        for i in range(N_READS):
            pos = int(rng.integers(0, GENOME_LEN - READ_LEN))
            is_rev = i % 2 == 1
            ref_seg = genome[pos:pos + READ_LEN]
            basecall = DNA_ALPHABET.reverse_complement(ref_seg) if is_rev \
                else ref_seg
            name = f"read{i}"
            fq.write(f"@{name}\n{basecall}\n+\n{'I' * len(basecall)}\n")
            sc = SquiggleScalings.from4(
                shift=float(rng.uniform(-3, 3)),
                scale=float(rng.uniform(0.95, 1.05)), drift=0.0, var=1.0)
            pa = synthetic_raw_signal(rng, basecall, model, sc,
                                      samples_per_base=10.0, leader=500,
                                      trailer=120)
            adc = np.clip(pa * digitisation / prange - offset,
                          -32000, 32000).astype(np.int16)
            sw.write(name, adc, digitisation, offset, prange, 4000.0)
            truth.append((name, pos, is_rev, basecall))

    index_app.main([fastq, "--slow5", slow5])

    bam = str(d / "aln.bam")
    w = BamWriter(bam, "@HD\tVN:1.6\tSO:coordinate\n", ["tig1"], [GENOME_LEN])
    for name, pos, is_rev, basecall in sorted(truth, key=lambda t: t[1]):
        seq = DNA_ALPHABET.reverse_complement(basecall) if is_rev else basecall
        w.write(BamRecord(qname=name, flag=16 if is_rev else 0, tid=0,
                          pos=pos, mapq=60, cigar=[(0, READ_LEN)], seq=seq,
                          qual=np.full(READ_LEN, 30, np.uint8),
                          tags={"NM": ("i", 0)}))
    w.close()
    return {"dir": d, "genome": genome, "ref_fa": ref_fa, "fastq": fastq,
            "bam": bam, "truth": {t[0]: t for t in truth}}


def test_eventalign_tsv(pipeline_dir):
    p = pipeline_dir
    out = io.StringIO()
    ea_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"],
                 "--print-read-names", "--summary",
                 str(p["dir"] / "summary.tsv")], stdout=out)
    lines = out.getvalue().splitlines()
    assert lines[0].startswith("contig\tposition\treference_kmer\tread_name")
    rows = [l.split("\t") for l in lines[1:]]
    assert len(rows) > 100
    genome = p["genome"]
    reads_seen = set()
    for f in rows:
        contig, pos, ref_kmer, read_name, strand = f[0], int(f[1]), f[2], f[3], f[4]
        assert contig == "tig1"
        assert strand == "t"
        # reference kmer must match the genome at that position
        assert ref_kmer == genome[pos:pos + 6]
        model_kmer = f[9]
        _, tpos, is_rev, _ = p["truth"][read_name]
        if model_kmer != "NNNNNN":
            if is_rev:
                assert model_kmer == \
                    DNA_ALPHABET.reverse_complement(ref_kmer)
            else:
                assert model_kmer == ref_kmer
        reads_seen.add(read_name)
    assert len(reads_seen) == N_READS

    # per-read event indices behave: monotone direction per read
    for name in reads_seen:
        ev = [int(f[5]) for f in rows if f[3] == name]
        assert len(ev) > 50
        d = np.diff(ev)
        _, tpos, is_rev, _ = p["truth"][name]
        # events should be globally monotone (non-strictly, both K-skips and
        # stays repeat events)
        if is_rev:
            assert (d <= 1).mean() > 0.95
        else:
            assert (d >= -1).mean() > 0.95

    # summary file
    summary = (p["dir"] / "summary.tsv").read_text().splitlines()
    assert summary[0].startswith("read_index\tread_name\tfast5_path")
    assert len(summary) == 1 + N_READS
    for line in summary[1:]:
        f = line.split("\t")
        assert f[4] == "template"
        assert int(f[5]) > 0       # num_events
        assert float(f[11]) > 0.5  # scale


def test_eventalign_scale_events(pipeline_dir):
    p = pipeline_dir
    out = io.StringIO()
    ea_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"],
                 "--scale-events", "--print-read-names"], stdout=out)
    rows = [l.split("\t") for l in out.getvalue().splitlines()[1:]]
    # scaled event means should be near the unscaled model means for M rows
    devs = []
    for f in rows:
        if f[10] != "0.00" and f[9] != "NNNNNN":
            devs.append(abs(float(f[6]) - float(f[10])) / float(f[11]))
    assert np.median(devs) < 2.0


def test_eventalign_sam(pipeline_dir):
    p = pipeline_dir
    out = io.StringIO()
    ea_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"],
                 "--sam"], stdout=out)
    lines = out.getvalue().splitlines()
    body = [l for l in lines if l and not l.startswith("@")]
    assert len(body) == N_READS
    for l in body:
        f = l.split("\t")
        assert f[2] == "tig1"
        assert "M" in f[5]
        assert any(t.startswith("ES:i:") for t in f[11:])


def test_eventalign_window(pipeline_dir):
    p = pipeline_dir
    out = io.StringIO()
    ea_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"],
                 "-w", "tig1:1-700", "--print-read-names"], stdout=out)
    rows = [l.split("\t") for l in out.getvalue().splitlines()[1:]]
    assert rows
    assert all(int(f[1]) <= 700 for f in rows)


def test_device_chain_matches_host_wavefront(pipeline_dir, monkeypatch):
    """The on-device segment chain (alignment/device_chain.py: the whole
    chain in one jitted while_loop) must emit byte-identical TSV to the
    host wavefront when both use the Pallas Viterbi kernel (interpret
    mode off-TPU).  Covers forward and reverse reads."""
    import io as _io

    from nanopolish_tpu.apps import eventalign as ea_app

    p = pipeline_dir
    monkeypatch.setenv("NPT_HMM_IMPL", "pallas")
    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("NPT_EA_DEVICE_CHAIN", mode)
        out = _io.StringIO()
        ea_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"]],
                    stdout=out)
        outs[mode] = out.getvalue()
    assert outs["0"] == outs["1"]
    assert len(outs["1"].splitlines()) > 1000


def test_closest_event_array_matches_scalar():
    """closest_event_array must reproduce get_closest_event_to per index,
    including the +-1000 boundary-exclusive quirks, on random sparse
    maps."""
    from nanopolish_tpu.alignment.device_chain import closest_event_array
    from nanopolish_tpu.models.squiggle import SquiggleRead, T_IDX

    rng = np.random.default_rng(5)
    for density, n in ((0.9, 300), (0.05, 2500), (0.0005, 2500)):
        b2e = np.full((n, 2), -1, np.int32)
        mask = rng.random(n) < density
        b2e[mask, 0] = np.arange(mask.sum(), dtype=np.int32) * 2
        sr = SquiggleRead(read_name="x", read_sequence="A" * (n + 6))
        sr.base_to_event_map[T_IDX] = b2e
        got = closest_event_array(b2e)
        for kidx in list(range(0, n, 37)) + [0, 1, n - 2, n - 1]:
            assert got[kidx] == sr.get_closest_event_to(kidx, T_IDX), \
                (density, kidx)


def test_device_chain_ineligible_jobs_fall_back(pipeline_dir, monkeypatch):
    """Spliced (multi-segment) alignments must take the host wavefront:
    stage_job declines them, and the app still emits their rows."""
    from nanopolish_tpu.alignment import device_chain as dc
    from nanopolish_tpu.alignment.eventalign import _make_job
    from nanopolish_tpu.io.bam import BamRecord
    from nanopolish_tpu.io.fasta import FastaIndex
    from nanopolish_tpu.io.readdb import ReadDB
    from nanopolish_tpu.models.read_loader import load_squiggle_reads

    p = pipeline_dir
    db = ReadDB()
    db.load(p["fastq"])
    name = next(iter(p["truth"]))
    tr = p["truth"][name]
    reads = load_squiggle_reads([name], db, num_threads=1)
    sr = reads[name]
    # a spliced record: two M runs split by an N op
    rec = BamRecord(qname=name, flag=16 if tr[2] else 0, tid=0, pos=tr[1],
                    mapq=60, cigar=[(0, 200), (3, 50), (0, READ_LEN - 200)],
                    seq=tr[3], qual=np.full(READ_LEN, 30, np.uint8))
    fai = FastaIndex(p["ref_fa"])
    job = _make_job(sr, rec, 0, 0, fai, ["tig1"], -1, -1)
    assert job is not None and len(job.pair_segments) == 2
    assert dc.stage_job(job) is None
