"""IO layer tests: BGZF, fasta/faidx, BAM+BAI, slow5, ReadDB round-trips."""

import os
import random
import struct

import numpy as np
import pytest

from nanopolish_tpu.io.bgzf import BgzfReader, BgzfWriter, is_bgzf
from nanopolish_tpu.io.fasta import FastaIndex, build_fai, read_fastx, write_bgzf_fasta
from nanopolish_tpu.io.bam import (
    BamReader, BamRecord, BamWriter, aligned_pairs)
from nanopolish_tpu.io.readdb import ReadDB
from nanopolish_tpu.io.slow5 import Slow5File, Slow5Writer
from nanopolish_tpu.io.vcf import Variant, VcfReader, VcfWriter


def test_bgzf_roundtrip(tmp_path):
    path = str(tmp_path / "t.gz")
    data = bytes(random.Random(7).randbytes(300_000))
    with BgzfWriter.open(path) as w:
        w.write(data)
    assert is_bgzf(path)
    with BgzfReader.open(path) as r:
        assert r.read() == data


def test_bgzf_virtual_offsets(tmp_path):
    path = str(tmp_path / "t.gz")
    w = BgzfWriter.open(path)
    offs = []
    for i in range(5):
        offs.append(w.tell())
        w.write(f"chunk{i:04d}|".encode() * 10000)   # force multiple blocks
    w.close()
    r = BgzfReader.open(path)
    r.seek(offs[3])
    assert r.read(9) == b"chunk0003"
    r.seek(offs[1])
    assert r.read(9) == b"chunk0001"
    r.close()


def _write_fasta(path, seqs, width=7):
    with open(path, "w") as fh:
        for name, seq in seqs.items():
            fh.write(f">{name} desc\n")
            for i in range(0, len(seq), width):
                fh.write(seq[i:i + width] + "\n")


def test_fasta_faidx_fetch(tmp_path):
    rng = random.Random(1)
    seqs = {f"ctg{i}": "".join(rng.choice("ACGT") for _ in range(rng.randint(50, 900)))
            for i in range(4)}
    path = str(tmp_path / "ref.fa")
    _write_fasta(path, seqs)
    fai = FastaIndex(path)
    assert sorted(fai.names()) == sorted(seqs)
    for name, seq in seqs.items():
        assert fai.fetch(name) == seq
        assert fai.fetch(name, 10, 33) == seq[10:33]
        assert fai.fetch(name, 0, 7) == seq[:7]
        assert fai.fetch(name, len(seq) - 5) == seq[-5:]


def test_bgzf_fasta_faidx(tmp_path):
    rng = random.Random(2)
    seqs = {f"read{i}": "".join(rng.choice("ACGT") for _ in range(rng.randint(100, 5000)))
            for i in range(20)}
    path = str(tmp_path / "reads.index")
    write_bgzf_fasta(iter(seqs.items()), path)
    assert is_bgzf(path)
    fai = FastaIndex(path)
    for name, seq in seqs.items():
        assert fai.fetch(name) == seq
        assert fai.fetch(name, 5, 50) == seq[5:50]


def test_read_fastx_fastq(tmp_path):
    path = str(tmp_path / "r.fastq")
    with open(path, "w") as fh:
        fh.write("@r1 extra\nACGTACGT\n+\nIIIIIIII\n@r2\nGGGG\n+\n!!!!\n")
    recs = list(read_fastx(path))
    assert recs == [("r1", "ACGTACGT", "IIIIIIII"), ("r2", "GGGG", "!!!!")]


def _make_bam(tmp_path, n=30, with_index=False):
    rng = random.Random(3)
    refs = ["chr1", "chr2"]
    lengths = [100000, 50000]
    path = str(tmp_path / "x.bam")
    w = BamWriter(path, "@HD\tVN:1.6\tSO:coordinate\n", refs, lengths)
    recs = []
    for i in range(n):
        # coordinate-sorted: first half on chr1, second half on chr2
        tid = 0 if i < n // 2 else 1
        pos = 100 + (i % (n // 2)) * 500
        seq = "".join(rng.choice("ACGT") for _ in range(60))
        rec = BamRecord(qname=f"q{i}", flag=0, tid=tid, pos=pos,
                        mapq=60, cigar=[(0, 30), (1, 5), (0, 25)],
                        seq=seq, qual=np.full(60, 30, np.uint8),
                        tags={"NM": ("i", 3)})
        recs.append(rec)
        w.write(rec)
    w.close()
    return path, recs, refs, lengths


def test_bam_roundtrip(tmp_path):
    path, recs, refs, lengths = _make_bam(tmp_path)
    r = BamReader(path)
    assert r.references == refs
    assert r.lengths == lengths
    got = list(r)
    assert len(got) == len(recs)
    for a, b in zip(got, recs):
        assert a.qname == b.qname
        assert a.pos == b.pos
        assert a.cigar == b.cigar
        assert a.seq == b.seq
        assert list(a.qual) == list(b.qual)
        assert a.tags["NM"] == ("i", 3)
    r.close()


def test_bam_fetch_without_index(tmp_path):
    path, recs, _, _ = _make_bam(tmp_path)
    r = BamReader(path)
    hits = list(r.fetch("chr1", 0, 2000))
    expect = [x for x in recs if x.tid == 0 and x.pos < 2000]
    assert [h.qname for h in hits] == [e.qname for e in expect]
    r.close()


def test_aligned_pairs():
    rec = BamRecord(pos=100, cigar=[(4, 2), (0, 3), (2, 2), (0, 2), (1, 1), (0, 1)])
    pairs = aligned_pairs(rec)
    assert pairs == [(2, 100), (3, 101), (4, 102), (5, 105), (6, 106), (8, 107)]


def test_sam_text():
    rec = BamRecord(qname="q", flag=16, tid=0, pos=99, mapq=7,
                    cigar=[(0, 4)], seq="ACGT",
                    qual=np.array([30, 31, 32, 33], np.uint8),
                    tags={"XX": ("Z", "hi")})
    line = rec.to_sam(["chr1"])
    f = line.split("\t")
    assert f[:6] == ["q", "16", "chr1", "100", "7", "4M"]
    assert f[10] == "?@AB"
    assert "XX:Z:hi" in f


def test_slow5_ascii_roundtrip(tmp_path):
    path = str(tmp_path / "s.slow5")
    rng = np.random.default_rng(5)
    sigs = {f"r{i}": rng.integers(0, 1000, size=50).astype(np.int16)
            for i in range(4)}
    with Slow5Writer(path) as w:
        for rid, sig in sigs.items():
            w.write(rid, sig, 8192.0, 10.0, 1500.0, 4000.0, start_time=7,
                    channel=3)
    f = Slow5File(path)
    recs = {r.read_id: r for r in f}
    assert set(recs) == set(sigs)
    for rid, sig in sigs.items():
        r = recs[rid]
        assert np.array_equal(r.raw_signal, sig)
        assert r.digitisation == 8192.0
        pa = r.to_pa()
        np.testing.assert_allclose(pa, (sig + 10.0) * (1500.0 / 8192.0), rtol=1e-6)
    # random access
    r2 = f.get_read("r2")
    assert r2 is not None and np.array_equal(r2.raw_signal, sigs["r2"])
    f.close()


def test_readdb_roundtrip(tmp_path):
    fastq = str(tmp_path / "reads.fastq")
    rng = random.Random(11)
    seqs = {f"read{i}": "".join(rng.choice("ACGT") for _ in range(200))
            for i in range(6)}
    with open(fastq, "w") as fh:
        for name, seq in seqs.items():
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    db = ReadDB()
    db.build(fastq)
    for i in range(6):
        db.add_signal_path(f"read{i}", f"/data/f5/{i}.fast5")
    db.save()

    db2 = ReadDB()
    db2.load(fastq)
    assert db2.get_num_reads() == 6
    for name, seq in seqs.items():
        assert db2.get_read_sequence(name) == seq
    assert db2.get_signal_path("read3") == "/data/f5/3.fast5"
    assert not db2.is_slow5_mode()


def test_vcf_roundtrip(tmp_path):
    path = str(tmp_path / "v.vcf")
    with open(path, "w") as out:
        w = VcfWriter(out, extra_header=["##nanopolish_window=tig1:100-200"])
        w.write_header()
        v = Variant(ref_name="tig1", ref_position=149, ref_seq="A", alt_seq="ACC",
                    quality=33.2, genotype="1/1")
        v.add_info("TotalReads", 20)
        v.add_info("SupportFraction", 0.857)
        w.write_variant(v)
    r = VcfReader(path)
    assert r.window() == ("tig1", 100, 200)
    recs = r.records()
    assert len(recs) == 1
    v2 = recs[0]
    assert (v2.ref_name, v2.ref_position, v2.ref_seq, v2.alt_seq) == \
        ("tig1", 149, "A", "ACC")
    assert v2.info["TotalReads"] == "20"
    assert v2.genotype == "1/1"
    assert abs(v2.quality - 33.2) < 1e-6


def test_sam_round_trip(tmp_path):
    """BamRecord -> SAM text -> parse_sam -> BAM -> BamReader preserves
    fields and tags."""
    import numpy as np

    from nanopolish_tpu.io.bam import BamReader, BamRecord, parse_sam, sam_to_bam

    rec = BamRecord(qname="q1", flag=16, tid=0, pos=41, mapq=7,
                    cigar=[(4, 2), (0, 5), (1, 1), (0, 3)], seq="ACGTACGTACG",
                    qual=np.arange(11, dtype=np.uint8),
                    tags={"NM": ("i", 3), "XS": ("f", -1.5),
                          "SA": ("Z", "tig2,1,+,5M,60,0;"),
                          "ML": ("B", ("C", [1, 2, 250]))})
    sam = tmp_path / "a.sam"
    sam.write_text("@HD\tVN:1.6\n@SQ\tSN:tig1\tLN:1000\n" +
                   rec.to_sam(["tig1"]) + "\n")
    header, refs, lens, recs = parse_sam(str(sam))
    assert refs == ["tig1"] and lens == [1000]
    got = recs[0]
    assert (got.qname, got.flag, got.tid, got.pos, got.mapq) == \
        ("q1", 16, 0, 41, 7)
    assert got.cigar == rec.cigar and got.seq == rec.seq
    assert got.tags["NM"] == ("i", 3)
    assert got.tags["SA"] == ("Z", "tig2,1,+,5M,60,0;")
    assert got.tags["ML"][1] == ("C", [1, 2, 250])
    bam = str(tmp_path / "a.bam")
    assert sam_to_bam(str(sam), bam) == 1
    r = BamReader(bam)
    back = list(r)[0]
    assert back.qname == "q1" and back.pos == 41 and back.cigar == rec.cigar
    np.testing.assert_array_equal(back.qual, rec.qual)


def test_blow5_writer_roundtrip(tmp_path):
    """Blow5Writer -> Slow5File: binary records, aux fields, index,
    zlib-compressed variant, and Fast5Data conversion."""
    import numpy as np

    from nanopolish_tpu.io.slow5 import Blow5Writer, Slow5File

    sig = (np.arange(5000) % 700).astype(np.int16)
    p = str(tmp_path / "t.blow5")
    with Blow5Writer(p) as w:
        w.write("readA", sig, 8192.0, 3.0, 1400.0, 4000.0,
                start_time=7, channel=2)
        w.write("readB", -sig, 8192.0, 0.0, 1400.0, 4000.0)
    f = Slow5File(p)
    recs = list(f)
    assert [r.read_id for r in recs] == ["readA", "readB"]
    r = recs[0]
    assert r.digitisation == 8192.0 and r.offset == 3.0
    assert np.array_equal(r.raw_signal, sig)
    assert r.aux["start_time"] == 7 and r.aux["channel_number"] == 2
    fd = r.to_fast5_data()
    assert fd.channel_id == 2 and len(fd.rt) == len(sig)
    assert set(f.build_index()) == {"readA", "readB"}

    pz = str(tmp_path / "tz.blow5")
    with Blow5Writer(pz, record_compression=1) as w:
        w.write("readC", sig, 8192.0, 0.0, 1400.0, 4000.0)
    rz = list(Slow5File(pz))[0]
    assert rz.read_id == "readC" and np.array_equal(rz.raw_signal, sig)
