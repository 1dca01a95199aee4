"""Workflow scripts: makerange windowing, methylation frequency
aggregation, consensus segment merging."""

import importlib.util
import os
import subprocess
import sys

import numpy as np

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(SCRIPTS, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_makerange(tmp_path, capsys):
    fa = tmp_path / "g.fa"
    fa.write_text(">c1\n" + "A" * 120000 + "\n>c2\n" + "C" * 900 + "\n")
    mod = _load("nanopolish_makerange")
    mod.main([str(fa)])
    out = capsys.readouterr().out.splitlines()
    assert out == ["c1:0-50200", "c1:50000-100200", "c1:100000-119999",
                   "c2:0-899"]


def test_methylation_frequency(tmp_path, capsys):
    tsv = tmp_path / "calls.tsv"
    rows = [
        "chromosome\tstrand\tstart\tend\tread_name\tlog_lik_ratio\t"
        "log_lik_methylated\tlog_lik_unmethylated\tnum_calling_strands\t"
        "num_motifs\tsequence",
        "c\t+\t100\t100\tr1\t5.0\t-10\t-15\t1\t1\tAAACGAAA",
        "c\t+\t100\t100\tr2\t-6.0\t-15\t-9\t1\t1\tAAACGAAA",
        "c\t+\t100\t100\tr3\t0.5\t-9\t-9.5\t1\t1\tAAACGAAA",  # ambiguous
        "c\t+\t200\t204\tr1\t8.0\t-10\t-18\t1\t2\tAACGCGAA",
    ]
    tsv.write_text("\n".join(rows) + "\n")
    mod = _load("calculate_methylation_frequency")
    mod.main([str(tsv)])
    out = capsys.readouterr().out.splitlines()
    assert out[0].startswith("chromosome\tstart\tend")
    body = {tuple(l.split("\t")[:2]): l.split("\t") for l in out[1:]}
    r100 = body[("c", "100")]
    assert r100[4] == "2" and r100[5] == "1"          # 2 called, 1 methylated
    assert abs(float(r100[6]) - 0.5) < 1e-9
    r200 = body[("c", "200")]
    assert r200[3] == "2" and float(r200[6]) == 1.0


def test_merge_segments(tmp_path, capsys):
    rng = np.random.default_rng(3)
    full = "".join(rng.choice(list("ACGT"), 1200))
    mod = _load("nanopolish_merge")
    # two overlapping windows as makerange would produce (with fake 50k grid
    # replaced by direct overlap): consensus merge of [0:700] and [500:1200]
    a = full[:700]
    b = full[500:]
    merged = mod.merge_into_consensus(a, b, 200)
    assert merged == full


def test_compare_methylation(tmp_path, capsys):
    hdr = ("chromosome\tstart\tend\tnum_motifs_in_group\tcalled_sites\t"
           "called_sites_methylated\tmethylated_frequency\tgroup_sequence\t"
           "num_cpgs_in_group\n")
    a = tmp_path / "freq_a.tsv"
    a.write_text(hdr +
                 "c1\t10\t10\t1\t20\t10\t0.5\tACGT\t1\n"
                 "c1\t50\t54\t2\t8\t8\t1.0\tACGTCG\t2\n"   # non-singleton: skipped
                 "c1\t99\t99\t1\t5\t0\t0.0\tTTCGA\t1\n")
    b = tmp_path / "freq_b.tsv"
    b.write_text(hdr +
                 "c1\t10\t10\t1\t10\t9\t0.9\tACGT\t1\n"
                 "c1\t77\t77\t1\t4\t4\t1.0\tGGCGA\t1\n")
    mod = _load("compare_methylation")
    assert mod.main([str(a), str(b)]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0].startswith("key\tdepth_1")
    assert out[1:] == ["c1:10-10\t20\t0.5000\t10\t0.9000"]


def test_dropmodel(tmp_path, capsys, monkeypatch):
    import itertools
    m = tmp_path / "kit.nucleotide.2mer.template.model"
    rows = []
    vals = {}
    for i, km in enumerate("".join(t) for t in
                           itertools.product("ACGT", repeat=2)):
        vals[km] = (80.0 + i, 1.0 + 0.1 * i)
        rows.append(f"{km}\t{vals[km][0]}\t{vals[km][1]}\t0\t0\t0")
    m.write_text("#kit\tkit\n#strand\ttemplate\nkmer\tlevel_mean\t"
                 "level_stdv\tsd_mean\tsd_stdv\n" + "\n".join(rows) + "\n")
    mod = _load("dropmodel")
    monkeypatch.chdir(tmp_path)
    assert mod.main(["-i", m.name]) == 0
    out_name = capsys.readouterr().out.strip()
    assert out_name.endswith("1mer.template.model")
    lines = (tmp_path / out_name).read_text().splitlines()
    body = {l.split("\t")[0]: float(l.split("\t")[1]) for l in lines
            if l and not l.startswith("#") and not l.startswith("kmer")}
    # A-mer collapses AA,AC,AG,AT: mean of their means
    want = sum(vals["A" + b][0] for b in "ACGT") / 4
    assert abs(body["A"] - want) < 1e-9


def test_import_ont_model(tmp_path, capsys, monkeypatch):
    d = tmp_path / "r9.4" / "r9.4_180mv_450bps_6mer_RNA"
    d.mkdir(parents=True)
    src = d / "template_median68pA.model"
    src.write_text("kmer\tlevel_mean\tlevel_stdv\n"
                   "ACGTAA\t80.0\t1.0\nAAAAAC\t90.0\t2.0\n")
    mod = _load("import_ont_model")
    monkeypatch.chdir(tmp_path)
    assert mod.main(["-i", str(src)]) == 0
    out_name = capsys.readouterr().out.strip()
    assert out_name == "r9.4_450bps.nucleotide.6mer.template.model"
    txt = (tmp_path / out_name).read_text()
    assert "#kit\tr9.4_450bps" in txt and "#strand\ttemplate" in txt
    body = [l.split("\t")[0] for l in txt.splitlines()
            if l and not l.startswith("#") and not l.startswith("kmer")]
    # RNA kmers are reversed into 5'->3' and sorted
    assert body == sorted(["AATGCA", "CAAAAA"])


def test_extract_reads_aligned_to_region(tmp_path, monkeypatch, capsys):
    import tarfile

    from nanopolish_tpu.apps import index as index_app
    from nanopolish_tpu.io.bam import BamRecord, BamWriter
    from nanopolish_tpu.io.slow5 import Slow5Writer

    monkeypatch.chdir(tmp_path)
    (tmp_path / "g.fa").write_text(">c1\n" + "ACGT" * 300 + "\n")
    with open("r.fastq", "w") as fq, Slow5Writer("s.slow5") as sw:
        for i, pos in enumerate((0, 400, 900)):
            fq.write(f"@rd{i}\n{'ACGT' * 50}\n+\n{'I' * 200}\n")
            sw.write(f"rd{i}", np.arange(100, dtype=np.int16),
                     8192.0, 0.0, 1400.0, 4000.0)
    index_app.main(["r.fastq", "--slow5", "s.slow5"])
    w = BamWriter("a.bam", "@HD\tVN:1.6\tSO:coordinate\n", ["c1"], [1200])
    for i, pos in enumerate((0, 400, 900)):
        w.write(BamRecord(qname=f"rd{i}", flag=0, tid=0, pos=pos, mapq=60,
                          cigar=[(0, 200)], seq="ACGT" * 50,
                          qual=np.full(200, 30, np.uint8)))
    w.close()

    mod = _load("extract_reads_aligned_to_region")
    assert mod.main(["-b", "a.bam", "-r", "r.fastq", "-g", "g.fa",
                     "-w", "c1:350-700", "-o", "sub"]) == 0
    out = capsys.readouterr().out.strip()
    assert out == "sub.tar.gz"
    with tarfile.open("sub.tar.gz") as tar:
        names = tar.getnames()
        fq_member = [n for n in names if n.endswith("region_reads.fastq")][0]
        txt = tar.extractfile(fq_member).read().decode()
        assert "@rd1" in txt and "@rd0" not in txt and "@rd2" not in txt
        assert any("region_signal" in n for n in names)
    assert "reads: 1" in (tmp_path / "sub.log").read_text()
