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
