"""End-to-end call-methylation: reads with signal drawn from the
methylated (cpg) vs unmethylated (nucleotide) pore models must separate by
log-likelihood ratio (the reference quickstart's expected-output model;
reference: docs/source/quickstart_call_methylation.rst)."""

import io

import numpy as np
import pytest

from nanopolish_tpu.apps import call_methylation as cm_app
from nanopolish_tpu.apps import index as index_app
from nanopolish_tpu.io.bam import BamRecord, BamWriter
from nanopolish_tpu.io.slow5 import Slow5Writer
from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.models.squiggle import SquiggleScalings
from nanopolish_tpu.utils.alphabet import DNA_ALPHABET, METHYL_CPG_ALPHABET
from nanopolish_tpu.utils.synthetic import random_sequence, synthetic_raw_signal

READ_LEN = 450
GENOME_LEN = 2000


@pytest.fixture(scope="module")
def meth_pipeline(tmp_path_factory):
    d = tmp_path_factory.mktemp("meth_e2e")
    rng = np.random.default_rng(11)
    pms = PoreModelSet.instance()
    nuc_model = pms.get_model("r9.4_450bps", "nucleotide", "template", 6)
    cpg_model = pms.get_model("r9.4_450bps", "cpg", "template", 6)

    genome = random_sequence(rng, GENOME_LEN)
    ref_fa = str(d / "ref.fa")
    with open(ref_fa, "w") as fh:
        fh.write(">tig1\n")
        for i in range(0, GENOME_LEN, 60):
            fh.write(genome[i:i + 60] + "\n")

    # reads: (name, pos, is_rev, methylated?)
    plan = [("m0", 100, False, True), ("m1", 700, True, True),
            ("u0", 400, False, False), ("u1", 1100, True, False)]
    fastq = str(d / "reads.fastq")
    slow5 = str(d / "sig.slow5")
    with open(fastq, "w") as fq, Slow5Writer(slow5) as sw:
        for name, pos, is_rev, is_meth in plan:
            seg = genome[pos:pos + READ_LEN]
            basecall = DNA_ALPHABET.reverse_complement(seg) if is_rev else seg
            fq.write(f"@{name}\n{basecall}\n+\n{'I' * READ_LEN}\n")
            sc = SquiggleScalings.from4(0.0, 1.0, 0.0, 1.0)
            if is_meth:
                # true signal drawn from the methylated model over the
                # CpG-methylated sequence
                sig_seq = METHYL_CPG_ALPHABET.methylate(basecall)
                pa = synthetic_raw_signal(rng, sig_seq, cpg_model, sc,
                                          samples_per_base=10.0, leader=500,
                                          trailer=100)
            else:
                pa = synthetic_raw_signal(rng, basecall, nuc_model, sc,
                                          samples_per_base=10.0, leader=500,
                                          trailer=100)
            adc = np.clip(pa * 8192.0 / 1400.0, -32000, 32000).astype(np.int16)
            sw.write(name, adc, 8192.0, 0.0, 1400.0, 4000.0)

    index_app.main([fastq, "--slow5", slow5])

    bam = str(d / "aln.bam")
    w = BamWriter(bam, "@HD\tVN:1.6\tSO:coordinate\n", ["tig1"], [GENOME_LEN])
    for name, pos, is_rev, _ in sorted(plan, key=lambda t: t[1]):
        seg = genome[pos:pos + READ_LEN]
        w.write(BamRecord(qname=name, flag=16 if is_rev else 0, tid=0,
                          pos=pos, mapq=60, cigar=[(0, READ_LEN)], seq=seg,
                          qual=np.full(READ_LEN, 30, np.uint8)))
    w.close()
    return {"fastq": fastq, "bam": bam, "ref_fa": ref_fa, "genome": genome}


def test_call_methylation_tsv(meth_pipeline):
    p = meth_pipeline
    out = io.StringIO()
    cm_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"],
                 "-q", "cpg"], stdout=out)
    lines = out.getvalue().splitlines()
    assert lines[0] == ("chromosome\tstrand\tstart\tend\tread_name\t"
                        "log_lik_ratio\tlog_lik_methylated\t"
                        "log_lik_unmethylated\tnum_calling_strands\t"
                        "num_motifs\tsequence")
    rows = [l.split("\t") for l in lines[1:]]
    assert len(rows) > 8
    per_read = {}
    genome = p["genome"]
    for f in rows:
        chrom, strand, start, end, name = f[0], f[1], int(f[2]), int(f[3]), f[4]
        llr = float(f[5])
        n_motif = int(f[9])
        seqctx = f[10]
        assert chrom == "tig1"
        assert strand in "+-"
        assert genome[start:start + 2] == "CG"
        assert end >= start
        assert n_motif >= 1
        assert "CG" in seqctx
        per_read.setdefault(name, []).append(llr)
    # methylated reads must skew positive, unmethylated negative
    for name, llrs in per_read.items():
        mean = float(np.mean(llrs))
        if name.startswith("m"):
            assert mean > 0.5, (name, mean)
        else:
            assert mean < -0.5, (name, mean)
    assert {n[0] for n in per_read} == {"m", "u"}


def test_call_methylation_window(meth_pipeline):
    p = meth_pipeline
    out = io.StringIO()
    cm_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"],
                 "-w", "tig1:1-800"], stdout=out)
    rows = [l.split("\t") for l in out.getvalue().splitlines()[1:]]
    assert rows
    assert all(int(f[2]) <= 800 for f in rows)


def test_call_methylation_modbam(meth_pipeline, tmp_path):
    import io as _io
    from nanopolish_tpu.io.bam import BamReader
    p = meth_pipeline
    modbam = str(tmp_path / "mods.bam")
    out = _io.StringIO()
    cm_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"],
                 "-q", "cpg", "--modbam-output-name", modbam,
                 "--modbam-style", "reference"], stdout=out)
    r = BamReader(modbam)
    recs = list(r)
    assert len(recs) == 4
    for rec in recs:
        assert "Mm" in rec.tags and "Ml" in rec.tags
        mm = rec.tags["Mm"][1]
        assert mm.startswith("C+m?") and mm.endswith(";")
        code, probs = rec.tags["Ml"][1]
        assert code == "C"
        n_calls = mm.count(",")
        assert len(probs) == n_calls
        # methylated reads get high probabilities, unmethylated low
        if probs:
            mean_p = sum(probs) / len(probs) / 255.0
            if rec.qname.startswith("m"):
                assert mean_p > 0.6, (rec.qname, mean_p)
            else:
                assert mean_p < 0.4, (rec.qname, mean_p)
    # read-style variant also writes valid records
    modbam2 = str(tmp_path / "mods_read.bam")
    cm_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"],
                 "-q", "cpg", "--modbam-output-name", modbam2,
                 "--modbam-style", "read"], stdout=_io.StringIO())
    recs2 = list(BamReader(modbam2))
    assert len(recs2) == 4
    assert all("Mm" in rc.tags for rc in recs2)


def test_call_methylation_sharding(meth_pipeline):
    """--shard i/N partitions reads disjointly; union == full output."""
    p = meth_pipeline
    full = io.StringIO()
    cm_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"]],
                stdout=full)
    full_rows = sorted(full.getvalue().splitlines()[1:])
    shard_rows = []
    for i in range(2):
        out = io.StringIO()
        cm_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"],
                     "--shard", f"{i}/2"], stdout=out)
        shard_rows += out.getvalue().splitlines()[1:]
    assert sorted(shard_rows) == full_rows


def test_call_methylation_watch_mode(meth_pipeline, tmp_path):
    """--watch live loop: fastq_pass/slow5_pass layout, sharding by numeric
    suffix, external mapper hook, per-chunk .meth.tsv outputs that match
    the direct calling path (call_methylation.cpp:213-530)."""
    import os
    import shutil
    import stat
    import subprocess

    p = meth_pipeline
    run = tmp_path / "run"
    fqd = run / "fastq_pass"
    sgd = run / "slow5_pass"
    fqd.mkdir(parents=True)
    sgd.mkdir()
    # one chunk holding all reads (suffix 0 -> assigned to process 0/2)
    shutil.copy(p["fastq"], fqd / "chunk_0.fastq")
    shutil.copy(os.path.splitext(p["fastq"])[0] + ".slow5"
                if os.path.exists(os.path.splitext(p["fastq"])[0] + ".slow5")
                else os.path.join(os.path.dirname(p["fastq"]), "sig.slow5"),
                sgd / "chunk_0.slow5")
    # a chunk assigned to the OTHER process (suffix 1) must be skipped
    shutil.copy(p["fastq"], fqd / "chunk_1.fastq")

    # stub mapper: emits the known-good alignments as SAM (the real flow
    # shells out to minimap2 the same way)
    from nanopolish_tpu.io.bam import BamReader
    sam_lines = ["@HD\tVN:1.6\tSO:unsorted",
                 f"@SQ\tSN:tig1\tLN:{GENOME_LEN}"]
    r = BamReader(p["bam"])
    for rec in r:
        sam_lines.append(rec.to_sam(r.references))
    r.close()
    sam_txt = "\n".join(sam_lines) + "\n"
    (tmp_path / "aln.sam").write_text(sam_txt)
    mapper = tmp_path / "fake_minimap2"
    mapper.write_text("#!/bin/sh\ncat " + str(tmp_path / "aln.sam") + "\n")
    mapper.chmod(mapper.stat().st_mode | stat.S_IXUSR)

    rc = cm_app.main(["-g", p["ref_fa"], "-q", "cpg",
                      "--watch", str(run), "--watch-once",
                      "--watch-process-total", "2",
                      "--watch-process-index", "0",
                      "--watch-mapper", str(mapper),
                      "--watch-mapper-opts", ""])
    assert rc == 0
    out_tsv = str(fqd / "chunk_0.fastq.meth.tsv")
    assert os.path.exists(out_tsv)
    assert not os.path.exists(str(fqd / "chunk_1.fastq.meth.tsv"))

    # per-chunk output must equal the direct calling path on the same data
    direct = io.StringIO()
    cm_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"],
                 "-q", "cpg"], stdout=direct)
    with open(out_tsv) as fh:
        watch_lines = fh.read().splitlines()
    assert sorted(watch_lines) == sorted(direct.getvalue().splitlines())


def _build_corpus(d, genome, plan, rng):
    """Write ref/fastq/slow5/bam for (name, pos, is_rev, is_meth) plan."""
    pms = PoreModelSet.instance()
    nuc_model = pms.get_model("r9.4_450bps", "nucleotide", "template", 6)
    cpg_model = pms.get_model("r9.4_450bps", "cpg", "template", 6)
    ref_fa = str(d / "ref.fa")
    with open(ref_fa, "w") as fh:
        fh.write(">tig1\n")
        for i in range(0, len(genome), 60):
            fh.write(genome[i:i + 60] + "\n")
    fastq = str(d / "reads.fastq")
    slow5 = str(d / "sig.slow5")
    with open(fastq, "w") as fq, Slow5Writer(slow5) as sw:
        for name, pos, is_rev, is_meth, rlen in plan:
            seg = genome[pos:pos + rlen]
            basecall = DNA_ALPHABET.reverse_complement(seg) if is_rev else seg
            fq.write(f"@{name}\n{basecall}\n+\n{'I' * rlen}\n")
            sc = SquiggleScalings.from4(0.0, 1.0, 0.0, 1.0)
            model = cpg_model if is_meth else nuc_model
            sig_seq = (METHYL_CPG_ALPHABET.methylate(basecall)
                       if is_meth else basecall)
            pa = synthetic_raw_signal(rng, sig_seq, model, sc,
                                      samples_per_base=10.0, leader=500,
                                      trailer=100)
            adc = np.clip(pa * 8192.0 / 1400.0, -32000, 32000).astype(np.int16)
            sw.write(name, adc, 8192.0, 0.0, 1400.0, 4000.0)
    index_app.main([fastq, "--slow5", slow5])
    bam = str(d / "aln.bam")
    w = BamWriter(bam, "@HD\tVN:1.6\tSO:coordinate\n", ["tig1"], [len(genome)])
    for name, pos, is_rev, _, rlen in sorted(plan, key=lambda t: t[1]):
        seg = genome[pos:pos + rlen]
        w.write(BamRecord(qname=name, flag=16 if is_rev else 0, tid=0,
                          pos=pos, mapq=60, cigar=[(0, rlen)], seq=seg,
                          qual=np.full(rlen, 30, np.uint8)))
    w.close()
    return fastq, bam, ref_fa


def _run_both_paths(fastq, bam, ref_fa, monkeypatch):
    outs = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("NPT_METH_ARRAY", mode)
        monkeypatch.setenv("NPT_METH_CHUNK", "3")  # exercise the pipeline
        out = io.StringIO()
        cm_app.main(["-r", fastq, "-b", bam, "-g", ref_fa, "-q", "cpg"],
                    stdout=out)
        outs[mode] = out.getvalue()
    return outs


def test_array_path_parity_random(meth_pipeline, monkeypatch):
    """The array-mode scoring path (struct-of-array collect + batched
    gathers + async drain) must produce byte-identical TSV to the
    HMMInputSequence/ScoreBatcher path."""
    p = meth_pipeline
    outs = _run_both_paths(p["fastq"], p["bam"], p["ref_fa"], monkeypatch)
    assert outs["1"] == outs["0"]
    assert len(outs["1"].splitlines()) > 8


def test_array_path_parity_straddle(tmp_path, monkeypatch):
    """Dense CpGs spaced min_separation+1 apart put a neighbouring motif
    exactly one base outside every window boundary, forcing the non-fast
    (explicit per-window methylate) branch; parity must hold there too."""
    rng = np.random.default_rng(23)
    unit = "ATTGATAGACG"           # CG at offset 9 of each 11-base unit
    genome = ("ATCAAT" * 10) + unit * 60 + ("TTAGCA" * 10)
    plan = [("s0", 0, False, True, 400), ("s1", 150, True, False, 400),
            ("s2", 300, False, True, 400)]
    fastq, bam, ref_fa = _build_corpus(tmp_path, genome, plan, rng)

    # the geometry really does contain non-fast groups
    from nanopolish_tpu.apps.call_methylation import (CallingParameters,
                                                      _ScoreArrays,
                                                      _motif_group_spans,
                                                      _spans_empty_vec)
    params = CallingParameters(methylation_type="cpg")
    alphabet = params.alphabet
    motif_arr = alphabet.motif_positions(genome[:400])
    rl = alphabet.recognition_length
    gs, ge = _motif_group_spans(motif_arr, params.min_separation)
    sub_start = motif_arr[gs] - params.min_flank
    sub_end = motif_arr[ge - 1] + params.min_flank
    fast_v = (_spans_empty_vec(motif_arr, sub_start - rl + 1, sub_start - 1)
              & _spans_empty_vec(motif_arr, sub_end - rl + 2, sub_end))
    assert (~fast_v).any(), "corpus failed to force the straddle branch"

    outs = _run_both_paths(fastq, bam, ref_fa, monkeypatch)
    assert outs["1"] == outs["0"]
    assert len(outs["1"].splitlines()) > 10


# ---------------------------------------------------------------------------
# Native geometry parity (csrc/meth_geometry.cpp)
# ---------------------------------------------------------------------------

def _materialize_block_rows(block, reg):
    """Expand a block's (src, start, step) rank indirection to per-group
    rank rows, for representation-independent comparison."""
    rows_u, rows_m = [], []
    for j in range(len(block["e1"])):
        nk = int(block["nk"][j])
        for key, out in (("ru", rows_u), ("rm", rows_m)):
            src = int(block[f"{key}_src"][j])
            start = int(block[f"{key}_start"][j])
            step = int(block["rstep"][j]) if key == "ru" else \
                int(block["rstep"][j])
            buf = np.asarray(reg.rank_rows[src], np.int64)
            idx = start + np.arange(nk) * step
            out.append(buf[idx])
    return rows_u, rows_m


def test_native_geometry_block_parity(meth_pipeline):
    """collect_read_tasks_native must reproduce collect_read_tasks_arrays'
    geometry and rank rows exactly, across all four methylation
    alphabets."""
    from nanopolish_tpu.apps.call_methylation import (
        CallingParameters, _ScoreArrays, collect_read_tasks_arrays,
        collect_read_tasks_native)
    from nanopolish_tpu.apps.bam_processor import BamBatchProcessor
    from nanopolish_tpu.io.fasta import FastaIndex
    from nanopolish_tpu.io.readdb import ReadDB
    from nanopolish_tpu.models.read_loader import load_squiggle_reads
    from nanopolish_tpu.utils.alphabet import DNA_ALPHABET
    from nanopolish_tpu.utils.native import get_native_lib

    assert get_native_lib() is not None, "native lib must build"
    p = meth_pipeline
    read_db = ReadDB()
    read_db.load(p["fastq"])
    fai = FastaIndex(p["ref_fa"])
    proc = BamBatchProcessor(p["bam"], batch_size=512,
                             min_mapping_quality=20)
    batch = next(proc.batches())
    names = sorted({rec.qname for _, rec in batch})
    reads = load_squiggle_reads(names, read_db, num_threads=2)

    n_groups_checked = 0
    for mtype in ("cpg", "gpc", "dam", "dcm"):
        params = CallingParameters(methylation_type=mtype)
        for read_idx, rec in batch:
            sr = reads.get(rec.qname)
            if sr is None:
                continue
            contig = proc.references[rec.tid]
            ref_seq = DNA_ALPHABET.disambiguate(
                fai.fetch(contig, rec.pos,
                          rec.reference_end() + 1).upper())
            reg_a = _ScoreArrays()
            blocks_a = collect_read_tasks_arrays(
                sr, rec, ref_seq, rec.pos, params, -1, -1, reg_a)
            reg_n = _ScoreArrays()
            blocks_n = collect_read_tasks_native(
                sr, rec, ref_seq, rec.pos, params, -1, -1, reg_n)
            assert blocks_n is not None
            assert len(blocks_a) == len(blocks_n)
            for ba, bn in zip(blocks_a, blocks_n):
                for key in ("strand_idx", "epb"):
                    assert ba[key] == bn[key]
                for key in ("e1", "estep", "nev", "nk", "start_pos",
                            "end_pos", "n_motif", "seq_lo", "seq_hi"):
                    np.testing.assert_array_equal(
                        np.asarray(ba[key], np.int64),
                        np.asarray(bn[key], np.int64), err_msg=key)
                ua, ma = _materialize_block_rows(ba, reg_a)
                un, mn = _materialize_block_rows(bn, reg_n)
                for ra, rn in zip(ua + ma, un + mn):
                    np.testing.assert_array_equal(ra, rn)
                n_groups_checked += len(ba["e1"])
    assert n_groups_checked > 100


def test_native_path_tsv_parity(meth_pipeline, monkeypatch):
    """e2e TSV byte equality: native geometry on vs off."""
    p = meth_pipeline
    outs = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("NPT_METH_NATIVE", mode)
        monkeypatch.setenv("NPT_METH_CHUNK", "3")
        out = io.StringIO()
        cm_app.main(["-r", p["fastq"], "-b", p["bam"], "-g", p["ref_fa"],
                     "-q", "cpg"], stdout=out)
        outs[mode] = out.getvalue()
    assert outs["1"] == outs["0"]
    assert len(outs["1"].splitlines()) > 8


def test_native_path_tsv_parity_straddle(tmp_path, monkeypatch):
    """Native parity on the straddle-forcing corpus (boundary-cut sites
    exercise the per-window methylate semantics in C)."""
    rng = np.random.default_rng(23)
    unit = "ATTGATAGACG"
    genome = ("ATCAAT" * 10) + unit * 60 + ("TTAGCA" * 10)
    plan = [("s0", 0, False, True, 400), ("s1", 150, True, False, 400),
            ("s2", 300, False, True, 400)]
    fastq, bam, ref_fa = _build_corpus(tmp_path, genome, plan, rng)
    outs = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("NPT_METH_NATIVE", mode)
        out = io.StringIO()
        cm_app.main(["-r", fastq, "-b", bam, "-g", ref_fa, "-q", "cpg"],
                    stdout=out)
        outs[mode] = out.getvalue()
    assert outs["1"] == outs["0"]
    assert len(outs["1"].splitlines()) > 10


def _wire_test_inputs(meth_pipeline):
    """Shared fixture machinery for the wire byte-equality tests:
    returns every input plus the reference flat wire from
    _pack_hmm_inputs."""
    from nanopolish_tpu.apps.call_methylation import (
        CallingParameters, _ScoreArrays, collect_read_tasks_native)
    from nanopolish_tpu.apps.bam_processor import BamBatchProcessor
    from nanopolish_tpu.io.fasta import FastaIndex
    from nanopolish_tpu.io.readdb import ReadDB
    from nanopolish_tpu.models.read_loader import load_squiggle_reads
    from nanopolish_tpu.ops.pallas_profile_hmm import (LOG_INV_SQRT_2PI,
                                                      _np_transitions,
                                                      _pack_hmm_inputs)
    from nanopolish_tpu.utils.alphabet import DNA_ALPHABET

    p = meth_pipeline
    read_db = ReadDB()
    read_db.load(p["fastq"])
    fai = FastaIndex(p["ref_fa"])
    proc = BamBatchProcessor(p["bam"], batch_size=8, min_mapping_quality=20)
    batch = next(proc.batches())
    names = sorted({rec.qname for _, rec in batch})
    reads = load_squiggle_reads(names, read_db, num_threads=2)
    params = CallingParameters(methylation_type="cpg")
    reg = _ScoreArrays()
    blocks = []
    for read_idx, rec in batch:
        sr = reads.get(rec.qname)
        if sr is None:
            continue
        ref_seq = DNA_ALPHABET.disambiguate(
            fai.fetch(proc.references[rec.tid], rec.pos,
                      rec.reference_end() + 1).upper())
        bl = collect_read_tasks_native(sr, rec, ref_seq, rec.pos, params,
                                       -1, -1, reg)
        blocks.extend(bl or [])
    assert blocks

    def cat(key):
        return np.concatenate([np.asarray(b[key], np.int64)
                               for b in blocks])

    e1, estep, nev = cat("e1"), cat("estep"), cat("nev")
    ru_src, ru_start, rstep = cat("ru_src"), cat("ru_start"), cat("rstep")
    rm_src, rm_start, nk = cat("rm_src"), cat("rm_start"), cat("nk")
    sizes = np.array([len(b["e1"]) for b in blocks], np.int64)
    lev_id = np.repeat([b["lev"] for b in blocks], sizes)
    tab_id = np.repeat([b["tab"] for b in blocks], sizes)
    epb = np.repeat(np.array([b["epb"] for b in blocks], np.float32),
                    sizes)
    G = len(e1)

    lev_off = np.concatenate(
        [[0], np.cumsum([len(a) for a in reg.lev_rows])])[:-1]
    lev_buf = np.ascontiguousarray(np.concatenate(reg.lev_rows),
                                   np.float32)
    rank_off = np.concatenate(
        [[0], np.cumsum([len(a) for a in reg.rank_rows])])[:-1]
    rank_buf = np.ascontiguousarray(
        np.concatenate([np.asarray(a).ravel() for a in reg.rank_rows]),
        np.int32)
    lev_pos = np.tile(lev_off[lev_id] + e1, 2)
    estep2, nev2 = np.tile(estep, 2), np.tile(nev, 2)
    rk_pos = np.concatenate([rank_off[ru_src] + ru_start,
                             rank_off[rm_src] + rm_start])
    rk_step, nk2 = np.tile(rstep, 2), np.tile(nk, 2)
    tab2 = np.tile(tab_id, 2)
    epb2 = np.tile(epb, 2)
    tp = int(np.maximum(64, 2 ** np.ceil(np.log2(nev2.max()))))
    kp = int(np.maximum(128, 2 ** np.ceil(np.log2(nk2.max()))))
    sel = np.flatnonzero(
        (np.maximum(64, np.exp2(np.ceil(np.log2(nev2)))) == tp)
        & (np.maximum(128, np.exp2(np.ceil(np.log2(nk2)))) == kp)
    ).astype(np.int64)[:300]
    assert len(sel) > 4
    n = len(sel)
    Tc, Kc = int(nev2[sel].max()), int(nk2[sel].max())
    levels = np.zeros((n, Tc), np.float32)
    mu = np.zeros((n, Kc), np.float32)
    sigma = np.ones((n, Kc), np.float32)
    for r, i in enumerate(sel.tolist()):
        idx = lev_pos[i] + np.arange(nev2[i]) * estep2[i]
        levels[r, :nev2[i]] = lev_buf[idx]
        rk = rank_buf[rk_pos[i] + np.arange(nk2[i]) * rk_step[i]]
        mu[r, :nk2[i]] = reg.mu_tabs[tab2[i]][rk]
        sigma[r, :nk2[i]] = reg.sig_tabs[tab2[i]][rk]
    packed, TP, B0, _, _ = _pack_hmm_inputs(
        levels, nev2[sel].astype(np.int32), mu, sigma,
        np.log(np.maximum(sigma, 1e-30)), nk2[sel].astype(np.int32),
        epb2[sel], np.full(n, 3, np.int32), 1.0, kp=kp, r_min=64)
    assert TP == tp

    n_tabs = len(reg.mu_tabs)
    S = max(len(t) for t in reg.mu_tabs)
    tabs = np.zeros((3, n_tabs, S), np.float32)
    for t, (mt, st) in enumerate(zip(reg.mu_tabs, reg.sig_tabs)):
        sg = np.maximum(np.asarray(st, np.float32), 1e-30)
        tabs[0, t, :len(mt)] = mt
        tabs[1, t, :len(st)] = 1.0 / sg
        tabs[2, t, :len(st)] = LOG_INV_SQRT_2PI - np.log(sg)
    trans1 = _np_transitions(epb2, 1.0).astype(np.float32)
    trans8 = np.ascontiguousarray(trans1)
    clips = np.ascontiguousarray(
        np.broadcast_to(np.array([1.0, 1.0], np.float32),
                        (2 * G, 2)).copy())
    trans_pad = np.ascontiguousarray(
        _np_transitions(np.array([2.0], np.float32), 1.0)[0].astype(
            np.float32))
    return (reg, lev_buf, rank_buf, np.ascontiguousarray(tabs), lev_pos,
            np.ascontiguousarray(estep2), np.ascontiguousarray(nev2),
            np.ascontiguousarray(rk_pos), np.ascontiguousarray(rk_step),
            np.ascontiguousarray(nk2), np.ascontiguousarray(tab2),
            trans8, clips, trans_pad, sel, tp, kp, packed)


def test_native_wire_builder_matches_pack(meth_pipeline):
    """csrc/hmm_wire.cpp must produce byte-identical packed wire rows to
    _pack_hmm_inputs over the gathered matrices (the f32 contract the
    TPU wire path rides)."""
    from nanopolish_tpu.utils.native import get_native_lib

    lib = get_native_lib()
    assert lib is not None and lib._build_hmm_wire is not None
    (reg, lev_buf, rank_buf, tabs, lev_pos, estep2, nev2, rk_pos, rk_step,
     nk2, tab2, trans8, clips, trans_pad, sel, tp, kp, packed) = \
        _wire_test_inputs(meth_pipeline)
    B = packed.shape[0]
    wire = np.empty((B, tp + 3 * kp + 12), np.float32)
    lib.build_hmm_wire(lev_buf, rank_buf, tabs, lev_pos, estep2, nev2,
                       rk_pos, rk_step, nk2, tab2, trans8, clips,
                       trans_pad, sel, B, tp, kp, -1.0e30, wire)
    np.testing.assert_array_equal(wire.view(np.uint32),
                                  packed.view(np.uint32))


def test_windows_wire_assembly_matches_pack(meth_pipeline):
    """The compact 'windows' wire + device-side _assemble_windows must
    reproduce _pack_hmm_inputs' flat wire bit-for-bit (levels window
    gather, table gathers, b2 = mu*inv, tail layout)."""
    import jax.numpy as jnp

    from nanopolish_tpu.ops.pallas_profile_hmm import _assemble_windows
    from nanopolish_tpu.utils.native import get_native_lib

    lib = get_native_lib()
    assert lib._build_hmm_wire_compact is not None
    # reuse the flat-wire fixture machinery: rebuild the same inputs
    env = _wire_test_inputs(meth_pipeline)
    (reg, lev_buf, rank_buf, tabs, lev_pos, estep2, nev2, rk_pos, rk_step,
     nk2, tab2, trans8, clips, trans_pad, sel, tp, kp, packed) = env
    B = packed.shape[0]
    S = tabs.shape[2]
    wire_i = np.empty((B, kp + 16), np.int32)
    lib.build_hmm_wire_compact(rank_buf, lev_pos, estep2, nev2, rk_pos,
                               rk_step, nk2, tab2, trans8, clips,
                               trans_pad, sel, B, kp, wire_i)
    assembled = np.asarray(_assemble_windows(
        wire_i, jnp.asarray(lev_buf),
        jnp.asarray(np.ascontiguousarray(tabs.reshape(3, -1))),
        tp, kp, S))
    n = len(sel)
    # real rows byte-identical; padding rows differ only in their
    # (discarded, row-independent) level/table cells — their tails
    # (nev=1, nk=1, default transitions) must still match so the kernel
    # control flow is identical
    np.testing.assert_array_equal(assembled[:n].view(np.uint32),
                                  packed[:n].view(np.uint32))
    W = packed.shape[1]
    np.testing.assert_array_equal(
        assembled[n:, W - 12:].view(np.uint32),
        packed[n:, W - 12:].view(np.uint32))
