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


# ---------------------------------------------------------------------------
# Screening-threshold boundary semantics (VERDICT r3 #8)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def screening_corpus(tmp_path_factory):
    """Mixed corpus for controlled screening sums: 4 reads support the
    DRAFT base at sub_pos (negative delta for the correcting variant)
    and 8 support the TRUTH (positive delta), all full-length M
    alignments, ordered draft-supporters first."""
    d = tmp_path_factory.mktemp("screen_bound")
    rng = np.random.default_rng(77)
    model = PoreModelSet.instance().get_model(
        "r9.4_450bps", "nucleotide", "template", 6)

    L = 240
    sub_pos = 120
    truth = random_sequence(rng, L)
    draft = list(truth)
    orig = draft[sub_pos]
    draft[sub_pos] = {"A": "G", "C": "T", "G": "A", "T": "C"}[orig]
    draft = "".join(draft)

    draft_fa = str(d / "draft.fa")
    with open(draft_fa, "w") as fh:
        fh.write(">tig1\n" + draft + "\n")

    fastq = str(d / "reads.fastq")
    slow5 = str(d / "sig.slow5")
    names, seqs = [], []
    for i in range(4):
        names.append(f"a{i}")
        seqs.append(draft)
    for i in range(8):
        names.append(f"b{i}")
        seqs.append(truth)
    with open(fastq, "w") as fq, Slow5Writer(slow5) as sw:
        for name, seq in zip(names, seqs):
            fq.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
            sc = SquiggleScalings.from4(float(rng.uniform(-2, 2)), 1.0,
                                        0.0, 1.0)
            pa = synthetic_raw_signal(rng, seq, model, sc,
                                      samples_per_base=9.0, leader=450,
                                      trailer=90)
            adc = np.clip(pa * 8192.0 / 1400.0, -32000,
                          32000).astype(np.int16)
            sw.write(name, adc, 8192.0, 0.0, 1400.0, 4000.0)

    index_app.main([fastq, "--slow5", slow5])
    bam = str(d / "aln.bam")
    w = BamWriter(bam, "@HD\tVN:1.6\tSO:coordinate\n", ["tig1"], [L])
    for name, seq in zip(names, seqs):
        w.write(BamRecord(qname=name, tid=0, pos=0, mapq=60,
                          cigar=[(0, L)], seq=seq,
                          qual=np.full(L, 30, np.uint8)))
    w.close()

    from nanopolish_tpu.alignment.alignment_db import AlignmentDB
    db = AlignmentDB(fastq, draft_fa, bam)
    db.load_region("tig1", 0, L - 1)
    return {"db": db, "draft": draft, "truth": truth, "sub_pos": sub_pos,
            "orig": orig, "names": names}


def _screening_setup(screening_corpus):
    """(hap, events-in-name-order, true_var, bogus_var, per-read deltas)."""
    from nanopolish_tpu.apps.variants import score_variants_batched
    from nanopolish_tpu.models.haplotype import Haplotype

    p = screening_corpus
    db = p["db"]
    sub_pos = p["sub_pos"]
    flank = 10
    cs, ce = sub_pos - flank, sub_pos + 1 + flank
    hap = Haplotype("tig1", cs, db.get_reference_substring("tig1", cs, ce))
    events = db.get_event_subsequences("tig1", cs, ce)
    # stable order: draft-supporters a0..a3 first, then b0..b7
    order = {n: i for i, n in enumerate(p["names"])}
    events = sorted(events, key=lambda e: order[e.sr.read_name])
    draft_base = p["draft"][sub_pos]
    true_var = var_app.Variant(ref_name="tig1", ref_position=sub_pos,
                               ref_seq=draft_base, alt_seq=p["orig"])
    bogus_alt = next(b for b in "ACGT"
                     if b != draft_base and b != p["orig"])
    bogus_var = var_app.Variant(ref_name="tig1", ref_position=sub_pos,
                                ref_seq=draft_base, alt_seq=bogus_alt)
    # per-read deltas via independent single-read jobs (exact path)
    def deltas(var):
        jobs = [(hap, var, [ev]) for ev in events]
        return np.asarray(score_variants_batched(jobs, [],
                                                 screen_threshold=None))
    return hap, events, true_var, bogus_var, deltas


def _checkpoints(chunk_reads, n):
    """Cumulative read counts at which score_variants_batched checks the
    running sum (geometric schedule: s, 3s, 7s, ... with s=chunk//2)."""
    s = max(1, chunk_reads // 2)
    out, tot = [], 0
    while tot < n:
        tot = min(tot + s, n)
        out.append(tot)
        s *= 2
    return out


def test_screening_truncation_boundaries(screening_corpus):
    """Candidates whose running screen sum crosses -threshold at
    different positions relative to the chunk boundaries: accept/reject
    must match the unchunked exact path, and the truncated total must be
    the running sum at the first checkpoint at/after the crossing."""
    from nanopolish_tpu.apps.variants import score_variants_batched

    hap, events, true_var, bogus_var, deltas = \
        _screening_setup(screening_corpus)
    d_bogus = deltas(bogus_var)
    cum = np.cumsum(d_bogus)
    assert cum[-1] < 0          # the corpus rejects the bogus alt overall
    exact_total = score_variants_batched([(hap, bogus_var, events)], [],
                                         screen_threshold=None)[0]
    assert np.isclose(exact_total, cum[-1], rtol=0, atol=1e-5)

    n = len(events)
    # thresholds straddling EVERY running-sum value: each places the
    # first crossing at a different read index relative to the chunk
    # boundaries (on-checkpoint, mid-chunk, straddling each boundary)
    thrs = sorted({t for c in cum if c < 0
                   for t in (-c - 1e-3, -c + 1e-3)} | {1.0}
                  )
    for chunk_reads in (2, 4, 8, 16):
        cps = _checkpoints(chunk_reads, n)
        for thr in thrs:
            if thr <= 0:
                continue
            got = score_variants_batched(
                [(hap, bogus_var, events)], [],
                screen_threshold=float(thr),
                chunk_reads=chunk_reads)[0]
            # reject/accept identical to exact (exact total is negative)
            assert (got > 0) == (exact_total > 0) == False
            # deterministic truncation point: first checkpoint whose
            # running sum is at/below -thr (None = full exact sum)
            kill_cp = next((cp for cp in cps if cum[cp - 1] <= -thr),
                           None)
            want = cum[kill_cp - 1] if kill_cp is not None else cum[-1]
            assert np.isclose(got, want, rtol=0, atol=1e-5), \
                (chunk_reads, thr, got, kill_cp)
            # never more aggressive than the reference's per-read exit:
            # the reference stops at the FIRST read whose running sum
            # crosses, which precedes (or equals) any checkpoint kill
            ref_kill = next((i + 1 for i in range(n)
                             if cum[i] <= -thr), None)
            if kill_cp is not None:
                assert ref_kill is not None and kill_cp >= ref_kill


def test_screening_survivor_quality_exact(screening_corpus):
    """A candidate that survives screening must carry the identical
    (untruncated) quality the exact path computes, at every chunking."""
    from nanopolish_tpu.apps.variants import score_variants_batched

    hap, events, true_var, bogus_var, deltas = \
        _screening_setup(screening_corpus)
    exact = score_variants_batched([(hap, true_var, events)], [],
                                   screen_threshold=None)[0]
    assert exact > 0
    d = deltas(true_var)
    cum = np.cumsum(d)
    for chunk_reads in (2, 4, 8, 16):
        thr = -cum.min() + 1.0     # above the dip: survives every check
        got = score_variants_batched([(hap, true_var, events)], [],
                                     screen_threshold=float(thr),
                                     chunk_reads=chunk_reads)[0]
        assert np.isclose(got, exact, rtol=0, atol=1e-5)


def test_screening_dip_recovery_vs_reference(screening_corpus):
    """The events are ordered contradicting-reads-first, so the running
    sum for the TRUE variant dips negative before recovering.  With a
    threshold inside the dip: (a) a chunking whose checkpoints skip the
    dip keeps the exact accepted quality; (b) per-read checking (the
    reference's semantics, chunk_reads=2 => checkpoints 1,3,7..) may
    reject — and our kill checkpoint is never EARLIER than the
    reference's per-read kill, i.e. the batched screen is never more
    aggressive than nanopolish_variant.cpp:765-799."""
    from nanopolish_tpu.apps.variants import score_variants_batched

    hap, events, true_var, bogus_var, deltas = \
        _screening_setup(screening_corpus)
    d = deltas(true_var)
    assert (d[:4] < 0).all() and (d[4:] > 0).all()
    cum = np.cumsum(d)
    exact = score_variants_batched([(hap, true_var, events)], [],
                                   screen_threshold=None)[0]
    assert exact > 0 and np.isclose(exact, cum[-1], rtol=0, atol=1e-5)

    dip = -cum.min()              # depth of the dip (positive)
    n = len(events)
    ref_kill = int(np.argmax(cum <= -dip)) + 1 \
        if (cum <= -dip).any() else None
    assert ref_kill is not None   # threshold==dip: reference kills at min

    for chunk_reads in (2, 4, 8, 16):
        cps = _checkpoints(chunk_reads, n)
        crossed = [cp for cp in cps if cum[cp - 1] <= -dip]
        got = score_variants_batched([(hap, true_var, events)], [],
                                     screen_threshold=float(dip),
                                     chunk_reads=chunk_reads)[0]
        if crossed:
            # killed at the first crossing checkpoint — never earlier
            # than the reference's per-read kill
            assert crossed[0] >= ref_kill
            assert np.isclose(got, cum[crossed[0] - 1], rtol=0, atol=1e-5)
            assert got <= 0
        else:
            # checkpoints skipped the dip: full exact quality survives
            assert np.isclose(got, exact, rtol=0, atol=1e-5)
            assert got > 0


def test_array_screening_matches_object_path(screening_corpus):
    """score_variants_batched_arrays must reproduce the object path's
    totals bitwise on the CPU flat kernel — with and without the
    screening threshold, across chunkings."""
    from nanopolish_tpu.apps.variants import (score_variants_batched,
                                              score_variants_batched_arrays)

    hap, events, true_var, bogus_var, deltas = \
        _screening_setup(screening_corpus)
    jobs = [(hap, true_var, events), (hap, bogus_var, events)]
    # add a failing job (ref mismatch) to exercise the -inf path
    bad = var_app.Variant(ref_name="tig1",
                          ref_position=true_var.ref_position,
                          ref_seq="A" if true_var.ref_seq != "A" else "C",
                          alt_seq="G")
    if bad.ref_seq == hap.sequence[
            bad.ref_position - hap.ref_position]:
        bad = var_app.Variant(ref_name="tig1",
                              ref_position=true_var.ref_position,
                              ref_seq="T" if hap.sequence[
                                  bad.ref_position - hap.ref_position]
                              != "T" else "G", alt_seq="A")
    jobs.append((hap, bad, events))
    for thr in (None, 25.0, 100.0):
        for ck in (2, 8):
            obj = score_variants_batched(jobs, [], screen_threshold=thr,
                                         chunk_reads=ck)
            arr = score_variants_batched_arrays(jobs,
                                                screen_threshold=thr,
                                                chunk_reads=ck)
            assert arr is not None
            assert obj == arr, (thr, ck, obj, arr)
