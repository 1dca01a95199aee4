#!/usr/bin/env python3
"""CPU e2e denominators for the analysis apps (VERDICT r2 missing #3).

For call-methylation and variants --consensus this tool:
  1. builds the SAME corpus as the matching perf_e2e tool,
  2. runs the real app on the CPU backend with a spy on
     forward_segments, capturing every profile-HMM segment the app
     actually scores (the identical workload a reference run computes
     for this corpus — same task geometry per basemods.cpp:238-457 /
     call_variants.cpp:288-361),
  3. times csrc's npt_cpu_profile_hmm_forward_batch (the reference
     inner loop's op census, validated against the scan port in
     tests/test_cpu_baseline_hmm.py) over all captured segments,
     single thread, best of NPT_CPU_REPS,
  4. times csrc's npt_cpu_banded_align over the corpus's ingest
     workload (per-read adaptive banded DP) and the native event
     detector (both stages a reference run pays once per read),
  5. reports the estimated 16-thread CPU throughput:
         sites/s  = n_sites / ((t_hmm + t_banded + t_detect) / 16)
     This is an UPPER bound on the reference (zero host/geometry/IO
     cost, perfect 16-thread scaling, -march=native), so the derived
     vs_cpu ratios are conservative.

Usage: python tools/cpu_e2e_baseline.py [methylation|variants|all]
Output: one JSON line per app with the single-thread stage seconds and
the estimated 16-thread rate; paste into BASELINE.md.
"""

import ctypes
import importlib.util
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("NPT_PLATFORM", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from nanopolish_tpu.utils.native import get_native_lib  # noqa: E402

REPS = int(os.environ.get("NPT_CPU_REPS", "3"))
THREADS = 16


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _bind():
    lib = get_native_lib()._lib
    P = ctypes.POINTER
    fb = lib.npt_cpu_profile_hmm_forward_batch
    fb.restype = None
    fb.argtypes = [P(ctypes.c_float), P(ctypes.c_int64), P(ctypes.c_float),
                   P(ctypes.c_float), P(ctypes.c_float), P(ctypes.c_int64),
                   P(ctypes.c_float), P(ctypes.c_int32), ctypes.c_int64,
                   P(ctypes.c_float)]
    vb = lib.npt_cpu_profile_hmm_viterbi_batch
    vb.restype = None
    vb.argtypes = fb.argtypes + [P(ctypes.c_int64)]
    ba = lib.npt_cpu_banded_align
    ba.restype = ctypes.c_int64
    ba.argtypes = [P(ctypes.c_float), ctypes.c_int64, P(ctypes.c_float),
                   P(ctypes.c_float), P(ctypes.c_float), ctypes.c_int64]
    return fb, vb, ba


def _capture_segments():
    """Patch alignment.segments.forward_segments (and every app module's
    imported alias) to record segments while still returning scores."""
    import nanopolish_tpu.alignment.segments as seg
    import nanopolish_tpu.apps.call_methylation as cm
    import nanopolish_tpu.apps.variants as var

    captured = []
    orig = seg.forward_segments

    def spy(segments, *a, **k):
        captured.extend(segments)
        return orig(segments, *a, **k)

    import nanopolish_tpu.apps.phase_reads as pr
    import nanopolish_tpu.apps.scorereads as sc

    seg.forward_segments = spy
    cm.forward_segments = spy
    var.forward_segments = spy
    sc.forward_segments = spy
    pr.forward_segments = spy

    def restore():
        seg.forward_segments = orig
        cm.forward_segments = orig
        var.forward_segments = orig
        sc.forward_segments = orig
        pr.forward_segments = orig
    return captured, restore


def _capture_viterbi_segments():
    """Same spy for the Viterbi drain (eventalign's scoring path)."""
    import nanopolish_tpu.alignment.eventalign as ea
    import nanopolish_tpu.alignment.segments as seg

    captured = []
    orig = seg.viterbi_segments

    def spy(segments, *a, **k):
        captured.extend(segments)
        return orig(segments, *a, **k)

    seg.viterbi_segments = spy
    ea.viterbi_segments = spy

    def restore():
        seg.viterbi_segments = orig
        ea.viterbi_segments = orig
    return captured, restore


def _time_hmm(fb, segments):
    """Single-thread C++ Forward over all captured segments (batch entry:
    the loop lives in C++)."""
    lev = np.concatenate([np.asarray(s.levels, np.float32)
                          for s in segments])
    lev_off = np.concatenate(
        [[0], np.cumsum([len(s.levels) for s in segments])]).astype(np.int64)
    mu = np.concatenate([np.asarray(s.mu, np.float32) for s in segments])
    sig = np.concatenate([np.asarray(s.sigma, np.float32)
                          for s in segments])
    lsig = np.log(sig)
    k_off = np.concatenate(
        [[0], np.cumsum([len(s.mu) for s in segments])]).astype(np.int64)
    epb = np.array([s.events_per_base for s in segments], np.float32)
    flags = np.array([s.flags for s in segments], np.int32)
    out = np.zeros(len(segments), np.float32)

    P = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))  # noqa: E731
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        fb(P(lev, ctypes.c_float), P(lev_off, ctypes.c_int64),
           P(mu, ctypes.c_float), P(sig, ctypes.c_float),
           P(lsig, ctypes.c_float), P(k_off, ctypes.c_int64),
           P(epb, ctypes.c_float), P(flags, ctypes.c_int32),
           len(segments), P(out, ctypes.c_float))
        best = min(best, time.perf_counter() - t0)
    cells = int(np.sum(np.diff(lev_off) * np.diff(k_off)))
    return best, cells, out


def _time_ingest(ba, read_db_dir, fastq):
    """Single-thread banded align + event detect over the corpus reads
    (the reference's per-read load_from_raw work)."""
    from nanopolish_tpu.io.readdb import ReadDB
    from nanopolish_tpu.models.pore_model import PoreModelSet
    from nanopolish_tpu.models.read_loader import load_raw_inputs
    from nanopolish_tpu.ops import event_detect

    db = ReadDB()
    db.load(fastq)
    # slow5 single-file mode keeps _data empty; the fasta index has names
    names = list(db._data) or list(db._fai.entries)
    inputs = load_raw_inputs(names, db, num_threads=4)
    model = PoreModelSet.instance().get_model(
        "r9.4_450bps", "nucleotide", "template", 6)

    t_detect = 0.0
    work = []
    for inp in inputs.values():
        t0 = time.perf_counter()
        bounds = event_detect.trim_and_segment_raw(inp.raw, 200, 10, 100, 0.0)
        et = event_detect.detect_events(
            inp.raw[bounds[0]:bounds[1]], event_detect.EVENT_DETECTION_DEFAULTS)
        t_detect += time.perf_counter() - t0
        seq = inp.sequence
        ranks = model.alphabet.seq_to_kmer_ranks(seq, model.k)
        lm = model.level_mean[ranks].astype(np.float32)
        ls = model.level_stdv[ranks].astype(np.float32)
        ev = np.asarray(et.mean, np.float32)
        # MoM scaling like the reference's load path
        shift = ev.mean() - lm.mean()
        scale = ((ev - shift) ** 2).mean() / (lm ** 2).mean()
        mu = (scale * lm + shift).astype(np.float32)
        work.append((ev, mu, ls, np.log(ls).astype(np.float32)))

    P = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))  # noqa: E731
    best = float("inf")
    cells = 0
    for rep in range(REPS):
        t0 = time.perf_counter()
        for ev, mu, ls, lls in work:
            ba(P(ev), len(ev), P(mu), P(ls), P(lls), len(mu))
        best = min(best, time.perf_counter() - t0)
    cells = sum((len(ev) + len(mu) + 2) * 100 for ev, mu, _, _ in work)
    return best, t_detect, cells, len(work)


def run_methylation(fb, ba):
    pm = _load_tool("perf_e2e_methylation")
    captured, restore = _capture_segments()
    with tempfile.TemporaryDirectory() as d:
        fastq, bam, ref_fa = pm.build_corpus(d)
        import io

        out = io.StringIO()
        from nanopolish_tpu.apps import call_methylation as cm_app
        cm_app.main(["-r", fastq, "-b", bam, "-g", ref_fa, "-q", "cpg",
                     "-t", "4"], stdout=out)
        n_sites = sum(1 for l in out.getvalue().splitlines()
                      if l and not l.startswith("chromosome\t"))
        t_hmm, hmm_cells, _ = _time_hmm(fb, captured)
        t_banded, t_detect, b_cells, n_reads = _time_ingest(ba, d, fastq)
    restore()
    total_1t = t_hmm + t_banded + t_detect
    est = n_sites / (total_1t / THREADS)
    print(json.dumps({
        "app": "call-methylation", "reads": pm.N_READS, "sites": n_sites,
        "segments": len(captured), "hmm_cells": hmm_cells,
        "t_hmm_1t_s": round(t_hmm, 2), "ns_per_hmm_cell":
        round(t_hmm / max(hmm_cells, 1) * 1e9, 1),
        "t_banded_1t_s": round(t_banded, 2), "t_detect_1t_s":
        round(t_detect, 2),
        "est_cpu_16t_sites_per_s": round(est, 1)}), flush=True)
    return est


def run_variants(fb, ba):
    pv = _load_tool("perf_e2e_variants")
    captured, restore = _capture_segments()
    with tempfile.TemporaryDirectory() as d:
        fastq, bam, draft_fa, draft, truth, subs = pv.build_corpus(d)
        vcf_path = os.path.join(d, "out.vcf")
        from nanopolish_tpu.apps import variants as var_app
        var_app.main(["-r", fastq, "-b", bam, "-g", draft_fa,
                      "-w", f"tig1:0-{pv.DRAFT_LEN - 1}", "--consensus",
                      "-o", vcf_path, "-d", "10"])
        t_hmm, hmm_cells, _ = _time_hmm(fb, captured)
        t_banded, t_detect, b_cells, n_reads = _time_ingest(ba, d, fastq)
    restore()
    total_1t = t_hmm + t_banded + t_detect
    est = pv.DRAFT_LEN / (total_1t / THREADS)
    print(json.dumps({
        "app": "variants--consensus", "reads": pv.N_READS,
        "window_bases": pv.DRAFT_LEN, "segments": len(captured),
        "hmm_cells": hmm_cells, "t_hmm_1t_s": round(t_hmm, 2),
        "ns_per_hmm_cell": round(t_hmm / max(hmm_cells, 1) * 1e9, 1),
        "t_banded_1t_s": round(t_banded, 2),
        "t_detect_1t_s": round(t_detect, 2),
        "est_cpu_16t_bases_per_s": round(est, 1)}), flush=True)
    return est


def _time_viterbi(vb, segments):
    lev = np.concatenate([np.asarray(s.levels, np.float32)
                          for s in segments])
    lev_off = np.concatenate(
        [[0], np.cumsum([len(s.levels) for s in segments])]).astype(np.int64)
    mu = np.concatenate([np.asarray(s.mu, np.float32) for s in segments])
    sig = np.concatenate([np.asarray(s.sigma, np.float32)
                          for s in segments])
    lsig = np.log(sig)
    k_off = np.concatenate(
        [[0], np.cumsum([len(s.mu) for s in segments])]).astype(np.int64)
    epb = np.array([s.events_per_base for s in segments], np.float32)
    flags = np.array([s.flags for s in segments], np.int32)
    out = np.zeros(len(segments), np.float32)
    pairs = np.zeros(len(segments), np.int64)

    P = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))  # noqa: E731
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        vb(P(lev, ctypes.c_float), P(lev_off, ctypes.c_int64),
           P(mu, ctypes.c_float), P(sig, ctypes.c_float),
           P(lsig, ctypes.c_float), P(k_off, ctypes.c_int64),
           P(epb, ctypes.c_float), P(flags, ctypes.c_int32),
           len(segments), P(out, ctypes.c_float),
           P(pairs, ctypes.c_int64))
        best = min(best, time.perf_counter() - t0)
    cells = int(np.sum(np.diff(lev_off) * np.diff(k_off)))
    assert (pairs > 0).all()
    return best, cells


def run_eventalign(vb, ba):
    pe = _load_tool("perf_e2e_eventalign")
    captured, restore = _capture_viterbi_segments()
    with tempfile.TemporaryDirectory() as d:
        fastq, bam, ref_fa = pe.build_corpus(d)
        import io

        from nanopolish_tpu.apps import eventalign as ea_app
        out = io.StringIO()
        ea_app.main(["-r", fastq, "-b", bam, "-g", ref_fa, "-t", "4"],
                    stdout=out)
        n_rows = sum(1 for l in out.getvalue().splitlines()) - 1
        t_vit, cells = _time_viterbi(vb, captured)
        t_banded, t_detect, b_cells, n_reads = _time_ingest(ba, d, fastq)
        t_tsv = _time_tsv_rows(n_rows)
    restore()
    # the TSV emit is ON the reference's hot path
    # (nanopolish_eventalign.cpp:398-484) so its cost belongs in the
    # denominator (VERDICT r3 missing #4)
    total_1t = t_vit + t_banded + t_detect + t_tsv
    est_rows = n_rows / (total_1t / THREADS)
    print(json.dumps({
        "app": "eventalign", "reads": pe.N_READS, "tsv_rows": n_rows,
        "segments": len(captured), "hmm_cells": cells,
        "t_viterbi_1t_s": round(t_vit, 2), "ns_per_cell":
        round(t_vit / max(cells, 1) * 1e9, 1),
        "t_banded_1t_s": round(t_banded, 2),
        "t_detect_1t_s": round(t_detect, 2),
        "t_tsv_1t_s": round(t_tsv, 2),
        "est_cpu_16t_rows_per_s": round(est_rows, 1),
        "est_cpu_16t_reads_per_s": round(
            pe.N_READS / (total_1t / THREADS), 1)}), flush=True)
    return est_rows


# ---------------------------------------------------------------------------
# Round-4 additions (VERDICT r3 missing #4): honest eventalign TSV cost,
# polya and methyltrain denominators
# ---------------------------------------------------------------------------

def _bind_polya():
    lib = get_native_lib()._lib
    fn = lib.npt_cpu_polya_viterbi
    fn.restype = ctypes.c_int64
    fn.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                   ctypes.c_float, ctypes.c_float, ctypes.c_float,
                   ctypes.POINTER(ctypes.c_uint8),
                   ctypes.POINTER(ctypes.c_uint8)]
    return fn


def _time_tsv_rows(n_rows, k=6):
    """Single-thread TSV formatting cost for n_rows eventalign rows via
    the native snprintf formatter — the printf work the reference pays on
    its hot output path (nanopolish_eventalign.cpp:398-484).  Charged to
    the CPU denominator because the reference cannot skip it."""
    lib = get_native_lib()
    n = 200000
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGT"), 4096))
    rp = rng.integers(0, 4000, n)
    pos0 = rng.integers(0, 4000, n)
    ev = rng.integers(0, 100000, n)
    is_b = (rng.random(n) < 0.05).astype(np.uint8)
    f = rng.normal(100, 10, n).astype(np.float32)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        res = lib.format_eventalign_rows("tig1", "42", "t", seq, "", False,
                                         k, rp, pos0, ev, is_b,
                                         f, f, f, f, f, f)
        best = min(best, time.perf_counter() - t0)
    assert res is not None
    return best * (n_rows / n)


def run_polya(ba):
    pp = _load_tool("perf_e2e_polya")
    fn = _bind_polya()
    import io

    from nanopolish_tpu.apps import polya as polya_app
    from nanopolish_tpu.io.slow5 import Slow5Record

    # polya corpus needs RNA experiment type (mirrors the tool's patch)
    orig_tf = Slow5Record.to_fast5_data
    Slow5Record.to_fast5_data = (
        lambda self, kit="", experiment_type="dna":
        orig_tf(self, kit=kit, experiment_type="rna"))

    captured = []
    orig_seg = polya_app.segment_reads

    def spy(samples, scalings, *a, **k):
        captured.extend(zip(samples, scalings))
        return orig_seg(samples, scalings, *a, **k)

    polya_app.segment_reads = spy
    try:
        with tempfile.TemporaryDirectory() as d:
            fastq, bam, ref_fa = pp.build_corpus(d)
            out = io.StringIO()
            polya_app.main(["-r", fastq, "-b", bam, "-g", ref_fa],
                           stdout=out)
            n_pass = sum(1 for l in out.getvalue().splitlines()[1:]
                         if l.split("\t")[9] == "PASS")
            # single-thread segmentation viterbi over the captured reads
            best = float("inf")
            n_boundary = 0
            for _ in range(REPS):
                t0 = time.perf_counter()
                n_boundary = 0
                for samples, (scale, shift, var) in captured:
                    s = np.ascontiguousarray(samples, np.float32)
                    labels = np.empty(len(s), np.uint8)
                    bptr = np.empty(len(s) * 6, np.uint8)
                    r = fn(s.ctypes.data_as(
                        ctypes.POINTER(ctypes.c_float)), len(s),
                        scale, shift, var,
                        labels.ctypes.data_as(
                            ctypes.POINTER(ctypes.c_uint8)),
                        bptr.ctypes.data_as(
                            ctypes.POINTER(ctypes.c_uint8)))
                    n_boundary += int(r > 0)
                best = min(best, time.perf_counter() - t0)
            # the C decode must find a polyA region on the pass reads
            assert n_boundary >= n_pass, (n_boundary, n_pass)
            t_banded, t_detect, _, n_reads = _time_ingest(ba, d, fastq)
    finally:
        polya_app.segment_reads = orig_seg
        Slow5Record.to_fast5_data = orig_tf
    total_1t = best + t_banded + t_detect
    est = pp.N_READS / (total_1t / THREADS)
    print(json.dumps({
        "app": "polya", "reads": pp.N_READS, "n_pass": n_pass,
        "t_segviterbi_1t_s": round(best, 2),
        "t_banded_1t_s": round(t_banded, 2),
        "t_detect_1t_s": round(t_detect, 2),
        "est_cpu_16t_reads_per_s": round(est, 1)}), flush=True)
    return est


def run_methyltrain(vb, ba):
    """Denominator for methyltrain: the per-round event-kmer alignment
    (Viterbi over every read x round, captured from the real app run)
    plus one ingest pass.  The mixture-EM update and all host/geometry
    work are OMITTED, idealizing the CPU upward."""
    pm = _load_tool("perf_e2e_methyltrain")
    captured, restore = _capture_viterbi_segments()
    cwd = os.getcwd()
    # the tool's main() owns a TemporaryDirectory that dies when main
    # returns; keep it alive until the ingest timing has read the corpus
    holder = {}
    orig_td = pm.tempfile.TemporaryDirectory

    class _KeepTD:
        # main() calls ctx.cleanup() itself; defer it until the ingest
        # timing has read the corpus
        def __init__(self, td):
            self._td = td
            self.name = td.name

        def cleanup(self):
            pass

    def keep_td(*a, **k):
        td = orig_td(*a, **k)
        holder.setdefault("td", td)
        return _KeepTD(td)

    pm.tempfile.TemporaryDirectory = keep_td
    try:
        pm.main()
        d = holder["td"].name
        fastq = os.path.join(d, "reads.fastq")
        t_vit, cells = _time_viterbi(vb, captured)
        t_banded, t_detect, _, n_reads = _time_ingest(ba, d, fastq)
    finally:
        restore()
        pm.tempfile.TemporaryDirectory = orig_td
        os.chdir(cwd)
    align_units = pm.N_READS * pm.ROUNDS
    total_1t = t_vit + t_banded + t_detect
    est = align_units / (total_1t / THREADS)
    print(json.dumps({
        "app": "methyltrain", "reads": pm.N_READS, "rounds": pm.ROUNDS,
        "segments": len(captured), "hmm_cells": cells,
        "t_viterbi_1t_s": round(t_vit, 2),
        "t_banded_1t_s": round(t_banded, 2),
        "t_detect_1t_s": round(t_detect, 2),
        "note": "EM update + host work omitted (idealizes the CPU)",
        "est_cpu_16t_read_rounds_per_s": round(est, 1)}), flush=True)
    return est


def run_scorereads(fb, vb, ba):
    """scorereads denominator: the reference re-aligns each read
    (chained Viterbi windows, scorereads.cpp:306-462 via model_score ->
    align_read_to_ref) then Forward-scores 500-event segments
    (scorereads.cpp:116-203); charge viterbi + forward + per-read
    ingest, idealized 16 threads."""
    ps = _load_tool("perf_e2e_scorereads")
    cap_f, restore_f = _capture_segments()
    cap_v, restore_v = _capture_viterbi_segments()
    with tempfile.TemporaryDirectory() as d:
        fastq, bam, ref_fa = ps.build_corpus(d)
        import io

        from nanopolish_tpu.apps import scorereads as sc_app
        out = io.StringIO()
        sc_app.main(["-r", fastq, "-b", bam, "-g", ref_fa], stdout=out)
        t_hmm, hmm_cells, _ = _time_hmm(fb, cap_f)
        t_vit, v_cells = _time_viterbi(vb, cap_v)
        t_banded, t_detect, b_cells, n_reads = _time_ingest(ba, d, fastq)
    restore_f()
    restore_v()
    total_1t = t_hmm + t_vit + t_banded + t_detect
    est = ps.N_READS / (total_1t / THREADS)
    print(json.dumps({
        "app": "scorereads", "reads": ps.N_READS,
        "fwd_segments": len(cap_f), "vit_segments": len(cap_v),
        "t_hmm_1t_s": round(t_hmm, 2), "t_viterbi_1t_s": round(t_vit, 2),
        "t_banded_1t_s": round(t_banded, 2),
        "t_detect_1t_s": round(t_detect, 2),
        "est_cpu_16t_reads_per_s": round(est, 1)}), flush=True)
    return est


def run_phase(fb, ba):
    """phase-reads denominator: ref-vs-alt Forward per (read, SNP)
    (phase_reads.cpp:178-347) + per-read ingest, idealized 16
    threads."""
    pp = _load_tool("perf_e2e_phase")
    cap_f, restore_f = _capture_segments()
    with tempfile.TemporaryDirectory() as d:
        fastq, bam, ref_fa, vcf = pp.build_corpus(d)
        import io

        from nanopolish_tpu.apps import phase_reads as pr_app
        out = io.StringIO()
        pr_app.main(["-r", fastq, "-b", bam, "-g", ref_fa, vcf],
                    stdout=out)
        t_hmm, hmm_cells, _ = _time_hmm(fb, cap_f)
        t_banded, t_detect, b_cells, n_reads = _time_ingest(ba, d, fastq)
    restore_f()
    total_1t = t_hmm + t_banded + t_detect
    est = pp.N_READS / (total_1t / THREADS)
    print(json.dumps({
        "app": "phase-reads", "reads": pp.N_READS,
        "fwd_segments": len(cap_f), "hmm_cells": hmm_cells,
        "t_hmm_1t_s": round(t_hmm, 2),
        "t_banded_1t_s": round(t_banded, 2),
        "t_detect_1t_s": round(t_detect, 2),
        "est_cpu_16t_reads_per_s": round(est, 1)}), flush=True)
    return est


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    fb, vb, ba = _bind()
    if which in ("methylation", "all"):
        run_methylation(fb, ba)
    if which in ("variants", "all"):
        run_variants(fb, ba)
    if which in ("eventalign", "all"):
        run_eventalign(vb, ba)
    if which in ("polya", "all"):
        run_polya(ba)
    if which in ("methyltrain", "all"):
        run_methyltrain(vb, ba)
    if which in ("scorereads", "all"):
        run_scorereads(fb, vb, ba)
    if which in ("phase", "all"):
        run_phase(fb, ba)


if __name__ == "__main__":
    main()
