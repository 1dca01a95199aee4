#!/usr/bin/env python3
"""End-to-end eventalign throughput on one chip: synthetic corpus (one
shape bucket), run the real app (ingest -> banded event align ->
segment-wavefront Pallas Viterbi -> TSV), report reads/s and TSV rows/s
wall-clock, cold and warm.

Usage: python tools/perf_e2e_eventalign.py
Env: NPT_E2E_READS (default 32), NPT_E2E_READLEN (default 1800).
"""

import io
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("NPT_PLATFORM"):      # e.g. NPT_PLATFORM=cpu for smoke
    import jax
    jax.config.update("jax_platforms", os.environ["NPT_PLATFORM"])

from nanopolish_tpu.apps import eventalign as ea_app
from nanopolish_tpu.apps import index as index_app
from nanopolish_tpu.io.bam import BamRecord, BamWriter
from nanopolish_tpu.io.slow5 import Blow5Writer
from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.models.squiggle import SquiggleScalings
from nanopolish_tpu.utils.alphabet import DNA_ALPHABET
from nanopolish_tpu.utils.synthetic import random_sequence, synthetic_raw_signal

N_READS = int(os.environ.get("NPT_E2E_READS", "32"))
READ_LEN = int(os.environ.get("NPT_E2E_READLEN", "1800"))
# fraction of reads written as SPLICED records (two aligned segments
# around an N gap) — these are ineligible for the device chain and
# measure the host-wavefront fallback share on realistic mixtures
SPLICED = float(os.environ.get("NPT_E2E_SPLICED", "0"))


def build_corpus(d):
    rng = np.random.default_rng(19)
    pms = PoreModelSet.instance()
    nuc_model = pms.get_model("r9.4_450bps", "nucleotide", "template", 6)

    genome_len = READ_LEN + 150 * (N_READS + 1)
    genome = random_sequence(rng, genome_len)
    ref_fa = os.path.join(d, "ref.fa")
    with open(ref_fa, "w") as fh:
        fh.write(">tig1\n")
        for i in range(0, genome_len, 60):
            fh.write(genome[i:i + 60] + "\n")

    plan = [(f"r{i:04d}", 150 * i, bool(i % 3 == 1),
             SPLICED > 0 and (i % max(int(round(1 / SPLICED)), 1) == 2))
            for i in range(N_READS)]
    gap = 400
    half = READ_LEN // 2
    fastq = os.path.join(d, "reads.fastq")
    slow5 = os.path.join(d, "sig.blow5")
    with open(fastq, "w") as fq, Blow5Writer(slow5) as sw:
        for name, pos, is_rev, is_spliced in plan:
            if is_spliced:
                # two exons around an N gap: the basecall/signal cover
                # the concatenated exonic sequence
                seg = genome[pos:pos + half] + \
                    genome[pos + half + gap:pos + half + gap + half]
            else:
                seg = genome[pos:pos + READ_LEN]
            basecall = DNA_ALPHABET.reverse_complement(seg) if is_rev else seg
            fq.write(f"@{name}\n{basecall}\n+\n{'I' * len(seg)}\n")
            sc = SquiggleScalings.from4(0.0, 1.0, 0.0, 1.0)
            pa = synthetic_raw_signal(rng, basecall, nuc_model, sc,
                                      samples_per_base=10.0, leader=500,
                                      trailer=100)
            adc = np.clip(pa * 8192.0 / 1400.0, -32000, 32000).astype(np.int16)
            sw.write(name, adc, 8192.0, 0.0, 1400.0, 4000.0)

    index_app.main([fastq, "--slow5", slow5])

    bam = os.path.join(d, "aln.bam")
    w = BamWriter(bam, "@HD\tVN:1.6\tSO:coordinate\n", ["tig1"], [genome_len])
    for name, pos, is_rev, is_spliced in sorted(plan, key=lambda t: t[1]):
        if is_spliced:
            seg = genome[pos:pos + half] + \
                genome[pos + half + gap:pos + half + gap + half]
            cigar = [(0, half), (3, gap), (0, half)]
        else:
            seg = genome[pos:pos + READ_LEN]
            cigar = [(0, READ_LEN)]
        w.write(BamRecord(qname=name, flag=16 if is_rev else 0, tid=0,
                          pos=pos, mapq=60, cigar=cigar, seq=seg,
                          qual=np.full(len(seg), 30, np.uint8)))
    w.close()
    return fastq, bam, ref_fa


def run_once(fastq, bam, ref_fa):
    from nanopolish_tpu.alignment.device_chain import (CHAIN_STATS,
                                                       reset_chain_stats)
    from nanopolish_tpu.utils import profiler
    from nanopolish_tpu.utils.syncstats import SYNC_STATS

    reset_chain_stats()
    before = profiler.snapshot()
    out = io.StringIO()
    with SYNC_STATS.capture() as snap:
        t0 = time.perf_counter()
        ea_app.main(["-r", fastq, "-b", bam, "-g", ref_fa], stdout=out)
        dt = time.perf_counter() - t0
    after = profiler.snapshot()
    snap.stages = {k: round(after[k][1] - before.get(k, (0, 0.0))[1], 3)
                   for k in after
                   if after[k][1] - before.get(k, (0, 0.0))[1] > 0.001}
    snap.chain = dict(CHAIN_STATS)
    rows = out.getvalue().count("\n") - 1
    return dt, rows, snap


def check_sync_ceiling(snap):
    # one Viterbi fetch per wavefront round PER WAVE (up to 8
    # concurrent waves, each walking its own job subset — their fetches
    # overlap, so the count scales with waves while the wall does not)
    # + the ingest fetches; a sync-per-chunk regression trips this even
    # in a fast tunnel (VERDICT r3 #6)
    # rounds/read ~= kept rows / OUTPUT_STRIDE; kept rows track the
    # event count (~2/base at synthetic noise), not the base count
    rounds = (2 * READ_LEN) // 50 + 24
    waves = 8
    ceiling = rounds * waves + 4 * ((N_READS + 63) // 64) + 16
    if snap.sync_count > ceiling:
        raise SystemExit(
            f"SYNC REGRESSION: {snap.sync_count} fetches "
            f"(ceiling {ceiling})")


def main():
    with tempfile.TemporaryDirectory() as d:
        t0 = time.perf_counter()
        fastq, bam, ref_fa = build_corpus(d)
        print(f"corpus: {N_READS} reads x {READ_LEN}b in "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
        for tag in ("cold", "warm"):
            if tag == "warm" and os.environ.get("NPT_E2E_PROFILE"):
                import cProfile
                import pstats
                pr = cProfile.Profile()
                pr.enable()
                dt, rows, snap = run_once(fastq, bam, ref_fa)
                pr.disable()
                pstats.Stats(pr, stream=sys.stderr).sort_stats(
                    "cumulative").print_stats(30)
            else:
                dt, rows, snap = run_once(fastq, bam, ref_fa)
            if tag == "warm":
                check_sync_ceiling(snap)
            ch = snap.chain
            tot = ch["chained"] + ch["ineligible"] + ch["aborted"]
            print(json.dumps({"pass": tag, "reads": N_READS, "rows": rows,
                              "s": round(dt, 1),
                              "rows_per_s": round(rows / dt, 1),
                              "reads_per_s": round(N_READS / dt, 2),
                              "host_s": round(max(dt - snap.blocked_s, 0), 2),
                              **snap.as_dict(),
                              "chain": ch,
                              "chained_frac": round(ch["chained"] / tot, 3)
                              if tot else None,
                              "stages": snap.stages}),
                  flush=True)


if __name__ == "__main__":
    main()
