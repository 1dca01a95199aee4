#!/usr/bin/env python3
"""End-to-end scorereads throughput on one chip: N reads re-aligned to
the reference (device chain / wavefront Viterbi), 500-event Forward
segments scored batched, per-read scores printed.  Reports reads/s with
the relay-independent triple, cold + warm-sampled (reference workload:
src/nanopolish_scorereads.cpp:116-203,306-462).

Usage: python tools/perf_e2e_scorereads.py
Env: NPT_E2E_READS (default 64), NPT_E2E_READLEN (default 1800),
NPT_E2E_REPS (default 3).
"""

import io
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("NPT_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["NPT_PLATFORM"])

from nanopolish_tpu.apps import index as index_app
from nanopolish_tpu.apps import scorereads as sc_app
from nanopolish_tpu.io.bam import BamRecord, BamWriter
from nanopolish_tpu.io.slow5 import Blow5Writer
from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.models.squiggle import SquiggleScalings
from nanopolish_tpu.utils.alphabet import DNA_ALPHABET
from nanopolish_tpu.utils.synthetic import random_sequence, synthetic_raw_signal

N_READS = int(os.environ.get("NPT_E2E_READS", "64"))
READ_LEN = int(os.environ.get("NPT_E2E_READLEN", "1800"))


def build_corpus(d):
    rng = np.random.default_rng(23)
    pms = PoreModelSet.instance()
    nuc_model = pms.get_model("r9.4_450bps", "nucleotide", "template", 6)

    genome_len = READ_LEN + 150 * (N_READS + 1)
    genome = random_sequence(rng, genome_len)
    ref_fa = os.path.join(d, "ref.fa")
    with open(ref_fa, "w") as fh:
        fh.write(">tig1\n")
        for i in range(0, genome_len, 60):
            fh.write(genome[i:i + 60] + "\n")

    plan = [(f"r{i:04d}", 150 * i, bool(i % 3 == 1)) for i in range(N_READS)]
    fastq = os.path.join(d, "reads.fastq")
    slow5 = os.path.join(d, "sig.blow5")
    with open(fastq, "w") as fq, Blow5Writer(slow5) as sw:
        for name, pos, is_rev in plan:
            seg = genome[pos:pos + READ_LEN]
            basecall = DNA_ALPHABET.reverse_complement(seg) if is_rev else seg
            fq.write(f"@{name}\n{basecall}\n+\n{'I' * READ_LEN}\n")
            sc = SquiggleScalings.from4(0.0, 1.0, 0.0, 1.0)
            pa = synthetic_raw_signal(rng, basecall, nuc_model, sc,
                                      samples_per_base=10.0, leader=500,
                                      trailer=100)
            adc = np.clip(pa * 8192.0 / 1400.0, -32000, 32000).astype(np.int16)
            sw.write(name, adc, 8192.0, 0.0, 1400.0, 4000.0)

    index_app.main([fastq, "--slow5", slow5])

    bam = os.path.join(d, "aln.bam")
    w = BamWriter(bam, "@HD\tVN:1.6\tSO:coordinate\n", ["tig1"], [genome_len])
    for name, pos, is_rev in sorted(plan, key=lambda t: t[1]):
        seg = genome[pos:pos + READ_LEN]
        w.write(BamRecord(qname=name, flag=16 if is_rev else 0, tid=0,
                          pos=pos, mapq=60, cigar=[(0, READ_LEN)], seq=seg,
                          qual=np.full(READ_LEN, 30, np.uint8)))
    w.close()
    return fastq, bam, ref_fa


def run_once(fastq, bam, ref_fa):
    from nanopolish_tpu.utils.syncstats import SYNC_STATS

    out = io.StringIO()
    with SYNC_STATS.capture() as snap:
        t0 = time.perf_counter()
        sc_app.main(["-r", fastq, "-b", bam, "-g", ref_fa], stdout=out)
        dt = time.perf_counter() - t0
    lines = out.getvalue().splitlines()
    n_scores = sum(1 for l in lines if not l.startswith("SEGMENT"))
    return dt, n_scores, snap


def main():
    with tempfile.TemporaryDirectory() as d:
        fastq, bam, ref_fa = build_corpus(d)
        dt, n, snap = run_once(fastq, bam, ref_fa)
        print(json.dumps({"pass": "cold", "reads": N_READS, "scored": n,
                          "s": round(dt, 1),
                          "reads_per_s": round(N_READS / dt, 2),
                          "host_s": round(max(dt - snap.blocked_s, 0), 2),
                          **snap.as_dict()}), flush=True)
        best = None
        for _ in range(int(os.environ.get("NPT_E2E_REPS", "3"))):
            dt, n, snap = run_once(fastq, bam, ref_fa)
            print(json.dumps({"pass": "warm_sample", "s": round(dt, 2),
                              "reads_per_s": round(N_READS / dt, 2),
                              "host_s": round(max(dt - snap.blocked_s, 0), 2),
                              **snap.as_dict()}), flush=True)
            if best is None or dt < best[0]:
                best = (dt, n, snap)
        dt, n, snap = best
        print(json.dumps({"pass": "warm", "reads": N_READS, "scored": n,
                          "s": round(dt, 1),
                          "reads_per_s": round(N_READS / dt, 2),
                          "host_s": round(max(dt - snap.blocked_s, 0), 2),
                          **snap.as_dict()}), flush=True)


if __name__ == "__main__":
    main()
