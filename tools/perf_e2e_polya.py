#!/usr/bin/env python3
"""End-to-end polya throughput on one chip: synthetic direct-RNA reads
with a planted 120 nt poly(A) tail, run the real app (ingest ->
sample-level segmentation Viterbi Pallas kernel -> tail estimator ->
TSV), report reads/s wall-clock and tail-length recovery.

Usage: python tools/perf_e2e_polya.py
Env: NPT_E2E_READS (default 32).
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

from nanopolish_tpu.apps import index as index_app
from nanopolish_tpu.apps import polya as polya_app
from nanopolish_tpu.io.bam import BamRecord, BamWriter
from nanopolish_tpu.io.slow5 import Blow5Writer, Slow5Record
from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.utils.synthetic import random_sequence

N_READS = int(os.environ.get("NPT_E2E_READS", "32"))
POLYA_NT = 120
SAMPLES_PER_BASE = 30.0
SAMPLE_RATE = 4000.0
TRANSCRIPT_LEN = 500


def _rna_read_signal(rng, transcript, model):
    parts = [
        rng.normal(70.3, 2.0, size=300),
        rng.normal(110.9, 2.0, size=400),
        rng.normal(79.3, 2.5, size=400),
        rng.normal(108.9, 1.5, size=int(POLYA_NT * SAMPLES_PER_BASE)),
    ]
    seq = transcript.replace("U", "T")
    ranks = model.alphabet.seq_to_kmer_ranks(seq, model.k)[::-1]
    nsamp = np.maximum(3, rng.poisson(SAMPLES_PER_BASE, size=len(ranks)))
    level = model.level_mean[ranks]
    stdv = model.level_stdv[ranks]
    parts.append(rng.normal(np.repeat(level, nsamp), np.repeat(stdv, nsamp)))
    return np.concatenate(parts).astype(np.float32)


def build_corpus(d):
    rng = np.random.default_rng(43)
    model = PoreModelSet.instance().get_model(
        "r9.4_70bps", "u_to_t_rna", "template", 5)
    transcript = random_sequence(rng, TRANSCRIPT_LEN)

    ref_fa = os.path.join(d, "ref.fa")
    with open(ref_fa, "w") as fh:
        fh.write(">rna1\n")
        for i in range(0, TRANSCRIPT_LEN, 60):
            fh.write(transcript[i:i + 60] + "\n")

    fastq = os.path.join(d, "reads.fastq")
    slow5 = os.path.join(d, "sig.blow5")
    with open(fastq, "w") as fq, Blow5Writer(slow5) as sw:
        for i in range(N_READS):
            name = f"rna{i}"
            fq.write(f"@{name}\n{transcript}\n+\n{'I' * TRANSCRIPT_LEN}\n")
            pa = _rna_read_signal(rng, transcript, model)
            adc = np.clip(pa * 8192.0 / 1400.0, -32000, 32000).astype(np.int16)
            sw.write(name, adc, 8192.0, 0.0, 1400.0, SAMPLE_RATE)
    index_app.main([fastq, "--slow5", slow5])

    bam = os.path.join(d, "aln.bam")
    w = BamWriter(bam, "@HD\tVN:1.6\tSO:coordinate\n", ["rna1"],
                  [TRANSCRIPT_LEN])
    for i in range(N_READS):
        w.write(BamRecord(qname=f"rna{i}", tid=0, pos=0, mapq=60,
                          cigar=[(0, TRANSCRIPT_LEN)], seq=transcript,
                          qual=np.full(TRANSCRIPT_LEN, 30, np.uint8)))
    w.close()
    return fastq, bam, ref_fa


def main():
    # slow5 records default to dna; polya needs RNA experiment type
    orig = Slow5Record.to_fast5_data
    Slow5Record.to_fast5_data = (
        lambda self, kit="", experiment_type="dna":
        orig(self, kit=kit, experiment_type="rna"))

    with tempfile.TemporaryDirectory() as d:
        fastq, bam, ref_fa = build_corpus(d)
        from nanopolish_tpu.utils.syncstats import SYNC_STATS

        def run_once(tag):
            out = io.StringIO()
            with SYNC_STATS.capture() as snap:
                t0 = time.perf_counter()
                polya_app.main(["-r", fastq, "-b", bam, "-g", ref_fa],
                               stdout=out)
                dt = time.perf_counter() - t0
            rows = [l.split("\t") for l in out.getvalue().splitlines()[1:]]
            tails = [float(f[8]) for f in rows if f[9] == "PASS"]
            rec = {
                "pass": tag, "reads": N_READS, "s": round(dt, 2),
                "reads_per_s": round(N_READS / dt, 2),
                "n_pass": len(tails),
                "host_s": round(max(dt - snap.blocked_s, 0), 2),
                **snap.as_dict(),
                "tail_nt_mean": round(float(np.mean(tails)), 1)
                if tails else None,
                "planted_nt": POLYA_NT}
            print(json.dumps(rec), flush=True)
            return dt, rec

        run_once("cold")
        best = None
        for _ in range(int(os.environ.get("NPT_E2E_REPS", "3"))):
            dt, rec = run_once("warm_sample")
            if best is None or dt < best[0]:
                best = (dt, rec)
        print(json.dumps({**best[1], "pass": "warm"}), flush=True)


if __name__ == "__main__":
    main()
