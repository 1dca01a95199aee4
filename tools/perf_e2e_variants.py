#!/usr/bin/env python3
"""End-to-end variants --consensus throughput on one chip: a draft window
with planted substitution/deletion errors every ~150 bases, N reads of
true signal, polish with the real app (candidate screening -> haplotype
combinations -> batched packed Forward scoring, 50-round loop), and
report wall-clock bases-polished/s plus planted-error recovery.

Usage: python tools/perf_e2e_variants.py
Env: NPT_E2E_READS (default 24), NPT_E2E_WINDOW (draft length, default
1200).
"""

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
from nanopolish_tpu.apps import variants as var_app
from nanopolish_tpu.io.bam import BamRecord, BamWriter
from nanopolish_tpu.io.slow5 import Blow5Writer
from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.models.squiggle import SquiggleScalings
from nanopolish_tpu.utils.synthetic import random_sequence, synthetic_raw_signal

N_READS = int(os.environ.get("NPT_E2E_READS", "24"))
DRAFT_LEN = int(os.environ.get("NPT_E2E_WINDOW", "1200"))
# reads tile the window when shorter than it (a reference-default 50 kb
# makerange window is polished by ~2 kb reads at some depth, not by
# window-length reads); 0 = window-length reads (the original corpus)
READ_LEN = int(os.environ.get("NPT_E2E_READLEN", "0")) or DRAFT_LEN
SUB = {"A": "G", "C": "T", "G": "A", "T": "C"}


def build_corpus(d):
    rng = np.random.default_rng(41)
    model = PoreModelSet.instance().get_model(
        "r9.4_450bps", "nucleotide", "template", 6)
    truth = random_sequence(rng, DRAFT_LEN)
    draft = list(truth)
    sub_positions = list(range(120, DRAFT_LEN - 120, 150))
    for p in sub_positions:
        draft[p] = SUB[draft[p]]
    draft = "".join(draft)

    draft_fa = os.path.join(d, "draft.fa")
    with open(draft_fa, "w") as fh:
        fh.write(">tig1\n")
        for i in range(0, len(draft), 60):
            fh.write(draft[i:i + 60] + "\n")

    # read placement: evenly staggered READ_LEN reads (window-length
    # reads when READ_LEN == DRAFT_LEN, i.e. pos always 0)
    span = max(DRAFT_LEN - READ_LEN, 0)
    plan = [(f"r{i}", (span * i // max(N_READS - 1, 1)) if span else 0)
            for i in range(N_READS)]

    fastq = os.path.join(d, "reads.fastq")
    slow5 = os.path.join(d, "sig.blow5")
    with open(fastq, "w") as fq, Blow5Writer(slow5) as sw:
        for name, pos in plan:
            seg = truth[pos:pos + READ_LEN]
            fq.write(f"@{name}\n{seg}\n+\n{'I' * len(seg)}\n")
            sc = SquiggleScalings.from4(float(rng.uniform(-2, 2)), 1.0,
                                        0.0, 1.0)
            pa = synthetic_raw_signal(rng, seg, model, sc,
                                      samples_per_base=9.0, leader=450,
                                      trailer=90)
            adc = np.clip(pa * 8192.0 / 1400.0, -32000, 32000).astype(np.int16)
            sw.write(name, adc, 8192.0, 0.0, 1400.0, 4000.0)
    index_app.main([fastq, "--slow5", slow5])

    bam = os.path.join(d, "aln.bam")
    w = BamWriter(bam, "@HD\tVN:1.6\tSO:coordinate\n", ["tig1"], [len(draft)])
    for name, pos in sorted(plan, key=lambda t: t[1]):
        seg = truth[pos:pos + READ_LEN]
        w.write(BamRecord(qname=name, tid=0, pos=pos, mapq=60,
                          cigar=[(0, len(seg))], seq=seg,
                          qual=np.full(len(seg), 30, np.uint8)))
    w.close()
    return fastq, bam, draft_fa, draft, truth, sub_positions


def main():
    with tempfile.TemporaryDirectory() as d:
        fastq, bam, draft_fa, draft, truth, subs = build_corpus(d)
        # relay moods flap on a minutes scale; sample warm repeatedly
        tags = ["cold"] + ["warm"] * int(os.environ.get("NPT_E2E_REPS",
                                                        "1"))
        for tag in tags:
            vcf_path = os.path.join(d, f"polished_{tag}.vcf")
            pr = None
            if tag == "warm" and os.environ.get("NPT_E2E_PROFILE"):
                import cProfile
                pr = cProfile.Profile()
                pr.enable()
            from nanopolish_tpu.alignment.segments import ScoreBatcher
            from nanopolish_tpu.utils import profiler
            from nanopolish_tpu.utils.syncstats import SYNC_STATS
            mh0, mm0 = ScoreBatcher.MEMO_HITS, ScoreBatcher.MEMO_MISSES
            prof0 = profiler.snapshot()
            with SYNC_STATS.capture() as snap:
                t0 = time.perf_counter()
                var_app.main(["-r", fastq, "-b", bam, "-g", draft_fa,
                              "-w", f"tig1:0-{DRAFT_LEN - 1}", "--consensus",
                              "-o", vcf_path, "-d", "10"])
                dt = time.perf_counter() - t0
            if pr is not None:
                import pstats
                pr.disable()
                pstats.Stats(pr, stream=sys.stderr).sort_stats(
                    "cumulative").print_stats(30)
            keys = set()
            for line in open(vcf_path):
                if line.startswith("#"):
                    continue
                f = line.split("\t")
                keys.add((int(f[1]) - 1, f[3], f[4]))
            recovered = sum((p, draft[p], truth[p]) in keys for p in subs)
            print(json.dumps({
                "pass": tag, "reads": N_READS, "window_bases": DRAFT_LEN,
                "s": round(dt, 1),
                "bases_per_s": round(DRAFT_LEN / dt, 1),
                "planted_subs": len(subs), "recovered": recovered,
                "n_calls": len(keys),
                "host_s": round(dt - snap.blocked_s, 2),
                **snap.as_dict(),
                "memo_hits": ScoreBatcher.MEMO_HITS - mh0,
                "memo_misses": ScoreBatcher.MEMO_MISSES - mm0,
                "stages": {k: round(v[1] - prof0.get(k, (0, 0.0))[1], 2)
                           for k, v in profiler.snapshot().items()
                           if v[1] - prof0.get(k, (0, 0.0))[1] > 0.01}}),
                flush=True)


if __name__ == "__main__":
    main()
