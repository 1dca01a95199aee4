"""`train-poremodel-from-basecalls` subcommand: bootstrap a nucleotide
pore model from basecalled reads only (no reference).

The reference's implementation body is disabled (`#if 0` in
src/nanopolish_train_poremodel_from_basecalls.cpp:209+); this provides a
working equivalent of its documented design: initialize a model from the
read with the most events (per-kmer median levels), then iterate rounds of
event-to-basecall banded alignment + single-Gaussian updates.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional, TextIO

import numpy as np

from ..io.readdb import ReadDB
from ..models.pore_model import PoreModel, PoreModelSet
from ..models.read_builder import GLOBAL_READ_STATS
from ..models.read_loader import load_raw_inputs
from ..ops import event_detect
from ..ops.banded_align import banded_align_batch
from ..utils.alphabet import DNA_ALPHABET


def _detect_all(inputs):
    """Event tables + kmer ranks for each read."""
    out = []
    for name, inp in inputs.items():
        bounds = event_detect.trim_and_segment_raw(inp.raw, 200, 10, 100, 0.0)
        if bounds is None:
            continue
        et = event_detect.detect_events(inp.raw[bounds[0]:bounds[1]],
                                        event_detect.EVENT_DETECTION_DEFAULTS)
        if len(et) == 0:
            continue
        out.append((name, inp.sequence, et))
    return out


def _align_and_collect(reads, model, k):
    """Banded-align each read's events to its basecall under `model`;
    return per-kmer-rank level lists."""
    n_states = model.level_mean.shape[0]
    per_rank: List[List[float]] = [[] for _ in range(n_states)]
    B = len(reads)
    if B == 0:
        return per_rank
    T = max(len(et) for _, _, et in reads)
    K = max(len(seq) - k + 1 for _, seq, _ in reads)
    ev = np.zeros((B, max(T, 8)), np.float32)
    mu = np.zeros((B, max(K, 8)), np.float32)
    sd = np.ones((B, max(K, 8)), np.float32)
    ranks_all = np.zeros((B, max(K, 8)), np.int64)
    nev = np.zeros(B, np.int32)
    nk = np.zeros(B, np.int32)
    for i, (_, seq, et) in enumerate(reads):
        ranks = DNA_ALPHABET.seq_to_kmer_ranks(seq, k)
        ev[i, :len(et)] = et.mean
        mu[i, :len(ranks)] = model.level_mean[ranks]
        sd[i, :len(ranks)] = model.level_stdv[ranks]
        ranks_all[i, :len(ranks)] = ranks
        nev[i] = len(et)
        nk[i] = len(ranks)
    res = banded_align_batch(ev, nev, mu, sd, np.log(sd), nk)
    b2e_start = np.asarray(res.b2e_start)
    b2e_stop = np.asarray(res.b2e_stop)
    failed = np.asarray(res.failed)
    for i in range(B):
        if failed[i]:
            continue
        for ki in range(int(nk[i])):
            s, e = int(b2e_start[i, ki]), int(b2e_stop[i, ki])
            if s == -1:
                continue
            for ei in range(s, e + 1):
                lvl = float(ev[i, ei])
                if lvl >= 1.0:
                    per_rank[int(ranks_all[i, ki])].append(lvl)
    return per_rank


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="nanopolish_tpu train-poremodel-from-basecalls",
        description="bootstrap a pore model from basecalled reads")
    p.add_argument("-r", "--reads", required=True,
                   help="basecalled reads with a built readdb index")
    p.add_argument("-k", type=int, default=6)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("-o", "--output", default="bootstrapped.model")
    p.add_argument("--max-reads", type=int, default=100)
    return p


def main(argv: Optional[List[str]] = None, stdout: Optional[TextIO] = None):
    opt = make_parser().parse_args(argv)
    k = opt.k
    read_db = ReadDB()
    read_db.load(opt.reads)
    names = read_db.get_all_read_names()[:opt.max_reads]
    inputs = load_raw_inputs(names, read_db, stats=GLOBAL_READ_STATS)
    reads = _detect_all(inputs)
    if not reads:
        raise SystemExit("no usable reads")
    print(f"Loaded {len(reads)} reads", file=sys.stderr)

    # initialize from the builtin model's sigma but bootstrap means from a
    # proportional event split of the read with the most events
    base = PoreModelSet.instance().get_model("r9.4_450bps", "nucleotide",
                                             "template", 6)
    n_states = DNA_ALPHABET.num_strings(k)
    best = max(reads, key=lambda r: len(r[2]))
    name, seq, et = best
    ranks = DNA_ALPHABET.seq_to_kmer_ranks(seq, k)
    ki = np.minimum((np.arange(len(et)) * len(ranks)) // max(len(et), 1),
                    len(ranks) - 1)
    level_mean = np.full(n_states, 100.0)
    sums = np.zeros(n_states)
    cnts = np.zeros(n_states)
    np.add.at(sums, ranks[ki], et.mean)
    np.add.at(cnts, ranks[ki], 1)
    got = cnts > 0
    level_mean[got] = sums[got] / cnts[got]
    level_stdv = np.full(n_states, 2.5)
    model = PoreModel(kit="bootstrap", strand="template", k=k,
                      alphabet=DNA_ALPHABET, level_mean=level_mean,
                      level_stdv=level_stdv,
                      sd_mean=np.zeros(n_states), sd_stdv=np.ones(n_states),
                      name=f"bootstrap_{k}mer")

    for rnd in range(opt.rounds):
        per_rank = _align_and_collect(reads, model, k)
        trained = 0
        for r, vals in enumerate(per_rank):
            if len(vals) >= 10:
                v = np.asarray(vals)
                level_mean[r] = float(np.median(v))
                level_stdv[r] = max(float(v.std()), 0.5)
                trained += 1
        model = model.with_states(level_mean.copy(), level_stdv.copy())
        print(f"Round {rnd}: updated {trained}/{n_states} kmers",
              file=sys.stderr)

    model.write(opt.output, model.name)
    print(f"Wrote {opt.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main(sys.argv[1:]))
