#!/usr/bin/env python3
"""Merge per-window consensus fastas into whole contigs.

Behavior-compatible rebuild of the reference scripts/nanopolish_merge.py
without the Biopython dependency: the overlap merge aligns the 200bp
overlap regions with a Needleman-Wunsch (match 2, mismatch -10, gap open
-10, gap extend -3 — pairwise2.globalms parameters) and splices at the
alignment midpoint.
"""

import sys

import numpy as np

SEGMENT_LENGTH = 50000
OVERLAP_LENGTH = 200

MATCH, MISMATCH, GAP_OPEN, GAP_EXTEND = 2.0, -10.0, -10.0, -3.0


def _align_overlap(a: str, b: str):
    """Affine-gap global alignment; returns (aligned_a, aligned_b)."""
    n, m = len(a), len(b)
    NEG = -1e18
    M = np.full((n + 1, m + 1), NEG)
    X = np.full((n + 1, m + 1), NEG)   # gap in b (consume a)
    Y = np.full((n + 1, m + 1), NEG)   # gap in a (consume b)
    M[0, 0] = 0.0
    for i in range(1, n + 1):
        X[i, 0] = GAP_OPEN + (i - 1) * GAP_EXTEND
    for j in range(1, m + 1):
        Y[0, j] = GAP_OPEN + (j - 1) * GAP_EXTEND
    for i in range(1, n + 1):
        ai = a[i - 1]
        for j in range(1, m + 1):
            s = MATCH if ai == b[j - 1] else MISMATCH
            M[i, j] = max(M[i - 1, j - 1], X[i - 1, j - 1],
                          Y[i - 1, j - 1]) + s
            X[i, j] = max(M[i - 1, j] + GAP_OPEN, X[i - 1, j] + GAP_EXTEND)
            Y[i, j] = max(M[i, j - 1] + GAP_OPEN, Y[i, j - 1] + GAP_EXTEND)
    # traceback
    i, j = n, m
    state = int(np.argmax([M[n, m], X[n, m], Y[n, m]]))
    out_a, out_b = [], []
    while i > 0 or j > 0:
        if state == 0 and i > 0 and j > 0:
            out_a.append(a[i - 1])
            out_b.append(b[j - 1])
            s = MATCH if a[i - 1] == b[j - 1] else MISMATCH
            prev = [M[i - 1, j - 1], X[i - 1, j - 1], Y[i - 1, j - 1]]
            state = int(np.argmax(prev))
            i -= 1
            j -= 1
        elif state == 1 and i > 0:
            out_a.append(a[i - 1])
            out_b.append("-")
            state = 0 if M[i - 1, j] + GAP_OPEN >= X[i - 1, j] + GAP_EXTEND \
                else 1
            i -= 1
        elif j > 0:
            out_a.append("-")
            out_b.append(b[j - 1])
            state = 0 if M[i, j - 1] + GAP_OPEN >= Y[i, j - 1] + GAP_EXTEND \
                else 2
            j -= 1
        else:
            break
    return "".join(reversed(out_a)), "".join(reversed(out_b))


def merge_into_consensus(consensus: str, incoming: str,
                         overlap_length: int) -> str:
    if consensus == "":
        return incoming
    or_con = consensus[-overlap_length:]
    or_inc = incoming[:overlap_length]
    aln_con, aln_inc = _align_overlap(or_con, or_inc)
    m_con = m_inc = 0
    for i in range(len(aln_con) // 2):
        if aln_con[i] != "-":
            m_con += 1
        if aln_inc[i] != "-":
            m_inc += 1
    m_con += len(consensus) - overlap_length
    return consensus[:m_con] + incoming[m_inc:]


def read_fasta(path):
    name = None
    seq = []
    with open(path) as fh:
        for line in fh:
            if line.startswith(">"):
                if name is not None:
                    yield name, "".join(seq)
                name = line[1:].split()[0]
                seq = []
            else:
                seq.append(line.strip())
    if name is not None:
        yield name, "".join(seq)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    segments_by_name = {}
    for fn in argv:
        for title, seq in read_fasta(fn):
            contig, segment_range = title.split(":")
            start = int(segment_range.split("-")[0])
            segments_by_name.setdefault(contig, {})[start] = seq

    for contig in sorted(segments_by_name):
        assembly = ""
        prev = None
        ok = True
        for start in sorted(segments_by_name[contig]):
            if not (prev is None
                    or prev + SEGMENT_LENGTH + OVERLAP_LENGTH > start):
                sys.stderr.write(f"error: segment starting at {contig}:"
                                 f"{prev + SEGMENT_LENGTH + 40} is missing\n")
                ok = False
            assembly = merge_into_consensus(
                assembly, segments_by_name[contig][start], OVERLAP_LENGTH)
            prev = start
        if ok:
            print(f">{contig}\n{assembly}")
        else:
            sys.stderr.write(f"error: some segments are missing, could not "
                             f"merge contig {contig}\n")
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
