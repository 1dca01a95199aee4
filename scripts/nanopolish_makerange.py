#!/usr/bin/env python3
"""Partition a genome into overlapping polishing windows.

Behavior-compatible rebuild of the reference scripts/nanopolish_makerange.py
(no Biopython dependency): emits contig:start-end windows of
--segment-length with --overlap-length, extending trailing short segments.
"""

import argparse
import sys


def fasta_lengths(path):
    name = None
    length = 0
    opener = open
    if path.endswith(".gz"):
        import gzip
        opener = lambda p: gzip.open(p, "rt")   # noqa: E731
    with opener(path) as fh:
        for line in fh:
            if line.startswith(">"):
                if name is not None:
                    yield name, length
                name = line[1:].split()[0]
                length = 0
            else:
                length += len(line.strip())
    if name is not None:
        yield name, length


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Partition a genome into a set of overlapping segments")
    parser.add_argument("--segment-length", type=int, default=50000)
    parser.add_argument("--overlap-length", type=int, default=200)
    parser.add_argument("genome")
    args = parser.parse_args(argv)

    seg = args.segment_length
    ovl = args.overlap_length
    min_seg = 5 * ovl
    for name, length in fasta_lengths(args.genome):
        start = 0
        while start < length:
            end = start + seg
            if length - end < min_seg:
                print(f"{name}:{start}-{length - 1}")
                start = length
            else:
                print(f"{name}:{start}-{end + ovl}")
                start = end
    return 0


if __name__ == "__main__":
    sys.exit(main())
