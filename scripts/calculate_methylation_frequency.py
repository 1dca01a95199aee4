#!/usr/bin/env python3
"""Aggregate per-read methylation calls into per-site frequencies.

Behavior-compatible rebuild of the reference
scripts/calculate_methylation_frequency.py: consumes call-methylation TSVs,
filters ambiguous calls (|LLR| < threshold * num_motifs), optionally splits
multi-CpG groups, prints per-site frequency rows.
"""

import argparse
import csv
import gzip
import sys


class SiteStats:
    def __init__(self, g_size, g_seq):
        self.num_reads = 0
        self.called_sites = 0
        self.called_sites_methylated = 0
        self.group_size = g_size
        self.sequence = g_seq


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Calculate methylation frequency at genomic CpG sites")
    parser.add_argument("-c", "--call-threshold", type=float, default=2.0)
    parser.add_argument("-s", "--split-groups", action="store_true")
    parser.add_argument("input_files", nargs="+")
    args = parser.parse_args(argv)

    sites = {}

    def update(key, num_called, is_methylated, sequence):
        if key not in sites:
            sites[key] = SiteStats(num_called, sequence)
        st = sites[key]
        st.num_reads += 1
        st.called_sites += num_called
        if is_methylated:
            st.called_sites_methylated += num_called

    for f in args.input_files:
        fh = gzip.open(f, "rt") if f.endswith(".gz") else open(f)
        for record in csv.DictReader(fh, delimiter="\t"):
            num_sites = int(record["num_motifs"])
            llr = float(record["log_lik_ratio"])
            if abs(llr) < args.call_threshold * num_sites:
                continue
            sequence = record["sequence"]
            is_methylated = llr > 0
            if args.split_groups and num_sites > 1:
                c = record["chromosome"]
                s = int(record["start"])
                cg_pos = sequence.find("CG")
                first = cg_pos
                while cg_pos != -1:
                    key = (c, s + cg_pos - first, s + cg_pos - first)
                    update(key, 1, is_methylated, "split-group")
                    cg_pos = sequence.find("CG", cg_pos + 1)
            else:
                key = (record["chromosome"], int(record["start"]),
                       int(record["end"]))
                update(key, num_sites, is_methylated, sequence)
        fh.close()

    print("\t".join(["chromosome", "start", "end", "num_motifs_in_group",
                     "called_sites", "called_sites_methylated",
                     "methylated_frequency", "group_sequence"]))
    for key in sorted(sites):
        st = sites[key]
        if st.called_sites > 0:
            c, s, e = key
            freq = st.called_sites_methylated / st.called_sites
            print(f"{c}\t{s}\t{e}\t{st.group_size}\t{st.called_sites}\t"
                  f"{st.called_sites_methylated}\t{freq:.3f}\t{st.sequence}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
