#!/usr/bin/env python3
"""Join two methylation-frequency files on genomic site for comparison
(scatter plots, concordance checks).

Behavioral rebuild of the reference's scripts/compare_methylation.py:
accepts nanopolish-style frequency TSVs (from
calculate_methylation_frequency.py; singleton CpG groups only) and
bisulfite BED files (auto-detected by "bisulfite" in the filename,
strand-collapsed onto the forward-strand C), and prints the inner join:
key depth_1 frequency_1 depth_2 frequency_2.
"""

import csv
import sys


class SiteStats:
    def __init__(self, called, methylated):
        self.called = called
        self.methylated = methylated

    def add(self, called, methylated):
        self.called += called
        self.methylated += methylated

    def frequency(self):
        return self.methylated / self.called


def load_nanopolish(path):
    sites = {}
    with open(path) as fh:
        for rec in csv.DictReader(fh, delimiter="\t"):
            # column renamed num_cpgs_in_group -> num_motifs_in_group
            # across nanopolish versions; accept both
            n_group = rec.get("num_motifs_in_group",
                              rec.get("num_cpgs_in_group"))
            if int(n_group) > 1:
                continue        # singletons only, matching the reference
            key = f'{rec["chromosome"]}:{rec["start"]}-{rec["end"]}'
            sites[key] = SiteStats(int(rec["called_sites"]),
                                   int(rec["called_sites_methylated"]))
    return sites


def load_bisulfite(path):
    sites = {}
    with open(path) as fh:
        for line in fh:
            f = line.split()
            chrom, start, strand = f[0], int(f[1]), f[5]
            depth = float(f[9])
            methylated = int(float(f[10]) / 100.0 * depth)
            # collapse the reverse-strand G onto its forward-strand C
            pos = start if strand == "+" else start - 1
            key = f"{chrom}:{pos}-{pos}"
            if key in sites:
                sites[key].add(depth, methylated)
            else:
                sites[key] = SiteStats(depth, methylated)
    return sites


def load(path):
    return load_bisulfite(path) if "bisulfite" in path else \
        load_nanopolish(path)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2:
        sys.stderr.write(
            "usage: compare_methylation.py set1.tsv set2.tsv > joined.tsv\n")
        return 1
    set1, set2 = load(argv[0]), load(argv[1])
    print("key\tdepth_1\tfrequency_1\tdepth_2\tfrequency_2")
    n = 0
    for key, s1 in set1.items():
        s2 = set2.get(key)
        if s2 is None or s1.called == 0 or s2.called == 0:
            continue
        print(f"{key}\t{int(s1.called)}\t{s1.frequency():.4f}\t"
              f"{int(s2.called)}\t{s2.frequency():.4f}")
        n += 1
    sys.stderr.write(f"set1 sites: {len(set1)} set2 sites: {len(set2)} "
                     f"output: {n}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
