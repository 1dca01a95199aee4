#!/usr/bin/env python3
"""Derive a (k-1)-mer pore model from a k-mer model.

Behavioral rebuild of the reference's scripts/dropmodel.py: each
(k-1)-mer's gaussian summarizes the four k-mers sharing that prefix.
The reference estimates the collapsed mean/stdv by Monte Carlo sampling
(1000 draws per k-mer); here the equal-weight mixture moments are
computed in closed form (mean of means; variance = E[var + mu^2] -
mean^2), which is the same estimator without sampling noise.

Output: <input with "{k}mer" replaced by "{k-1}mer">, header tags
(#strand/#kit/#ont_model_name/#alphabet copied, #k and #original_file
added), sd_mean/sd_stdv zeroed as in the reference.
"""

import argparse
import itertools
import math
import sys

BASES = "ACGT"


def main(argv=None):
    p = argparse.ArgumentParser(
        description="reduce a k-mer model to a (k-1)-mer model")
    p.add_argument("-i", "--input", required=True)
    opt = p.parse_args(argv)

    keep = {"#strand", "#kit", "#ont_model_name", "#alphabet"}
    header = []
    model = {}
    k = 0
    with open(opt.input) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            f = line.split()
            if line.startswith("#") or line.startswith("kmer"):
                if f[0] in keep:
                    header.append(line)
                continue
            if k == 0:
                k = len(f[0])
            assert len(f[0]) == k, f"inconsistent kmer length in {f[0]}"
            model[f[0]] = (float(f[1]), float(f[2]))

    if k < 2:
        sys.stderr.write("input model must have k >= 2\n")
        return 1
    kp = k - 1
    out_name = opt.input.replace(f"{k}mer", f"{kp}mer")
    if out_name == opt.input:
        sys.stderr.write(f"input name must contain '{k}mer'\n")
        return 1

    header.append(f"#k\t{kp}")
    header.append(f"#original_file\t{opt.input}")
    with open(out_name, "w") as out:
        out.write("\n".join(header) + "\n")
        out.write("kmer\tlevel_mean\tlevel_stdv\tsd_mean\tsd_stdv\n")
        for pmer_t in itertools.product(BASES, repeat=kp):
            pmer = "".join(pmer_t)
            gs = [model[pmer + b] for b in BASES]
            mean = sum(m for m, _ in gs) / len(gs)
            second = sum(s * s + m * m for m, s in gs) / len(gs)
            stdv = math.sqrt(max(second - mean * mean, 0.0))
            out.write(f"{pmer}\t{mean}\t{stdv}\t0.0\t0.0\t0.0\n")
    print(out_name)
    return 0


if __name__ == "__main__":
    sys.exit(main())
