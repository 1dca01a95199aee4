#!/usr/bin/env python3
"""Convert an ONT-published pore model file into the framework's .model
format by adding metadata headers.

Behavioral rebuild of the reference's scripts/import_ont_model.py: the
kit/speed/k metadata is parsed from the model's type directory name
(e.g. .../r9.4_450bps_6mer_.../template.model), RNA models have their
kmers reversed into 5'->3' convention, states are emitted sorted by
kmer, and the output is named
<kit>.<alphabet>.<k>mer.<strand>.model (path printed to stdout).
"""

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(
        description="convert an ONT model file into framework format")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output-dir", default="")
    p.add_argument("-a", "--alphabet", default="")
    opt = p.parse_args(argv)

    dirs, filename = os.path.split(opt.input)
    type_dir = os.path.split(dirs)[1]
    fields = type_dir.split("_")
    if len(fields) != 5:
        sys.stderr.write(
            "error: cannot parse the model's type directory name "
            f"({type_dir!r}; expected 5 _-separated fields)\n")
        return 1
    pore, speed, kstr = fields[0], fields[2], fields[3].replace("mer", "")
    is_rna = "RNA" in type_dir
    kit = f"{pore}_{speed}"
    alphabet = opt.alphabet or "nucleotide"

    if "template" in filename:
        strand = "template"
    elif "pop1" in filename:
        strand = "complement.pop1"
    elif "pop2" in filename:
        strand = "complement.pop2"
    else:
        sys.stderr.write("error: cannot infer strand from filename\n")
        return 1

    prefix = opt.output_dir + "/" if opt.output_dir else ""
    out_name = f"{prefix}{kit}.{alphabet}.{kstr}mer.{strand}.model"

    states = []
    with open(opt.input) as fh:
        column_header = fh.readline()
        for line in fh:
            if line.startswith("#"):
                sys.stderr.write("error: ONT model should not have # tags\n")
                return 1
            f = line.rstrip("\n").split()
            if is_rna:
                # ONT RNA models are in sequencing (3'->5') order; the
                # framework convention is 5'->3'
                f[0] = f[0][::-1]
            states.append(f)

    with open(out_name, "w") as out:
        out.write(f"#ont_model_name\t{type_dir}\n")
        out.write(f"#kit\t{kit}\n")
        out.write(f"#strand\t{strand}\n")
        out.write(f"#k\t{kstr}\n")
        if opt.alphabet:
            out.write(f"#alphabet\t{opt.alphabet}\n")
        out.write(f"#original_file\t{type_dir}/{filename}\n")
        out.write(column_header)
        for rec in sorted(states, key=lambda r: r[0]):
            out.write("\t".join(rec) + "\n")
    print(out_name)
    return 0


if __name__ == "__main__":
    sys.exit(main())
