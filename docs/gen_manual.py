#!/usr/bin/env python3
"""Regenerate docs/manual.md from the subcommands' argparse definitions."""
import importlib
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

SUBS = ["index", "eventalign", "call_methylation", "variants", "vcf2fasta",
        "scorereads", "phase_reads", "polya", "detect_polyi", "methyltrain",
        "train_poremodel_from_basecalls", "fast5_check"]


def main():
    out = ["# Manual — subcommand reference",
           "",
           "Every subcommand runs as `python -m nanopolish_tpu <name> [args]`.",
           "Generated from the argparse definitions (`docs/gen_manual.py` regenerates).",
           ""]
    for s in SUBS:
        m = importlib.import_module(f"nanopolish_tpu.apps.{s}")
        buf = io.StringIO()
        m.make_parser().print_help(buf)
        out += [f"## {s.replace('_', '-')}", "", "```",
                buf.getvalue().rstrip(), "```", ""]
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "manual.md"), "w") as fh:
        fh.write("\n".join(out))


if __name__ == "__main__":
    main()
