"""CLI driver: subcommand dispatch (reference: src/main/nanopolish.cpp:28-43).

Usage: python -m nanopolish_tpu <subcommand> [args]
"""

from __future__ import annotations

import os
import sys

# Persistent compile cache: multi-process launches (parallel.launch,
# --watch shards) otherwise recompile every kernel shape per process —
# on CPU backends that is seconds per shape, on remotely-attached TPU
# minutes.  Must be set before any backend initializes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/npt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# Platform pinning must happen before any backend use: this image's TPU
# plugin overrides the JAX_PLATFORMS env var, so launcher children (and
# tests) that need the CPU backend set NPT_PLATFORM instead, which wins
# through jax.config as long as no backend has initialized yet.
if os.environ.get("NPT_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["NPT_PLATFORM"])

from .models.read_builder import GLOBAL_READ_STATS


def _lazy(name):
    def run(argv):
        import importlib
        mod = importlib.import_module(f".apps.{name}", package="nanopolish_tpu")
        return mod.main(argv)
    return run


SUBCOMMANDS = {
    "index": _lazy("index"),
    "eventalign": _lazy("eventalign"),
    "variants": _lazy("variants"),
    "call-methylation": _lazy("call_methylation"),
    "methyltrain": _lazy("methyltrain"),
    "scorereads": _lazy("scorereads"),
    "phase-reads": _lazy("phase_reads"),
    "vcf2fasta": _lazy("vcf2fasta"),
    "polya": _lazy("polya"),
    "detect-polyi": _lazy("detect_polyi"),
    "fast5-check": _lazy("fast5_check"),
    "train-poremodel-from-basecalls": _lazy("train_poremodel_from_basecalls"),
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help", "help"):
        print("usage: nanopolish_tpu <command> [options]\n\ncommands:",
              file=sys.stderr)
        for name in SUBCOMMANDS:
            print(f"  {name}", file=sys.stderr)
        return 0 if argv else 1
    if argv[0] == "--version":
        from . import __version__
        print(f"nanopolish_tpu {__version__}")
        return 0
    cmd = SUBCOMMANDS.get(argv[0])
    if cmd is None:
        print(f"error: unrecognized command {argv[0]!r}", file=sys.stderr)
        return 1
    # join the jax.distributed runtime when spawned by parallel.launch
    # (no-op for plain single-process runs)
    from .parallel.distributed import auto_init
    auto_init()
    ret = cmd(argv[1:])
    # post-run read QC summary (src/main/nanopolish.cpp:87-97)
    report = GLOBAL_READ_STATS.report()
    if report:
        print(report, file=sys.stderr)
    return ret


if __name__ == "__main__":
    sys.exit(main())
