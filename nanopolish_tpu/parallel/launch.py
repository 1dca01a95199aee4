"""Per-host process launcher: `python -m nanopolish_tpu.parallel.launch`.

Spawns N copies of a nanopolish_tpu subcommand, each with its own process
shard and output file — the programmatic version of the reference's
"makerange | parallel" / watch-suffix-mod-N patterns (README.md:142-147,
call_methylation.cpp:489-508) — and exports the jax.distributed
environment (NPT_COORDINATOR/NPT_NUM_PROCS/NPT_PROC_ID) so children join
one runtime when collectives are needed.

Placeholders `{i}` (process id) and `{n}` (process count) are substituted
into the command args, e.g.:

    python -m nanopolish_tpu.parallel.launch -n 4 \
        --stdout meth.{i}.tsv -- \
        call-methylation -r reads.fq -b a.bam -g ref.fa --shard {i}/{n}

Exit status is non-zero if any child fails.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
from typing import List, Optional


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="nanopolish_tpu.parallel.launch",
        description="spawn N sharded nanopolish_tpu processes")
    p.add_argument("-n", "--num-processes", type=int, required=True)
    p.add_argument("--coordinator", default="",
                   help="host:port for jax.distributed (default: "
                        "127.0.0.1:<free port>; 'none' disables)")
    p.add_argument("--stdout", default="",
                   help="per-process stdout file pattern with {i}")
    p.add_argument("--pin-cores", type=int, default=0, metavar="C",
                   help="pin child i to C disjoint CPU cores (cores "
                        "i*C..(i+1)*C-1): keeps per-process host "
                        "resources constant so process scaling is "
                        "measurable on a shared host")
    p.add_argument("command", nargs=argparse.REMAINDER,
                   help="-- <subcommand> [args...] ({i}/{n} substituted)")
    return p


def main(argv: Optional[List[str]] = None) -> int:
    opt = make_parser().parse_args(argv)
    cmd = opt.command
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        raise SystemExit("launch: no command given after --")
    n = opt.num_processes
    coordinator = opt.coordinator
    if coordinator == "":
        coordinator = f"127.0.0.1:{_free_port()}"
    procs = []
    files = []
    for i in range(n):
        env = dict(os.environ)
        env["NPT_NUM_PROCS"] = str(n)
        env["NPT_PROC_ID"] = str(i)
        if coordinator != "none":
            env["NPT_COORDINATOR"] = coordinator
        args = [a.replace("{i}", str(i)).replace("{n}", str(n))
                for a in cmd]
        out = None
        if opt.stdout:
            out = open(opt.stdout.replace("{i}", str(i)).replace(
                "{n}", str(n)), "w")
            files.append(out)
        preexec = None
        if opt.pin_cores:
            cores = set(range(i * opt.pin_cores, (i + 1) * opt.pin_cores))

            def preexec(cores=cores):  # noqa: E731
                os.sched_setaffinity(0, cores)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "nanopolish_tpu"] + args,
            env=env, stdout=out, preexec_fn=preexec))
    rc = 0
    for p in procs:
        rc = rc or p.wait()
    for f in files:
        f.close()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
