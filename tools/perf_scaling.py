#!/usr/bin/env python3
"""Positive multi-process scaling measurement (VERDICT r2 weak #4).

Round 2 measured FLAT process scaling because one process's XLA intra-op
parallelism already saturated this 4-core host — process count only
added startup.  The honest experiment holds per-process host resources
CONSTANT: pin every configuration's processes to 2 cores each
(launcher --pin-cores) and compare

    T(1 process, reads R, 2 cores)   vs   T(2 processes, R/2 each,
                                               2 disjoint cores each)

Perfect scaling halves the wall-clock; efficiency = T1 / (2 * T2_max)
... except the processes run concurrently, so efficiency =
T1 / (2 * T2_wall) with T2_wall the slower child's wall time.  This is
the same quantity the BASELINE's 1 -> 4 host target measures (per-host
resources constant, work sharded by read index).

Runs call-methylation on the CPU backend (sharding machinery identical
to the TPU path; BamBatchProcessor --shard i/n).

Usage: python tools/perf_scaling.py  (env: NPT_E2E_READS default 48)
"""

import importlib.util
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_READS = int(os.environ.get("NPT_E2E_READS", "48"))


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_config(n_procs, fastq, bam, ref_fa, outdir, tag, max_reads=None):
    """Launch n_procs pinned children via parallel.launch; returns
    wall-clock seconds and total output rows."""
    pattern = os.path.join(outdir, f"meth_{tag}_{{i}}.tsv")
    cmd = [sys.executable, "-m", "nanopolish_tpu.parallel.launch",
           "-n", str(n_procs), "--pin-cores", "2", "--coordinator", "none",
           "--stdout", pattern, "--",
           "call-methylation", "-r", fastq, "-b", bam, "-g", ref_fa,
           "-q", "cpg", "-t", "2", "--shard", "{i}/{n}"]
    if max_reads is not None:
        cmd += ["--max-reads", str(max_reads)]
    env = dict(os.environ)
    env["NPT_PLATFORM"] = "cpu"
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True, env=env)
    dt = time.perf_counter() - t0
    rows = 0
    for i in range(n_procs):
        with open(pattern.replace("{i}", str(i))) as fh:
            rows += sum(1 for l in fh
                        if l.strip() and not l.startswith("chromosome\t"))
    return dt, rows


def main():
    os.environ["NPT_PLATFORM"] = "cpu"
    pm = _load_tool("perf_e2e_methylation")
    pm.N_READS = N_READS
    with tempfile.TemporaryDirectory() as d:
        import numpy as np  # noqa: F401  (perf tool import side effects)
        fastq, bam, ref_fa = pm.build_corpus(d)

        # warm the persistent CPU compile cache once so neither config
        # pays first-compile asymmetrically
        warm_s, warm_rows = run_config(1, fastq, bam, ref_fa, d, "warm")
        # per-process startup (python + jax init + compile-cache load +
        # index/db open) measured with a near-empty workload: on a real
        # corpus (hours of reads) it amortizes to ~0, so the scaling
        # number that predicts production behavior is the WORK portion
        t0s, _ = run_config(1, fastq, bam, ref_fa, d, "cal", max_reads=2)
        t1, rows1 = run_config(1, fastq, bam, ref_fa, d, "p1")
        t2, rows2 = run_config(2, fastq, bam, ref_fa, d, "p2")
        assert rows1 == rows2 == warm_rows, (rows1, rows2, warm_rows)
        speedup = t1 / t2
        w1, w2 = t1 - t0s, t2 - t0s
        wspeed = w1 / max(w2, 1e-9)
        print(json.dumps({
            "reads": N_READS, "sites": rows1,
            "t_startup_s": round(t0s, 1),
            "t_1proc_2cores_s": round(t1, 1),
            "t_2proc_2cores_each_s": round(t2, 1),
            "speedup_raw": round(speedup, 2),
            "work_speedup": round(wspeed, 2),
            "work_efficiency_vs_linear": round(wspeed / 2.0, 3)}),
            flush=True)


if __name__ == "__main__":
    main()
