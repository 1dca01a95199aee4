"""Multi-process execution: launcher, shard-union correctness, and the
jax.distributed CPU backend (cross-process collectives).

Spec: the reference's multi-machine pattern is process-level sharding
(README.md:142-147 makerange x GNU parallel; watch suffix mod N,
call_methylation.cpp:489-508).  Here the same sharding runs through
parallel.launch + `--shard i/n`, and a real jax.distributed runtime
backs cross-process collectives for training reductions.
"""

import os
import subprocess
import sys
import time

import numpy as np
import pytest

from nanopolish_tpu.apps import index as index_app
from nanopolish_tpu.io.bam import BamRecord, BamWriter
from nanopolish_tpu.io.slow5 import Slow5Writer
from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.models.squiggle import SquiggleScalings
from nanopolish_tpu.utils.alphabet import DNA_ALPHABET, METHYL_CPG_ALPHABET
from nanopolish_tpu.utils.synthetic import random_sequence, synthetic_raw_signal


@pytest.fixture(scope="module")
def meth_pipe(tmp_path_factory):
    d = tmp_path_factory.mktemp("dist_meth")
    rng = np.random.default_rng(5150)
    pms = PoreModelSet.instance()
    nuc = pms.get_model("r9.4_450bps", "nucleotide", "template", 6)
    cpg = pms.get_model("r9.4_450bps", "cpg", "template", 6)
    genome = random_sequence(rng, 1600)
    ref_fa = str(d / "ref.fa")
    with open(ref_fa, "w") as fh:
        fh.write(">tig1\n")
        for i in range(0, len(genome), 60):
            fh.write(genome[i:i + 60] + "\n")
    fastq, slow5 = str(d / "reads.fastq"), str(d / "sig.slow5")
    L = 300
    plan = [(f"d{i}", 80 + 180 * i, i % 2 == 1, i % 2 == 0)
            for i in range(6)]
    with open(fastq, "w") as fq, Slow5Writer(slow5) as sw:
        for name, pos, is_rev, is_meth in plan:
            seg = genome[pos:pos + L]
            basecall = DNA_ALPHABET.reverse_complement(seg) if is_rev else seg
            fq.write(f"@{name}\n{basecall}\n+\n{'I' * L}\n")
            sc = SquiggleScalings.from4(0.0, 1.0, 0.0, 1.0)
            model, seq = (cpg, METHYL_CPG_ALPHABET.methylate(basecall)) \
                if is_meth else (nuc, basecall)
            pa = synthetic_raw_signal(rng, seq, model, sc,
                                      samples_per_base=10.0, leader=400,
                                      trailer=100)
            adc = np.clip(pa * 8192.0 / 1400.0, -32000, 32000).astype(np.int16)
            sw.write(name, adc, 8192.0, 0.0, 1400.0, 4000.0)
    index_app.main([fastq, "--slow5", slow5])
    bam = str(d / "aln.bam")
    w = BamWriter(bam, "@HD\tVN:1.6\tSO:coordinate\n", ["tig1"], [len(genome)])
    for name, pos, is_rev, _m in sorted(plan, key=lambda t: t[1]):
        seg = genome[pos:pos + L]
        w.write(BamRecord(qname=name, flag=16 if is_rev else 0, tid=0,
                          pos=pos, mapq=60, cigar=[(0, L)], seq=seg,
                          qual=np.full(L, 30, np.uint8)))
    w.close()
    return dict(dir=d, ref_fa=ref_fa, fastq=fastq, bam=bam)


def _run_launch(n, p, tag, extra_env=None):
    from nanopolish_tpu.parallel import launch

    pattern = str(p["dir"] / f"meth.{tag}.{{i}}.tsv")
    argv = ["-n", str(n), "--stdout", pattern, "--",
            "call-methylation", "-r", p["fastq"], "-b", p["bam"],
            "-g", p["ref_fa"], "--shard", "{i}/{n}"]
    t0 = time.perf_counter()
    env_bak = dict(os.environ)
    try:
        # children must run on the CPU backend (the TPU plugin overrides
        # JAX_PLATFORMS, so NPT_PLATFORM pins it through jax.config)
        os.environ["NPT_PLATFORM"] = "cpu"
        if extra_env:
            os.environ.update(extra_env)
        rc = launch.main(argv)
    finally:
        os.environ.clear()
        os.environ.update(env_bak)
    dt = time.perf_counter() - t0
    assert rc == 0
    outs = []
    for i in range(n):
        outs.append(open(pattern.replace("{i}", str(i))).read())
    return outs, dt


def _rows(text):
    return set(l for l in text.splitlines()[1:] if l)


@pytest.mark.parametrize("n", [2, 3])
def test_shard_union_matches_single_process(meth_pipe, n):
    single, t1 = _run_launch(1, meth_pipe, "s")
    rows1 = _rows(single[0])
    assert rows1, "single-process run produced no calls"
    shards, tn = _run_launch(n, meth_pipe, f"n{n}")
    union = set()
    for s in shards:
        r = _rows(s)
        assert not (union & r), "shards overlap"
        union |= r
    assert union == rows1
    sites = len(rows1)
    print(f"[scaling] n=1 {sites / t1:.1f} sites/s; "
          f"n={n} {sites / tn:.1f} sites/s (wall {t1:.1f}s -> {tn:.1f}s)")


def test_cross_process_psum(tmp_path):
    """Two launcher-style processes join one jax.distributed runtime and
    psum across process-local CPU devices."""
    script = tmp_path / "psum_child.py"
    script.write_text(
        "import os, sys\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from nanopolish_tpu.parallel.distributed import auto_init\n"
        "pid, n = auto_init()\n"
        "assert n == 2 and jax.device_count() == 2\n"
        "import numpy as np, jax.numpy as jnp\n"
        "from jax.sharding import Mesh, PartitionSpec as P\n"
        "from jax.experimental.multihost_utils import "
        "host_local_array_to_global_array\n"
        "mesh = Mesh(np.array(jax.devices()), ('d',))\n"
        "f = jax.shard_map(lambda x: jax.lax.psum(x, 'd'), mesh=mesh,\n"
        "                  in_specs=P('d'), out_specs=P())\n"
        "g = host_local_array_to_global_array(\n"
        "    np.full((1, 4), pid + 1.0, np.float32), mesh, P('d'))\n"
        "out = np.asarray(jax.device_get(f(g).addressable_data(0)))\n"
        "assert (out == 3.0).all(), out\n"
        "print(f'proc {pid} psum ok')\n")
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env.update(NPT_COORDINATOR=f"127.0.0.1:{port}", NPT_NUM_PROCS="2",
                   NPT_PROC_ID=str(i), JAX_PLATFORMS="cpu",
                   XLA_FLAGS="",    # 1 local device per process
                   PYTHONPATH=os.pathsep.join(
                       [os.path.dirname(os.path.dirname(__file__))]
                       + sys.path))
        procs.append(subprocess.Popen([sys.executable, str(script)],
                                      env=env, stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=180)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i}:\n{outs[i]}"
        assert "psum ok" in outs[i]
