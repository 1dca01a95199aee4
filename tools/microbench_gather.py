#!/usr/bin/env python3
"""Measure XLA (non-Pallas) gather + masked-sum throughput at the shape a
post-hoc backtrack emission sum would need: take_along_axis of [B, N]
walk indices into per-read event/kmer tables, emission arithmetic, and a
masked row sum — chained ITERS times inside one jit, device_get-fenced.

Decides whether moving the QC emission recompute out of the backtrack
kernel (saving its 4 rolling streams, ~256 vreg-ops/band) pays: the
kernel-side saving is ~27 us/read at B=256, so the XLA side must cost
well under that.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = int(os.environ.get("NPT_GB_B", "256"))
N = int(os.environ.get("NPT_GB_N", "24704"))    # bands for an 8kb read
T = int(os.environ.get("NPT_GB_T", "16384"))
K = int(os.environ.get("NPT_GB_K", "8320"))
ITERS = int(os.environ.get("NPT_BENCH_ITERS", "8"))
TRIALS = int(os.environ.get("NPT_TRIALS", "5"))


def main():
    rng = np.random.default_rng(3)
    ev = jnp.asarray(rng.uniform(60, 130, (B, T)).astype(np.float32))
    mu = jnp.asarray(rng.uniform(60, 130, (B, K)).astype(np.float32))
    sig = jnp.asarray(rng.uniform(1, 3, (B, K)).astype(np.float32))
    c0 = jnp.asarray(rng.uniform(-3, -1, (B, K)).astype(np.float32))
    re = jnp.asarray(rng.integers(-1, T, (B, N)).astype(np.int32))
    rk = jnp.asarray(rng.integers(0, K, (B, N)).astype(np.int32))
    jax.block_until_ready((ev, mu, sig, c0, re, rk))

    @jax.jit
    def run(re, rk):
        def body(_, carry):
            re_c, acc = carry
            act = re_c >= 0
            ei = jnp.maximum(re_c, 0)
            e = jnp.take_along_axis(ev, ei, axis=1)
            m = jnp.take_along_axis(mu, rk, axis=1)
            s = jnp.take_along_axis(sig, rk, axis=1)
            c = jnp.take_along_axis(c0, rk, axis=1)
            a = (e - m) / s
            em = c + (-0.5 * a) * a
            tot = jnp.sum(jnp.where(act, em, 0.0), axis=1)
            dep = (jnp.minimum(jnp.sum(tot), 0.0) * 1e-30).astype(jnp.int32)
            return re_c + dep, acc + tot
        return jax.lax.fori_loop(
            0, ITERS, body, (re, jnp.zeros((B,), jnp.float32)))[1]

    print("compiling...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    jax.device_get(run(re, rk))
    print(f"compile+run {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    best = None
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        jax.device_get(run(re, rk))
        us_per_read = (time.perf_counter() - t0) / (ITERS * B) * 1e6
        if best is None or us_per_read < best:
            best = us_per_read
        print(json.dumps({"B": B, "N": N,
                          "us_per_read": round(us_per_read, 1),
                          "best": round(best, 1)}), flush=True)


if __name__ == "__main__":
    main()
