#!/usr/bin/env python3
"""Honest chip rate of the profile-HMM Pallas kernels (kernel #2).

The PERF.md figure of ~8-8.9k segments/s was sync-per-call: each call
paid a full relay round trip, so it measured the tunnel, not the chip.
This tool chains ITERS data-dependent kernel invocations inside one jit
(the same methodology as bench.py / tools/perf_split.py for the banded
kernel) and reports segments/s with only one device_get fence.

Shapes model a typical variants / call-methylation scoring batch:
B segments x T events x K kmers (defaults 512 x 256 x 32 — a 30-base
methylation scoring window at ~2 events/base; eventalign-style long
segments can be modeled with NPT_HMM_T=512 NPT_HMM_K=224).

Usage: python tools/perf_hmm.py [forward viterbi]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nanopolish_tpu.ops.pallas_profile_hmm import (
    HAF_ALLOW_PRE_CLIP, HAF_ALLOW_POST_CLIP,
    _pack_hmm_inputs, _profile_hmm_forward_call_packed,
    _profile_hmm_viterbi_call_packed)

B = int(os.environ.get("NPT_HMM_B", "512"))
T = int(os.environ.get("NPT_HMM_T", "256"))
K = int(os.environ.get("NPT_HMM_K", "32"))
ITERS = int(os.environ.get("NPT_BENCH_ITERS", "12"))
TRIALS = int(os.environ.get("NPT_TRIALS", "6"))


def main():
    rng = np.random.default_rng(11)
    n_kmers = np.full(B, K, np.int32)
    n_events = rng.integers(max(2 * K - 16, 4), T, size=B).astype(np.int32)
    mu = rng.uniform(60, 130, size=(B, K)).astype(np.float32)
    sigma = rng.uniform(1.0, 3.0, size=(B, K)).astype(np.float32)
    levels = rng.uniform(55, 140, size=(B, T)).astype(np.float32)
    epb = (n_events / np.maximum(n_kmers, 1)).astype(np.float32)
    flags = np.full(B, HAF_ALLOW_PRE_CLIP | HAF_ALLOW_POST_CLIP, np.int32)

    packed, TP, B0, _, _ = _pack_hmm_inputs(
        levels, n_events, mu, sigma, np.log(sigma), n_kmers, epb, flags, 1.0)
    packed = jax.device_put(jnp.asarray(packed))
    jax.block_until_ready(packed)

    calls = {"forward": _profile_hmm_forward_call_packed,
             "viterbi": _profile_hmm_viterbi_call_packed}
    names = sys.argv[1:] or ["forward", "viterbi"]
    for name in names:
        call = calls[name]

        @jax.jit
        def run(p):
            def body(_, carry):
                p_cur, _last = carry
                out = call(p_cur, TP)
                s = out[0] if isinstance(out, tuple) else out
                s = jnp.asarray(s, jnp.float32)
                dep = jnp.minimum(jnp.sum(s), 0.0) * 1e-30
                return p_cur.at[:, 0].add(dep), jnp.sum(s)
            return jax.lax.fori_loop(
                0, ITERS, body, (p, jnp.float32(0.0)))[1]

        print(f"perf_hmm: compiling {name}...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        jax.device_get(run(packed))
        print(f"perf_hmm: {name} compile+run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        best = None
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            jax.device_get(run(packed))
            dt = time.perf_counter() - t0
            rate = ITERS * B / dt
            if best is None or rate > best:
                best = rate
            print(json.dumps({
                "kernel": name, "B": B, "T": T, "K": K,
                "segments_per_s": round(rate, 1),
                "best": round(best, 1)}), flush=True)


if __name__ == "__main__":
    main()
