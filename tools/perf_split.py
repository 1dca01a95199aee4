#!/usr/bin/env python3
"""Measure the exact-banded pipeline's stage split on the real chip.

Times three device programs at the bench shape (B=128, 8kb reads):
  fill    — _fill_call only
  fillbt  — fill + backtrack kernels (no b2e scatter)
  full    — _exact_align_device (fill + backtrack + b2e scatter + QC)

Each program chains ITERS data-dependent iterations inside one jit and is
fenced with jax.device_get (see PERF.md "honest timing").  Prints one JSON
line per config with best us/read over the trial budget.

Usage: python tools/perf_split.py [fill fillbt full]
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import make_reads, BATCH
from nanopolish_tpu.ops.pallas_banded_exact import (
    _backtrack_call, _exact_align_device, _fill_call, prepare_exact_inputs,
    transition_params_f32)

ITERS = int(os.environ.get("NPT_BENCH_ITERS", "8"))
TRIALS = int(os.environ.get("NPT_TRIALS", "6"))


def main():
    ev, n_events, mu, sigma, log_sigma, n_kmers = make_reads(BATCH)
    prep = prepare_exact_inputs(ev, n_events, mu, sigma, log_sigma, n_kmers)
    lps, lpt = transition_params_f32(n_events, n_kmers)
    Tp, K0 = prep["Tp"], prep["K0"]
    args = [jax.device_put(x) for x in
            (prep["evr"], prep["tmu"], prep["tsig"], prep["tc"],
             prep["nev"], prep["nk"], lps, lpt)]
    jax.block_until_ready(args)

    @jax.jit
    def run_fill(evr, *rest):
        def body(_, carry):
            e_cur, _ = carry
            trace, lle, best_s, best_e = _fill_call(e_cur, *rest, Tp=Tp)
            dep = jnp.minimum(jnp.sum(best_s), 0.0) * 1e-30
            return e_cur.at[:, 0].add(dep), best_e
        return jax.lax.fori_loop(
            0, ITERS, body,
            (evr, jnp.zeros((evr.shape[0], 1), jnp.int32)))[1]

    @jax.jit
    def run_fillbt(evr, tmu, tsig, tc, nev, nk, lps_, lpt_):
        def body(_, carry):
            e_cur, _ = carry
            trace, lle, best_s, best_e = _fill_call(
                e_cur, tmu, tsig, tc, nev, nk, lps_, lpt_, Tp=Tp)
            best_ok = (best_s > -1e30).astype(jnp.int32)
            rows_k, rows_e, sum_em, stats = _backtrack_call(
                trace, e_cur, tmu, tsig, tc, nk, lle, best_e, best_ok, Tp)
            dep = jnp.minimum(jnp.sum(sum_em), 0.0) * 1e-30
            return e_cur.at[:, 0].add(dep), stats[0, :]
        return jax.lax.fori_loop(
            0, ITERS, body,
            (evr, jnp.zeros((evr.shape[0],), jnp.int32)))[1]

    @jax.jit
    def run_full(evr, *rest):
        def body(_, carry):
            e_cur, _ = carry
            res = _exact_align_device(e_cur, *rest, Tp=Tp, K0=K0,
                                      interpret=False)
            dep = jnp.minimum(jnp.sum(res.avg_log_emission), 0.0) * 1e-30
            return e_cur.at[:, 0].add(dep), res.failed
        return jax.lax.fori_loop(
            0, ITERS, body,
            (evr, jnp.zeros((evr.shape[0],), bool)))[1]

    progs = {"fill": run_fill, "fillbt": run_fillbt, "full": run_full}
    names = sys.argv[1:] or ["fill", "fillbt", "full"]
    for name in names:
        fn = progs[name]
        print(f"perf_split: compiling {name}...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        print(f"perf_split: {name} compile+run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        best = None
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            jax.device_get(fn(*args))
            dt = time.perf_counter() - t0
            us_per_read = dt / (ITERS * BATCH) * 1e6
            if best is None or us_per_read < best:
                best = us_per_read
            print(json.dumps({"config": name,
                              "us_per_read": round(us_per_read, 1),
                              "best": round(best, 1)}), flush=True)


if __name__ == "__main__":
    main()
