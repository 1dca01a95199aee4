#!/usr/bin/env python3
"""Microbenchmark of the Pallas primitive ops that dominate the exact
banded fill kernel, to decide frame-layout tradeoffs with data instead
of guesses (see PERF.md "issue-bound" attribution).

Each case is a Pallas kernel that runs ITER chained repetitions of one
primitive pattern on fill-kernel-shaped operands ([B, N] f32), fenced
with device_get; the report is ns per repetition after subtracting the
`baseline` case (same loop, one add per rep).

Cases:
  baseline   x = x + 1                      (loop + 1 op overhead)
  croll256   conditional roll+select on [B, 256]   (one fill window op)
  uroll256   unconditional roll on [B, 256]
  croll128   conditional roll+select on [B, 128]
  reduce     masked max-reduce [B,128] -> [B,1] (dynamic-lane extract)
  extract2   two one-hot masked max-reduces (ll+ur extraction pattern)
  bcast      [B,1] -> [B,128] broadcast + select
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("NPT_MB_B", "64"))
ITER = int(os.environ.get("NPT_MB_ITER", "4096"))
TRIALS = int(os.environ.get("NPT_TRIALS", "4"))


def _kernel(case, x_ref, c_ref, o_ref):
    x = x_ref[:]                      # [B, 256]
    c = c_ref[:]                      # [B, 1] int32 (values 0/1)
    acc = jnp.zeros((B, 1), jnp.float32)

    def body(i, st):
        x, acc = st
        if case == "baseline":
            x = x + 1.0
        elif case == "uroll2x256":
            a = pltpu.roll(x, 1, 1)
            b = pltpu.roll(x + 2.0, 1, 1)
            x = a + b
        elif case.startswith("uroll") and case != "uroll256":
            w = int(case[5:])            # uroll128 / uroll512 / uroll1024
            n = w // 256
            if n >= 1:
                y = jnp.concatenate([x] * n, axis=1)
                y = pltpu.roll(y, 1, 1)
                x = y[:, :256] + 1.0
            else:
                h = pltpu.roll(x[:, :w], 1, 1)
                x = jnp.concatenate([h, x[:, w:]], axis=1) + 1.0
        elif case == "fused1024":
            # fused mega-window pattern: one roll + one per-lane mask
            # select on 4x256 lanes (vs croll256 x 4)
            r = (c + i) % 2 > 0
            y = jnp.concatenate([x, x + 1, x + 2, x + 3], axis=1)
            rw = jnp.broadcast_to(r, (B, 1024))
            m = rw != (jax.lax.broadcasted_iota(
                jnp.int32, (B, 1024), 1) >= 768)
            y = jnp.where(m, pltpu.roll(y, 1, 1), y)
            x = y[:, :256] + 1.0
        elif case == "croll256":
            r = (c + i) % 2 > 0
            rw = jnp.broadcast_to(r, (B, 256))
            x = jnp.where(rw, pltpu.roll(x, 1, 1), x) + 1.0
        elif case == "uroll256":
            x = pltpu.roll(x, 1, 1) + 1.0
        elif case == "croll128":
            r = (c + i) % 2 > 0
            rw = jnp.broadcast_to(r, (B, 128))
            h = x[:, :128]
            h = jnp.where(rw, pltpu.roll(h, 1, 1), h) + 1.0
            x = jnp.concatenate([h, x[:, 128:]], axis=1)
        elif case == "reduce":
            d = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1) - (c + i % 97)
            v = jnp.max(jnp.where(d == 0, x[:, :128], -1e30),
                        axis=1, keepdims=True)
            acc = acc + v
            x = x + 1.0
        elif case == "extract2":
            d = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1) - (c + i % 97)
            h = x[:, :128]
            ll = jnp.max(jnp.where(d == 0, h, -1e30), axis=1, keepdims=True)
            ur = jnp.max(jnp.where(d == 99, h, -1e30), axis=1, keepdims=True)
            acc = acc + jnp.where(ll < ur, ll, ur)
            x = x + 1.0
        elif case == "bcast":
            r = (c + i) % 2 > 0
            rw = jnp.broadcast_to(r, (B, 128))
            h = jnp.where(rw, x[:, :128], -x[:, :128])
            acc = acc + h[:, 0:1]
            x = x + 1.0
        else:
            raise ValueError(case)
        return x, acc

    x, acc = jax.lax.fori_loop(0, ITER, body, (x, acc))
    o_ref[:] = x[:, 0:1] + acc


def run_case(case):
    x = jnp.asarray(np.random.rand(B, 256).astype(np.float32))
    c = jnp.asarray(np.random.randint(0, 2, (B, 1)).astype(np.int32))

    f = pl.pallas_call(
        functools.partial(_kernel, case),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    g = jax.jit(f)
    jax.device_get(g(x, c))          # compile + warm
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        jax.device_get(g(x, c))
        best = min(best, time.perf_counter() - t0)
    return best / ITER * 1e9


def main():
    cases = sys.argv[1:] or ["baseline", "uroll256", "croll256", "croll128",
                             "reduce", "extract2", "bcast", "uroll128",
                             "uroll512", "uroll1024", "uroll2x256",
                             "fused1024"]
    base = None
    for case in cases:
        ns = run_case(case)
        if case == "baseline":
            base = ns
        rel = ns - base if base is not None and case != "baseline" else ns
        print(json.dumps({"case": case, "ns_per_rep": round(ns, 2),
                          "ns_minus_baseline": round(rel, 2)}), flush=True)


if __name__ == "__main__":
    main()
