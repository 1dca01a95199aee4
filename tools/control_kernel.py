#!/usr/bin/env python3
"""Control-kernel measurement: pin the fill kernel's per-band cost stack.

VERDICT r2 weak#1: the fill kernel's counted vector work was ~5x below
the observed cycles/band, and round 2 *attributed* the gap to Mosaic's
serial band-loop structure without isolating it.  This tool measures the
floor directly with kernels that share ``_fill_kernel``'s exact
structural scaffold (same grid over 128-band chunks, same
fori-loop-over-groups + 16-band static unroll, same nsplit interleaved
chains, same packed-trace accumulate + one store per group, same scratch
layout) and progressively larger LIVE band bodies (every added op feeds
the trace output through the score chain, so nothing dead-code
eliminates):

  loop    - near-empty: band-edge decision compare + trace encode only
  dp      - + minimal serial DP: 1 roll + 2 add + 2 max + trace selects
  dpwin   - + the 4 conditional [Bs,256] window rolls, windows consumed
            by the score chain
  dpemit  - + the real emission arithmetic (sub, div, mul, mul, add)
  dpfull  - + real neighbor alignment (up/left selects, 3-way diag,
            column->lane broadcasts) and placement bookkeeping: the full
            band body minus trim/end blocks
  dpfull_refill - dpfull + the per-chunk refill (4 streams x B per-read
            384-lane dynamic-slice loads + align_left), indices carried
            through a scratch so nothing hoists
  dpwin1  - like dpwin but the 3 kmer streams stacked in ONE [3Bs,256]
            array advanced with ONE roll + ONE select (tests whether the
            window cost is per-op fixed overhead or per-vreg issue)

The production fill measures ~124 us/read at B=256 (tools/perf_split.py)
= ~1.29 us/band-batch; the difference between consecutive variants
attributes the stack.  Methodology as bench.py: ITERS chained
data-dependent iterations inside one jit, device_get fence, best trial.

Run:  python tools/control_kernel.py [--batch 256] [--bodies ...]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanopolish_tpu.ops.pallas_banded_exact import (
    BANDWIDTH, CHUNK, LANES, PACK, WIN, _align_left, _iota_b, _roll_l)

LP_SKIP = -23.0
BODIES = ("loop", "dp", "dpwin", "dpwin1", "dpemit", "dpfull",
          "dpfull_refill", "kstatic", "kstatic128")


def _control_kernel(evr_ref, out_ref, trace_ref,
                    s_prev, s_prev2, ew, kmu, ksig, kc, kall, r_prev, ll_e,
                    stage, body, nsplit):
    i = pl.program_id(0)
    B = s_prev.shape[0]
    Bs = B // nsplit
    lanes = _iota_b(Bs, LANES)

    @pl.when(i == 0)
    def _():
        off = _iota_b(B, LANES)
        s_prev2[:] = jnp.where(off == 50, 0.0, -1.0)
        s_prev[:] = jnp.where(off == 50, -0.5, -1.0)
        r_prev[:] = jnp.zeros((B, 1), jnp.int32)
        ll_e[:] = jnp.zeros((B, 1), jnp.int32)
        ew[:] = evr_ref[:, :WIN]
        kmu[:] = evr_ref[:, WIN:2 * WIN]
        ksig[:] = evr_ref[:, 2 * WIN:3 * WIN] * 0.25 + 1.0
        kc[:] = evr_ref[:, 3 * WIN:4 * WIN] * 0.125
        for s in range(3):
            kall[s * B:(s + 1) * B, :] = evr_ref[:, :WIN] * (0.5 ** s)

    if body == "dpfull_refill":
        # the real kernel's per-chunk refill: 4 streams x B per-read
        # 384-lane aligned dynamic-slice loads + vectorized align.  j0
        # depends on the carried ll_e scratch (data-dependent, like the
        # real kernel's band placement) so nothing hoists out of the grid.
        j0v = (ll_e[:] + i) & 1023
        r_vec = j0v & 127
        for w in (ew, kmu, ksig, kc):
            for b in range(B):
                jb = (ll_e[b, 0] + i) & 1023
                ab = pl.multiple_of(jb - (jb & 127), 128)
                stage[b, :] = evr_ref[b, pl.ds(ab, 384)]
            w[:] = _align_left(stage[:], r_vec)[:, :WIN]

    def band(parity, st):
        (sp, sp2, ew_v, kmu_v, ksig_v, kc_v, kall_v,
         r_prev_v, ll_e_v) = st

        if body in ("kstatic", "kstatic128"):
            # ---- the kmer-static-lanes frame (VERDICT r3 #3) ----
            # kmers sit at fixed lanes; the 100-live-cell window drifts
            # right by one lane per right-move.  What this frame saves:
            # the 3 kmer-stream conditional rolls and the conditional
            # neighbor selects (up/left/diag alignment is unconditional:
            # up = sp, left = roll(sp), diag = roll(sp2)).  What it
            # pays, per band, on the serial placement path:
            #   * band-edge score extraction at DYNAMIC per-read lanes
            #     (two one-hot masked reduces over the DP width);
            #   * the event stream still rolls conditionally (the event
            #     vector ev[diag-k] shifts by one lane per down-move)
            #     AND injects its new element at a dynamic lane;
            #   * a per-band live-lane mask from the drifting window;
            #   * 'kstatic': the window straddles 128-lane block
            #     boundaries per read, so every DP/emission op runs
            #     2-blocks (256) wide; 'kstatic128' is the OPTIMISTIC
            #     variant that assumes a free re-centering scheme keeps
            #     everything 128 wide (a lower bound for the frame).
            # Role remap (scaffold scratches, widths fixed):
            #   ew_v [Bs,256] = scores d-1; kmu_v [Bs,256] = scores d-2;
            #   ksig_v [Bs,256] = event stream; kall_v 3x[Bs,256] =
            #   static kmer mu/sig/const; ll_e_v [Bs,1] = k_low.
            Wk = LANES if body == "kstatic128" else 2 * LANES
            lanesW = _iota_b(Bs, Wk)
            klow = ll_e_v
            spW = ew_v[:, :Wk]
            sp2W = kmu_v[:, :Wk]
            evW = ksig_v[:, :Wk]
            kmuW = kall_v[0:Bs, :Wk]
            ksigW = kall_v[Bs:2 * Bs, :Wk]
            kcW = kall_v[2 * Bs:3 * Bs, :Wk]

            # dynamic band-edge extraction (serial path)
            low_oh = lanesW == (klow & (Wk - 1))
            hi_oh = lanesW == ((klow + BANDWIDTH - 1) & (Wk - 1))
            ll = jnp.sum(jnp.where(low_oh, spW, 0.0), axis=1,
                         keepdims=True)
            ur = jnp.sum(jnp.where(hi_oh, spW, 0.0), axis=1,
                         keepdims=True)
            r_i = (ll < ur).astype(jnp.int32)
            right = r_i > 0
            right_w = jnp.broadcast_to(right, (Bs, Wk))
            klow_new = klow + r_i

            # event stream: conditional roll + dynamic-lane inject
            evW = jnp.where(right_w, evW, pltpu.roll(evW, 1, 1))
            inj = jnp.broadcast_to(ll + ur, (Bs, Wk))
            evW = jnp.where(low_oh & (~right_w), inj, evW)

            # emission vs static kmer tables
            a = (evW - kmuW) / ksigW
            em = kcW + (-0.5 * a) * a

            # unconditional neighbor alignment
            left = pltpu.roll(spW, 1, 1)
            diag = pltpu.roll(sp2W, 1, 1)
            sd = (diag + 0.125) + em
            su = (spW + 0.0625) + em
            sl = left + LP_SKIP
            m2 = jnp.maximum(sd, su)
            m3 = jnp.maximum(m2, sl)
            # live-lane mask of the drifting window (wrap ignored: a
            # real kernel would pay MORE here)
            lo = klow_new & (Wk - 1)
            live = (lanesW >= lo) & (lanesW < lo + BANDWIDTH)
            m3 = jnp.where(live, m3, -jnp.inf)
            tr = jnp.where(sl >= m2, 2, jnp.where(su >= sd, 1, 0))
            tr128 = tr[:, :LANES] | jnp.broadcast_to(r_i, (Bs, LANES))

            ew_n = ew_v
            kmu_n = kmu_v
            ksig_n = ksig_v
            if Wk == LANES:
                ew_n = jnp.concatenate([m3, ew_v[:, LANES:]], axis=1)
                kmu_n = jnp.concatenate([spW, kmu_v[:, LANES:]], axis=1)
                ksig_n = jnp.concatenate([evW, ksig_v[:, LANES:]],
                                         axis=1)
            else:
                ew_n = m3
                kmu_n = spW
                ksig_n = evW
            return tr128, (sp, sp2, ew_n, kmu_n, ksig_n, kc_v, kall_v,
                           r_i, klow_new)

        ll = sp[:, 0:1]
        ur = sp[:, BANDWIDTH - 1:BANDWIDTH]
        both_ob = (ll < -1e30) & (ur < -1e30)
        r_i = jnp.where(both_ob, parity, (ll < ur).astype(jnp.int32))
        right = r_i > 0

        def repack(sp, sp2, r_i, ll_e_v):
            return (sp, sp2, ew_v, kmu_v, ksig_v, kc_v, kall_v, r_i, ll_e_v)

        if body == "loop":
            tr = jnp.broadcast_to(r_i, (Bs, LANES))
            return tr, repack(sp, sp2, r_i, ll_e_v)

        if body in ("dpwin", "dpemit", "dpfull", "dpfull_refill"):
            right_w = jnp.broadcast_to(right, (Bs, WIN))
            ew_v = jnp.where(right_w, ew_v, pltpu.roll(ew_v, 1, 1))
            kmu_v = jnp.where(right_w, _roll_l(kmu_v), kmu_v)
            ksig_v = jnp.where(right_w, _roll_l(ksig_v), ksig_v)
            kc_v = jnp.where(right_w, _roll_l(kc_v), kc_v)

        if body == "dpwin1":
            right_w = jnp.broadcast_to(right, (Bs, WIN))
            ew_v = jnp.where(right_w, ew_v, pltpu.roll(ew_v, 1, 1))
            right3 = jnp.broadcast_to(
                jnp.concatenate([right, right, right], axis=0), (3 * Bs, WIN))
            kall_v = jnp.where(right3, _roll_l(kall_v), kall_v)

        if body in ("dpemit", "dpfull", "dpfull_refill"):
            ev_band = ew_v[:, LANES:WIN]
            a = (ev_band - kmu_v[:, 0:LANES]) / ksig_v[:, 0:LANES]
            em = kc_v[:, 0:LANES] + (-0.5 * a) * a
        elif body == "dpwin":
            em = kc_v[:, 0:LANES] + ew_v[:, LANES:WIN]
        elif body == "dpwin1":
            # consume all three stream blocks so none dead-code eliminates
            a = (ew_v[:, LANES:WIN] - kall_v[0:Bs, 0:LANES]) \
                / kall_v[Bs:2 * Bs, 0:LANES]
            em = kall_v[2 * Bs:3 * Bs, 0:LANES] + (-0.5 * a) * a
        else:
            em = 0.125

        if body in ("dpfull", "dpfull_refill"):
            # real neighbor alignment + placement bookkeeping
            right_b = jnp.broadcast_to(right, (Bs, LANES))
            ll_e_v = ll_e_v + (1 - r_i)
            sp_l = _roll_l(sp)
            sp_r = pltpu.roll(sp, 1, 1)
            up = jnp.where(right_b, sp_l, sp)
            left = jnp.where(right_b, sp, sp_r)
            amt = r_prev_v + r_i - 1
            amt_w = jnp.broadcast_to(amt, (amt.shape[0], LANES))
            diag = jnp.where(amt_w == 1, _roll_l(sp2),
                             jnp.where(amt_w == 0, sp2,
                                       pltpu.roll(sp2, 1, 0)))
            sd = (diag + 0.125) + em
            su = (up + 0.0625) + em
            sl = left + LP_SKIP
            m2 = jnp.maximum(sd, su)
            m3 = jnp.maximum(m2, sl)
            tr = jnp.where(sl >= m2, 2, jnp.where(su >= sd, 1, 0))
            m3 = jnp.where(lanes >= BANDWIDTH, -jnp.inf, m3)
            tr = jnp.where(lanes == LANES - 1,
                           right_b.astype(jnp.int32), tr)
            return tr, repack(m3, sp, r_i, ll_e_v)

        sp_l = _roll_l(sp)
        sd = sp2 + em
        su = sp + 0.0625
        m2 = jnp.maximum(sd, su)
        m3 = jnp.maximum(m2, sp_l)
        tr = jnp.where(sp_l >= m2, 2, jnp.where(su >= sd, 1, 0))
        return tr, repack(m3, sp, r_i, ll_e_v)

    # per-chain row multiplier (kall stacks 3 stream blocks per chain)
    scratches = ((s_prev, 1), (s_prev2, 1), (ew, 1), (kmu, 1), (ksig, 1),
                 (kc, 1), (kall, 3), (r_prev, 1), (ll_e, 1))

    def load_state():
        return tuple(
            tuple(r[s * m * Bs:(s + 1) * m * Bs, :] for r, m in scratches)
            for s in range(nsplit))

    def store_state(sts):
        for s, st in enumerate(sts):
            for (r, m), v in zip(scratches, st):
                r[s * m * Bs:(s + 1) * m * Bs, :] = v

    def group(g, sts):
        sts = list(sts)
        accs = [jnp.zeros((Bs, LANES), jnp.int32) for _ in range(nsplit)]
        for m in range(PACK):
            for s in range(nsplit):
                tr, sts[s] = band(m & 1, sts[s])
                accs[s] = accs[s] | jnp.left_shift(tr, 2 * m)
        for s in range(nsplit):
            trace_ref[g, s * Bs:(s + 1) * Bs, :] = accs[s]
        return tuple(sts)

    store_state(jax.lax.fori_loop(0, CHUNK // PACK, group, load_state()))
    out_ref[:] = s_prev[:]


@functools.partial(jax.jit, static_argnames=("n_steps", "body", "nsplit"))
def _control_call(evr, n_steps, body, nsplit):
    B = evr.shape[0]
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    fixed = pl.BlockSpec((B, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((B, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_steps * CHUNK // PACK, B, LANES), jnp.int32),
    )
    return pl.pallas_call(
        functools.partial(_control_kernel, body=body, nsplit=nsplit),
        grid=(n_steps,),
        in_specs=[full],
        out_specs=(
            fixed,
            pl.BlockSpec((CHUNK // PACK, B, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((B, LANES), jnp.float32),
            pltpu.VMEM((B, LANES), jnp.float32),
            pltpu.VMEM((B, WIN), jnp.float32),
            pltpu.VMEM((B, WIN), jnp.float32),
            pltpu.VMEM((B, WIN), jnp.float32),
            pltpu.VMEM((B, WIN), jnp.float32),
            pltpu.VMEM((3 * B, WIN), jnp.float32),
            pltpu.VMEM((B, 1), jnp.int32),
            pltpu.VMEM((B, 1), jnp.int32),
            pltpu.VMEM((B, 384), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(evr)


def measure(fn, args, iters, trials, budget_s):
    @jax.jit
    def chained(x):
        def bodyf(_, carry):
            out, tr = fn(carry)
            dep = jnp.minimum(jnp.sum(out), 0.0) * 1e-30
            return carry.at[:, 0].add(dep)
        x = jax.lax.fori_loop(0, iters, bodyf, x)
        return jnp.sum(x[:, 0])

    t0 = time.time()
    jax.device_get(chained(args))
    compile_s = time.time() - t0
    best = float("inf")
    t_start = time.perf_counter()
    n = 0
    while n < trials and time.perf_counter() - t_start < budget_s:
        t0 = time.perf_counter()
        jax.device_get(chained(args))
        best = min(best, (time.perf_counter() - t0) / iters)
        n += 1
    return best, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--budget", type=float, default=120.0)
    ap.add_argument("--bodies", default=",".join(BODIES))
    ap.add_argument("--nsplit", type=int, default=2)
    args = ap.parse_args()

    B = args.batch
    Tp, Kp = 16384, 8192               # bench shape: 8kb reads, 2 ev/base
    n_steps = (Tp + Kp) // CHUNK
    n_bands = n_steps * CHUNK
    rng = np.random.default_rng(0)
    evr = rng.normal(size=(B, 2048)).astype(np.float32)
    evr_d = jax.device_put(evr)
    jax.block_until_ready(evr_d)

    clock_ghz = float(os.environ.get("NPT_TPU_GHZ", "0.94"))
    results = {}
    for body in args.bodies.split(","):
        fn = functools.partial(_control_call, n_steps=n_steps, body=body,
                               nsplit=args.nsplit)
        per_iter, compile_s = measure(fn, evr_d, args.iters, args.trials,
                                      args.budget)
        ns_band = per_iter / n_bands * 1e9
        results[body] = dict(
            us_per_batch=per_iter * 1e6,
            us_per_read=per_iter / B * 1e6,
            ns_per_band=ns_band,
            cycles_per_band=ns_band * clock_ghz,
            compile_s=compile_s,
        )
        print(f"{body:14s}: {per_iter*1e3:8.2f} ms/iter  "
              f"{per_iter/B*1e6:6.1f} us/read  "
              f"{ns_band:7.1f} ns/band  ~{ns_band*clock_ghz:6.0f} cyc/band  "
              f"(compile {compile_s:.0f}s)", flush=True)

    print(json.dumps({"batch": B, "nsplit": args.nsplit,
                      "n_bands": n_bands, "results": results}))


if __name__ == "__main__":
    main()
