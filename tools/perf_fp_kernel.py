#!/usr/bin/env python3
"""Per-dispatch device time of the packed Forward kernel at the variant
SCREENING shapes (B rows x TP events x KP lanes): chains N dispatches,
fences with device_get, reports ms/dispatch and rows/s.  Distinguishes
kernel cost from relay enqueue latency for the screening drain.

Env: NPT_FPK_B (rows, default 4096), NPT_FPK_TP (default 64),
NPT_FPK_N (dispatches, default 12).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("NPT_FPK_B", "4096"))
TP = int(os.environ.get("NPT_FPK_TP", "64"))
KP = 128
N = int(os.environ.get("NPT_FPK_N", "12"))


def main():
    import jax
    import jax.numpy as jnp

    from nanopolish_tpu.ops.pallas_profile_hmm import (
        _forward_packed_call, _np_transitions)

    rng = np.random.default_rng(3)
    # representative screening geometry: ~10 segments of width ~13 per
    # row, E=B event rows, U=B rank rows, tables 1024-wide
    E = U = B
    Tc = TP
    Kc = KP
    R2 = 8
    S = 1024
    n = B * 9
    npad = 1 << int(np.ceil(np.log2(n)))
    scan_hi = 16

    lev = rng.normal(90, 10, (E, Tc)).astype(np.float32)
    nev = np.full((E, 1), Tc, np.int32)
    ranks = rng.integers(0, S, (U, Kc)).astype(np.int32)
    trans = _np_transitions(np.full(R2, 2.0, np.float32), 1.0)
    row_ev = rng.integers(0, E, B).astype(np.int32)
    row_tr = rng.integers(0, R2, B).astype(np.int32)
    row_clip = np.ones((B, 2), np.float32)
    lane_rank = rng.integers(0, U, (B, KP)).astype(np.int32)
    lane_tab = np.zeros((B, KP), np.int32)
    w = 13
    pos = np.tile(np.arange(KP) % w, (B, 1)).astype(np.int32)
    rev = (w - 1 - pos).astype(np.int32)
    seg_idx = np.zeros(npad, np.int32)
    seg_idx[:n] = (np.arange(n) % (B * (KP // w)))[:n] * w + w - 1

    wire = np.concatenate([
        lev.ravel(), nev.ravel().view(np.float32),
        ranks.view(np.float32).ravel(), trans.astype(np.float32).ravel(),
        row_ev.view(np.float32), row_tr.view(np.float32),
        row_clip.ravel(),
        lane_rank.view(np.float32).ravel(),
        lane_tab.view(np.float32).ravel(),
        pos.view(np.float32).ravel(), rev.view(np.float32).ravel(),
        seg_idx.view(np.float32)])
    tabs = np.zeros((3, 1, S), np.float32)
    tabs[0] = 90.0
    tabs[1] = 1.0
    tabs_dev = jnp.asarray(tabs)
    wire_dev = jnp.asarray(wire)

    # compile + warm
    out = _forward_packed_call(wire_dev, tabs_dev, E, Tc, U, Kc, B, R2,
                               npad, TP, KP, scan_hi)
    np.asarray(out[:4])

    t0 = time.perf_counter()
    outs = [_forward_packed_call(wire_dev, tabs_dev, E, Tc, U, Kc, B, R2,
                                 npad, TP, KP, scan_hi) for _ in range(N)]
    cat = jnp.concatenate([o[:1] for o in outs])
    np.asarray(cat)
    dt = time.perf_counter() - t0
    print(json.dumps({"B": B, "TP": TP, "KP": KP, "n_dispatch": N,
                      "total_s": round(dt, 3),
                      "ms_per_dispatch": round(dt / N * 1e3, 1),
                      "rows_per_s": round(N * B / dt)}), flush=True)


if __name__ == "__main__":
    main()
