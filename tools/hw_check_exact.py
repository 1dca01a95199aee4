#!/usr/bin/env python3
"""Hardware validation of the exact banded kernel: run banded_align_exact
on the real chip over a varied-length batch (clean + noisy + tiny reads)
and compare every result field against the NumPy port of the reference
algorithm (ops/banded_align.py, itself byte-checked against the lax.scan
implementation).  Integer fields must match exactly; avg_log_emission to
1e-3 (VPU divide vs host divide can differ by an f32 ulp per cell).

Exits non-zero on any mismatch.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.ops.banded_align import (
    banded_align_reference, base_to_event_map_from_pairs)
from nanopolish_tpu.ops.pallas_banded_exact import banded_align_exact


def main():
    model = PoreModelSet.instance().get_model(
        "r9.4_450bps", "nucleotide", "template", 6)
    rng = np.random.default_rng(7)
    B = int(os.environ.get("NPT_HW_B", "32"))
    Kmax, Tmax = 2048, 4400
    n_kmers = rng.integers(40, Kmax, size=B).astype(np.int32)
    n_kmers[:4] = (Kmax, 45, 1800, 300)
    epk = rng.uniform(1.6, 3.0, size=B)
    n_events = np.minimum((n_kmers * epk).astype(np.int32), Tmax - 1)
    noise = np.where(np.arange(B) % 3 == 0, 2.5, 1.0)  # every 3rd read noisy

    ranks = rng.integers(0, 4096, size=(B, Kmax)).astype(np.int32)
    mu = model.level_mean[ranks].astype(np.float32)
    sigma = model.level_stdv[ranks].astype(np.float32)
    ev = np.zeros((B, Tmax), np.float32)
    for b in range(B):
        reps = np.minimum((np.arange(n_events[b]) / epk[b]).astype(int),
                          n_kmers[b] - 1)
        ev[b, :n_events[b]] = (
            mu[b, reps] + rng.normal(0, noise[b], size=n_events[b])
            .astype(np.float32) * sigma[b, reps])

    print("hw_check: running kernel on", file=sys.stderr, flush=True)
    import jax
    print(jax.devices(), file=sys.stderr, flush=True)
    res = banded_align_exact(ev, n_events, mu, sigma,
                             np.log(sigma), n_kmers, interpret=False)
    res = jax.tree.map(np.asarray, res)

    bad = 0
    for b in range(B):
        pairs, stats = banded_align_reference(
            ev[b, :n_events[b]], mu[b, :n_kmers[b]], sigma[b, :n_kmers[b]],
            np.log(sigma[b, :n_kmers[b]]))
        ok = bool(res.failed[b]) == stats["failed"]
        ok &= int(res.max_gap[b]) == stats["max_gap"]
        if not stats["failed"]:
            ok &= int(res.n_pairs[b]) == stats["n_pairs"]
            ok &= abs(float(res.avg_log_emission[b]) -
                      stats["avg_log_emission"]) < 1e-3
            b2e = base_to_event_map_from_pairs(pairs, int(n_kmers[b]))
            ok &= np.array_equal(res.b2e_start[b, :n_kmers[b]], b2e[:, 0])
            ok &= np.array_equal(res.b2e_stop[b, :n_kmers[b]], b2e[:, 1])
        if not ok:
            bad += 1
            print(f"MISMATCH read {b}: K={n_kmers[b]} T={n_events[b]} "
                  f"noise={noise[b]} failed={bool(res.failed[b])}/"
                  f"{stats['failed']} n_pairs={int(res.n_pairs[b])}/"
                  f"{stats.get('n_pairs')} max_gap={int(res.max_gap[b])}/"
                  f"{stats['max_gap']} avg={float(res.avg_log_emission[b])}/"
                  f"{stats.get('avg_log_emission')}", flush=True)
        else:
            print(f"ok read {b}: K={n_kmers[b]} T={n_events[b]} "
                  f"failed={bool(res.failed[b])}", flush=True)
    print("hw_check:", "FAIL" if bad else "PASS", f"({B - bad}/{B})",
          flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
