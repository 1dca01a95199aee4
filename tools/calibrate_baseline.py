#!/usr/bin/env python3
"""Calibrate the CPU benchmark baseline (csrc/cpu_baseline.cpp).

Two checks, recorded in BASELINE.md:

1. semantic equivalence — the baseline binary must produce the same
   aligned-pair count as the NumPy port of the reference algorithm
   (ops/banded_align.banded_align_reference) on a read corpus, i.e. it
   fills the same bands and walks the same traceback (same work per read);
2. per-cell cost — measured cells/s of the baseline, against the
   structural per-cell op census of the reference's inner loop
   (src/nanopolish_raw_loader.cpp:240-284: one gaussian log-pdf with a
   division, three adds, a three-way max with two compares, two stores).

Run:  python tools/calibrate_baseline.py
"""

import ctypes
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_reads, CPU_THREADS_BASELINE  # noqa: E402
from nanopolish_tpu.ops.banded_align import banded_align_reference  # noqa: E402
from nanopolish_tpu.utils.native import get_native_lib  # noqa: E402


def get_fn():
    lib = get_native_lib()._cdll if hasattr(get_native_lib(), "_cdll") \
        else None
    if lib is None:
        lib = ctypes.CDLL(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "nanopolish_tpu", "data", "libnanopolish_tpu.so"))
    f = lib.npt_cpu_banded_align
    f.restype = ctypes.c_int64
    f.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                  ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                  ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    return f


def ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def main():
    f = get_fn()

    # 1. semantic cross-validation on small reads (NumPy port is slow)
    ev, n_events, mu, sigma, log_sigma, n_kmers = make_reads(4, seed=7)
    n_mismatch = 0
    for b in range(4):
        T, K = 600, 300
        e, m, s = ev[b, :T].copy(), mu[b, :K].copy(), sigma[b, :K].copy()
        ls = np.log(s)
        got = f(ptr(e), T, ptr(m), ptr(s), ptr(ls), K)
        pairs, stats = banded_align_reference(e, m, s, ls)
        want = -1 if stats["failed"] else stats["n_pairs"]
        ok = got == want
        n_mismatch += not ok
        print(f"read {b}: baseline n_pairs={got} numpy-port={want} "
              f"{'OK' if ok else 'MISMATCH'}")

    # 2. throughput / per-cell cost on the bench shape
    ev, n_events, mu, sigma, log_sigma, n_kmers = make_reads(3, seed=1)
    T, K = ev.shape[1], mu.shape[1]
    cells_per_read = ((T + 1) + (K + 1)) * 100
    f(ptr(ev[0]), T, ptr(mu[0]), ptr(sigma[0]), ptr(log_sigma[0]), K)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        for b in range(3):
            r = f(ptr(ev[b]), T, ptr(mu[b]), ptr(sigma[b]),
                  ptr(log_sigma[b]), K)
            assert r > 0
    dt = (time.perf_counter() - t0) / (reps * 3)
    print(f"\nbench shape: T={T} K={K} -> {cells_per_read/1e6:.2f} Mcells/read")
    print(f"1 thread: {dt*1e3:.1f} ms/read = {cells_per_read/dt/1e6:.0f} "
          f"Mcells/s = {1e9*dt/cells_per_read:.2f} ns/cell")
    print(f"16-thread baseline rate used by bench.py: "
          f"{CPU_THREADS_BASELINE/dt:.0f} reads/s")
    return 1 if n_mismatch else 0


if __name__ == "__main__":
    raise SystemExit(main())
