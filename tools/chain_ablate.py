#!/usr/bin/env python3
"""Cost attribution for the device-chain while-loop body
(alignment/device_chain._chain_program): times the jitted chain on a
synthetic batch with body pieces ablated via NPT_CHAIN_ABLATE
(trace-time switches — "search", "kwin", "twin", "kernel", "scatter").

One config per process (the switch is baked at trace time):
    for a in none search kwin twin kernel scatter; do
        NPT_CHAIN_ABLATE=$a python tools/chain_ablate.py; done

Env: NPT_AB_B (jobs, default 256), NPT_AB_LEN (read bases, default
1200), NPT_AB_REPS (timed reps, default 3).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B0 = int(os.environ.get("NPT_AB_B", "256"))
L = int(os.environ.get("NPT_AB_LEN", "1200"))
REPS = int(os.environ.get("NPT_AB_REPS", "3"))


class _Obj:
    pass


def build_jobs():
    """Synthetic DeviceJobs with a plausible signal (levels near the
    model means of the window ranks) so chains run full length."""
    from nanopolish_tpu.alignment.device_chain import DeviceJob
    from nanopolish_tpu.models.pore_model import PoreModelSet

    rng = np.random.default_rng(5)
    model = PoreModelSet.instance().get_model(
        "r9.4_450bps", "nucleotide", "template", 6)
    k = 6
    S = len(model.level_mean)
    jobs = []
    for i in range(B0):
        nk = L - k + 1
        ranks = rng.integers(0, S, nk).astype(np.int32)
        n_ev = 2 * L
        # 2 events per base, levels = model mean of the kmer + noise
        kidx = np.minimum(np.arange(n_ev) // 2, nk - 1)
        levels = (model.level_mean[ranks[kidx]]
                  + rng.normal(0, 0.8, n_ev)).astype(np.float32)
        pairs_ref = np.arange(L, dtype=np.int64)
        pairs_read = np.arange(L, dtype=np.int64)
        closest = np.minimum(2 * np.arange(L), n_ev - 1).astype(np.int32)
        job = _Obj()
        job.model = _Obj()
        job.model.k = k
        job.out_ref, job.out_ev, job.out_st = [], [], []
        job.done = False
        jobs.append(DeviceJob(
            job, pairs_ref, pairs_read, ranks, levels, closest,
            model.level_mean.astype(np.float32),
            model.level_stdv.astype(np.float32),
            2.0, 0, 0, n_ev - 1, True, 0, n_ev))
    return jobs


def main():
    import jax

    from nanopolish_tpu.alignment import device_chain as dc

    djobs = build_jobs()
    t0 = time.perf_counter()
    dc.run_device_chain(djobs)          # compile + first run
    compile_s = time.perf_counter() - t0
    rows = sum(len(j.job.out_ref[0]) if j.job.out_ref else 0
               for j in djobs)
    times = []
    for _ in range(REPS):
        for d in djobs:
            d.job.out_ref, d.job.out_ev, d.job.out_st = [], [], []
            d.job.done = False
        t0 = time.perf_counter()
        dc.run_device_chain(djobs)
        times.append(time.perf_counter() - t0)
    print(json.dumps({
        "ablate": os.environ.get("NPT_CHAIN_ABLATE", "none") or "none",
        "B": B0, "len": L, "rows": rows,
        "compile_s": round(compile_s, 1),
        "best_s": round(min(times), 3),
        "all_s": [round(t, 3) for t in times]}), flush=True)


if __name__ == "__main__":
    main()
