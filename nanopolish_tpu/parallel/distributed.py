"""Multi-process execution: jax.distributed wiring + process-shard env.

The reference scales across machines at the shell level — makerange
windows x GNU parallel (README.md:142-147) and watch-mode file sharding by
suffix mod N (call_methylation.cpp:489-508) — with no communication
backend.  The TPU-native equivalent has two layers:

 * embarrassing read/window sharding across *processes* (each process owns
   its chips and its output file) — `--shard i/n` on the apps, spawned by
   parallel.launch; no collectives needed because reads are independent;
 * a real `jax.distributed` backend so that multi-host meshes can run the
   training collectives (EM moment psums over ICI) — initialized here from
   the NPT_* environment the launcher exports.

auto_init() is called from the CLI driver on every subcommand: a plain
single-process run (no NPT_COORDINATOR) is a no-op, while a launcher child
joins the distributed runtime before any backend is touched.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

_initialized = False


def process_env() -> Tuple[int, int]:
    """(process_id, num_processes) from the launcher env (1-process default)."""
    return (int(os.environ.get("NPT_PROC_ID", "0")),
            int(os.environ.get("NPT_NUM_PROCS", "1")))


def auto_init(coordinator: Optional[str] = None,
              num_processes: Optional[int] = None,
              process_id: Optional[int] = None) -> Tuple[int, int]:
    """Join the jax.distributed runtime if a coordinator is configured.

    Returns (process_id, num_processes).  Safe to call more than once.
    """
    global _initialized
    coordinator = coordinator or os.environ.get("NPT_COORDINATOR", "")
    pid, n = process_env()
    if process_id is not None:
        pid = process_id
    if num_processes is not None:
        n = num_processes
    if not coordinator or n <= 1:
        return pid, n
    if not _initialized:
        import jax

        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=n, process_id=pid)
        _initialized = True
    return pid, n


def shard_arg() -> str:
    """The `--shard i/n` value for this process."""
    pid, n = process_env()
    return f"{pid}/{n}"
