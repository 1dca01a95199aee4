"""Device-sync accounting: the relay-independent measurement protocol.

Through a remotely-attached chip every device->host materialization pays
a relay round trip whose latency flaps on a minutes timescale (ms to
hundreds of ms — see PERF.md "honest timing"), so app wall-clock numbers
measured one-shot report the tunnel's mood, not the pipeline.  This
module instruments every materialization point in the package so a run
can be decomposed into mood-independent quantities:

  host_s    = wall_s - blocked_s   (pure host work: geometry, packing,
                                    formatting — never touches the relay)
  blocked_s = seconds spent blocked inside device fetches (device
              compute remainder + sync_count x relay RTT)
  sync_count, bytes_fetched

host_s and sync_count are stable across tunnel moods; blocked_s in a
fast-tunnel window approaches the true device time.  The perf tools
report the triple per warm pass and assert sync-count ceilings, so a
regression that adds a sync per batch fails loudly even when the tunnel
happens to be fast (VERDICT r3 #6).

Usage:
    from nanopolish_tpu.utils.syncstats import SYNC_STATS, timed_fetch
    with SYNC_STATS.capture() as snap:
        run_app()
    print(snap.sync_count, snap.blocked_s)

Instrumented points call ``timed_fetch(device_array)`` (or use
``SYNC_STATS.sync()`` as a context manager around a blocking fetch).
"""

from __future__ import annotations

import threading
import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class SyncSnapshot:
    sync_count: int = 0
    blocked_s: float = 0.0
    bytes_fetched: int = 0

    def as_dict(self):
        return {"sync_count": self.sync_count,
                "blocked_s": round(self.blocked_s, 4),
                "bytes_fetched": self.bytes_fetched}


class SyncStats:
    """Process-global sync accounting.  Thread-safe: fetches resolve on
    worker threads in the pipelined apps."""

    def __init__(self):
        self._lock = threading.Lock()
        self._count = 0
        self._blocked = 0.0
        self._bytes = 0

    def record(self, blocked_s: float, nbytes: int = 0) -> None:
        with self._lock:
            self._count += 1
            self._blocked += blocked_s
            self._bytes += nbytes

    @contextmanager
    def sync(self, nbytes: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(time.perf_counter() - t0, nbytes)

    def snapshot(self) -> SyncSnapshot:
        with self._lock:
            return SyncSnapshot(self._count, self._blocked, self._bytes)

    @contextmanager
    def capture(self):
        """Yields a SyncSnapshot that is filled with the deltas of the
        enclosed region when the block exits."""
        before = self.snapshot()
        snap = SyncSnapshot()
        t0 = time.perf_counter()
        try:
            yield snap
        finally:
            after = self.snapshot()
            snap.sync_count = after.sync_count - before.sync_count
            snap.blocked_s = after.blocked_s - before.blocked_s
            snap.bytes_fetched = after.bytes_fetched - before.bytes_fetched
            snap.wall_s = time.perf_counter() - t0
            snap.host_s = snap.wall_s - snap.blocked_s


SYNC_STATS = SyncStats()


def timed_fetch(device_array):
    """np.asarray(device_array) with the blocked time + byte volume
    recorded.  The single chokepoint the package's materialization sites
    route through."""
    import numpy as np

    t0 = time.perf_counter()
    out = np.asarray(device_array)
    SYNC_STATS.record(time.perf_counter() - t0, out.nbytes)
    return out
