"""Opt-in macro profiler + progress bars.

Rebuild of the reference's profiling aids:
- `PROFILE_FUNC("name")` accumulates atomic cumulative ns per scope and
  prints every 1000 invocations when compiled in (src/common/profiler.h:17-62).
  Here: `profile_scope(name)` / `@profiled`, enabled by NPT_PROFILE=1
  (off by default so outputs stay byte-identical).
- `Progress` elapsed-time bars (src/common/progress.h:16-50; used by
  methyltrain rounds, nanopolish_methyltrain.cpp:788,816-818).

Device-side tracing goes through `jax.profiler.trace` instead — the TPU
analogue of the reference's wall-clock scopes; `profile_scope` measures
the host-side orchestration around kernel dispatches.
"""

from __future__ import annotations

import atexit
import functools
import os
import sys
import time
from contextlib import contextmanager
from typing import Dict, List, Tuple

PRINT_EVERY = 1000        # invocations, matching profiler.h:49

_scopes: Dict[str, List[float]] = {}    # name -> [calls, total_ns]
_registered = False


def profiling_enabled() -> bool:
    return os.environ.get("NPT_PROFILE", "") not in ("", "0")


def _report(fp=None) -> None:
    fp = fp or sys.stderr
    for name, (calls, ns) in sorted(_scopes.items(),
                                    key=lambda kv: -kv[1][1]):
        fp.write(f"[profile] {name}: {int(calls)} calls, "
                 f"{ns / 1e9:.3f} s total, {ns / max(calls, 1) / 1e6:.3f} "
                 f"ms/call\n")


def _ensure_atexit() -> None:
    global _registered
    if not _registered:
        atexit.register(_report)
        _registered = True


@contextmanager
def profile_scope(name: str):
    """Accumulate wall time under `name`; report every PRINT_EVERY calls
    and at exit.  No-op (single branch) unless NPT_PROFILE is set."""
    if not profiling_enabled():
        yield
        return
    _ensure_atexit()
    t0 = time.perf_counter_ns()
    try:
        yield
    finally:
        cell = _scopes.setdefault(name, [0, 0.0])
        cell[0] += 1
        cell[1] += time.perf_counter_ns() - t0
        if cell[0] % PRINT_EVERY == 0:
            sys.stderr.write(
                f"[profile] {name}: {int(cell[0])} calls, "
                f"{cell[1] / 1e9:.3f} s\n")


def profiled(fn):
    """Decorator form of profile_scope (the PROFILE_FUNC idiom)."""
    name = f"{fn.__module__.rsplit('.', 1)[-1]}.{fn.__qualname__}"

    @functools.wraps(fn)
    def wrap(*a, **k):
        with profile_scope(name):
            return fn(*a, **k)
    return wrap


def snapshot() -> Dict[str, Tuple[int, float]]:
    """Current {name: (calls, total_seconds)} (for tests/tools)."""
    return {k: (int(c), ns / 1e9) for k, (c, ns) in _scopes.items()}


class Progress:
    """Elapsed-time progress bar (progress.h:16-50): prints `[### ...] p%`
    with elapsed seconds to stderr, throttled to one update per percent."""

    def __init__(self, label: str, width: int = 50, fp=None):
        self.label = label
        self.width = width
        self.fp = fp or sys.stderr
        self.t0 = time.perf_counter()
        self._last_pct = -1

    def update(self, frac: float) -> None:
        pct = int(min(max(frac, 0.0), 1.0) * 100)
        if pct == self._last_pct:
            return
        self._last_pct = pct
        n = pct * self.width // 100
        bar = "#" * n + " " * (self.width - n)
        self.fp.write(f"\r[{self.label}] [{bar}] {pct:3d}% "
                      f"{time.perf_counter() - self.t0:6.1f}s")
        self.fp.flush()

    def end(self) -> None:
        self.update(1.0)
        self.fp.write("\n")
