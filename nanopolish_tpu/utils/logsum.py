"""Log-space addition policies.

The reference computes Forward scores with hmmer3's table-driven
``p7_FLogsum`` (reference: src/common/logsum.{h,cpp}): a 16000-entry
lookup of log(1+e^{-d}) quantized to 0.001-nat steps, clamped at 15.7
nats.  On TPU the exact ``logaddexp`` is both faster (no gather) and more
accurate, so it is the default; a table-emulation mode is provided for
bit-level comparison against reference outputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

P7_LOGSUM_TBL = 16000
P7_LOGSUM_SCALE = 1000.0

_table_np = None


def _logsum_table_np() -> np.ndarray:
    global _table_np
    if _table_np is None:
        # flogsum_lookup[i] = log(1 + exp(-i/scale)) computed in float64,
        # stored float32 (logsum.cpp:50-65)
        i = np.arange(P7_LOGSUM_TBL, dtype=np.float64)
        _table_np = np.log(1.0 + np.exp(-i / P7_LOGSUM_SCALE)).astype(np.float32)
    return _table_np


def add_logs_exact(a, b):
    """Exact log(e^a + e^b), safe for -inf arguments."""
    return jnp.logaddexp(a, b)


def add_logs_table(a, b):
    """Bit-faithful emulation of p7_FLogsum (logsum.h:55-67)."""
    table = jnp.asarray(_logsum_table_np())
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    d = mx - mn
    idx = (d * P7_LOGSUM_SCALE).astype(jnp.int32)
    idx = jnp.clip(idx, 0, P7_LOGSUM_TBL - 1)
    approx = mx + table[idx]
    return jnp.where((mn == -jnp.inf) | (d >= 15.7), mx, approx)


def add_logs_np(a, b, table: bool = False):
    """NumPy (host) version, scalar or array."""
    if not table:
        return np.logaddexp(a, b)
    tbl = _logsum_table_np()
    mx = np.maximum(a, b)
    mn = np.minimum(a, b)
    with np.errstate(invalid="ignore"):
        d = np.where(mn == -np.inf, np.inf, mx - mn)   # -inf-(-inf) is nan
        idx = np.clip((d * P7_LOGSUM_SCALE).astype(np.int64), 0, P7_LOGSUM_TBL - 1)
    return np.where((mn == -np.inf) | (d >= 15.7), mx, mx + tbl[idx])


def get_add_logs(mode: str = "exact"):
    if mode == "exact":
        return add_logs_exact
    if mode == "table":
        return add_logs_table
    raise ValueError(f"unknown logsum mode {mode!r}")
