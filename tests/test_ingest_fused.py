"""Fused single-dispatch ingest (ops/ingest_fused) parity vs the legacy
three-sync chain: MoM -> banded align -> recalibration must be
bit-identical, since the fused program only moves WHERE each stage runs
(host numpy / eager jnp -> one jit), not what it computes.

Spec: SquiggleRead::load_from_raw
(reference: src/nanopolish_squiggle_read.cpp:189-337).
"""

import numpy as np
import jax.numpy as jnp

from nanopolish_tpu.ops.ingest_fused import ingest_align_recalibrate
from nanopolish_tpu.ops.pallas_banded_exact import banded_align_exact
from nanopolish_tpu.ops.scaling import (estimate_scalings_mom,
                                        mstate_events_batch, recalibrate)


def _legacy(ev_mean, ev_time, n_events, lvl_mean, lvl_stdv, ranks, n_kmers):
    T = ev_mean.shape[1]
    shift, scale = estimate_scalings_mom(ev_mean, n_events, lvl_mean,
                                         n_kmers)
    ss = np.asarray(jnp.stack([shift, scale]))
    shift, scale = ss[0], ss[1]
    mu = scale[:, None] * lvl_mean + shift[:, None]
    res = banded_align_exact(ev_mean, n_events, mu, lvl_stdv,
                             np.log(lvl_stdv), n_kmers)
    m_mask = mstate_events_batch(res.b2e_start, res.b2e_stop, ranks, n_kmers)
    ev_idx = np.clip(np.asarray(res.b2e_start), 0, T - 1)
    levels = np.take_along_axis(ev_mean, ev_idx, axis=1)
    times = np.take_along_axis(ev_time, ev_idx, axis=1) - ev_time[:, :1]
    recal = recalibrate(levels, times, lvl_mean, lvl_stdv, m_mask,
                        scale_var=True, scale_drift=False)
    return res, recal


def test_fused_ingest_bitexact_vs_legacy():
    rng = np.random.default_rng(3)
    B, T, K = 3, 384, 192
    n_events = np.array([384, 320, 210], np.int32)
    n_kmers = np.array([192, 160, 100], np.int32)
    ev_mean = rng.normal(100, 15, (B, T)).astype(np.float32)
    ev_time = np.cumsum(np.abs(rng.normal(0.01, 0.001, (B, T))),
                        axis=1).astype(np.float32)
    lvl_mean = rng.normal(100, 12, (B, K)).astype(np.float32)
    lvl_stdv = (np.abs(rng.normal(2, 0.3, (B, K))) + 0.5).astype(np.float32)
    ranks = rng.integers(0, 4096, (B, K)).astype(np.int32)

    res, recal = _legacy(ev_mean, ev_time, n_events, lvl_mean, lvl_stdv,
                         ranks, n_kmers)
    r = ingest_align_recalibrate(ev_mean, ev_time, n_events, lvl_mean,
                                 lvl_stdv, ranks, n_kmers)

    np.testing.assert_array_equal(np.asarray(res.b2e_start), r.b2e_start)
    np.testing.assert_array_equal(np.asarray(res.b2e_stop), r.b2e_stop)
    np.testing.assert_array_equal(np.asarray(res.failed), r.failed)
    np.testing.assert_array_equal(np.asarray(res.events_per_base),
                                  r.events_per_base)
    for name in ("shift", "scale", "drift", "var"):
        a = np.asarray(getattr(recal, name), np.float32)
        b = getattr(r, name)
        assert np.array_equal(a.view(np.int32), b.view(np.int32)), name
    np.testing.assert_array_equal(np.asarray(recal.recalibrated), r.recal_ok)


def test_fused_ingest_degenerate_reads():
    """Short / unalignable reads flow through the fused path with the
    same failed/QC flags as the legacy chain."""
    rng = np.random.default_rng(11)
    B, T, K = 3, 256, 128
    n_events = np.array([40, 256, 8], np.int32)
    n_kmers = np.array([128, 10, 4], np.int32)
    ev_mean = rng.normal(100, 15, (B, T)).astype(np.float32)
    # read 1: events uncorrelated with the model -> likely QC-fail path
    ev_time = np.cumsum(np.abs(rng.normal(0.01, 0.001, (B, T))),
                        axis=1).astype(np.float32)
    lvl_mean = rng.normal(100, 12, (B, K)).astype(np.float32)
    lvl_stdv = (np.abs(rng.normal(2, 0.3, (B, K))) + 0.5).astype(np.float32)
    ranks = rng.integers(0, 4096, (B, K)).astype(np.int32)

    res, recal = _legacy(ev_mean, ev_time, n_events, lvl_mean, lvl_stdv,
                         ranks, n_kmers)
    r = ingest_align_recalibrate(ev_mean, ev_time, n_events, lvl_mean,
                                 lvl_stdv, ranks, n_kmers)
    np.testing.assert_array_equal(np.asarray(res.failed), r.failed)
    np.testing.assert_array_equal(np.asarray(res.b2e_start), r.b2e_start)
    np.testing.assert_array_equal(np.asarray(recal.recalibrated), r.recal_ok)
