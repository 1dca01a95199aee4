"""Fused single-dispatch read ingest: MoM scaling -> exact banded event
alignment -> 'M'-event extraction -> WLS recalibration as ONE jitted
device program with ONE packed device->host fetch per sub-batch.

The legacy path (models/read_builder._process_chunk_impl) pays three
serial device round trips per chunk (MoM fetch, banded packed fetch,
recalibration fetch) because the banded kernel's inputs were prepared on
the host from the fetched MoM scalings.  On remotely-attached chips each
sync costs a full relay round trip (~25-100 ms), so the chain dominates
warm end-to-end time.  Here every inter-stage value stays on device:

  * `prepare_exact_inputs` is re-expressed in jnp as pad/flip/where
    (no gathers — the reversed event stream is a flip of the padded
    array, the lead-padded kmer tables are shifted pads);
  * MoM shift/scale (ops/scaling.estimate_scalings_mom) feeds the
    per-read Gaussian tables mu = scale*level_mean + shift directly;
  * the reference-exact Pallas fill+backtrack kernels run unchanged
    (ops/pallas_banded_exact._exact_align_device);
  * the recalibration design matrix (segment_levels gathers + the
    'M'-state mask of ops/scaling.mstate_events_batch) and the [B,2,2]
    normal-equation solve run as XLA ops;
  * everything the host needs lands in ONE int32 wire array
    [B, 2*K0 + 11]: b2e_start | b2e_stop | failed | epb | shift |
    scale | drift | var | recal_ok | avg_log_emission | n_pairs.

lp_stay/lp_step stay host-computed (transition_params_f32 does f64 math
on host-known n_events/n_kmers; reference raw_loader.cpp:98-107) so the
band transition constants are bit-identical to the legacy path.

Spec: SquiggleRead::load_from_raw
(reference: src/nanopolish_squiggle_read.cpp:189-337).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np

from .emissions import LOG_INV_SQRT_2PI
from .pallas_banded_exact import (C_PAD, CHUNK, EV_PAD, _exact_align_device,
                                  _pad_batch, _pad_to, transition_params_f32)
from .scaling import estimate_scalings_mom, mstate_events_batch, recalibrate


def _prepare_exact_inputs_jnp(event_mean, n_events, mu, sigma, log_sigma,
                              n_kmers, Tp, K0):
    """jnp twin of pallas_banded_exact.prepare_exact_inputs: identical
    arrays, built from pads/flips/wheres so the whole prep traces into
    the fused program (no host numpy, no XLA gathers)."""
    B, T0 = event_mean.shape
    Lev = Tp + 768
    EOFF = Tp + 255

    # evr[b, j] = event[b, EOFF - j] where 0 <= EOFF-j < n_events, EV_PAD
    # elsewhere.  padded has width Tp+1; its flip f[b, i] = padded[b, Tp-i]
    # so evr's gather is f left-padded by 255 columns.
    padded = jnp.pad(event_mean, ((0, 0), (0, Tp - T0 + 1)))
    fl = jnp.flip(padded, axis=1)
    core = jnp.pad(fl, ((0, 0), (255, Lev - 255 - (Tp + 1))))
    ivals = EOFF - jnp.arange(Lev, dtype=jnp.int32)
    valid = (ivals[None, :] >= 0) & (ivals[None, :] < n_events[:, None])
    evr = jnp.where(valid, core, EV_PAD).astype(jnp.float32)

    # forward tables with a 256-lane lead pad: tab[b, 256 + k] = col k
    Lk = _pad_to(K0, CHUNK) + 768
    kvals = jnp.arange(Lk, dtype=jnp.int32) - 256
    kmask = (kvals[None, :] >= 0) & (kvals[None, :] < n_kmers[:, None])

    def lead_pad(x):
        return jnp.pad(x, ((0, 0), (256, Lk - 256 - K0)))

    tmu = jnp.where(kmask, lead_pad(mu), 0.0).astype(jnp.float32)
    tsig = jnp.where(kmask, lead_pad(sigma), 1.0).astype(jnp.float32)
    c_full = np.float32(LOG_INV_SQRT_2PI) - log_sigma.astype(jnp.float32)
    tc = jnp.where(kmask, lead_pad(c_full), C_PAD).astype(jnp.float32)
    return evr, tmu, tsig, tc


@functools.partial(jax.jit, static_argnames=("Tp", "K0", "interpret",
                                             "fill_nsplit", "bt_nsplit"))
def _ingest_device_packed(ev_mean, ev_time, n_events, lvl_mean, lvl_stdv,
                          log_lvl_stdv, ranks, n_kmers, lps, lpt,
                          Tp, K0, interpret=False,
                          fill_nsplit=None, bt_nsplit=None):
    """MoM -> banded align -> recalibration; returns one int32
    [B, 2*K0 + 11] wire array (layout in module docstring)."""
    B, T = ev_mean.shape

    shift, scale = estimate_scalings_mom(ev_mean, n_events, lvl_mean,
                                         n_kmers)
    mu = scale[:, None] * lvl_mean + shift[:, None]
    evr, tmu, tsig, tc = _prepare_exact_inputs_jnp(
        ev_mean, n_events, mu, lvl_stdv, log_lvl_stdv, n_kmers, Tp, K0)
    res = _exact_align_device(
        evr, tmu, tsig, tc, n_events[:, None], n_kmers[:, None], lps, lpt,
        Tp, K0, interpret=interpret,
        fill_nsplit=fill_nsplit, bt_nsplit=bt_nsplit)

    m_mask = mstate_events_batch(res.b2e_start, res.b2e_stop, ranks, n_kmers)
    ev_idx = jnp.clip(res.b2e_start, 0, T - 1)
    levels = jnp.take_along_axis(ev_mean, ev_idx, axis=1)
    times = jnp.take_along_axis(ev_time, ev_idx, axis=1) - ev_time[:, :1]
    recal = recalibrate(levels, times, lvl_mean, lvl_stdv, m_mask,
                        scale_var=True, scale_drift=False)

    fbits = lambda x: jax.lax.bitcast_convert_type(  # noqa: E731
        x.astype(jnp.float32), jnp.int32)
    return jnp.concatenate([
        res.b2e_start, res.b2e_stop,
        res.failed.astype(jnp.int32)[:, None],
        fbits(res.events_per_base)[:, None],
        fbits(recal.shift)[:, None],
        fbits(recal.scale)[:, None],
        fbits(recal.drift)[:, None],
        fbits(recal.var)[:, None],
        recal.recalibrated.astype(jnp.int32)[:, None],
        fbits(res.avg_log_emission)[:, None],
        res.n_pairs[:, None],
    ], axis=1)


class IngestResult:
    """Host view of one fused-ingest wire array."""

    __slots__ = ("b2e_start", "b2e_stop", "failed", "events_per_base",
                 "shift", "scale", "drift", "var", "recal_ok",
                 "avg_log_emission", "n_pairs")

    def __init__(self, arr: np.ndarray, K0: int):
        arr = np.asarray(arr)
        self.b2e_start = arr[:, :K0]
        self.b2e_stop = arr[:, K0:2 * K0]
        t = np.ascontiguousarray(arr[:, 2 * K0:])
        self.failed = t[:, 0].astype(bool)
        self.events_per_base = t[:, 1].copy().view(np.float32)
        self.shift = t[:, 2].copy().view(np.float32)
        self.scale = t[:, 3].copy().view(np.float32)
        self.drift = t[:, 4].copy().view(np.float32)
        self.var = t[:, 5].copy().view(np.float32)
        self.recal_ok = t[:, 6].astype(bool)
        self.avg_log_emission = t[:, 7].copy().view(np.float32)
        self.n_pairs = t[:, 8]


def ingest_align_recalibrate(ev_mean, ev_time, n_events, lvl_mean, lvl_stdv,
                             ranks, n_kmers, interpret=None) -> IngestResult:
    """Batched fused ingest (see ingest_align_recalibrate_async)."""
    return ingest_align_recalibrate_async(ev_mean, ev_time, n_events,
                                          lvl_mean, lvl_stdv, ranks, n_kmers,
                                          interpret=interpret)()


def ingest_align_recalibrate_async(ev_mean, ev_time, n_events, lvl_mean,
                                   lvl_stdv, ranks, n_kmers, interpret=None):
    """Batched fused ingest, split into dispatch/materialize: all
    sub-batches are dispatched before this returns; the returned zero-arg
    closure pays the packed fetches.  Callers with several length-sorted
    chunks (models/read_builder.build_reads) dispatch every chunk first
    so the relay round trips of chunk i's fetch overlap chunk i+1's
    device work.  Args are host numpy arrays: ev_mean/ev_time [B, T] f32,
    n_events [B] i32, lvl_mean/lvl_stdv [B, K] f32 (model tables of the
    read's kmers), ranks [B, K] i32, n_kmers [B] i32.  Sub-batches are
    VMEM-sized like pallas_banded_exact.banded_align_exact."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    ev_mean = np.asarray(ev_mean, np.float32)
    ev_time = np.asarray(ev_time, np.float32)
    n_events = np.asarray(n_events, np.int32)
    n_kmers = np.asarray(n_kmers, np.int32)
    lvl_mean = np.asarray(lvl_mean, np.float32)
    lvl_stdv = np.asarray(lvl_stdv, np.float32)
    log_lvl_stdv = np.log(lvl_stdv)
    ranks = np.asarray(ranks, np.int32)
    B, T0 = ev_mean.shape
    K0 = lvl_mean.shape[1]
    Tp = _pad_to(T0, CHUNK)
    lp_stay, lp_step = transition_params_f32(n_events, n_kmers)

    bytes_per_read = 4 * ((Tp + 768) + 3 * (_pad_to(K0, CHUNK) + 768))
    bmax = max(8, min(256, int(70e6 // max(bytes_per_read, 1)) // 8 * 8))
    fill_nsplit = int(_os.environ.get("NPT_FILL_SPLIT", "2"))
    bt_nsplit = int(_os.environ.get("NPT_BT_SPLIT", "1"))

    pending = []
    for lo in range(0, B, bmax):
        hi = min(lo + bmax, B)
        Bc = _pad_batch(hi - lo)
        pad = Bc - (hi - lo)
        sl = slice(lo, hi)

        def padded(x, fill=0):
            x = np.asarray(x)
            if pad:
                shape = (pad,) + x.shape[1:]
                x = np.concatenate([x, np.full(shape, fill, x.dtype)],
                                   axis=0)
            return x

        dev = _ingest_device_packed(
            padded(ev_mean[sl]), padded(ev_time[sl]),
            padded(n_events[sl], 1), padded(lvl_mean[sl]),
            padded(lvl_stdv[sl], 1.0), padded(log_lvl_stdv[sl]),
            padded(ranks[sl]), padded(n_kmers[sl], 2),
            padded(lp_stay[sl]), padded(lp_step[sl]),
            Tp, K0, interpret=interpret,
            fill_nsplit=fill_nsplit, bt_nsplit=bt_nsplit)
        pending.append((dev, hi - lo))

    def resolve() -> IngestResult:
        from ..utils.syncstats import timed_fetch
        parts = [IngestResult(timed_fetch(dev)[:n], K0) for dev, n in pending]
        if len(parts) == 1:
            return parts[0]
        out = parts[0]
        for name in IngestResult.__slots__:
            setattr(out, name, np.concatenate(
                [getattr(p, name) for p in parts], axis=0))
        return out

    return resolve
