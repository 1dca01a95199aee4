"""Distributed model-training step: one methyltrain round as a single
`shard_map`-jitted program over a (data, model) mesh.

The reference's round (src/nanopolish_methyltrain.cpp:721-873) is:
align every read (OpenMP over reads) -> collect per-kmer events under
`omp critical` -> per-kmer Gaussian update (OpenMP over kmers).  Here the
same round is one compiled step:

  data axis  : reads sharded on the batch axis; alignment + recalibration
               are per-read independent; per-kmer moment sums cross the
               axis with a single `psum` (ICI all-reduce).
  model axis : the k-mer table is sharded for the M-step (the tensor-
               parallel axis); the updated shard is re-assembled by the
               out-sharding.

The step runs the FULL per-read pipeline on device: MoM scaling ->
adaptive banded event alignment (kernel #1) -> WLS recalibration ->
per-kmer sufficient statistics -> psum -> Gaussian M-step -> profile-HMM
forward scoring (kernel #2) of the batch under the updated model as the
monitored objective (the analogue of methyltrain's per-round model score,
methyltrain.cpp:385-402).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.banded_align import banded_align_batch
from ..ops.profile_hmm import make_transitions, profile_hmm_forward
from ..ops.scaling import estimate_scalings_mom, mstate_events_batch, recalibrate
from ..ops.training import KmerMoments, gaussian_update, kmer_moments, psum_moments
from .mesh import DATA_AXIS, MODEL_AXIS


class TrainBatch(NamedTuple):
    """One sharded batch of reads (leading axis = reads, sharded on data)."""

    ev_mean: jnp.ndarray   # [B, T] f32 event levels (pA)
    ev_time: jnp.ndarray   # [B, T] f32 event start times (s, relative)
    n_events: jnp.ndarray  # [B] i32
    ranks: jnp.ndarray     # [B, K] i32 read kmer ranks
    n_kmers: jnp.ndarray   # [B] i32


class TrainStepResult(NamedTuple):
    level_mean: jnp.ndarray  # [R] updated
    level_stdv: jnp.ndarray  # [R] updated
    loss: jnp.ndarray        # scalar: -mean HMM forward lp of scoreable reads
    n_scored: jnp.ndarray    # scalar i32


def _train_step_body(level_mean, level_stdv, batch: TrainBatch,
                     n_ranks: int, model_shards: int):
    # --- assemble the replicated full kmer table from the local shard ---
    full_mean = jax.lax.all_gather(level_mean, MODEL_AXIS, tiled=True)
    full_stdv = jax.lax.all_gather(level_stdv, MODEL_AXIS, tiled=True)

    n_events = jnp.maximum(batch.n_events, 2)
    n_kmers = jnp.maximum(batch.n_kmers, 2)
    valid = (batch.n_events > 0) & (batch.n_kmers > 0)

    lvl_mean = full_mean[batch.ranks]
    lvl_stdv = full_stdv[batch.ranks]

    # --- per-read pipeline (independent across the data axis) ---
    shift, scale = estimate_scalings_mom(batch.ev_mean, n_events, lvl_mean, n_kmers)
    mu = scale[:, None] * lvl_mean + shift[:, None]
    sigma = lvl_stdv
    res = banded_align_batch(batch.ev_mean, n_events, mu, sigma,
                             jnp.log(sigma), n_kmers)

    m_mask = mstate_events_batch(res.b2e_start, res.b2e_stop, batch.ranks, n_kmers)
    T = batch.ev_mean.shape[1]
    ev_idx = jnp.clip(res.b2e_start, 0, T - 1)
    levels = jnp.take_along_axis(batch.ev_mean, ev_idx, axis=1)
    times = jnp.take_along_axis(batch.ev_time, ev_idx, axis=1)
    times = times - batch.ev_time[:, :1]
    recal = recalibrate(levels, times, lvl_mean, lvl_stdv, m_mask,
                        scale_var=True, scale_drift=False)

    read_ok = valid & (~res.failed) & recal.recalibrated

    # --- E-step statistics: fully-scaled levels keyed by kmer rank ---
    scaled = (levels - recal.shift[:, None]) / recal.scale[:, None]
    w = jnp.where(read_ok[:, None] & m_mask, 1.0, 0.0)
    local = kmer_moments(batch.ranks, scaled, w, n_ranks)
    glob = psum_moments(local, DATA_AXIS)

    # --- M-step on this device's kmer-table shard ---
    rows = n_ranks // model_shards
    start = jax.lax.axis_index(MODEL_AXIS) * rows
    shard_m = KmerMoments(*(jax.lax.dynamic_slice(v, (start,), (rows,))
                            for v in glob))
    new_mean, new_stdv = gaussian_update(shard_m, level_mean, level_stdv)

    # --- objective: HMM forward score under the updated model ---
    upd_mean = jax.lax.all_gather(new_mean, MODEL_AXIS, tiled=True)
    upd_stdv = jax.lax.all_gather(new_stdv, MODEL_AXIS, tiled=True)
    mu2 = recal.scale[:, None] * upd_mean[batch.ranks] + recal.shift[:, None]
    sg2 = upd_stdv[batch.ranks] * recal.var[:, None]
    lp = profile_hmm_forward(
        jnp.where(read_ok[:, None], batch.ev_mean, 0.0), n_events,
        mu2, sg2, jnp.log(sg2), n_kmers, res.events_per_base)
    lp = jnp.where(read_ok, lp, 0.0)
    n_scored = jax.lax.psum(jnp.sum(read_ok.astype(jnp.int32)), DATA_AXIS)
    loss = -jax.lax.psum(jnp.sum(lp), DATA_AXIS) / jnp.maximum(n_scored, 1)
    return TrainStepResult(level_mean=new_mean, level_stdv=new_stdv,
                           loss=loss, n_scored=n_scored)


def make_train_step(mesh: Mesh, n_ranks: int):
    """Build the jitted sharded train step for a mesh.

    Returns step(level_mean [R], level_stdv [R], batch: TrainBatch) ->
    TrainStepResult with the model arrays sharded over the model axis and
    batch arrays over the data axis.
    """
    model_shards = mesh.shape[MODEL_AXIS]
    if n_ranks % model_shards != 0:
        raise ValueError(f"kmer table size {n_ranks} not divisible by "
                         f"model axis {model_shards}")

    body = functools.partial(_train_step_body, n_ranks=n_ranks,
                             model_shards=model_shards)
    batch_spec = TrainBatch(*(P(DATA_AXIS) for _ in TrainBatch._fields))
    # check_vma=False: the body's psum outputs carry no varying-mesh-axes
    # metadata for jax.shard_map's replication checker
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(MODEL_AXIS), P(MODEL_AXIS), batch_spec),
        out_specs=TrainStepResult(P(MODEL_AXIS), P(MODEL_AXIS), P(), P()),
        check_vma=False)
    return jax.jit(sharded)
