"""Device mesh + sharding policy for the TPU-native framework.

The reference parallelizes with single-node OpenMP over reads
(reference: src/common/nanopolish_bam_processor.cpp:49-133) plus shell-level
window sharding (scripts/nanopolish_makerange.py).  Here the same two axes
become a 2-D `jax.sharding.Mesh`:

  * ``data``  — batches of reads (the BamProcessor axis): every per-read
    array is sharded on its leading axis; per-read work is independent, so
    no collectives are needed until reduction time (EM sufficient
    statistics, per-site aggregation), which ride ICI via `psum` /
    `reduce_scatter`.
  * ``model`` — the k-mer table axis (4^k..5^k rows): pore-model updates
    (methyltrain's per-kmer mixture EM) shard the k-mer table, the tensor-
    parallel analogue.

Pore models, reference windows and transition scalars are replicated.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence] = None,
              model_parallel: int = 1) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    `model_parallel` devices go to the k-mer-table axis; the rest to the
    read-batch axis.  With a single device both axes are size 1.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for per-read batch arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def model_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for k-mer-table arrays."""
    return NamedSharding(mesh, P(MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_reads(mesh: Mesh, *arrays):
    """Device-put per-read arrays with leading-axis data sharding."""
    s = data_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) != 1 else out[0]


def pad_batch_to_multiple(arrays, multiple: int, batch_axis: int = 0):
    """Pad the batch axis so it divides the data-mesh size; returns
    (padded_arrays, real_batch).  Padded rows must be masked by callers
    (n_events=0 rows are inert in every kernel)."""
    b = arrays[0].shape[batch_axis]
    pad = (-b) % multiple
    if pad == 0:
        return list(arrays), b
    out = []
    for a in arrays:
        widths = [(0, 0)] * a.ndim
        widths[batch_axis] = (0, pad)
        out.append(np.pad(a, widths))
    return out, b
