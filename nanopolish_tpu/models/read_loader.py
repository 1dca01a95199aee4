"""Bridge: ReadDB + signal files -> batched SquiggleRead construction.

The per-read path of the reference (SquiggleRead ctor: ReadDB sequence
fetch + Fast5Loader::load_read + load_from_raw,
src/nanopolish_squiggle_read.cpp:68-116) becomes a batch loader feeding
models/read_builder.build_reads.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

from ..io.readdb import ReadDB
from .read_builder import RawReadInput, ReadStats, build_reads
from .squiggle import SquiggleRead


def load_raw_inputs(read_names: Sequence[str], read_db: ReadDB,
                    stats: Optional[ReadStats] = None) -> Dict[str, RawReadInput]:
    """Fetch sequence + raw signal for each read name."""
    from ..io import fast5 as f5
    from ..io.slow5 import Slow5File

    out: Dict[str, RawReadInput] = {}
    slow5_cache: Dict[str, Slow5File] = {}
    for name in read_names:
        seq = read_db.get_read_sequence(name)
        if not seq:
            continue
        path = read_db.get_signal_path(name)
        if not path:
            continue
        if path.endswith((".slow5", ".blow5")):
            sf = slow5_cache.get(path)
            if sf is None:
                sf = slow5_cache[path] = Slow5File(path)
            rec = sf.get_read(name)
            if rec is None:
                continue
            data = rec.to_fast5_data()
        else:
            data = f5.load_read(path, name)
            if not data.is_valid:
                continue
        out[name] = RawReadInput(
            read_name=name,
            sequence=seq,
            raw=data.rt,
            sample_rate=data.channel_params.sample_rate,
            experiment_type=data.experiment_type or "dna",
            sequencing_kit=data.sequencing_kit,
            channel_id=data.channel_id,
            start_time=data.start_time,
        )
    return out


def load_squiggle_reads(read_names: Sequence[str], read_db: ReadDB,
                        flags: int = 0,
                        stats: Optional[ReadStats] = None,
                        ) -> Dict[str, SquiggleRead]:
    """Batched SquiggleRead construction for a set of read names."""
    inputs = load_raw_inputs(read_names, read_db, stats)
    names = list(inputs)
    reads = build_reads([inputs[n] for n in names], flags=flags, stats=stats)
    return {n: r for n, r in zip(names, reads) if r is not None}
