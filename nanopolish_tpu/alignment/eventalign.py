"""eventalign core: re-align read events to the reference, batched.

Rebuild of align_read_to_ref (src/alignment/nanopolish_eventalign.cpp:612-827).
The reference loops segment-by-segment per read (each ~100 ref bases,
emitting ~50 alignments, chained by the last output event/kmer).  The chain
is inherently sequential per read, so the TPU design runs a **segment
wavefront**: every active (read, strand) job contributes its current
segment to one batched Viterbi kernel call per round; jobs advance until
exhausted.  Batch occupancy stays high while any reads remain.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..io.bam import BamRecord
from ..models.hmm_input import HMMInputSequence
from ..models.squiggle import SquiggleRead
from .anchor import (get_aligned_segments, get_end_pair, trim_pairs_to_kmer,
                     trim_pairs_to_ref_region)
from .segments import HMMSegment, make_segment, viterbi_segments

ALIGN_STRIDE = 100   # ref bases per HMM call (eventalign.cpp:668)
OUTPUT_STRIDE = 50   # alignments emitted per call (eventalign.cpp:669)


@dataclass
class EventAlignment:
    """One (reference kmer, event) alignment row
    (src/alignment/nanopolish_eventalign.h:53-69)."""

    ref_name: str = ""
    ref_position: int = -1
    ref_kmer: str = ""
    read_idx: int = -1
    strand_idx: int = 0
    event_idx: int = -1
    rc: bool = False
    model_kmer: str = ""
    hmm_state: str = "M"


@dataclass
class _Job:
    """Wavefront state for one (read, strand) alignment."""

    read: SquiggleRead
    record: BamRecord
    strand: int
    read_idx: int
    model: object
    ref_name: str
    ref_offset: int
    ref_seq: str
    rc_ref_seq: str
    pair_segments: List[np.ndarray]
    output: List[EventAlignment] = field(default_factory=list)

    seg_i: int = 0
    started: bool = False
    done: bool = False

    # per-aligned-segment chain state
    pairs: Optional[np.ndarray] = None
    curr_start_event: int = 0
    curr_start_ref: int = 0
    curr_pair_idx: int = 0
    last_event: int = 0
    forward: bool = True

    # per-round context
    _hmm_seq: Optional[HMMInputSequence] = None
    _input_rc: bool = False
    _event_stop: int = 0
    _last_section: bool = False
    _end_pair_idx: int = 0


def _start_segment(job: _Job) -> bool:
    """Initialize chain state for aligned segment seg_i; False if the whole
    job is finished."""
    read = job.read
    k = job.model.k
    while job.seg_i < len(job.pair_segments):
        pairs = job.pair_segments[job.seg_i]
        if pairs.shape[0] == 0:
            job.seg_i += 1
            continue
        do_base_rc = job.record.is_reverse
        read_kidx_start = int(pairs[0, 1])
        read_kidx_end = int(pairs[-1, 1])
        if do_base_rc:
            read_kidx_start = read.flip_k_strand(read_kidx_start, k)
            read_kidx_end = read.flip_k_strand(read_kidx_end, k)
        if read_kidx_start < 0 or read_kidx_end < 0:
            job.seg_i += 1
            continue
        first_event = read.get_closest_event_to(read_kidx_start, job.strand)
        last_event = read.get_closest_event_to(read_kidx_end, job.strand)
        if first_event == -1 or last_event == -1:
            job.seg_i += 1
            continue
        job.pairs = pairs
        job.curr_start_event = first_event
        job.last_event = last_event
        job.forward = first_event < last_event
        job.curr_start_ref = int(pairs[0, 0])
        job.curr_pair_idx = 0
        return True
    job.done = True
    return False


def _prepare(job: _Job) -> Optional[HMMSegment]:
    """Build the next HMM segment for this job, or None when finished.
    Mirrors the loop body of align_read_to_ref (eventalign.cpp:691-760)."""
    read = job.read
    model = job.model
    k = model.k
    while True:
        if job.done:
            return None
        if job.pairs is None:
            if not _start_segment(job):
                return None
        # loop condition (eventalign.cpp:689-690)
        if not ((job.forward and job.curr_start_event < job.last_event) or
                (not job.forward and job.curr_start_event > job.last_event)):
            job.pairs = None
            job.seg_i += 1
            continue

        pairs = job.pairs
        end_pair_idx = get_end_pair(pairs, job.curr_start_ref + ALIGN_STRIDE,
                                    job.curr_pair_idx)
        curr_end_ref = int(pairs[end_pair_idx, 0])
        curr_end_read = int(pairs[end_pair_idx, 1])
        do_base_rc = job.record.is_reverse
        if do_base_rc:
            curr_end_read = read.flip_k_strand(curr_end_read, k)
        if curr_end_read < 0:
            job.pairs = None
            job.seg_i += 1
            continue

        s = job.curr_start_ref - job.ref_offset
        l = curr_end_ref - job.curr_start_ref + 1
        fwd_subseq = job.ref_seq[s:s + l]
        rc_subseq = job.rc_ref_seq[len(job.ref_seq) - s - l:
                                   len(job.ref_seq) - s]
        if len(fwd_subseq) < 2 * k:     # minimum sequence (eventalign.cpp:723)
            job.pairs = None
            job.seg_i += 1
            continue
        hmm_seq = HMMInputSequence(fwd_subseq, rc_subseq, model.alphabet)

        event_stop = read.get_closest_event_to(curr_end_read, job.strand)
        if abs(job.curr_start_event - event_stop) < 2:  # eventalign.cpp:744
            job.pairs = None
            job.seg_i += 1
            continue

        rc_flags = (do_base_rc, not do_base_rc)
        input_rc = rc_flags[job.strand]
        ranks = hmm_seq.kmer_ranks(k, input_rc)

        job._hmm_seq = hmm_seq
        job._input_rc = input_rc
        job._event_stop = event_stop
        job._end_pair_idx = end_pair_idx
        job._last_section = end_pair_idx == pairs.shape[0] - 1
        return make_segment(read, job.strand, ranks, job.curr_start_event,
                            event_stop, model=model)


def _consume(job: _Job, result: Tuple[np.ndarray, np.ndarray, str]):
    """Apply one Viterbi result: emit alignments + advance the chain
    (eventalign.cpp:762-823)."""
    read = job.read
    k = job.model.k
    evs, kms, states = result
    stride = 1 if job.curr_start_event <= job._event_stop else -1

    num_output = 0
    last_event_output = 0
    last_ref_kmer_output = 0
    for row in range(len(states)):
        if num_output >= OUTPUT_STRIDE and not job._last_section:
            break
        state = states[row]
        event_idx = job.curr_start_event + int(evs[row]) * stride
        if state == "K" or event_idx == job.curr_start_event:
            continue
        kmer_idx = int(kms[row])
        ref_position = job.curr_start_ref + kmer_idx
        ea = EventAlignment(
            ref_name=job.ref_name,
            ref_position=ref_position,
            ref_kmer=job.ref_seq[ref_position - job.ref_offset:
                                 ref_position - job.ref_offset + k],
            read_idx=job.read_idx,
            strand_idx=job.strand,
            event_idx=event_idx,
            rc=job._input_rc,
            model_kmer=(job._hmm_seq.get_kmer(kmer_idx, k, job._input_rc)
                        if state != "B" else "N" * k),
            hmm_state=state,
        )
        job.output.append(ea)
        last_event_output = event_idx
        last_ref_kmer_output = ref_position
        num_output += 1

    if num_output == 0:
        job.pairs = None
        job.seg_i += 1
        return
    job.curr_start_event = last_event_output
    job.curr_start_ref = last_ref_kmer_output
    job.curr_pair_idx = get_end_pair(job.pairs, job.curr_start_ref,
                                     job.curr_pair_idx)


def align_reads_to_ref(
    jobs_in: Sequence[Tuple[SquiggleRead, BamRecord, int, int]],
    fai, references: List[str],
    region_start: int = -1, region_end: int = -1,
    alphabet: str = "",
) -> List[List[EventAlignment]]:
    """Align many (read, record, strand, read_idx) jobs via the segment
    wavefront.  Returns one EventAlignment list per input job.

    `alphabet` selects an alternative pore model family (e.g. "cpg") as
    EventAlignmentParameters.alphabet does (nanopolish_eventalign.h:33)."""
    jobs: List[Optional[_Job]] = []
    for read, record, strand, read_idx in jobs_in:
        job = _make_job(read, record, strand, read_idx, fai, references,
                        region_start, region_end, alphabet)
        jobs.append(job)

    active = [j for j in jobs if j is not None and not j.done]
    while active:
        segs: List[HMMSegment] = []
        seg_jobs: List[_Job] = []
        for j in active:
            seg = _prepare(j)
            if seg is not None:
                segs.append(seg)
                seg_jobs.append(j)
        if not segs:
            break
        results = viterbi_segments(segs)
        for j, r in zip(seg_jobs, results):
            _consume(j, r)
        active = [j for j in seg_jobs if not j.done]

    return [(j.output if j is not None else []) for j in jobs]


def _make_job(read: SquiggleRead, record: BamRecord, strand: int,
              read_idx: int, fai, references: List[str],
              region_start: int, region_end: int,
              alphabet: str = "") -> Optional[_Job]:
    if record.is_unmapped or not read.has_events_for_strand(strand):
        return None
    model = read.get_model(strand, alphabet) if alphabet \
        else read.base_model[strand]
    k = model.k
    ref_name = references[record.tid]
    ref_offset = record.pos
    ref_seq = fai.fetch(ref_name, ref_offset, record.reference_end() + 1).upper()
    ref_seq = model.alphabet.disambiguate(ref_seq)
    rc_ref_seq = model.alphabet.reverse_complement(ref_seq)

    pair_segments = get_aligned_segments(record)
    max_kmer_idx = len(read.read_sequence) - k
    trimmed = []
    for pairs in pair_segments:
        if region_start != -1 and region_end != -1:
            pairs = trim_pairs_to_ref_region(pairs, region_start, region_end)
        pairs = trim_pairs_to_kmer(pairs, max_kmer_idx)
        if pairs.shape[0] == 0:
            # an empty trimmed segment aborts the record (eventalign.cpp:664)
            break
        trimmed.append(pairs)
    return _Job(read=read, record=record, strand=strand, read_idx=read_idx,
                model=model, ref_name=ref_name, ref_offset=ref_offset,
                ref_seq=ref_seq, rc_ref_seq=rc_ref_seq,
                pair_segments=trimmed)
