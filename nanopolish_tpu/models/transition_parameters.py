"""TransitionParameters: trainable HMM transition statistics.

Rebuild of src/hmm/nanopolish_transition_parameters.{h,cpp}: per-strand
counts of M/E/K state transitions plus a skip-probability table binned by
|delta expected level|, re-estimated by train() with pseudocounts.

The reference ships kit-specific initialization tables for the legacy R7
chemistries (initialize_sqkmap005/6/7); the R9 profile HMM uses fixed
transitions instead (r9.inl:17-76), so training here starts from a flat
prior and the trained table is what scorereads --train-transitions prints.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np

_STATES = "MEK"


def _state_index(c: str) -> int:
    return {"M": 0, "E": 1, "B": 1, "K": 2}[c]


@dataclass
class TransitionParameters:
    skip_bin_width: float = 0.5
    n_bins: int = 30
    trans_m_to_e_not_k: float = 0.15
    trans_e_to_e: float = 0.33

    def __post_init__(self):
        self.skip_probabilities = np.full(self.n_bins, 0.1)
        # state_transitions[from 3][to*2 + kmer_move 6]
        self.state_transitions = np.zeros((3, 6), np.int64)
        self.kmer_transitions: List[Tuple[float, float, str]] = []
        self.n_matches = 0
        self.n_merges = 0
        self.n_skips = 0

    # ------------------------------------------------------------------
    def get_skip_bin(self, level1: float, level2: float) -> int:
        d = abs(level1 - level2)
        return min(int(d / self.skip_bin_width),
                   len(self.skip_probabilities) - 1)

    def get_skip_probability(self, level1: float, level2: float) -> float:
        return float(self.skip_probabilities[self.get_skip_bin(level1, level2)])

    def add_transition_observation(self, state_from: str, state_to: str,
                                   kmer_move: bool):
        f = _state_index(state_from)
        t = 2 * _state_index(state_to) + int(kmer_move)
        self.state_transitions[f, t] += 1

    # ------------------------------------------------------------------
    def add_training_from_alignment(self, sr, strand: int, model,
                                    hmm_sequence, rc: bool, alignment,
                                    ignore_edge_length: int = 5):
        """transition_parameters.cpp:295-368 over a backtrack alignment
        (list of (event_idx, kmer_idx, state))."""
        if len(alignment) <= ignore_edge_length:
            return
        k = model.k
        prev_s = "M"
        s = sr.scalings[strand]
        for pi, (ei, ki, state) in enumerate(alignment):
            kmer_move = pi == 0 or alignment[pi - 1][1] != ki
            self.add_transition_observation(prev_s, state, kmer_move)
            if ignore_edge_length < pi < len(alignment) - ignore_edge_length:
                if state != "B":
                    t_from = alignment[pi - 1][1]
                    t_to = ki
                    if state == "K" and prev_s == "M":
                        t_from = alignment[pi - 1][1]
                        t_to = t_from + 1
                    rank1 = hmm_sequence.get_kmer_rank(t_from, k, rc)
                    rank2 = hmm_sequence.get_kmer_rank(t_to, k, rc)
                    l1 = s.scale * model.level_mean[rank1] + s.shift
                    l2 = s.scale * model.level_mean[rank2] + s.shift
                    self.kmer_transitions.append((float(l1), float(l2), state))
                self.add_transition_observation(prev_s, state, kmer_move)
            prev_s = state
            self.n_matches += state == "M"
            self.n_merges += state == "E"
            self.n_skips += state == "K"

    def train(self, pseudocount: float = 100.0):
        """transition_parameters.cpp:370-440."""
        skip_obs = self.skip_probabilities * pseudocount
        total_obs = np.full_like(skip_obs, pseudocount)
        for l1, l2, state in self.kmer_transitions:
            b = self.get_skip_bin(l1, l2)
            skip_obs[b] += state == "K"
            total_obs[b] += 1
        self.skip_probabilities = skip_obs / total_obs

    # ------------------------------------------------------------------
    def print(self, fp=None) -> str:
        import sys
        fp = fp or sys.stderr
        lines = ["TRANSITIONS"]
        for i, c in enumerate("MBK"):
            lines.append("\t%c: %s" % (c, " ".join(
                str(v) for v in self.state_transitions[i])))
        lines.append("SKIP_TABLE\t" + " ".join(
            f"{p:.4f}" for p in self.skip_probabilities))
        lines.append(f"SUMMARY\tmatches={self.n_matches} "
                     f"merges={self.n_merges} skips={self.n_skips}")
        out = "\n".join(lines)
        print(out, file=fp)
        return out
