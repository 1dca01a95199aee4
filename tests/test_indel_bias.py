"""hmm_indel_bias_factor + p-skip knob plumbing.

Spec: the reference sets hmm_indel_bias_factor to 0.9 (consensus) / 0.8
(calling) in variants (call_variants.cpp:1114-1117), scaling
read_events_per_base inside calculate_transitions (r9.inl:15-28), and
exposes --p-skip/--p-skip-self/--p-bad/--p-bad-self overrides
(call_variants.cpp:187-190,1050-1053).
"""

import numpy as np
import pytest

from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.models.squiggle import SquiggleScalings
from nanopolish_tpu.ops.profile_hmm import (
    TransitionKnobs, profile_hmm_forward, profile_hmm_reference)
from nanopolish_tpu.utils.synthetic import random_sequence, synthetic_events


@pytest.fixture(scope="module")
def case():
    model = PoreModelSet().get_model("r9.4_450bps", "nucleotide", "template", 6)
    rng = np.random.default_rng(5)
    seq = random_sequence(rng, 70 + model.k - 1)
    sc = SquiggleScalings.from4(3.0, 1.02, 0.0, 1.0)
    ev = synthetic_events(rng, seq, model, sc, events_per_base=1.8)
    ranks = model.alphabet.seq_to_kmer_ranks(seq, model.k)
    mu = (sc.scale * model.level_mean[ranks] + sc.shift).astype(np.float32)
    sigma = (model.level_stdv[ranks] * sc.var).astype(np.float32)
    levels = ev.mean.astype(np.float32)
    return levels, mu, sigma, np.log(sigma), len(levels) / len(ranks)


def _fwd(case, indel_bias):
    levels, mu, sigma, log_sigma, epb = case
    return float(profile_hmm_forward(
        levels[None], np.array([len(levels)], np.int32), mu[None],
        sigma[None], log_sigma[None], np.array([len(mu)], np.int32),
        np.array([epb], np.float32), indel_bias=indel_bias)[0])


def test_bias_modes_change_scores_and_match_oracle(case):
    levels, mu, sigma, log_sigma, epb = case
    scores = {}
    for bias in (1.0, 0.9, 0.8):
        got = _fwd(case, bias)
        want = profile_hmm_reference(levels, mu, sigma, log_sigma, epb,
                                     indel_bias=bias)
        assert got == pytest.approx(float(want), abs=2e-3)
        scores[bias] = got
    # consensus (0.9) and calling (0.8) modes really score differently
    assert scores[0.9] != scores[0.8]
    assert scores[1.0] != scores[0.9]


def test_p_skip_knobs_take_effect_and_match_oracle(case):
    levels, mu, sigma, log_sigma, epb = case
    base = _fwd(case, 1.0)
    try:
        TransitionKnobs.set(p_skip=0.05, p_bad=0.01, p_skip_self=0.5,
                            p_bad_self=0.02)
        got = _fwd(case, 1.0)
        want = profile_hmm_reference(levels, mu, sigma, log_sigma, epb)
        assert got != base
        assert got == pytest.approx(float(want), abs=2e-3)
    finally:
        TransitionKnobs.reset()
    assert _fwd(case, 1.0) == base       # reset restores defaults


def test_variants_cli_wires_bias_and_knobs(monkeypatch):
    """variants main() applies the mode default / -i override and the
    --p-skip family before scoring."""
    from nanopolish_tpu.apps import variants as V

    captured = {}

    def fake_call(contig, s, e, alignments, opts, candidates=None):
        captured["bias"] = opts.indel_bias
        captured["p_skip"] = TransitionKnobs.p_skip
        from nanopolish_tpu.models.haplotype import Haplotype
        return Haplotype(contig, s, "ACGT")

    monkeypatch.setattr(V, "call_variants_for_region", fake_call)
    monkeypatch.setattr(V, "AlignmentDB",
                        lambda *a, **k: type("A", (), {"_fai": None})())
    import io
    args = ["-r", "x.fq", "-b", "x.bam", "-g", "x.fa", "-w", "tig:0-4"]

    class _W(io.StringIO):
        pass

    try:
        V.main(args + ["--consensus"], stdout=_W())
        assert captured["bias"] == 0.9
        V.main(args, stdout=_W())
        assert captured["bias"] == 0.8
        V.main(args + ["-i", "0.7", "--p-skip", "0.01"], stdout=_W())
        assert captured["bias"] == 0.7
        assert captured["p_skip"] == 0.01
    finally:
        TransitionKnobs.reset()
