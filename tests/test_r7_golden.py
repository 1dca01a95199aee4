"""The reference's golden HMM test, re-enabled.

src/test/nanopolish_test.cpp:389-455 (disabled upstream with `#if 0`
because the modern reference dropped the legacy events-only FAST5 load
path) records exact Viterbi state strings and Forward/Viterbi
log-likelihoods for both strands of the one real signal file checked into
the repo.  This test reproduces those values through our legacy 2D loader
+ R7 profile HMM — real (non-synthetic) signal data through the ingest
and scoring stack.

Tolerances follow Catch's Approx (relative ~1.2e-5, the reference test's
own criterion).
"""

import os

import numpy as np
import pytest

from nanopolish_tpu.io.fast5_legacy import load_legacy_2d
from nanopolish_tpu.models.hmm_input import HMMInputSequence
from nanopolish_tpu.models.transition_parameters import TransitionParameters
from nanopolish_tpu.ops.profile_hmm_r7 import R7Scorer

F5 = ("/root/reference/test/data/"
      "LomanLabz_PC_Ecoli_K12_R7.3_2549_1_ch8_file30_strand.fast5")

REF_SUBSEQ = ("ATCAGTAAAATAACGTAGAGCGGTAACCTTGCCATAAAGGTCGAGTTTA"
              "TTACCATCCTTGTTATAGACTTCGGCAGCGTGTGCTACGTTCGCAGCT")

EXPECTED_ALIGNMENT = [
    "MMMMMEMKMKMMMMMMMKMMMKMMMKMMMMMMMMMKKMMEEEMMMMMMKMMMM"
    "MMMKMMMMMKMKMKMEMKKMKMKKMMMMMMEMMMMKMKMEEMMMMKMEEEEEM",
    "MMKMMMKMEEMMKMKMKMEMMMKMMMKMEMMMKMMMKMMMMMMMMMKKMEMMM"
    "EMMMMMMMMMKMKKMMMMMMMEMMMMMKMMMMMKMEMMMMMKMMMMMEEEEEEEEM",
]
EXPECTED_VITERBI_LAST_STATE = [-237.7808380127, -267.9027709961]
EXPECTED_FORWARD = [-216.053604126, -254.5881347656]

INPUTS = [
    dict(strand=0, e_start=3, e_stop=88, rc=False),
    dict(strand=1, e_start=6788, e_stop=6697, rc=True),
]

needs_file = pytest.mark.skipif(not os.path.exists(F5),
                                reason="reference test data not present")


@needs_file
def test_legacy_2d_ingest():
    """Real, non-synthetic signal bytes through the ingest stack."""
    read = load_legacy_2d(F5)
    assert set(read.strands) == {0, 1}
    t = read.strands[0]
    assert len(t.mean) == 5346          # template basecalled events
    assert len(read.strands[1].mean) == 6838
    assert t.k == 5 and len(t.level_mean) == 4 ** 5
    # scalings recorded by the basecaller
    assert t.shift == pytest.approx(2.0752194, abs=1e-5)
    assert t.scale == pytest.approx(0.9667562, abs=1e-5)
    assert read.twod_sequence and set(read.twod_sequence) <= set("ACGT")
    # event levels are plausible pA values
    assert 20 < np.median(t.mean) < 120


@needs_file
@pytest.mark.parametrize("si", [0, 1])
def test_golden_hmm_values(si):
    """nanopolish_test.cpp:389-455, exact expected values."""
    read = load_legacy_2d(F5)
    inp = INPUTS[si]
    sd = read.strands[inp["strand"]]
    params = TransitionParameters.for_kit("sqkmap005", inp["strand"])
    sc = R7Scorer(sd, params, HMMInputSequence(REF_SUBSEQ), inp["rc"],
                  inp["e_start"], inp["e_stop"])

    states, kis, eis, fms = sc.align()
    assert states == EXPECTED_ALIGNMENT[si]
    assert fms[-1] == pytest.approx(EXPECTED_VITERBI_LAST_STATE[si],
                                    rel=1.2e-5)
    assert sc.score() == pytest.approx(EXPECTED_FORWARD[si], rel=1.2e-5)
