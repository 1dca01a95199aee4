"""Pallas profile-HMM Forward kernel vs the exact lax.scan implementation
(and thereby the NumPy cell-by-cell port, covered by test_profile_hmm)."""

import numpy as np
import pytest

from nanopolish_tpu.models.pore_model import PoreModelSet
from nanopolish_tpu.ops.pallas_profile_hmm import profile_hmm_forward_pallas
from nanopolish_tpu.ops.profile_hmm import profile_hmm_forward


def _batch(B, Kmax, Tmax, seed=0):
    model = PoreModelSet.instance().get_model(
        "r9.4_450bps", "nucleotide", "template", 6)
    rng = np.random.default_rng(seed)
    Ks = rng.integers(Kmax // 2, Kmax, B)
    Ts = rng.integers(Tmax // 2, Tmax, B)
    mu = np.zeros((B, Kmax), np.float32)
    sd = np.ones((B, Kmax), np.float32)
    lv = np.zeros((B, Tmax), np.float32)
    for b in range(B):
        ranks = rng.integers(0, 4096, Ks[b])
        mu[b, :Ks[b]] = model.level_mean[ranks]
        sd[b, :Ks[b]] = model.level_stdv[ranks]
        reps = np.minimum((np.arange(Ts[b]) / (Ts[b] / Ks[b])).astype(int),
                          Ks[b] - 1)
        lv[b, :Ts[b]] = mu[b, reps] + rng.normal(0, 1, Ts[b]) * sd[b, reps]
    epb = np.full(B, 2.2, np.float32)
    return lv, Ts.astype(np.int32), mu, sd, Ks.astype(np.int32), epb


@pytest.mark.parametrize("flags", [0, 1, 2, 3])
def test_pallas_forward_matches_scan(flags):
    lv, Ts, mu, sd, Ks, epb = _batch(6, 150, 280, seed=flags)
    ref = np.asarray(profile_hmm_forward(lv, Ts, mu, sd, np.log(sd), Ks,
                                         epb, flags=flags))
    pal = profile_hmm_forward_pallas(lv, Ts, mu, sd, np.log(sd), Ks, epb,
                                     flags)
    np.testing.assert_allclose(pal, ref, atol=2e-3, rtol=0)


def test_pallas_forward_mixed_flags_one_call():
    lv, Ts, mu, sd, Ks, epb = _batch(8, 120, 250, seed=9)
    flags = np.array([0, 1, 2, 3, 3, 2, 1, 0], np.int32)
    pal = profile_hmm_forward_pallas(lv, Ts, mu, sd, np.log(sd), Ks, epb,
                                     flags)
    for b in range(8):
        ref = np.asarray(profile_hmm_forward(
            lv[b:b + 1], Ts[b:b + 1], mu[b:b + 1], sd[b:b + 1],
            np.log(sd[b:b + 1]), Ks[b:b + 1], epb[b:b + 1],
            flags=int(flags[b])))
        assert abs(pal[b] - ref[0]) < 2e-3


@pytest.mark.parametrize("flags", [0, 3])
def test_pallas_viterbi_matches_scan_backtrack(flags):
    from nanopolish_tpu.ops.pallas_profile_hmm import profile_hmm_viterbi_pallas
    from nanopolish_tpu.ops.profile_hmm import (profile_hmm_viterbi,
                                                viterbi_backtrack)
    lv, Ts, mu, sd, Ks, epb = _batch(4, 120, 220, seed=20 + flags)
    _, traces = profile_hmm_viterbi(lv, Ts, mu, sd, np.log(sd), Ks, epb,
                                    flags=flags, with_trace=True)
    ref = viterbi_backtrack(np.asarray(traces), Ts, Ks)
    pal = profile_hmm_viterbi_pallas(lv, Ts, mu, sd, np.log(sd), Ks, epb,
                                     flags)
    for b in range(4):
        re, rk, rs = ref[b]
        pe, pk, ps = pal[b]
        assert rs == ps
        np.testing.assert_array_equal(re, pe)
        np.testing.assert_array_equal(rk, pk)


def test_forward_scores_invariant_to_kmer_lane_bucket():
    """The per-call kmer-lane bucket (KP, chosen from the padded table
    width) must not change scores: the same segments packed at K0=40
    (128-lane kernel) and zero-padded to K0=200 (256-lane kernel) give
    bit-identical Forward scores — n_kmers masks the padding."""
    lv, Ts, mu, sd, Ks, epb = _batch(8, 40, 160, seed=9)
    s128 = profile_hmm_forward_pallas(lv, Ts, mu, sd, np.log(sd), Ks, epb, 3)
    pad = 200 - mu.shape[1]
    mu2 = np.pad(mu, ((0, 0), (0, pad)))
    sd2 = np.pad(sd, ((0, 0), (0, pad)), constant_values=1.0)
    s256 = profile_hmm_forward_pallas(lv, Ts, mu2, sd2, np.log(sd2), Ks,
                                      epb, 3)
    np.testing.assert_array_equal(s128, s256)


@pytest.mark.parametrize("flags", [0, 3])
def test_pallas_viterbi_matches_scan_wide_kernel(flags):
    """Viterbi parity at the 256-lane kernel width (Kmax=200 -> KP=256):
    the KP-sensitive code (prefix/head-recovery roll depths, uint8 dist
    encoding, backtrack lane selects) must hold at the widest production
    bucket (call-methylation groups reach ~221 kmers), not just the
    128-lane one the other tests compile."""
    from nanopolish_tpu.ops.pallas_profile_hmm import profile_hmm_viterbi_pallas
    from nanopolish_tpu.ops.profile_hmm import (profile_hmm_viterbi,
                                                viterbi_backtrack)

    lv, Ts, mu, sd, Ks, epb = _batch(4, 200, 480, seed=13)
    pal = profile_hmm_viterbi_pallas(lv, Ts, mu, sd, np.log(sd), Ks, epb,
                                     flags)
    _, traces = profile_hmm_viterbi(lv, Ts, mu, sd, np.log(sd), Ks, epb,
                                    flags=flags, with_trace=True)
    ref = viterbi_backtrack(np.asarray(traces), Ts, Ks)
    for b in range(4):
        np.testing.assert_array_equal(pal[b][0], ref[b][0])
        np.testing.assert_array_equal(pal[b][1], ref[b][1])
        assert pal[b][2] == ref[b][2]
