"""Alphabet behavior specs, ported from reference src/test/nanopolish_test.cpp:27-265."""

import numpy as np
import pytest

from nanopolish_tpu.utils.alphabet import (
    DNA_ALPHABET,
    METHYL_CPG_ALPHABET,
    METHYL_DAM_ALPHABET,
    METHYL_DCM_ALPHABET,
    METHYL_GPC_ALPHABET,
    best_alphabet,
    get_alphabet_by_name,
)


def test_dna_ranks():
    for i, b in enumerate("ACGT"):
        assert DNA_ALPHABET.rank(b) == i
        assert DNA_ALPHABET.base(i) == b


def test_cpg_ranks():
    a = METHYL_CPG_ALPHABET
    for i, b in enumerate("ACGMT"):
        assert a.rank(b) == i
        assert a.base(i) == b


def test_lexicographic_next_and_rank_cpg():
    # nanopolish_test.cpp:58-74: each lexicographic_next increments rank by 1
    a = METHYL_CPG_ALPHABET
    k = 3
    kmer = "A" * k
    for i in range(a.num_strings(k) - 1):
        nxt = a.lexicographic_next(kmer)
        assert nxt > kmer
        assert a.kmer_rank(nxt, k) - a.kmer_rank(kmer, k) == 1
        kmer = nxt
    assert kmer == "TTT"


def test_kmer_rank_last_base_minor():
    assert DNA_ALPHABET.kmer_rank("AAAAA") == 0
    assert DNA_ALPHABET.kmer_rank("AAAAC") == 1
    assert DNA_ALPHABET.kmer_rank("CAAAA") == 256
    assert DNA_ALPHABET.kmer_rank("TTTTT") == 1023


def test_seq_to_kmer_ranks_vectorized():
    seq = "ACGTACGTAAGGTTCC"
    k = 5
    ranks = DNA_ALPHABET.seq_to_kmer_ranks(seq, k)
    expected = [DNA_ALPHABET.kmer_rank(seq[i:i + k]) for i in range(len(seq) - k + 1)]
    assert ranks.tolist() == expected


def test_rank_to_kmer_roundtrip():
    for kmer in ["AAAAA", "ACGTA", "TTTTT", "GATCA"]:
        r = DNA_ALPHABET.kmer_rank(kmer)
        assert DNA_ALPHABET.rank_to_kmer(r, 5) == kmer


# --- CpG (nanopolish_test.cpp:76-113) --------------------------------------

def test_cpg_methylate():
    a = METHYL_CPG_ALPHABET
    assert a.methylate("C") == "C"
    assert a.methylate("G") == "G"
    assert a.methylate("CG") == "MG"
    assert a.methylate("GC") == "GC"
    assert a.methylate("CGCG") == "MGMG"
    assert a.methylate("AAGCGT") == "AAGMGT"
    assert a.methylate("CGGCGT") == "MGGMGT"
    assert a.methylate("CGCGC") == "MGMGC"


def test_cpg_unmethylate():
    a = METHYL_CPG_ALPHABET
    assert a.unmethylate("C") == "C"
    assert a.unmethylate("CG") == "CG"
    assert a.unmethylate("M") == "C"
    assert a.unmethylate("MG") == "CG"
    assert a.unmethylate("MT") == "MT"


def test_cpg_disambiguate():
    a = METHYL_CPG_ALPHABET
    assert a.disambiguate("") == ""
    assert a.disambiguate("M") == "M"
    assert a.disambiguate("MT") == "AT"
    assert a.disambiguate("MG") == "MG"
    assert a.disambiguate("AMG") == "AMG"
    assert a.disambiguate("CAM") == "CAM"


def test_cpg_reverse_complement():
    a = METHYL_CPG_ALPHABET
    assert a.reverse_complement("M") == "G"
    assert a.reverse_complement("C") == "G"
    assert a.reverse_complement("G") == "C"
    assert a.reverse_complement("MG") == "MG"
    assert a.reverse_complement("CG") == "CG"
    assert a.reverse_complement("AM") == "GT"
    assert a.reverse_complement("AMG") == "MGT"
    assert a.reverse_complement("AAAMG") == "MGTTT"
    assert a.reverse_complement("MGMG") == "MGMG"
    assert a.reverse_complement("MGAMG") == "MGTMG"
    assert a.reverse_complement("GTACATG") == DNA_ALPHABET.reverse_complement("GTACATG")
    assert DNA_ALPHABET.reverse_complement("GATTACA") == "TGTAATC"


# --- Dam (nanopolish_test.cpp:115-172) --------------------------------------

def test_dam_methylate():
    a = METHYL_DAM_ALPHABET
    assert a.methylate("") == ""
    assert a.methylate("G") == "G"
    assert a.methylate("GA") == "GA"
    assert a.methylate("GAT") == "GAT"
    assert a.methylate("GATC") == "GMTC"
    assert a.methylate("GATCG") == "GMTCG"
    assert a.methylate("GATCGA") == "GMTCGA"
    assert a.methylate("GATCGAT") == "GMTCGAT"
    assert a.methylate("GATCGATC") == "GMTCGMTC"
    assert a.methylate("GMTCGATC") == "GMTCGMTC"
    assert a.methylate("GMTCGMTC") == "GMTCGMTC"


def test_dam_unmethylate():
    a = METHYL_DAM_ALPHABET
    assert a.unmethylate("M") == "A"
    assert a.unmethylate("MT") == "AT"
    assert a.unmethylate("MTC") == "ATC"
    assert a.unmethylate("GM") == "GA"
    assert a.unmethylate("GMT") == "GAT"
    assert a.unmethylate("GMTC") == "GATC"
    assert a.unmethylate("GMTCG") == "GATCG"
    assert a.unmethylate("GMTCGM") == "GATCGA"
    assert a.unmethylate("GMTCGMTC") == "GATCGATC"
    assert a.unmethylate("GMTCGMT") == "GATCGAT"
    assert a.unmethylate("MA") == "MA"
    assert a.unmethylate("CM") == "CM"


def test_dam_disambiguate():
    a = METHYL_DAM_ALPHABET
    assert a.disambiguate("") == ""
    assert a.disambiguate("GMTC") == "GMTC"
    assert a.disambiguate("M") == "M"
    assert a.disambiguate("MT") == "MT"
    assert a.disambiguate("MTC") == "MTC"
    assert a.disambiguate("GM") == "GM"
    assert a.disambiguate("GMT") == "GMT"
    assert a.disambiguate("GMA") == "GAA"


def test_dam_reverse_complement():
    a = METHYL_DAM_ALPHABET
    assert a.reverse_complement("") == ""
    assert a.reverse_complement("M") == "T"
    assert a.reverse_complement("G") == "C"
    assert a.reverse_complement("GM") == "TC"
    assert a.reverse_complement("GMT") == "MTC"
    assert a.reverse_complement("GMTC") == "GMTC"
    assert a.reverse_complement("MTC") == "GMT"
    assert a.reverse_complement("TC") == "GA"
    assert a.reverse_complement("GATC") == "GATC"
    assert a.reverse_complement("ATC") == "GAT"
    assert a.reverse_complement("GAT") == "ATC"


# --- Dcm (nanopolish_test.cpp:174-237) --------------------------------------

def test_dcm_methylate():
    a = METHYL_DCM_ALPHABET
    assert a.methylate("") == ""
    assert a.methylate("C") == "C"
    assert a.methylate("CC") == "CC"
    assert a.methylate("CCA") == "CCA"
    assert a.methylate("CCAG") == "CCAG"
    assert a.methylate("CCAGG") == "CMAGG"
    assert a.methylate("CAGG") == "CAGG"
    assert a.methylate("AGG") == "AGG"
    assert a.methylate("CCT") == "CCT"
    assert a.methylate("CCTG") == "CCTG"
    assert a.methylate("CCTGG") == "CMTGG"
    assert a.methylate("CTGG") == "CTGG"
    assert a.methylate("TGG") == "TGG"
    assert a.methylate("CCAGGCCTGG") == "CMAGGCMTGG"
    assert a.methylate("CCAGGCCTG") == "CMAGGCCTG"


def test_dcm_unmethylate():
    a = METHYL_DCM_ALPHABET
    assert a.unmethylate("M") == "C"
    assert a.unmethylate("MA") == "CA"
    assert a.unmethylate("MT") == "CT"
    assert a.unmethylate("MAG") == "CAG"
    assert a.unmethylate("MTG") == "CTG"
    assert a.unmethylate("MAGG") == "CAGG"
    assert a.unmethylate("MTGG") == "CTGG"
    assert a.unmethylate("CM") == "CC"
    assert a.unmethylate("GM") == "GM"
    assert a.unmethylate("MC") == "MC"


def test_dcm_disambiguate():
    a = METHYL_DCM_ALPHABET
    assert a.disambiguate("") == ""
    assert a.disambiguate("M") == "M"
    assert a.disambiguate("CM") == "CM"
    assert a.disambiguate("GM") == "GA"
    assert a.disambiguate("MA") == "MA"
    assert a.disambiguate("MT") == "MT"
    assert a.disambiguate("MC") == "AC"


def test_dcm_reverse_complement():
    a = METHYL_DCM_ALPHABET
    assert a.reverse_complement("") == ""
    assert a.reverse_complement("M") == "G"
    assert a.reverse_complement("MT") == "AG"
    assert a.reverse_complement("MTG") == "MAG"
    assert a.reverse_complement("MTGG") == "CMAG"
    assert a.reverse_complement("MA") == "TG"
    assert a.reverse_complement("MAG") == "MTG"
    assert a.reverse_complement("MAGG") == "CMTG"
    assert a.reverse_complement("CM") == "GG"
    assert a.reverse_complement("CCAGG") == "CCTGG"
    assert a.reverse_complement("CCTGG") == "CCAGG"
    assert a.reverse_complement("CMAGG") == "CMTGG"
    assert a.reverse_complement("CMTGG") == "CMAGG"


# --- GpC + misc --------------------------------------------------------------

def test_gpc_alphabet():
    a = METHYL_GPC_ALPHABET
    assert a.methylate("GC") == "GM"
    assert a.unmethylate("GM") == "GC"
    assert a.reverse_complement("GM") == "GM"


def test_motif_positions():
    a = METHYL_CPG_ALPHABET
    s = "ACGTTCGACG"
    assert a.motif_positions(s).tolist() == [1, 5, 8]
    assert a.is_motif_match(s, 1)
    assert not a.is_motif_match(s, 0)
    d = METHYL_DCM_ALPHABET
    s2 = "ACCAGGTCCTGGA"
    assert d.motif_positions(s2).tolist() == [1, 7]


def test_best_alphabet():
    assert best_alphabet("ACGT").name == "nucleotide"
    assert best_alphabet("ACGMT").name == "cpg"
    assert get_alphabet_by_name("dam").name == "dam"
    with pytest.raises(KeyError):
        get_alphabet_by_name("nope")


def test_reverse_complement_vectorized_matches_scan():
    """The vectorized M-containing reverse_complement (greedy full-match
    patches + tail scan) must byte-match the original per-position scan
    (nanopolish_alphabet.h:118-150 semantics) on random methylated
    sequences across all methylation alphabets."""
    from nanopolish_tpu.utils.alphabet import ALPHABETS, _match_to_site

    def scan_rc(alpha, s):
        out = ["A"] * len(s)
        i = 0
        j = len(s) - 1
        while i < len(s):
            ridx = -1
            match = None
            for kk, site_m in enumerate(alpha.recognition_sites_methylated):
                m = _match_to_site(s, i, site_m)
                if m.length > 0 and m.covers_methylated_site:
                    ridx = kk
                    match = m
                    break
            if ridx != -1:
                comp_site = alpha.recognition_sites_methylated_complement[ridx]
                for kk in range(match.offset, match.offset + match.length):
                    out[j] = comp_site[kk]
                    j -= 1
                    i += 1
            else:
                out[j] = alpha.complement(s[i])
                j -= 1
                i += 1
        return "".join(out)

    rng = np.random.default_rng(5)
    for alpha in ALPHABETS.values():
        if not alpha.recognition_sites:
            continue
        for trial in range(40):
            n = int(rng.integers(1, 80))
            s = "".join(rng.choice(list("ACGT"), size=n))
            s = alpha.methylate(s)
            assert alpha.reverse_complement(s) == scan_rc(alpha, s), \
                (alpha.name, s)


def test_methylated_window_slice_reuse_identity():
    """The call-methylation hot path reuses whole-read methylated kmer
    ranks for a window whenever methylate(sub) == methylate(whole)[a:b]
    (apps/call_methylation.py collect_read_tasks).  Property: under that
    guard, both rank directions and the rc sequence of the locally
    methylated window equal the corresponding slices of the whole-read
    arrays — for every methylation alphabet."""
    rng = np.random.default_rng(11)
    for alpha in (METHYL_CPG_ALPHABET, METHYL_DAM_ALPHABET,
                  METHYL_DCM_ALPHABET, METHYL_GPC_ALPHABET):
        k = 6
        reused = 0
        for trial in range(60):
            n = int(rng.integers(40, 200))
            ref = "".join(rng.choice(list("ACGT"), size=n))
            meth_ref = alpha.methylate(ref)
            rc_meth_ref = alpha.reverse_complement(meth_ref)
            meth_ranks = alpha.seq_to_kmer_ranks(meth_ref, k)
            rc_meth_ranks = alpha.seq_to_kmer_ranks(rc_meth_ref, k)
            a = int(rng.integers(0, n - k - 1))
            b = int(rng.integers(a + k, n))         # inclusive end
            sub = ref[a:b + 1]
            m_sub = alpha.methylate(sub)
            halo = max(len(x) for x in alpha.recognition_sites) - 1
            lh = max(0, a - halo)
            if not (m_sub == meth_ref[a:b + 1]
                    and meth_ref[lh:a] == ref[lh:a]
                    and meth_ref[b + 1:b + 1 + halo] == ref[b + 1:b + 1 + halo]):
                continue                            # guard rejects: local path
            reused += 1
            nk = b + 1 - a - k + 1
            s0 = n - 1 - b
            assert alpha.reverse_complement(m_sub) == \
                rc_meth_ref[s0:n - a], (alpha.name, ref, a, b)
            np.testing.assert_array_equal(
                alpha.seq_to_kmer_ranks(m_sub, k),
                meth_ranks[a:a + nk])
            np.testing.assert_array_equal(
                alpha.seq_to_kmer_ranks(
                    alpha.reverse_complement(m_sub), k)[::-1],
                rc_meth_ranks[s0:s0 + nk][::-1])
        assert reused > 10, alpha.name


def test_no_straddle_implies_window_methylation_is_slice():
    """apps/call_methylation.collect_read_tasks fast path: when no
    recognition-site match straddles a window boundary, methylating the
    window equals slicing the whole-sequence methylation (the greedy
    scan state is fresh at the boundary and all suppression is local)."""
    import numpy as np

    from nanopolish_tpu.utils.alphabet import get_alphabet_by_name

    rng = np.random.default_rng(0)

    def span_empty(arr, lo, hi):
        i = np.searchsorted(arr, lo, "left")
        return i >= len(arr) or arr[i] > hi

    checked = 0
    for name in ("cpg", "gpc", "dam", "dcm"):
        alpha = get_alphabet_by_name(name)
        rl = alpha.recognition_length
        for _ in range(60):
            n = 300
            s = list("".join(rng.choice(list("ACGT"), n)))
            site = alpha.recognition_sites[
                rng.integers(len(alpha.recognition_sites))]
            for _ in range(30):
                p = rng.integers(0, n - rl)
                s[p:p + rl] = site.replace("W", "AT"[rng.integers(2)])
            s = "".join(s)
            motif_arr = alpha.motif_positions(s)
            meth = alpha.methylate(s)
            for _ in range(15):
                a = int(rng.integers(0, n - 50))
                b = int(a + rng.integers(20, 50))
                if span_empty(motif_arr, a - rl + 1, a - 1) and \
                        span_empty(motif_arr, b - rl + 2, b):
                    assert alpha.methylate(s[a:b + 1]) == meth[a:b + 1]
                    checked += 1
    assert checked > 1000
