"""Haplotype coordinate-map semantics (port of the behaviors of
src/nanopolish_haplotype.cpp)."""

from nanopolish_tpu.io.vcf import Variant
from nanopolish_tpu.models.haplotype import Haplotype


def test_apply_snp():
    h = Haplotype("c", 100, "ACGTACGT")
    assert h.apply_variant(Variant(ref_name="c", ref_position=102,
                                   ref_seq="G", alt_seq="T"))
    assert h.get_sequence() == "ACTTACGT"
    assert h.get_reference() == "ACGTACGT"
    assert h.get_reference_position_for_haplotype_base(2) is None
    assert h.get_reference_position_for_haplotype_base(3) == 103


def test_apply_insertion_deletion():
    h = Haplotype("c", 10, "AACCGGTT")
    # insertion: C -> CTT at ref 12
    assert h.apply_variant(Variant(ref_name="c", ref_position=12,
                                   ref_seq="C", alt_seq="CTT"))
    assert h.get_sequence() == "AACTTCGGTT"
    # deletion: GG -> G at ref 14
    assert h.apply_variant(Variant(ref_name="c", ref_position=14,
                                   ref_seq="GG", alt_seq="G"))
    assert h.get_sequence() == "AACTTCGTT"


def test_apply_mismatching_variant_rejected():
    h = Haplotype("c", 0, "AAAA")
    assert not h.apply_variant(Variant(ref_name="c", ref_position=1,
                                       ref_seq="C", alt_seq="T"))
    assert h.get_sequence() == "AAAA"
    # position outside
    assert not h.apply_variant(Variant(ref_name="c", ref_position=10,
                                       ref_seq="A", alt_seq="T"))


def test_substr_by_reference_with_variants():
    h = Haplotype("c", 100, "ACGTACGTAC")
    h.apply_variant(Variant(ref_name="c", ref_position=103,
                            ref_seq="T", alt_seq="TGG"))
    sub = h.substr_by_reference(101, 106)
    assert sub.ref_position == 101
    assert sub.get_reference() == "CGTACG"
    assert sub.get_sequence() == "CGTGGACG"
    # ref positions consumed by an applied variant become inserted bases
    # (haplotype.cpp:60-68), so stacking another variant there is rejected
    assert not sub.apply_variant(Variant(ref_name="c", ref_position=103,
                                         ref_seq="T", alt_seq="A"))
    # a variant on an untouched base still applies
    assert sub.apply_variant(Variant(ref_name="c", ref_position=104,
                                     ref_seq="A", alt_seq="G"))
    assert sub.get_sequence() == "CGTGGGCG"
