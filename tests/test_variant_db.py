"""Combinations enumerator + VariantGroup (ported behavior specs from
src/test/nanopolish_test.cpp:327-378)."""

import math

from nanopolish_tpu.io.vcf import Variant
from nanopolish_tpu.models.variant_db import (CO_WITH_REPLACEMENT,
                                              CO_WITHOUT_REPLACEMENT,
                                              VariantGroup, combinations)


def _strs(combos):
    return [",".join(str(i) for i in c) for c in combos]


def test_combinations_without_replacement():
    assert _strs(combinations(1, 1)) == ["0"]
    assert _strs(combinations(2, 1)) == ["0", "1"]
    assert _strs(combinations(2, 2)) == ["0,1"]
    assert _strs(combinations(3, 2)) == ["0,1", "0,2", "1,2"]
    assert _strs(combinations(4, 4)) == ["0,1,2,3"]
    n, k = 10, 4
    expect = math.factorial(n) // (math.factorial(k) * math.factorial(n - k))
    assert len(combinations(n, k)) == expect


def test_combinations_with_replacement():
    assert _strs(combinations(1, 1, CO_WITH_REPLACEMENT)) == ["0"]
    assert _strs(combinations(2, 1, CO_WITH_REPLACEMENT)) == ["0", "1"]
    assert _strs(combinations(2, 2, CO_WITH_REPLACEMENT)) == \
        ["0,0", "0,1", "1,1"]
    assert _strs(combinations(3, 2, CO_WITH_REPLACEMENT)) == \
        ["0,0", "0,1", "0,2", "1,1", "1,2", "2,2"]


def test_variant_group_scores():
    vs = [Variant(ref_name="c", ref_position=i, ref_seq="A", alt_seq="T")
          for i in (5, 9)]
    g = VariantGroup(0, vs)
    c0 = g.add_combination([])
    c1 = g.add_combination([0])
    c2 = g.add_combination([0, 1])
    g.set_read_strand("r1:0", False)
    g.set_read_strand("r2:0", True)
    for ci, s1, s2 in ((c0, -10.0, -12.0), (c1, -8.0, -11.0),
                       (c2, -9.0, -7.0)):
        g.set_combination_read_score(ci, "r1:0", s1)
        g.set_combination_read_score(ci, "r2:0", s2)
    sums = dict(g.get_read_sum_scores())
    # logsumexp over combinations per read
    expect_r1 = math.log(math.exp(-10) + math.exp(-8) + math.exp(-9))
    assert abs(sums["r1:0"] - expect_r1) < 1e-9
    assert g.is_read_rc("r2:0") and not g.is_read_rc("r1:0")
    assert g.get_variants(g.get_combination(c2)) == vs
