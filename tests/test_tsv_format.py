"""The native eventalign row formatter must be byte-identical to Python
f-string formatting — including decimal ties, signed zeros, and
non-finite values (csrc/tsv_format.cpp's fixed-decimal emitters fall
back to snprintf exactly when fast rounding could differ)."""

import numpy as np
import pytest

from nanopolish_tpu.utils.native import get_native_lib


@pytest.mark.parametrize("seed", [0, 1])
def test_format_eventalign_rows_matches_python(seed):
    lib = get_native_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(seed)
    n = 50000
    k = 6
    seq = "ACGTAC" * ((n + 400) // 6)
    rp = rng.integers(0, 1000000, n)
    pos0 = rng.integers(0, 100, n)
    ev = rng.integers(0, 10000000, n)
    is_b = rng.random(n) < 0.1
    em = np.concatenate([
        rng.normal(90, 30, n - 8).astype(np.float32),
        np.array([0.0, -0.0, 0.005, -0.005, 0.125, 123.455, 1e9, -1e9],
                 np.float32)])
    es = (rng.normal(2, 1, n) * rng.choice([1, -1, 0], n)).astype(np.float32)
    ed = (rng.integers(0, 400, n) / 4000.0).astype(np.float32)
    mm = rng.normal(90, 30, n).astype(np.float32)
    ms = np.abs(rng.normal(2, 1, n)).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        sd = ((em - mm) / ms).astype(np.float32)
    sd[::1000] = np.inf
    sd[1::1000] = -np.inf
    sd[2::1000] = np.nan
    res = lib.format_eventalign_rows("tig1", "r77", "t", seq, "", False, k,
                                     rp, pos0, ev, is_b, em, es, ed,
                                     mm, ms, sd)
    assert res is not None
    lines = res.splitlines()
    assert len(lines) == n
    nk = "N" * k
    check = rng.choice(n, 8000, replace=False)
    for i in check:
        p = int(pos0[i])
        rk = seq[p:p + k]
        mk = nk if is_b[i] else rk
        exp = (f"tig1\t{rp[i]}\t{rk}\tr77\tt\t{ev[i]}\t"
               f"{float(em[i]):.2f}\t{float(es[i]):.3f}\t"
               f"{float(ed[i]):.5f}\t{mk}\t{float(mm[i]):.2f}\t"
               f"{float(ms[i]):.2f}\t{float(sd[i]):.2f}")
        assert lines[i] == exp, (i, lines[i], exp)
