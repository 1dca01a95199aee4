"""The indexed Forward drain (ops/pallas_profile_hmm.forward_indexed)
must produce bit-identical scores to the flat wire path — the device
gathers reproduce _pack_hmm_inputs' f32 expressions from the same
host tables, so any difference is a wiring bug."""

import numpy as np

from nanopolish_tpu.ops.pallas_profile_hmm import (_np_transitions,
                                                   forward_indexed,
                                                   profile_hmm_forward_pallas)
from nanopolish_tpu.ops.profile_hmm import (HAF_ALLOW_POST_CLIP,
                                            HAF_ALLOW_PRE_CLIP)

FLAGS = HAF_ALLOW_PRE_CLIP | HAF_ALLOW_POST_CLIP


def test_forward_indexed_matches_flat():
    rng = np.random.default_rng(12)
    S = 4096
    R = 3                                # three read tables
    tabs = np.zeros((3, R, S), np.float32)
    tabs[0] = rng.normal(100, 12, (R, S)).astype(np.float32)
    tabs[1] = (np.abs(rng.normal(2, 0.3, (R, S))) + 0.5).astype(np.float32)
    tabs[2] = np.log(np.maximum(tabs[1], 1e-30))

    E, U = 4, 5
    n_ev_u = rng.integers(20, 60, E).astype(np.int32)
    Tc = int(n_ev_u.max())
    levels_u = rng.normal(100, 12, (E, Tc)).astype(np.float32)
    n_km_u = rng.integers(8, 24, U).astype(np.int32)
    Kc = int(n_km_u.max())
    rank_mat = rng.integers(0, S, (U, Kc)).astype(np.int32)
    epb_u = np.array([2.0, 2.4], np.float32)
    trans_u = _np_transitions(epb_u, 1.0)

    n = 24
    ids = np.stack([rng.integers(0, E, n), rng.integers(0, R, n),
                    rng.integers(0, U, n), rng.integers(0, 2, n)],
                   axis=1).astype(np.int32)
    flags = np.full(n, FLAGS, np.int32)

    got = forward_indexed(levels_u, n_ev_u, tabs, rank_mat, n_km_u,
                          trans_u, ids, flags)

    # flat path on the same kernel: expand per-segment matrices
    lev = levels_u[ids[:, 0]]
    nev = n_ev_u[ids[:, 0]]
    nkm = n_km_u[ids[:, 2]]
    mu = np.zeros((n, Kc), np.float32)
    sg = np.ones((n, Kc), np.float32)
    for i in range(n):
        rk = rank_mat[ids[i, 2], :nkm[i]]
        mu[i, :nkm[i]] = tabs[0, ids[i, 1]][rk]
        sg[i, :nkm[i]] = tabs[1, ids[i, 1]][rk]
    epb = epb_u[ids[:, 3]]
    want = profile_hmm_forward_pallas(lev, nev, mu, sg,
                                      np.log(np.maximum(sg, 1e-30)), nkm,
                                      epb, flags)
    assert np.array_equal(np.asarray(got).view(np.int32),
                          np.asarray(want).view(np.int32)), \
        np.abs(got - want).max()


def test_forward_packed_matches_flat():
    """The packed drain (many segments per lane row, segmented K-chain)
    must match the flat kernel within the flat-vs-scan tolerance (its
    per-segment logsumexp max rounds differently than the flat row-wide
    max, so bit-equality is not expected)."""
    from nanopolish_tpu.ops.pallas_profile_hmm import forward_packed

    rng = np.random.default_rng(13)
    S = 4096
    R = 3
    tabs = np.zeros((3, R, S), np.float32)
    tabs[0] = rng.normal(100, 12, (R, S)).astype(np.float32)
    tabs[1] = (np.abs(rng.normal(2, 0.3, (R, S))) + 0.5).astype(np.float32)
    tabs[2] = np.log(np.maximum(tabs[1], 1e-30))

    E, U = 5, 9
    n_ev_u = rng.integers(20, 70, E).astype(np.int32)
    Tc = int(n_ev_u.max())
    levels_u = rng.normal(100, 12, (E, Tc)).astype(np.float32)
    # widths spanning 1..Kc including degenerate single-kmer segments
    n_km_u = np.array([1, 2, 8, 11, 16, 17, 16, 24, 15], np.int32)
    Kc = int(n_km_u.max())
    rank_mat = rng.integers(0, S, (U, Kc)).astype(np.int32)
    epb_u = np.array([2.0, 2.4], np.float32)
    trans_u = _np_transitions(epb_u, 0.9)

    # screening-shaped workload: each (ev, trans) group scores ~10
    # sequence alternatives — many segments share one event row
    n = 160
    grp_ev = rng.integers(0, E, 16)
    grp_tr = rng.integers(0, 2, 16)
    ids = np.stack([np.repeat(grp_ev, 10), rng.integers(0, R, n),
                    rng.integers(0, U, n), np.repeat(grp_tr, 10)],
                   axis=1).astype(np.int32)
    flags = np.full(n, FLAGS, np.int32)

    got = forward_packed(levels_u, n_ev_u, tabs, rank_mat, n_km_u,
                         trans_u, ids, flags)

    nkm = n_km_u[ids[:, 2]]
    mu = np.zeros((n, Kc), np.float32)
    sg = np.ones((n, Kc), np.float32)
    for i in range(n):
        rk = rank_mat[ids[i, 2], :nkm[i]]
        mu[i, :nkm[i]] = tabs[0, ids[i, 1]][rk]
        sg[i, :nkm[i]] = tabs[1, ids[i, 1]][rk]
    want = profile_hmm_forward_pallas(
        levels_u[ids[:, 0]], n_ev_u[ids[:, 0]], mu, sg,
        np.log(np.maximum(sg, 1e-30)), nkm, epb_u[ids[:, 3]], flags,
        indel_bias=0.9)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=0)


def test_forward_packed_matches_scan_oracle():
    """Packed scores also check against the exact lax.scan port at the
    kernel-family tolerance."""
    from nanopolish_tpu.ops.pallas_profile_hmm import forward_packed
    from nanopolish_tpu.ops.profile_hmm import profile_hmm_forward

    rng = np.random.default_rng(14)
    S = 512
    tabs = np.zeros((3, 1, S), np.float32)
    tabs[0] = rng.normal(100, 12, (1, S)).astype(np.float32)
    tabs[1] = (np.abs(rng.normal(2, 0.3, (1, S))) + 0.5).astype(np.float32)
    tabs[2] = np.log(np.maximum(tabs[1], 1e-30))
    n_ev_u = np.array([37, 52], np.int32)
    Tc = int(n_ev_u.max())
    levels_u = rng.normal(100, 12, (2, Tc)).astype(np.float32)
    n_km_u = np.array([16, 17, 15, 12], np.int32)
    Kc = int(n_km_u.max())
    rank_mat = rng.integers(0, S, (4, Kc)).astype(np.int32)
    trans_u = _np_transitions(np.array([2.1], np.float32), 1.0)

    n = 8
    ids = np.stack([np.repeat(np.arange(2), 4), np.zeros(n),
                    np.tile(np.arange(4), 2), np.zeros(n)],
                   axis=1).astype(np.int32)
    flags = np.full(n, FLAGS, np.int32)
    got = forward_packed(levels_u, n_ev_u, tabs, rank_mat, n_km_u,
                         trans_u, ids, flags)

    for i in range(n):
        nk = int(n_km_u[ids[i, 2]])
        rk = rank_mat[ids[i, 2], :nk]
        mu = tabs[0, 0][rk][None]
        sg = tabs[1, 0][rk][None]
        ne = int(n_ev_u[ids[i, 0]])
        want = profile_hmm_forward(
            levels_u[ids[i, 0], :ne][None], np.array([ne], np.int32),
            mu, sg, np.log(np.maximum(sg, 1e-30)),
            np.array([nk], np.int32), np.array([2.1], np.float32),
            flags=FLAGS, indel_bias=1.0)
        assert abs(float(got[i]) - float(np.asarray(want)[0])) < 2e-3, \
            (i, float(got[i]), float(np.asarray(want)[0]))


def test_native_fp_assembler_matches_numpy_build():
    """csrc npt_fp_assemble (one-pass packed-wire assembly) must yield
    identical scores to the numpy build path (ur rows are a consistent
    relabeling; gathered values — hence scores — are equal)."""
    import numpy as np

    from nanopolish_tpu.ops import pallas_profile_hmm as pp
    from nanopolish_tpu.utils import native

    lib = native.get_native_lib()
    if lib is None or lib._fp_assemble is None:
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    E, U, R2 = 50, 90, 7
    Tc, Kc = 96, 48
    levels_u = rng.normal(100, 10, (E, Tc)).astype(np.float32)
    n_ev_u = rng.integers(20, Tc, E).astype(np.int32)
    rank_mat = rng.integers(0, 4096, (U, Kc)).astype(np.int32)
    n_km_u = rng.integers(8, 17, U).astype(np.int32)
    tabs = np.stack([rng.normal(100, 10, (9, 4096)),
                     rng.uniform(1, 2, (9, 4096)),
                     rng.normal(0, 1, (9, 4096))]).astype(np.float32)
    trans_u = rng.normal(-1, 0.1, (R2, 8)).astype(np.float32)
    n = 4000
    ids = np.stack([rng.integers(0, E, n), rng.integers(0, 9, n),
                    rng.integers(0, U, n), rng.integers(0, R2, n)],
                   axis=1).astype(np.int32)
    flags = np.full(n, 3, np.int32)
    got = pp.forward_packed(levels_u, n_ev_u, tabs, rank_mat, n_km_u,
                            trans_u, ids, flags)
    fa, prr = lib._fp_assemble, lib._pack_rows
    lib._fp_assemble = None
    lib._pack_rows = None
    try:
        want = pp.forward_packed(levels_u, n_ev_u, tabs, rank_mat,
                                 n_km_u, trans_u, ids, flags)
    finally:
        lib._fp_assemble, lib._pack_rows = fa, prr
    np.testing.assert_array_equal(got, want)
