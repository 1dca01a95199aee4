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
