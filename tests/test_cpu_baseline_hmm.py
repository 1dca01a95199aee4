"""csrc/cpu_profile_hmm.cpp (the CPU e2e-baseline Forward) must compute
the same Forward scores as ops/profile_hmm.profile_hmm_forward — it is a
cost-model proxy, but a proxy that does the WRONG work would make the
vs_cpu denominators meaningless.  The proxy uses the reference's
table-based p7_FLogsum (nanopolish_common.h:96-105), so the comparison
runs the scan port in NPT_LOGSUM=table mode; tolerance covers
summation-order float differences only."""

import ctypes

import numpy as np
import pytest

from nanopolish_tpu.ops.profile_hmm import (HAF_ALLOW_POST_CLIP,
                                            HAF_ALLOW_PRE_CLIP,
                                            profile_hmm_forward)
from nanopolish_tpu.utils.native import get_native_lib


def _cpu_forward():
    lib = get_native_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    f = lib._lib.npt_cpu_profile_hmm_forward
    f.restype = ctypes.c_float
    f.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_float, ctypes.c_int32,
    ]

    def call(levels, mu, sigma, epb, flags):
        ls = np.log(sigma)
        p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))  # noqa: E731
        return f(p(levels), len(levels), p(mu), p(sigma), p(ls), len(mu),
                 epb, flags)
    return call


@pytest.mark.parametrize("flags", [
    0, HAF_ALLOW_PRE_CLIP, HAF_ALLOW_POST_CLIP,
    HAF_ALLOW_PRE_CLIP | HAF_ALLOW_POST_CLIP])
def test_cpu_forward_matches_scan_port(flags):
    call = _cpu_forward()
    rng = np.random.default_rng(42 + flags)
    for _ in range(6):
        T = int(rng.integers(20, 120))
        K = int(rng.integers(8, 50))
        mu = rng.normal(100, 12, K).astype(np.float32)
        sigma = (np.abs(rng.normal(2, 0.3, K)) + 0.5).astype(np.float32)
        pos = np.clip(np.arange(T) * K // T, 0, K - 1)
        levels = (mu[pos] + rng.normal(0, 1.5, T)).astype(np.float32)
        epb = float(T) / K

        got = call(levels, mu, sigma, epb, flags)
        import os
        os.environ["NPT_LOGSUM"] = "table"
        try:
            want = profile_hmm_forward(
                levels[None], np.array([T], np.int32), mu[None], sigma[None],
                np.log(sigma)[None], np.array([K], np.int32),
                np.array([epb], np.float32), flags=flags)
        finally:
            del os.environ["NPT_LOGSUM"]
        want = float(np.asarray(want)[0])
        assert got == pytest.approx(want, abs=5e-3), (T, K, flags)
