"""ctypes loader for the native host library (csrc/).

The native layer owns the host-sequential inner loops: scrappie-style peak
detection and per-read DP backtracks.  If the shared library is absent we
attempt a one-shot `make`; failing that, callers fall back to NumPy/Python
implementations (same semantics, slower).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIB_PATH = os.path.join(_PKG_DIR, "data", "libnanopolish_tpu.so")
_CSRC_DIR = os.path.join(os.path.dirname(_PKG_DIR), "csrc")

_lock = threading.Lock()
_lib_wrapper = None
_load_attempted = False


class NativeLib:
    def __init__(self, cdll: ctypes.CDLL):
        self._lib = cdll
        f = cdll.npt_peak_detect
        f.restype = ctypes.c_int64
        f.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int64),
        ]
        g = cdll.npt_banded_backtrack
        g.restype = ctypes.c_int64
        g.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        i64_ = ctypes.c_int64
        p64_ = ctypes.POINTER(ctypes.c_int64)
        p32_ = ctypes.POINTER(ctypes.c_int32)
        pf_ = ctypes.POINTER(ctypes.c_float)
        pd_ = ctypes.POINTER(ctypes.c_double)
        pu8_ = ctypes.POINTER(ctypes.c_uint8)
        fe = getattr(cdll, "npt_format_eventalign_rows", None)
        if fe is not None:
            fe.restype = i64_
            fe.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char,
                ctypes.c_char_p, i64_, ctypes.c_char_p, i64_, i64_,
                p64_, p64_, p64_, pu8_,
                pf_, pf_, pf_, pf_, pf_, pf_,
                i64_, ctypes.c_char_p, i64_,
            ]
        fm = getattr(cdll, "npt_format_methylation_rows", None)
        if fm is not None:
            fm.restype = i64_
            fm.argtypes = [
                ctypes.c_char_p, ctypes.c_char, ctypes.c_char_p,
                ctypes.c_char_p,
                p64_, p64_, pd_, pd_, p64_, p64_, p64_, p64_,
                i64_, ctypes.c_char_p, i64_,
            ]
        self._build_hmm_wire = getattr(cdll, "npt_build_hmm_wire", None)
        if self._build_hmm_wire is not None:
            w = self._build_hmm_wire
            w.restype = None
            w.argtypes = [
                pf_, p32_, pf_, i64_, i64_,
                p64_, p64_, p64_,
                p64_, p64_, p64_, p64_,
                pf_, pf_, pf_,
                p64_, i64_, i64_,
                i64_, i64_, ctypes.c_float,
                pf_,
            ]
        self._build_hmm_wire_compact = getattr(
            cdll, "npt_build_hmm_wire_compact", None)
        if self._build_hmm_wire_compact is not None:
            wc = self._build_hmm_wire_compact
            wc.restype = None
            wc.argtypes = [
                p32_,
                p64_, p64_, p64_,
                p64_, p64_, p64_, p64_,
                pf_, pf_, pf_,
                p64_, i64_, i64_, i64_,
                p32_,
            ]
        self._pack_rows = getattr(cdll, "npt_pack_rows", None)
        if self._pack_rows is not None:
            pr = self._pack_rows
            pr.restype = None
            pr.argtypes = [p32_, p32_, p64_, i64_, i64_, p64_, p64_]
        self._fp_assemble = getattr(cdll, "npt_fp_assemble", None)
        if self._fp_assemble is not None:
            fa = self._fp_assemble
            fa.restype = i64_
            fa.argtypes = [
                p32_, p32_, p32_, p32_,
                p64_, p64_, p64_, i64_,
                pf_, i64_, p32_,
                p32_, i64_, p32_,
                pf_, i64_, pf_,
                p32_, p32_, i64_, ctypes.c_int32,
                i64_, i64_, i64_,
                p32_, p32_, p32_, p32_,
                pf_, i64_, p64_,
            ]
        self._meth_geometry = getattr(cdll, "npt_meth_geometry", None)
        if self._meth_geometry is not None:
            m = self._meth_geometry
            m.restype = ctypes.c_int64
            m.argtypes = [
                ctypes.c_char_p, i64_,                  # ref_seq
                p64_, i64_,                             # pairs
                i64_, i64_, i64_,                       # ref_start/region
                i64_, i64_, i64_, i64_,                 # sep/flank/k/rc
                ctypes.c_double,                        # max_ratio
                ctypes.c_char_p, i64_, ctypes.c_char_p,  # bases/size/compl
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
                i64_, i64_,                             # n_sites, rl
                i64_, i64_,                             # cap_groups, k_cap
                p64_, p64_, p64_, p64_,                 # e1/estep/nev/nk
                p32_, p32_,                             # ranks_u/m
                p64_, p64_, p64_, p64_, p64_,           # positions/meta
            ]

    def pack_rows(self, ev_c, tr_c, widths, KP):
        """First-fit row packing (csrc npt_pack_rows); identical to the
        Python loop in ops/pallas_profile_hmm._pack_rows."""
        n = len(widths)
        row_id = np.empty(n, np.int64)
        lane_off = np.empty(n, np.int64)
        p64 = ctypes.POINTER(ctypes.c_int64)
        p32 = ctypes.POINTER(ctypes.c_int32)
        self._pack_rows(
            np.ascontiguousarray(ev_c, np.int32).ctypes.data_as(p32),
            np.ascontiguousarray(tr_c, np.int32).ctypes.data_as(p32),
            np.ascontiguousarray(widths, np.int64).ctypes.data_as(p64),
            n, KP, row_id.ctypes.data_as(p64),
            lane_off.ctypes.data_as(p64))
        return row_id, lane_off

    def build_hmm_wire(self, lev_buf, rank_buf, tabs, lev_pos, estep, nev,
                       rk_pos, rk_step, nk, tab_id, trans8, clips,
                       trans_pad, sel, B, TP, KP, neg, wire):
        """Fill one packed profile-HMM wire chunk (csrc/hmm_wire.cpp);
        f32-identical to _pack_hmm_inputs over the gathered matrices."""
        pf = ctypes.POINTER(ctypes.c_float)
        p64 = ctypes.POINTER(ctypes.c_int64)
        p32 = ctypes.POINTER(ctypes.c_int32)
        self._build_hmm_wire(
            lev_buf.ctypes.data_as(pf), rank_buf.ctypes.data_as(p32),
            tabs.ctypes.data_as(pf), tabs.shape[1], tabs.shape[2],
            lev_pos.ctypes.data_as(p64), estep.ctypes.data_as(p64),
            nev.ctypes.data_as(p64), rk_pos.ctypes.data_as(p64),
            rk_step.ctypes.data_as(p64), nk.ctypes.data_as(p64),
            tab_id.ctypes.data_as(p64), trans8.ctypes.data_as(pf),
            clips.ctypes.data_as(pf), trans_pad.ctypes.data_as(pf),
            sel.ctypes.data_as(p64), len(sel), B, TP, KP,
            ctypes.c_float(neg), wire.ctypes.data_as(pf))

    def build_hmm_wire_compact(self, rank_buf, lev_pos, estep, nev,
                               rk_pos, rk_step, nk, tab_id, trans8, clips,
                               trans_pad, sel, B, KP, wire):
        """Fill one compact 'windows' wire chunk ([B, KP+16] int32)."""
        pf = ctypes.POINTER(ctypes.c_float)
        p64 = ctypes.POINTER(ctypes.c_int64)
        p32 = ctypes.POINTER(ctypes.c_int32)
        self._build_hmm_wire_compact(
            rank_buf.ctypes.data_as(p32),
            lev_pos.ctypes.data_as(p64), estep.ctypes.data_as(p64),
            nev.ctypes.data_as(p64), rk_pos.ctypes.data_as(p64),
            rk_step.ctypes.data_as(p64), nk.ctypes.data_as(p64),
            tab_id.ctypes.data_as(p64), trans8.ctypes.data_as(pf),
            clips.ctypes.data_as(pf), trans_pad.ctypes.data_as(pf),
            sel.ctypes.data_as(p64), len(sel), B, KP,
            wire.ctypes.data_as(p32))

    def format_eventalign_rows(self, ref_name: str, who: str,
                               strand_ch: str, seq: str, rcq: str, rc: bool,
                               k: int, rp, pos0, ev, is_b, em, es, ed,
                               mm, ms, sd) -> Optional[str]:
        """Native eventalign TSV row formatter (csrc/tsv_format.cpp);
        byte-identical to the Python f-string emitter.  None when the
        symbol is unavailable."""
        fn = getattr(self._lib, "npt_format_eventalign_rows", None)
        if fn is None:
            return None
        n = len(rp)
        cap = n * (64 + 2 * k + len(ref_name) + len(who)) + 1024
        out = ctypes.create_string_buffer(cap)
        P64 = ctypes.POINTER(ctypes.c_int64)
        PF = ctypes.POINTER(ctypes.c_float)
        P8 = ctypes.POINTER(ctypes.c_uint8)
        a64 = lambda a: np.ascontiguousarray(a, np.int64).ctypes.data_as(P64)
        af = lambda a: np.ascontiguousarray(a, np.float32).ctypes.data_as(PF)
        fn.restype = ctypes.c_int64
        wrote = fn(ref_name.encode(), who.encode(),
                   ctypes.c_char(strand_ch.encode()),
                   seq.encode(), len(seq),
                   rcq.encode() if rcq else b"", int(rc), k,
                   a64(rp), a64(pos0), a64(ev),
                   np.ascontiguousarray(is_b, np.uint8).ctypes.data_as(P8),
                   af(em), af(es), af(ed), af(mm), af(ms), af(sd),
                   n, out, cap)
        if wrote < 0:
            return None
        return out.raw[:wrote].decode("ascii")

    def format_methylation_rows(self, chrom: str, orientation: str,
                                qname: str, ref_seq: str, cols
                                ) -> Optional[str]:
        """Native call-methylation TSV row formatter; byte-identical to
        write_read_sites_cols' f-strings."""
        fn = getattr(self._lib, "npt_format_methylation_rows", None)
        if fn is None:
            return None
        n = len(cols["pos"])
        max_seq = int((cols["seq_hi"] - cols["seq_lo"]).max()) if n else 0
        cap = n * (64 + max_seq + len(chrom) + len(qname)) + 1024
        out = ctypes.create_string_buffer(cap)
        P64 = ctypes.POINTER(ctypes.c_int64)
        PD = ctypes.POINTER(ctypes.c_double)
        a64 = lambda a: np.ascontiguousarray(a, np.int64).ctypes.data_as(P64)
        ad = lambda a: np.ascontiguousarray(
            a, np.float64).ctypes.data_as(PD)
        fn.restype = ctypes.c_int64
        wrote = fn(chrom.encode(), ctypes.c_char(orientation.encode()),
                   qname.encode(), ref_seq.encode(),
                   a64(cols["pos"]), a64(cols["end"]),
                   ad(cols["sum_u"]), ad(cols["sum_m"]),
                   a64(cols["strands"]), a64(cols["n_motif"]),
                   a64(cols["seq_lo"]), a64(cols["seq_hi"]),
                   n, out, cap)
        if wrote < 0:
            return None
        return out.raw[:wrote].decode("ascii")

    def meth_geometry(self, ref_seq: str, pairs: np.ndarray,
                      ref_start_pos: int, region_start: int, region_end: int,
                      min_separation: int, min_flank: int, k: int, rc: bool,
                      max_ratio: float, alphabet, k_cap: int = 256):
        """One-call per-(read, strand) methylation task geometry
        (csrc/meth_geometry.cpp).  Returns a dict of group arrays with
        zero-padded [ng, k_cap] rank matrices, or None when the native
        routine declines (capacity exceeded) — callers fall back to the
        Python array path."""
        if self._meth_geometry is None:
            return None
        n_ref = len(ref_seq)
        pairs = np.ascontiguousarray(pairs, dtype=np.int64)
        cap = n_ref // (min_separation + 1) + 2
        # one int64 block for the 9 scalar outputs; two rank matrices
        meta = np.empty((9, cap), np.int64)
        ranks_u = np.empty((cap, k_cap), np.int32)
        ranks_m = np.empty((cap, k_cap), np.int32)
        # encoded alphabet spec, cached on the (frozen) alphabet object
        spec = getattr(alphabet, "_native_spec", None)
        if spec is None:
            spec = (alphabet.bases.encode("ascii"), len(alphabet.bases),
                    alphabet.complements.encode("ascii"),
                    "".join(alphabet.recognition_sites).encode("ascii"),
                    "".join(alphabet.recognition_sites_methylated
                            ).encode("ascii"),
                    "".join(alphabet.recognition_sites_methylated_complement
                            ).encode("ascii"),
                    len(alphabet.recognition_sites),
                    alphabet.recognition_length)
            object.__setattr__(alphabet, "_native_spec", spec)
        P64 = ctypes.POINTER(ctypes.c_int64)
        P32 = ctypes.POINTER(ctypes.c_int32)
        base = meta.ctypes.data

        def mrow(i):
            return ctypes.cast(base + i * cap * 8, P64)

        ng = self._meth_geometry(
            ref_seq.encode("ascii"), n_ref,
            pairs.ctypes.data_as(P64), pairs.shape[0],
            ref_start_pos, region_start, region_end,
            min_separation, min_flank, k, int(rc),
            float(max_ratio),
            spec[0], spec[1], spec[2], spec[3], spec[4], spec[5],
            spec[6], spec[7],
            cap, k_cap,
            mrow(0), mrow(1), mrow(2), mrow(3),
            ranks_u.ctypes.data_as(P32), ranks_m.ctypes.data_as(P32),
            mrow(4), mrow(5), mrow(6), mrow(7), mrow(8))
        if ng < 0:
            return None
        return {"ng": int(ng), "e1": meta[0, :ng], "estep": meta[1, :ng],
                "nev": meta[2, :ng], "nk": meta[3, :ng],
                "ranks_u": ranks_u[:ng], "ranks_m": ranks_m[:ng],
                "start_pos": meta[4, :ng], "end_pos": meta[5, :ng],
                "n_motif": meta[6, :ng], "seq_lo": meta[7, :ng],
                "seq_hi": meta[8, :ng], "k_cap": k_cap}

    def peak_detect(self, tstat1: np.ndarray, tstat2: np.ndarray,
                    wl1: int, wl2: int, th1: float, th2: float,
                    peak_height: float) -> np.ndarray:
        t1 = np.ascontiguousarray(tstat1, dtype=np.float32)
        t2 = np.ascontiguousarray(tstat2, dtype=np.float32)
        n = len(t1)
        out = np.empty(n, dtype=np.int64)
        cnt = self._lib.npt_peak_detect(
            t1.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            t2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, wl1, wl2, th1, th2, peak_height,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out[:cnt]

    def banded_backtrack(self, trace: np.ndarray, band_ll_event: np.ndarray,
                         band_ll_kmer: np.ndarray, start_event: int, start_kmer: int):
        trace = np.ascontiguousarray(trace, dtype=np.uint8)
        lle = np.ascontiguousarray(band_ll_event, dtype=np.int32)
        llk = np.ascontiguousarray(band_ll_kmer, dtype=np.int32)
        n_bands, bandwidth = trace.shape
        max_out = 2 * (n_bands + 2)
        out_k = np.empty(max_out, dtype=np.int32)
        out_e = np.empty(max_out, dtype=np.int32)
        cnt = self._lib.npt_banded_backtrack(
            trace.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n_bands, bandwidth,
            lle.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            llk.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            start_event, start_kmer,
            out_k.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_e.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_out)
        if cnt < 0:
            raise RuntimeError("banded_backtrack overflow")
        return out_k[:cnt], out_e[:cnt]


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _CSRC_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_native_lib() -> Optional[NativeLib]:
    global _lib_wrapper, _load_attempted
    if _lib_wrapper is not None or _load_attempted:
        return _lib_wrapper
    with _lock:
        if _lib_wrapper is not None or _load_attempted:
            return _lib_wrapper
        _load_attempted = True
        if not os.path.exists(_LIB_PATH) and os.path.isdir(_CSRC_DIR):
            _try_build()
        if os.path.exists(_LIB_PATH):
            try:
                _lib_wrapper = NativeLib(ctypes.CDLL(_LIB_PATH))
            except OSError:
                _lib_wrapper = None
    return _lib_wrapper
