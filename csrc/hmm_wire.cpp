// hmm_wire.cpp -- native builder for the profile-HMM packed wire.
//
// The scoring drain's kernel input is one [B, TP+3*KP+12] f32 row per
// segment (ops/pallas_profile_hmm._pack_hmm_inputs layout: ev | a |
// b2 | c0 | nev,nk (i32 bitcast) | trans[8] | clips[2]).  Building it
// in numpy costs two large fancy-gathers plus a pad/concat pass
// (~1.4 s per 512-read call-methylation batch); this routine writes
// each row in one pass from the drain's indirection form — whole-read
// level rows, rank rows, per-(read,strand,model) tables — with
// identical f32 values: inv/c0 are gathered from tables precomputed
// with the same np.float32 expressions, and b2 = mu*inv is the same
// f32 product the numpy path computes elementwise.

#include <algorithm>
#include <cstdint>
#include <cstring>

extern "C" {

void npt_build_hmm_wire(
    const float* lev_buf,
    const int32_t* rank_buf,
    const float* tabs,           // [3, n_tabs, S]: mu, inv, c0
    int64_t n_tabs, int64_t S,
    const int64_t* lev_pos,      // [n] absolute level start per segment
    const int64_t* estep, const int64_t* nev,
    const int64_t* rk_pos,       // [n] absolute rank start per segment
    const int64_t* rk_step, const int64_t* nk,
    const int64_t* tab_id,
    const float* trans8,         // [n, 8]
    const float* clips,          // [n, 2]
    const float* trans_pad,      // [8] default row for padding rows
    const int64_t* sel, int64_t nsel, int64_t B,
    int64_t TP, int64_t KP, float neg,
    float* wire) {               // [B, TP + 3*KP + 12], uninitialized
    const int64_t W = TP + 3 * KP + 12;
    for (int64_t r = 0; r < B; ++r) {
        float* row = wire + r * W;
        if (r >= nsel) {
            // padding row: zeros, c0 = NEG, nev=nk=1, default trans
            std::memset(row, 0, (size_t)(TP + 2 * KP) * sizeof(float));
            float* c0 = row + TP + 2 * KP;
            for (int64_t j = 0; j < KP; ++j) c0[j] = neg;
            float* tail = row + TP + 3 * KP;
            const int32_t one = 1;
            std::memcpy(tail, &one, 4);
            std::memcpy(tail + 1, &one, 4);
            for (int j = 0; j < 8; ++j) tail[2 + j] = trans_pad[j];
            tail[10] = 0.0f;
            tail[11] = 0.0f;
            continue;
        }
        const int64_t i = sel[r];
        const int64_t ne = nev[i], nkk = nk[i];
        // levels
        const float* lsrc = lev_buf + lev_pos[i];
        const int64_t es = estep[i];
        if (es == 1) {
            std::memcpy(row, lsrc, (size_t)ne * sizeof(float));
        } else {
            for (int64_t t = 0; t < ne; ++t) row[t] = lsrc[-t];
        }
        std::memset(row + ne, 0, (size_t)(TP - ne) * sizeof(float));
        // a = inv, b2 = mu*inv, c0 (NEG-padded)
        float* a = row + TP;
        float* b2 = a + KP;
        float* c0 = b2 + KP;
        const int32_t* rsrc = rank_buf + rk_pos[i];
        const int64_t rs = rk_step[i];
        const float* tmu = tabs + (size_t)tab_id[i] * S;
        const float* tinv = tabs + (size_t)(n_tabs + tab_id[i]) * S;
        const float* tc0 = tabs + (size_t)(2 * n_tabs + tab_id[i]) * S;
        for (int64_t j = 0; j < nkk; ++j) {
            const int32_t rk = rsrc[j * rs];
            a[j] = tinv[rk];
            b2[j] = tmu[rk] * tinv[rk];
            c0[j] = tc0[rk];
        }
        for (int64_t j = nkk; j < KP; ++j) {
            a[j] = 0.0f;
            b2[j] = 0.0f;
        }
        for (int64_t j = nkk; j < KP; ++j) c0[j] = neg;
        // tail: nev, nk (i32 bitcast), trans, clips
        float* tail = row + TP + 3 * KP;
        const int32_t ne32 = (int32_t)(ne > 0 ? ne : 1);
        const int32_t nk32 = (int32_t)(nkk > 0 ? nkk : 1);
        std::memcpy(tail, &ne32, 4);
        std::memcpy(tail + 1, &nk32, 4);
        std::memcpy(tail + 2, trans8 + i * 8, 8 * sizeof(float));
        tail[10] = clips[i * 2];
        tail[11] = clips[i * 2 + 1];
    }
}

}  // extern "C"

extern "C" {

// Compact "windows" wire: [B, KP+16] int32 — per-segment kmer ranks
// plus a 16-slot tail (nev, nk, trans8+clips2 bitcast, lev_pos, estep,
// tab, pad).  The level windows and table gathers happen ON DEVICE
// (ops/pallas_profile_hmm._assemble_windows) from whole-read level rows
// and per-read tables shipped once per batch — the flat wire shipped
// TP + 3*KP + 12 floats per segment where the unique payload is
// nk ints + 5 scalars (~6x h2d cut at call-methylation shapes).
void npt_build_hmm_wire_compact(
    const int32_t* rank_buf,
    const int64_t* lev_pos, const int64_t* estep, const int64_t* nev,
    const int64_t* rk_pos, const int64_t* rk_step, const int64_t* nk,
    const int64_t* tab_id,
    const float* trans8, const float* clips, const float* trans_pad,
    const int64_t* sel, int64_t nsel, int64_t B, int64_t KP,
    int32_t* wire) {                 // [B, KP+16], uninitialized
    const int64_t W = KP + 16;
    for (int64_t r = 0; r < B; ++r) {
        int32_t* row = wire + r * W;
        if (r >= nsel) {
            std::memset(row, 0, (size_t)W * sizeof(int32_t));
            row[KP] = 1;
            row[KP + 1] = 1;
            std::memcpy(row + KP + 2, trans_pad, 8 * sizeof(float));
            row[KP + 13] = 1;        // estep
            continue;
        }
        const int64_t i = sel[r];
        const int64_t nkk = nk[i];
        const int32_t* rsrc = rank_buf + rk_pos[i];
        const int64_t rs = rk_step[i];
        for (int64_t j = 0; j < nkk; ++j) row[j] = rsrc[j * rs];
        std::memset(row + nkk, 0, (size_t)(KP - nkk) * sizeof(int32_t));
        row[KP] = (int32_t)(nev[i] > 0 ? nev[i] : 1);
        row[KP + 1] = (int32_t)(nkk > 0 ? nkk : 1);
        std::memcpy(row + KP + 2, trans8 + i * 8, 8 * sizeof(float));
        std::memcpy(row + KP + 10, clips + i * 2, 2 * sizeof(float));
        row[KP + 12] = (int32_t)lev_pos[i];
        row[KP + 13] = (int32_t)estep[i];
        row[KP + 14] = (int32_t)tab_id[i];
        row[KP + 15] = 0;
    }
}

}  // extern "C"

extern "C" {

// Sequential first-fit of segments into KP-lane rows, new row on group
// change (segments pre-sorted group-major) — the Python loop ran at
// variants-screening volume (millions of segments per window).
void npt_pack_rows(const int32_t* ev_c, const int32_t* tr_c,
                   const int64_t* widths, int64_t n, int64_t KP,
                   int64_t* row_id, int64_t* lane_off) {
    int64_t row = 0, cur = 0;
    int32_t prev_e = -1, prev_x = -1;
    for (int64_t s = 0; s < n; ++s) {
        const int64_t w = widths[s];
        if (ev_c[s] != prev_e || tr_c[s] != prev_x || cur + w > KP) {
            if (s) ++row;
            cur = 0;
            prev_e = ev_c[s];
            prev_x = tr_c[s];
        }
        row_id[s] = row;
        lane_off[s] = cur;
        cur += w;
    }
}

}  // extern "C"

namespace {
inline int64_t pad_to(int64_t n, int64_t q) {
    const int64_t m = (n + q - 1) / q * q;
    return m > q ? m : q;
}
inline int64_t pad_pow2(int64_t n, int64_t lo = 8) {
    int64_t p = lo;
    while (p < n) p *= 2;
    return p;
}
}  // namespace

extern "C" {

// One-pass assembly of the packed screening drain's dispatch wire
// (ops/pallas_profile_hmm.forward_packed): unique event/rank rows,
// per-row metadata, the four lane maps and the section concatenation —
// the numpy version cost ~16 s of host time per 50 kb window.  ue keeps
// np.unique's ascending order (ev ids arrive sorted); ur uses
// first-seen order, which permutes rank_b rows and ur_inv consistently
// (a pure relabeling: the kernel gathers the same values).
// dims out: [E0, U0, Tc, Kc, B, E, U, R2, npad, total_len].
// Returns total_len, or -1 if wire_cap would be exceeded.
int64_t npt_fp_assemble(
    const int32_t* ev_c, const int32_t* tab_c, const int32_t* rk_c,
    const int32_t* tr_c,
    const int64_t* widths, const int64_t* rid, const int64_t* loff,
    int64_t n,
    const float* levels_all, int64_t lev_stride,
    const int32_t* nev_all,
    const int32_t* rank_all, int64_t rank_stride,
    const int32_t* nkm_all,
    const float* trans_all, int64_t r2_rows,
    const float* clips,            // [n, 2]
    int32_t* ur_mark, int32_t* ur_slot, int64_t mark_len, int32_t epoch,
    int64_t B0, int64_t KP, int64_t TP,
    int32_t* ue_buf, int32_t* ur_buf,      // capacity n each
    int32_t* ue_inv, int32_t* ur_inv,      // capacity n each
    float* wire, int64_t wire_cap,
    int64_t* dims) {
    // pass 1: uniques + maxes
    int64_t E0 = 0, U0 = 0;
    int32_t tc_max = 1, kc_max = 1;
    int32_t prev_ev = -1;
    for (int64_t s = 0; s < n; ++s) {
        const int32_t e = ev_c[s];
        if (e != prev_ev) {
            ue_buf[E0] = e;
            const int32_t ne = nev_all[e];
            if (ne > tc_max) tc_max = ne;
            prev_ev = e;
            ++E0;
        }
        ue_inv[s] = (int32_t)(E0 - 1);
        const int32_t r = rk_c[s];
        int32_t slot;
        if (ur_mark[r] == epoch) {
            slot = ur_slot[r];
        } else {
            ur_mark[r] = epoch;
            slot = (int32_t)U0;
            ur_slot[r] = slot;
            ur_buf[U0] = r;
            const int32_t nk = nkm_all[r];
            if (nk > kc_max) kc_max = nk;
            ++U0;
        }
        ur_inv[s] = slot;
    }
    (void)mark_len;
    const int64_t Tc = std::min<int64_t>(pad_to(tc_max, 64), TP);
    const int64_t Kc = pad_to(kc_max, 32);
    const int64_t B = pad_pow2(B0);
    const int64_t E = pad_pow2(E0);
    const int64_t U = pad_pow2(U0);
    const int64_t R2 = pad_pow2(r2_rows);
    const int64_t npad = pad_pow2(n);
    const int64_t total = E * Tc + E + U * Kc + R2 * 8 + B + B + 2 * B
        + 4 * B * KP + npad;
    dims[0] = E0; dims[1] = U0; dims[2] = Tc; dims[3] = Kc;
    dims[4] = B; dims[5] = E; dims[6] = U; dims[7] = R2;
    dims[8] = npad; dims[9] = total;
    if (total > wire_cap) return -1;

    float* p = wire;
    // levels [E, Tc]
    const int64_t ccopy = std::min(Tc, lev_stride);
    for (int64_t e = 0; e < E0; ++e) {
        std::memcpy(p + e * Tc, levels_all + (int64_t)ue_buf[e] * lev_stride,
                    (size_t)ccopy * sizeof(float));
        if (ccopy < Tc)
            std::memset(p + e * Tc + ccopy, 0,
                        (size_t)(Tc - ccopy) * sizeof(float));
    }
    std::memset(p + E0 * Tc, 0, (size_t)((E - E0) * Tc) * sizeof(float));
    p += E * Tc;
    // nev [E] (i32 bitcast)
    int32_t* ip = (int32_t*)p;
    for (int64_t e = 0; e < E0; ++e) ip[e] = nev_all[ue_buf[e]];
    std::memset(ip + E0, 0, (size_t)(E - E0) * 4);
    p += E;
    // ranks [U, Kc] (i32 bitcast)
    ip = (int32_t*)p;
    const int64_t rcopy = std::min(Kc, rank_stride);
    for (int64_t u = 0; u < U0; ++u) {
        std::memcpy(ip + u * Kc, rank_all + (int64_t)ur_buf[u] * rank_stride,
                    (size_t)rcopy * 4);
        if (rcopy < Kc)
            std::memset(ip + u * Kc + rcopy, 0, (size_t)(Kc - rcopy) * 4);
    }
    std::memset(ip + U0 * Kc, 0, (size_t)((U - U0) * Kc) * 4);
    p += U * Kc;
    // trans [R2, 8]
    std::memcpy(p, trans_all, (size_t)(r2_rows * 8) * sizeof(float));
    std::memset(p + r2_rows * 8, 0,
                (size_t)((R2 - r2_rows) * 8) * sizeof(float));
    p += R2 * 8;
    // row_ev, row_tr (i32), row_clip [B,2]
    int32_t* row_ev = (int32_t*)p;
    int32_t* row_tr = (int32_t*)(p + B);
    float* row_clip = p + 2 * B;
    std::memset(row_ev, 0, (size_t)B * 4);
    std::memset(row_tr, 0, (size_t)B * 4);
    std::memset(row_clip, 0, (size_t)(2 * B) * sizeof(float));
    // lane maps
    float* lane_base = p + 4 * B;
    int32_t* lane_rank = (int32_t*)lane_base;
    int32_t* lane_tab = (int32_t*)(lane_base + B * KP);
    int32_t* pos_w = (int32_t*)(lane_base + 2 * B * KP);
    int32_t* rev_w = (int32_t*)(lane_base + 3 * B * KP);
    std::memset(lane_rank, 0, (size_t)(B * KP) * 4);
    std::memset(lane_tab, 0, (size_t)(B * KP) * 4);
    std::memset(pos_w, 0xFF, (size_t)(B * KP) * 4);     // -1
    std::memset(rev_w, 0xFF, (size_t)(B * KP) * 4);
    float* seg_idx_f = lane_base + 4 * B * KP;
    int32_t* seg_idx = (int32_t*)seg_idx_f;
    for (int64_t s = 0; s < n; ++s) {
        const int64_t r = rid[s];
        row_ev[r] = ue_inv[s];
        row_tr[r] = tr_c[s];
        row_clip[2 * r] = clips[2 * s];
        row_clip[2 * r + 1] = clips[2 * s + 1];
        const int64_t w = widths[s];
        const int64_t base = r * KP + loff[s];
        for (int64_t j = 0; j < w; ++j) {
            lane_rank[base + j] = ur_inv[s];
            lane_tab[base + j] = tab_c[s];
            pos_w[base + j] = (int32_t)j;
            rev_w[base + j] = (int32_t)(w - 1 - j);
        }
        seg_idx[s] = (int32_t)(base + w - 1);
    }
    std::memset(seg_idx + n, 0, (size_t)(npad - n) * 4);
    return total;
}

}  // extern "C"
