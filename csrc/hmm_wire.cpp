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
