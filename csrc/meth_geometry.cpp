// meth_geometry.cpp -- native per-read task geometry for call-methylation.
//
// One call produces everything the scoring drain needs for one
// (read, strand): motif groups, event bounds + QC, and the final
// unmethylated/methylated k-mer rank rows for every surviving group.
// The Python array path (apps/call_methylation.py collect_read_tasks_arrays)
// computes the same quantities with ~30 small-numpy calls per read; this
// routine is its drop-in replacement on the hot path (~20 us/read vs
// ~1 ms), parity-pinned by tests/test_call_methylation_e2e.py.
//
// Behavioral spec (all semantics must match bit-for-bit):
//  * group geometry + span/ratio QC: basemods.cpp:273-380
//  * event-bound lookup incl. the right-bound quirk: alignment_db.cpp:688-731
//  * methylate / site-aware reverse_complement / kmer ranks:
//    nanopolish_alphabet.h:78-150 (mirrored by utils/alphabet.py, whose
//    vectorized forms are property-tested equal to the scalar forms
//    implemented here)

#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

constexpr int MAX_SEQ = 4096;   // group windows are <= 200 + 2*flank + 1

struct AlphabetSpec {
    const char* bases;          // e.g. "ACGMT"
    int64_t size;
    const char* complements;    // position-matched to bases
    const char* sites;          // n_sites x rl (unmethylated)
    const char* sites_m;        // n_sites x rl (methylated)
    const char* sites_m_comp;   // n_sites x rl (methylated complement)
    int64_t n_sites;
    int64_t rl;
    uint8_t rank_lut[256];
    char comp_lut[256];

    void init() {
        std::memset(rank_lut, 0, sizeof(rank_lut));
        for (int64_t r = 0; r < size; ++r)
            rank_lut[(uint8_t)bases[r]] = (uint8_t)r;
        for (int c = 0; c < 256; ++c)
            comp_lut[c] = complements[rank_lut[c]];
    }
};

// full recognition-site match at position i (any site, first in order)
inline int site_full_match(const AlphabetSpec& a, const char* s, int64_t n,
                           int64_t i) {
    if (i + a.rl > n) return -1;
    for (int64_t j = 0; j < a.n_sites; ++j)
        if (std::memcmp(s + i, a.sites + j * a.rl, (size_t)a.rl) == 0)
            return (int)j;
    return -1;
}

// methylate: replace fully-matched recognition sites left-to-right with
// greedy stride rl (nanopolish_alphabet.h methylate semantics)
inline void methylate(const AlphabetSpec& a, const char* s, int64_t n,
                      char* out) {
    std::memcpy(out, s, (size_t)n);
    int64_t i = 0;
    while (i < n) {
        int j = site_full_match(a, s, n, i);
        if (j >= 0) {
            std::memcpy(out + i, a.sites_m + j * a.rl, (size_t)a.rl);
            i += a.rl;
        } else {
            ++i;
        }
    }
}

// site-aware reverse complement (nanopolish_alphabet.h:118-150): the
// scalar walk.  For strings longer than one site, the i==0
// whole-string-inside-site branch of match_to_site can never fire, so a
// match at i is: s[i:i+cl] == site_m[:cl] with cl = min(rl, n-i), and it
// acts only when it covers an 'M'.
inline void reverse_complement_ma(const AlphabetSpec& a, const char* s,
                                  int64_t n, char* out) {
    int64_t i = 0, j = n - 1;
    while (i < n) {
        int ridx = -1;
        int64_t mlen = 0;
        for (int64_t kk = 0; kk < a.n_sites; ++kk) {
            int64_t cl = std::min(a.rl, n - i);
            const char* site_m = a.sites_m + kk * a.rl;
            if (std::memcmp(s + i, site_m, (size_t)cl) == 0) {
                bool covers = false;
                for (int64_t t = 0; t < cl; ++t)
                    if (s[i + t] == 'M') { covers = true; break; }
                if (covers) { ridx = (int)kk; mlen = cl; break; }
            }
        }
        if (ridx >= 0) {
            const char* comp_site = a.sites_m_comp + ridx * a.rl;
            for (int64_t kk = 0; kk < mlen; ++kk) {
                out[j--] = comp_site[kk];
                ++i;
            }
        } else {
            out[j--] = a.comp_lut[(uint8_t)s[i]];
            ++i;
        }
    }
}

// plain reverse complement (M-free input)
inline void reverse_complement_plain(const AlphabetSpec& a, const char* s,
                                     int64_t n, char* out) {
    for (int64_t i = 0; i < n; ++i)
        out[n - 1 - i] = a.comp_lut[(uint8_t)s[i]];
}

// lexicographic k-mer ranks, last base minor (nanopolish_alphabet.h:78)
inline void kmer_ranks(const AlphabetSpec& a, const char* s, int64_t n,
                       int64_t k, int32_t* out) {
    int64_t nk = n - k + 1;
    if (nk <= 0) return;
    // rolling rank: r_{i+1} = (r_i % size^(k-1)) * size + rank(s[i+k])
    int64_t mod = 1;
    for (int64_t t = 0; t < k - 1; ++t) mod *= a.size;
    int64_t r = 0;
    for (int64_t t = 0; t < k; ++t)
        r = r * a.size + a.rank_lut[(uint8_t)s[t]];
    out[0] = (int32_t)r;
    for (int64_t i = 1; i < nk; ++i) {
        r = (r % mod) * a.size + a.rank_lut[(uint8_t)s[i + k - 1]];
        out[i] = (int32_t)r;
    }
}

}  // namespace

extern "C" {

// Per-(read, strand) methylation task geometry.  Inputs:
//   ref_seq[n_ref]       disambiguated uppercase reference window
//   pairs[n_pairs*2]     aligned (ref_pos, event_idx), sorted by ref_pos
//   rc                   event-alignment orientation (rank-row direction)
// Outputs (caller-allocated, capacity cap_groups rows, rank stride k_cap):
//   per surviving group: e1, estep, nev, nk, start_pos, end_pos, n_motif,
//   seq_lo, seq_hi, and the k-mer rank rows ranks_u / ranks_m
//   ([cap_groups, k_cap] int32, zero-padded).
// Returns the number of groups written, or -1 if a capacity was exceeded
// (caller falls back to the Python path).
int64_t npt_meth_geometry(
    const char* ref_seq, int64_t n_ref,
    const int64_t* pairs, int64_t n_pairs,
    int64_t ref_start_pos, int64_t region_start, int64_t region_end,
    int64_t min_separation, int64_t min_flank, int64_t k, int64_t rc,
    double max_ratio,
    const char* bases, int64_t a_size, const char* complements,
    const char* sites, const char* sites_m, const char* sites_m_comp,
    int64_t n_sites, int64_t rl,
    int64_t cap_groups, int64_t k_cap,
    int64_t* e1_out, int64_t* estep_out, int64_t* nev_out, int64_t* nk_out,
    int32_t* ranks_u, int32_t* ranks_m,
    int64_t* start_pos, int64_t* end_pos, int64_t* n_motif,
    int64_t* seq_lo, int64_t* seq_hi) {
    AlphabetSpec a{bases, a_size, complements, sites, sites_m, sites_m_comp,
                   n_sites, rl, {}, {}};
    a.init();

    // ---- motif positions (full matches of any site) ----
    // stored on the stack when small, heap otherwise
    int64_t* motif = new int64_t[(size_t)std::max<int64_t>(n_ref, 1)];
    int64_t n_motifs = 0;
    for (int64_t i = 0; i + rl <= n_ref; ++i)
        if (site_full_match(a, ref_seq, n_ref, i) >= 0) motif[n_motifs++] = i;

    char sub[MAX_SEQ], msub[MAX_SEQ], useq[MAX_SEQ], mseq[MAX_SEQ];
    int64_t ng = 0;
    int64_t gi = 0;
    while (gi < n_motifs) {
        // maximal run with inter-site gaps <= min_separation
        int64_t ge = gi + 1;
        while (ge < n_motifs && motif[ge] - motif[ge - 1] <= min_separation)
            ++ge;
        const int64_t first = motif[gi], last = motif[ge - 1];
        const int64_t group_n = ge - gi;
        gi = ge;

        const int64_t ss = first - min_flank;
        const int64_t se = last + min_flank;
        if (!(ss > min_separation && last - first <= 200 && se < n_ref))
            continue;
        const int64_t sp = first + ref_start_pos;
        const int64_t ep = last + ref_start_pos;
        if (region_start != -1 && sp < region_start) continue;
        if (region_end != -1 && ep >= region_end) continue;

        // ---- event bounds (alignment_db.cpp:688-731 semantics) ----
        if (n_pairs == 0) continue;
        const int64_t rs = ss + ref_start_pos, re = se + ref_start_pos;
        // lower_bound over the ref column (pairs stride 2)
        auto lower = [&](int64_t v) {
            int64_t lo = 0, hi = n_pairs;
            while (lo < hi) {
                int64_t mid = (lo + hi) >> 1;
                if (pairs[2 * mid] < v) lo = mid + 1; else hi = mid;
            }
            return lo;
        };
        const int64_t i1 = lower(rs), i2 = lower(re);
        if (!(i1 < n_pairs && i2 < n_pairs)) continue;
        const int64_t i1c = std::min(i1, n_pairs - 1);
        const int64_t i2c = std::min(i2, n_pairs - 1);
        const bool left_b = pairs[2 * i1c] <= rs ||
            (i1 > 0 && pairs[2 * (i1 - 1)] <= rs);
        const bool right_b = pairs[2 * i2c] >= re ||
            (i2 + 1 < n_pairs && pairs[2 * (i2 + 1)] >= rs);
        if (!(left_b && right_b)) continue;
        const int64_t e1 = pairs[2 * i1c + 1], e2 = pairs[2 * i2c + 1];
        const int64_t d = e1 <= e2 ? e2 - e1 : e1 - e2;
        const int64_t span = std::max<int64_t>(se - ss, 1);
        if (!(d > 10) || ((double)d / (double)span > max_ratio)) continue;

        // ---- window strings + rank rows ----
        const int64_t sl = se - ss + 1;
        const int64_t nk = sl - k + 1;
        if (sl > MAX_SEQ || nk > k_cap || ng >= cap_groups) {
            delete[] motif;
            return -1;
        }
        std::memcpy(sub, ref_seq + ss, (size_t)sl);
        methylate(a, sub, sl, msub);
        const char* us;
        const char* ms;
        if (rc) {
            reverse_complement_plain(a, sub, sl, useq);   // sub is M-free
            reverse_complement_ma(a, msub, sl, mseq);
            us = useq;
            ms = mseq;
        } else {
            us = sub;
            ms = msub;
        }
        int32_t* ru = ranks_u + ng * k_cap;
        int32_t* rm = ranks_m + ng * k_cap;
        std::memset(ru, 0, (size_t)k_cap * sizeof(int32_t));
        std::memset(rm, 0, (size_t)k_cap * sizeof(int32_t));
        kmer_ranks(a, us, sl, k, ru);
        kmer_ranks(a, ms, sl, k, rm);
        if (rc) {
            // kmer_ranks(k, rc=True) == ranks(rc_seq) reversed
            std::reverse(ru, ru + nk);
            std::reverse(rm, rm + nk);
        }

        e1_out[ng] = e1;
        estep_out[ng] = e2 >= e1 ? 1 : -1;
        nev_out[ng] = d + 1;
        nk_out[ng] = nk;
        start_pos[ng] = sp;
        end_pos[ng] = ep;
        n_motif[ng] = group_n;
        seq_lo[ng] = first - k + 1;
        seq_hi[ng] = last + k;
        ++ng;
    }
    delete[] motif;
    return ng;
}

}  // extern "C"
