// cpu_baseline.cpp -- single-thread CPU implementation of the adaptive
// banded event alignment, used ONLY as the benchmark baseline proxy.
//
// The upstream reference cannot be built in this image (vendored submodule
// trees are empty and there is no network), so bench.py measures this
// independent C++ implementation of the same algorithm
// (spec: src/nanopolish_raw_loader.cpp:77-379 — band 100, adaptive
// down/right placement, gaussian emissions, stay/step/skip transitions)
// at the reference's per-cell cost model, and scales by thread count.

#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

constexpr int BANDWIDTH = 100;
constexpr float NEG_INF = -INFINITY;

inline float log_normal_pdf(float x, float mu, float sigma, float log_sigma) {
    static const float log_inv_sqrt_2pi = -0.918938533204672f;
    float a = (x - mu) / sigma;
    return log_inv_sqrt_2pi - log_sigma - 0.5f * a * a;
}

}  // namespace

extern "C" {

// Align one read's events to its kmer gaussians; returns the number of
// aligned (kmer,event) pairs, or -1 on failed alignment.  Mirrors the
// adaptive banded DP + backtrack semantics for throughput purposes.
int64_t npt_cpu_banded_align(const float* events, int64_t n_events,
                             const float* mu, const float* sigma,
                             const float* log_sigma, int64_t n_kmers) {
    const int64_t n_bands = (n_events + 1) + (n_kmers + 1);
    const float events_per_kmer = (float)n_events / (float)n_kmers;
    const float p_stay = 1.0f - (1.0f / (events_per_kmer + 1.0f));
    const float lp_skip = logf(1e-10f);
    const float lp_stay = logf(p_stay);
    const float lp_step = logf(1.0f - expf(lp_skip) - expf(lp_stay));
    const float lp_trim = logf(0.01f);

    std::vector<float> bands((size_t)n_bands * BANDWIDTH, NEG_INF);
    std::vector<uint8_t> trace((size_t)n_bands * BANDWIDTH, 0);
    std::vector<int> ll_event(n_bands), ll_kmer(n_bands);

    auto band = [&](int64_t bi) { return &bands[(size_t)bi * BANDWIDTH]; };
    auto tr = [&](int64_t bi) { return &trace[(size_t)bi * BANDWIDTH]; };
    // cell (event ei, kmer ki) at band bi has offset ki - ll_kmer[bi]
    auto event_at = [&](int64_t bi, int off) { return ll_event[bi] - off; };
    auto kmer_at = [&](int64_t bi, int off) { return ll_kmer[bi] + off; };

    // init: band 0 lower-left at (event 49, kmer -51); cell (-1,-1) = 0
    ll_event[0] = BANDWIDTH / 2 - 1;
    ll_kmer[0] = -1 - BANDWIDTH / 2;
    ll_event[1] = ll_event[0] + 1;
    ll_kmer[1] = ll_kmer[0];
    band(0)[BANDWIDTH / 2] = 0.0f;
    band(1)[BANDWIDTH / 2] = lp_trim;
    tr(1)[BANDWIDTH / 2] = 1;  // FROM_U

    for (int64_t bi = 2; bi < n_bands; ++bi) {
        // adaptive placement: compare head scores of band bi-1
        float ll = band(bi - 1)[0];
        float ur = band(bi - 1)[BANDWIDTH - 1];
        bool right = ll < ur;
        if (right) {  // move right: kmer+1
            ll_event[bi] = ll_event[bi - 1];
            ll_kmer[bi] = ll_kmer[bi - 1] + 1;
        } else {      // move down: event+1
            ll_event[bi] = ll_event[bi - 1] + 1;
            ll_kmer[bi] = ll_kmer[bi - 1];
        }
        float* curr = band(bi);
        uint8_t* t = tr(bi);
        const float* b1 = band(bi - 1);
        const float* b2 = band(bi - 2);
        const int shift1 = ll_kmer[bi] - ll_kmer[bi - 1];       // 0 or 1
        const int shift2 = ll_kmer[bi] - ll_kmer[bi - 2];
        int off_min = std::max<int64_t>(0, -ll_kmer[bi]);
        int off_max = (int)std::min<int64_t>(BANDWIDTH,
                                             n_kmers - ll_kmer[bi]);
        for (int off = off_min; off < off_max; ++off) {
            int ei = event_at(bi, off);
            int ki = kmer_at(bi, off);
            if (ei < 0 || ei >= n_events) continue;
            // up = (ei-1, ki) in band bi-1; left = (ei, ki-1) in bi-1;
            // diag = (ei-1, ki-1) in bi-2
            int up_off = off + shift1 - (right ? 1 : 0);
            // derive offsets directly from coordinates:
            int o_up = ki - ll_kmer[bi - 1];
            int o_left = (ki - 1) - ll_kmer[bi - 1];
            int o_diag = (ki - 1) - ll_kmer[bi - 2];
            (void)up_off; (void)shift2;
            float up = (o_up >= 0 && o_up < BANDWIDTH &&
                        ll_event[bi - 1] - o_up == ei - 1)
                       ? b1[o_up] : NEG_INF;
            float left = (o_left >= 0 && o_left < BANDWIDTH &&
                          ll_event[bi - 1] - o_left == ei)
                         ? b1[o_left] : NEG_INF;
            float diag = (o_diag >= 0 && o_diag < BANDWIDTH &&
                          ll_event[bi - 2] - o_diag == ei - 1)
                         ? b2[o_diag] : NEG_INF;
            float lp_emission = log_normal_pdf(events[ei], mu[ki], sigma[ki],
                                               log_sigma[ki]);
            float score_d = diag + lp_step + lp_emission;
            float score_u = up + lp_stay + lp_emission;
            float score_l = left + lp_skip;
            float m = std::max(score_d, std::max(score_u, score_l));
            curr[off] = m;
            t[off] = (m == score_d) ? 0 : (m == score_u ? 1 : 2);
        }
    }

    // best trailing-trim end at last kmer
    float best = NEG_INF;
    int best_ei = -1;
    for (int64_t ei = 0; ei < n_events; ++ei) {
        int64_t bi = (ei + 1) + n_kmers + 1 - 1;  // band of (ei, n_kmers-1)
        if (bi < 0 || bi >= n_bands) continue;
        int off = (int)(n_kmers - 1 - ll_kmer[bi]);
        if (off < 0 || off >= BANDWIDTH) continue;
        if (ll_event[bi] - off != ei) continue;
        float s = band(bi)[off] + (n_events - 1 - ei) * lp_trim;
        if (s > best) { best = s; best_ei = (int)ei; }
    }
    if (best_ei < 0) return -1;

    // backtrack
    int64_t ei = best_ei, ki = n_kmers - 1, n_pairs = 0;
    while (ki >= 0 && ei >= 0) {
        ++n_pairs;
        int64_t bi = (ei + 1) + (ki + 1);
        int off = (int)(ki - ll_kmer[bi]);
        uint8_t mv = (off >= 0 && off < BANDWIDTH) ? tr(bi)[off] : 0;
        if (mv == 0) { --ei; --ki; }
        else if (mv == 1) { --ei; }
        else { --ki; }
    }
    return n_pairs;
}

}  // extern "C"
