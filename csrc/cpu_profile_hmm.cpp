// cpu_profile_hmm.cpp -- single-thread CPU implementation of the R9
// profile-HMM Forward fill, used ONLY as the benchmark baseline proxy
// for the analysis apps (call-methylation, variants, eventalign).
//
// Mirrors the cost structure of the reference's inner loop
// (spec: src/hmm/nanopolish_profile_hmm_r9.inl:265-433 — 3 states per
// kmer block; per block one gaussian log-pdf and ~8 float logsumexp
// accumulations via add_logs = max + log1pf(expf(delta)); soft-clip
// flanks; end-state accumulation at the last kmer) without copying its
// code: this file re-derives the DP from the same recurrence our
// ops/profile_hmm.py scan implements, and its scores are validated
// against that port (tests/test_cpu_baseline_hmm.py).

#include <cmath>
#include <cstdint>
#include <vector>
#include <algorithm>

namespace {

constexpr float NEG_INF = -INFINITY;
constexpr float LOG_BG = -3.0f;               // background emission (nats)
constexpr float TRANS_CLIP_SELF = 0.9f;
constexpr float TRANS_START_TO_CLIP = 0.5f;

// the reference's Forward add_logs is hmmer3's TABLE-based p7_FLogsum
// (nanopolish_common.h:96-105 with ESL_LOG_SUM=1; table init in
// common/logsum.cpp:56-70): max + lookup[(max-min)*1000], clamped at
// 15.7 nats.  Using the same table keeps this proxy's per-cell cost
// honest (an expf/log1pf version measured 191 ns/cell vs the table's
// real cost — 3-5x slower than what the reference pays).
constexpr int LOGSUM_TBL = 16000;
constexpr float LOGSUM_SCALE = 1000.0f;

static float* logsum_table() {
    static float tbl[LOGSUM_TBL];
    static bool init = false;
    if (!init) {
        for (int i = 0; i < LOGSUM_TBL; ++i)
            tbl[i] = (float)log(1.0 + exp((double)-i / LOGSUM_SCALE));
        init = true;
    }
    return tbl;
}

static const float* g_logsum = logsum_table();

inline float add_logs(float a, float b) {
    const float mx = std::max(a, b);
    const float mn = std::min(a, b);
    if (mn == NEG_INF || mx - mn >= 15.7f) return mx;
    return mx + g_logsum[(int)((mx - mn) * LOGSUM_SCALE)];
}

inline float log_normal_pdf(float x, float mu, float sigma,
                            float log_sigma) {
    static const float log_inv_sqrt_2pi = -0.918938533204672f;
    float a = (x - mu) / sigma;
    return log_inv_sqrt_2pi - log_sigma - 0.5f * a * a;
}

inline float flank(int64_t i) {
    // pre_flank[i]; post_flank is the same function of (n-1-i)
    static const float base = logf(TRANS_START_TO_CLIP) + LOG_BG +
                              logf(1.0f - TRANS_CLIP_SELF);
    static const float step = logf(TRANS_CLIP_SELF) + LOG_BG;
    if (i == 0) return logf(1.0f - TRANS_START_TO_CLIP);
    return base + (float)(i - 1) * step;
}

}  // namespace

extern "C" {

// Forward-score one segment: levels [n_events] vs per-kmer gaussians
// mu/sigma/log_sigma [n_kmers].  flags bit0 = allow pre-clip, bit1 =
// allow post-clip.  Returns the Forward log-probability.
float npt_cpu_profile_hmm_forward(const float* levels, int64_t n_events,
                                  const float* mu, const float* sigma,
                                  const float* log_sigma, int64_t n_kmers,
                                  float events_per_base, int32_t flags) {
    const bool pre_clip = flags & 1;
    const bool post_clip = flags & 2;

    // block transitions (knob defaults; r9.inl:17-76 semantics)
    const float p_skip = 0.0025f, p_bad = 0.001f, p_skip_self = 0.3f;
    const float epb = std::max(1.25f, events_per_base);
    const float p_stay = 1.0f - 1.0f / epb;
    const float lp_mk = logf(p_skip);
    const float lp_mb = logf(p_bad);
    const float lp_mm_self = logf(p_stay);
    const float lp_mm_next = logf(1.0f - p_stay - p_skip - p_bad);
    const float lp_bb = logf(p_bad);
    const float lp_b3 = logf((1.0f - p_bad) / 3.0f);
    const float lp_kk = logf(p_skip_self);
    const float lp_km = logf(1.0f - p_skip_self);

    std::vector<float> M(n_kmers, NEG_INF), B(n_kmers, NEG_INF),
        K(n_kmers, NEG_INF), Mn(n_kmers), Bn(n_kmers), Kn(n_kmers);
    float lp_end = NEG_INF;

    for (int64_t t = 1; t <= n_events; ++t) {
        const float ev = levels[t - 1];
        const float pre = flank(t - 1);
        float k_prev_row = NEG_INF;  // K_new[k-1] (within-row recurrence)
        for (int64_t k = 0; k < n_kmers; ++k) {
            const float em =
                log_normal_pdf(ev, mu[k], sigma[k], log_sigma[k]);
            const float Mp = k > 0 ? M[k - 1] : NEG_INF;
            const float Bp = k > 0 ? B[k - 1] : NEG_INF;
            const float Kp = k > 0 ? K[k - 1] : NEG_INF;

            // PSR9_MATCH: 6-way logsumexp + emission
            float m_in = add_logs(lp_mm_self + M[k], lp_mm_next + Mp);
            m_in = add_logs(m_in, lp_b3 + B[k]);
            m_in = add_logs(m_in, lp_b3 + Bp);
            m_in = add_logs(m_in, lp_km + Kp);
            if (k == 0 && (pre_clip || t == 1))
                m_in = add_logs(m_in, pre);
            Mn[k] = m_in + em;

            // PSR9_BAD_EVENT (emission 0)
            Bn[k] = add_logs(lp_mb + M[k], lp_bb + B[k]);

            // PSR9_KMER_SKIP: same-row chain
            const float cM = k > 0 ? lp_mk + Mn[k - 1] : NEG_INF;
            const float cB = k > 0 ? lp_b3 + Bn[k - 1] : NEG_INF;
            float c = add_logs(cM, cB);
            k_prev_row = add_logs(c, k_prev_row + lp_kk);
            Kn[k] = k_prev_row;
        }
        if (post_clip || t == n_events) {
            const float post = flank(n_events - t);
            float last = add_logs(add_logs(Mn[n_kmers - 1], Bn[n_kmers - 1]),
                                  Kn[n_kmers - 1]);
            lp_end = add_logs(lp_end, last + post);
        }
        M.swap(Mn);
        B.swap(Bn);
        K.swap(Kn);
    }
    return lp_end;
}

// Viterbi variant (profile_hmm_align: eventalign's inner loop) — same
// recurrence with max instead of add_logs, plus per-cell trace bytes
// and the backtrack walk.  Returns the Viterbi score; *n_pairs_out
// receives the alignment length (so callers can check the work done).
float npt_cpu_profile_hmm_viterbi(const float* levels, int64_t n_events,
                                  const float* mu, const float* sigma,
                                  const float* log_sigma, int64_t n_kmers,
                                  float events_per_base, int32_t flags,
                                  int64_t* n_pairs_out) {
    const bool pre_clip = flags & 1;
    const bool post_clip = flags & 2;
    const float p_skip = 0.0025f, p_bad = 0.001f, p_skip_self = 0.3f;
    const float epb = std::max(1.25f, events_per_base);
    const float p_stay = 1.0f - 1.0f / epb;
    const float lp_mk = logf(p_skip);
    const float lp_mb = logf(p_bad);
    const float lp_mm_self = logf(p_stay);
    const float lp_mm_next = logf(1.0f - p_stay - p_skip - p_bad);
    const float lp_bb = logf(p_bad);
    const float lp_b3 = logf((1.0f - p_bad) / 3.0f);
    const float lp_kk = logf(p_skip_self);
    const float lp_km = logf(1.0f - p_skip_self);

    std::vector<float> M(n_kmers, NEG_INF), B(n_kmers, NEG_INF),
        K(n_kmers, NEG_INF), Mn(n_kmers), Bn(n_kmers), Kn(n_kmers);
    // trace: 3 states x n_kmers per row, 4 bits each is overkill — one
    // byte per (row, kmer, state) like the reference's HMMViterbiOutput
    std::vector<uint8_t> tr((size_t)(n_events + 1) * n_kmers * 3, 0);
    float lp_end = NEG_INF;
    int64_t end_row = 0;
    int end_state = 2;

    auto max6 = [](const float* x, int n, int* arg) {
        float m = x[0];
        *arg = 0;
        for (int i = 1; i < n; ++i)
            if (x[i] >= m) { m = x[i]; *arg = i; }
        return m;
    };

    for (int64_t t = 1; t <= n_events; ++t) {
        const float ev = levels[t - 1];
        const float pre = flank(t - 1);
        uint8_t* trow = &tr[(size_t)t * n_kmers * 3];
        for (int64_t k = 0; k < n_kmers; ++k) {
            const float em =
                log_normal_pdf(ev, mu[k], sigma[k], log_sigma[k]);
            const float Mp = k > 0 ? M[k - 1] : NEG_INF;
            const float Bp = k > 0 ? B[k - 1] : NEG_INF;
            const float Kp = k > 0 ? K[k - 1] : NEG_INF;
            float x[6] = {lp_mm_self + M[k], lp_mm_next + Mp,
                          lp_b3 + B[k], lp_b3 + Bp, lp_km + Kp,
                          (k == 0 && (pre_clip || t == 1)) ? pre : NEG_INF};
            int a;
            Mn[k] = max6(x, 6, &a) + em;
            trow[k * 3 + 2] = (uint8_t)a;

            float xb[2] = {lp_mb + M[k], lp_bb + B[k]};
            Bn[k] = max6(xb, 2, &a);
            trow[k * 3 + 1] = (uint8_t)a;

            float xk[3] = {k > 0 ? lp_mk + Mn[k - 1] : NEG_INF,
                           k > 0 ? lp_b3 + Bn[k - 1] : NEG_INF,
                           k > 0 ? Kn[k - 1] + lp_kk : NEG_INF};
            Kn[k] = max6(xk, 3, &a);
            trow[k * 3 + 0] = (uint8_t)a;
        }
        if (post_clip || t == n_events) {
            const float post = flank(n_events - t);
            float xe[3] = {Mn[n_kmers - 1], Bn[n_kmers - 1],
                           Kn[n_kmers - 1]};
            int a;
            float cand = max6(xe, 3, &a) + post;
            if (cand > lp_end) {
                lp_end = cand;
                end_row = t;
                end_state = a;
            }
        }
        M.swap(Mn);
        B.swap(Bn);
        K.swap(Kn);
    }

    // backtrack walk (r9.cpp:73-204 cost shape: one trace read per step)
    int64_t pairs = 0, t = end_row, k = n_kmers - 1;
    int st = end_state;
    while (t > 0 && k >= 0) {
        ++pairs;
        uint8_t mv = tr[((size_t)t * n_kmers + k) * 3 + (2 - st)];
        if (st == 0) {              // from M row
            if (mv == 5) break;     // soft start
            if (mv == 0) { --t; }
            else if (mv == 1) { --t; --k; }
            else if (mv == 2) { --t; st = 1; }
            else if (mv == 3) { --t; --k; st = 1; }
            else { --k; st = 2; }
        } else if (st == 1) {       // from B row
            --t;
            st = (mv == 1) ? 1 : 0;
        } else {                    // from K row
            if (mv == 0) { --k; st = 0; }
            else if (mv == 1) { --k; st = 1; }
            else { --k; st = 2; }
        }
    }
    if (n_pairs_out) *n_pairs_out = pairs;
    return lp_end;
}

// Batched drivers (timing loops live in C++ so per-call Python overhead
// does not pollute the baseline measurement).  Segment i spans
// levels[lev_off[i] .. lev_off[i+1]) and mu/sigma/log_sigma
// [k_off[i] .. k_off[i+1]).  Scores land in out[i].
void npt_cpu_profile_hmm_forward_batch(
    const float* levels, const int64_t* lev_off, const float* mu,
    const float* sigma, const float* log_sigma, const int64_t* k_off,
    const float* events_per_base, const int32_t* flags, int64_t n_segments,
    float* out) {
    for (int64_t i = 0; i < n_segments; ++i) {
        out[i] = npt_cpu_profile_hmm_forward(
            levels + lev_off[i], lev_off[i + 1] - lev_off[i], mu + k_off[i],
            sigma + k_off[i], log_sigma + k_off[i],
            k_off[i + 1] - k_off[i], events_per_base[i], flags[i]);
    }
}

void npt_cpu_profile_hmm_viterbi_batch(
    const float* levels, const int64_t* lev_off, const float* mu,
    const float* sigma, const float* log_sigma, const int64_t* k_off,
    const float* events_per_base, const int32_t* flags, int64_t n_segments,
    float* out, int64_t* pairs_out) {
    for (int64_t i = 0; i < n_segments; ++i) {
        out[i] = npt_cpu_profile_hmm_viterbi(
            levels + lev_off[i], lev_off[i + 1] - lev_off[i], mu + k_off[i],
            sigma + k_off[i], log_sigma + k_off[i],
            k_off[i + 1] - k_off[i], events_per_base[i], flags[i],
            pairs_out ? pairs_out + i : nullptr);
    }
}

}  // extern "C"
