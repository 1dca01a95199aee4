// cpu_polya.cpp -- single-thread CPU baseline for the polyA segmentation
// Viterbi (reference: src/nanopolish_polya_estimator.cpp:372-463).
//
// Used by tools/cpu_e2e_baseline.py as the polya denominator: the same
// 6-state sample-level decode (START->LEADER->ADAPTER->[POLYA<->CLIFF]->
// TRANSCRIPT) with the reference's emission census — per sample: one
// single Gaussian, three 2-component Gaussian mixtures, one uniform
// window, one mixture for START; plus the banded max/backpointer
// updates.  Not a copy of the reference implementation: same
// independently-specified state machine as ops/segmentation_hmm.py
// (this file mirrors that module's formulas), validated against its
// labels in the tool.

#include <cstdint>
#include <cmath>
#include <algorithm>

namespace {

constexpr int S = 0, L = 1, A = 2, P = 3, C = 4, T = 5;
constexpr float NEG = -1.0e30f;

struct Gauss { float mu, sd; };

inline float norm_pdf(float x, Gauss g, float scale, float shift,
                      float var) {
    const float mu = shift + scale * g.mu;
    const float sd = var * g.sd;
    const float z = (x - mu) / sd;
    return std::exp(-0.5f * z * z) / (sd * 2.5066282746310002f);
}

inline float log_norm_pdf(float x, Gauss g, float scale, float shift,
                          float var) {
    const float mu = shift + scale * g.mu;
    const float sd = var * g.sd;
    const float z = (x - mu) / sd;
    return -0.5f * z * z - std::log(sd) - 0.91893853320467274f;
}

}  // namespace

extern "C" {

// Decode one read's samples; writes labels[n] (state per sample).
// Returns the index of the last POLYA-labeled sample (or -1).
int64_t npt_cpu_polya_viterbi(
    const float* samples, int64_t n, float scale, float shift, float var,
    uint8_t* labels, uint8_t* bptr_buf /* capacity n*6 */) {
    if (n <= 0) return -1;
    const Gauss s_em{70.2737f, 3.7743f};
    const Gauss l_em{110.973f, 5.237f};
    const Gauss a0{79.347f, 8.3702f}, a1{63.3126f, 2.7464f};
    const Gauss p_em{108.883f, 3.257f};
    const Gauss t0{79.679f, 6.966f}, t1{105.784f, 16.022f};
    const float lt_ss = std::log(0.10f), lt_sl = std::log(0.90f);
    const float lt_ll = std::log(0.90f), lt_la = std::log(0.10f);
    const float lt_aa = std::log(0.95f), lt_ap = std::log(0.05f);
    const float lt_pp = std::log(0.89f), lt_pc = std::log(0.01f);
    const float lt_pt = std::log(0.10f);
    const float lt_cc = std::log(0.01f), lt_cp = std::log(0.99f);
    const float lt_tt = 0.0f;

    auto emissions = [&](float x, float* e) {
        const float xx = (x > 200.0f || x < 40.0f) ? 100.0f : x;
        e[S] = std::log(0.5f * norm_pdf(xx, s_em, scale, shift, var)
                        + 0.5f * 0.00476f);
        e[L] = log_norm_pdf(xx, l_em, scale, shift, var);
        e[A] = std::log(0.874f * norm_pdf(xx, a0, scale, shift, var)
                        + 0.126f * norm_pdf(xx, a1, scale, shift, var));
        e[P] = log_norm_pdf(xx, p_em, scale, shift, var);
        e[C] = (xx > 70.0f && xx < 140.0f) ? -4.2485f
                                           : -INFINITY;
        e[T] = std::log(0.346f * norm_pdf(xx, t0, scale, shift, var)
                        + 0.654f * norm_pdf(xx, t1, scale, shift, var));
    };

    float v[6], e[6];
    emissions(samples[n - 1], e);   // reference init quirk: last sample
    for (int i = 0; i < 6; ++i) v[i] = NEG;
    v[S] = e[S];

    for (int64_t t = 1; t < n; ++t) {
        emissions(samples[t], e);
        const float s_to_s = v[S] + lt_ss, s_to_l = v[S] + lt_sl;
        const float l_to_l = v[L] + lt_ll, l_to_a = v[L] + lt_la;
        const float a_to_a = v[A] + lt_aa, a_to_p = v[A] + lt_ap;
        const float p_to_p = v[P] + lt_pp, p_to_c = v[P] + lt_pc;
        const float p_to_t = v[P] + lt_pt;
        const float c_to_c = v[C] + lt_cc, c_to_p = v[C] + lt_cp;
        const float t_to_t = v[T] + lt_tt;

        uint8_t* b = bptr_buf + t * 6;
        b[S] = S;
        b[L] = (s_to_l < l_to_l) ? L : S;
        b[A] = (l_to_a < a_to_a) ? A : L;
        // argmax consistent with nv[P]'s max (fixed tie order P,A,C)
        b[P] = (p_to_p >= a_to_p && p_to_p >= c_to_p)
                   ? P
                   : ((a_to_p >= c_to_p) ? A : C);
        b[C] = (p_to_c < c_to_c) ? C : P;
        b[T] = (p_to_t < t_to_t) ? T : P;

        float nv[6];
        nv[S] = s_to_s + e[S];
        nv[L] = std::max(l_to_l, s_to_l) + e[L];
        nv[A] = std::max(a_to_a, l_to_a) + e[A];
        nv[P] = std::max(p_to_p, std::max(a_to_p, c_to_p)) + e[P];
        nv[C] = std::max(c_to_c, p_to_c) + e[C];
        nv[T] = std::max(p_to_t, t_to_t) + e[T];
        for (int i = 0; i < 6; ++i) v[i] = nv[i];
    }

    // backward pass: clamp last state to TRANSCRIPT, follow pointers
    int state = T;
    labels[n - 1] = (uint8_t)state;
    for (int64_t t = n - 1; t >= 1; --t) {
        state = bptr_buf[t * 6 + state];
        labels[t - 1] = (uint8_t)state;
    }
    int64_t last_p = -1;
    for (int64_t t = n - 1; t >= 0; --t)
        if (labels[t] == P) { last_p = t; break; }
    return last_p;
}

}  // extern "C"
