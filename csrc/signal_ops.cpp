// signal_ops.cpp -- native host-side signal kernels for nanopolish_tpu.
//
// The sequential per-sample state machines (peak detection) and per-read
// backtracks live here; everything batch/vector-shaped runs on the TPU.
// Exposed as a plain C ABI consumed via ctypes (utils/native.py).
//
// Behavioral spec: scrappie's short/long dual-window peak detector
// (reference: src/thirdparty/scrappie/event_detection.c:122-198).

#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Dual-detector peak finder over two t-statistic tracks.
// Returns the number of peaks written to out_peaks (size >= n).
int64_t npt_peak_detect(const float* tstat1, const float* tstat2, int64_t n,
                        int64_t window_length1, int64_t window_length2,
                        float threshold1, float threshold2, float peak_height,
                        int64_t* out_peaks) {
    const float DEF_PEAK_VAL = FLT_MAX;
    const float* sig[2] = {tstat1, tstat2};
    const float thresh[2] = {threshold1, threshold2};
    const int64_t wlen[2] = {window_length1, window_length2};
    int64_t masked_to[2] = {0, 0};
    int64_t peak_pos[2] = {-1, -1};
    float peak_value[2] = {DEF_PEAK_VAL, DEF_PEAK_VAL};
    bool valid_peak[2] = {false, false};

    int64_t count = 0;
    for (int64_t i = 0; i < n; ++i) {
        for (int k = 0; k < 2; ++k) {
            if (masked_to[k] >= i) continue;
            float current_value = sig[k][i];
            if (peak_pos[k] == -1) {
                if (current_value < peak_value[k]) {
                    peak_value[k] = current_value;
                } else if (current_value - peak_value[k] > peak_height) {
                    peak_value[k] = current_value;
                    peak_pos[k] = i;
                }
            } else {
                if (current_value > peak_value[k]) {
                    peak_value[k] = current_value;
                    peak_pos[k] = i;
                }
                if (k == 0) {
                    if (peak_value[0] > thresh[0]) {
                        masked_to[1] = peak_pos[0] + wlen[0];
                        peak_pos[1] = -1;
                        peak_value[1] = DEF_PEAK_VAL;
                        valid_peak[1] = false;
                    }
                }
                if (peak_value[k] - current_value > peak_height &&
                    peak_value[k] > thresh[k]) {
                    valid_peak[k] = true;
                }
                if (valid_peak[k] && (i - peak_pos[k]) > wlen[k] / 2) {
                    out_peaks[count++] = peak_pos[k];
                    peak_pos[k] = -1;
                    peak_value[k] = current_value;
                    valid_peak[k] = false;
                }
            }
        }
    }
    return count;
}

// Batched banded-alignment backtrack.
//
// Given the packed trace array [n_bands, bandwidth] (uint8 moves: 0=diag,
// 1=up, 2=left) and per-band lower-left coordinates, walk from
// (start_event, start_kmer) back to the origin, emitting (kmer, event)
// pairs (spec: src/nanopolish_raw_loader.cpp:302-362).  Returns the number
// of pairs written (reversed into forward order by the caller), or -1 on
// overflow.
int64_t npt_banded_backtrack(const uint8_t* trace, int64_t n_bands, int64_t bandwidth,
                             const int32_t* band_ll_event, const int32_t* band_ll_kmer,
                             int64_t start_event, int64_t start_kmer,
                             int32_t* out_kmer, int32_t* out_event, int64_t max_out) {
    int64_t ei = start_event;
    int64_t ki = start_kmer;
    int64_t count = 0;
    while (ki >= 0 && ei >= 0) {
        if (count >= max_out) return -1;
        out_kmer[count] = (int32_t)ki;
        out_event[count] = (int32_t)ei;
        ++count;
        int64_t band_idx = (ei + 1) + (ki + 1);
        int64_t offset = band_ll_event[band_idx] - ei;
        uint8_t from = trace[band_idx * bandwidth + offset];
        if (from == 0) { --ki; --ei; }
        else if (from == 1) { --ei; }
        else { --ki; }
    }
    // reverse in place to forward order
    for (int64_t a = 0, b = count - 1; a < b; ++a, --b) {
        std::swap(out_kmer[a], out_kmer[b]);
        std::swap(out_event[a], out_event[b]);
    }
    return count;
}

}  // extern "C"
