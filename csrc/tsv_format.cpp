// tsv_format.cpp -- native TSV row formatting for the high-volume emitters.
//
// eventalign's TSV is the highest-volume output in the package (millions
// of rows per run; the reference pays the same formatting on its hot
// path, src/alignment/nanopolish_eventalign.cpp:398-484).  A Python
// f-string per row costs ~3 us; snprintf is ~0.2 us.  Byte equality
// with the Python emitter holds because both glibc printf and CPython
// format floats with correctly-rounded decimal conversion of the same
// double (np.float32.tolist() promotes exactly, as does the (double)
// cast here), and inf/nan render as "inf"/"nan" in both.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>

// ---------------------------------------------------------------------------
// fast fixed-decimal emitters, byte-compatible with printf %.Nf
//
// printf rounds the true decimal expansion of the double; away from a
// decimal tie, rounding the scaled double gives the identical digits
// (the multiply's error, <=0.5 ulp ~ 1e-10 at these magnitudes, cannot
// cross the 1e-6 tie margin).  Rows whose value lands within the
// margin of a tie, is non-finite, or is huge fall back to snprintf for
// that whole row — byte equality is preserved in every case.
// ---------------------------------------------------------------------------

static inline char* put_u64(char* p, unsigned long long v) {
    char tmp[24];
    int i = 0;
    do { tmp[i++] = (char)('0' + (v % 10)); v /= 10; } while (v);
    while (i) *p++ = tmp[--i];
    return p;
}

static inline char* put_i64(char* p, long long v) {
    if (v < 0) { *p++ = '-'; return put_u64(p, (unsigned long long)(-v)); }
    return put_u64(p, (unsigned long long)v);
}

static inline char* put_fixed(char* p, double x, int dec,
                              unsigned long long pow10) {
    if (!(std::fabs(x) < 1e13)) return nullptr;       // non-finite / huge
    const bool neg = std::signbit(x);
    const double ax = neg ? -x : x;
    const double scaled = ax * (double)pow10;
    const double fl = std::floor(scaled);
    const double frac = scaled - fl;
    if (std::fabs(frac - 0.5) < 1e-6) return nullptr;  // decimal tie
    unsigned long long r =
        (unsigned long long)(frac > 0.5 ? fl + 1.0 : fl);
    unsigned long long ip = r / pow10;
    unsigned long long fp_ = r % pow10;
    if (neg) *p++ = '-';
    p = put_u64(p, ip);
    *p++ = '.';
    for (int d = dec - 1; d >= 0; --d) {
        p[d] = (char)('0' + (fp_ % 10));
        fp_ /= 10;
    }
    return p + dec;
}

extern "C" {

// Format n eventalign TSV rows into out (capacity out_cap bytes).
// Columns: ref_name, ref_position, ref_kmer, who, strand_ch, event_idx,
// event_mean(.2f), event_stdv(.3f), event_dur(.5f), model_kmer,
// model_mean(.2f), model_stdv(.2f), std_level(.2f).
// ref_kmer = seq[pos0 : pos0+k]; model_kmer = "N"*k for B rows, else
// rcq[nseq-pos0-k : nseq-pos0] when rc else ref_kmer.
// Returns bytes written, or -1 if out_cap would be exceeded.
int64_t npt_format_eventalign_rows(
    const char* ref_name, const char* who, char strand_ch,
    const char* seq, int64_t nseq, const char* rcq, int64_t rc, int64_t k,
    const int64_t* rp, const int64_t* pos0, const int64_t* ev,
    const uint8_t* is_b,
    const float* em, const float* es, const float* ed,
    const float* mm, const float* ms, const float* sd,
    int64_t n, char* out, int64_t out_cap) {
    char nk_str[64];
    if (k > 63) return -1;
    for (int64_t i = 0; i < k; ++i) nk_str[i] = 'N';
    nk_str[k] = '\0';

    char* p = out;
    char* end = out + out_cap;
    const size_t len_ref = strlen(ref_name);
    const size_t len_who = strlen(who);
    for (int64_t i = 0; i < n; ++i) {
        const int64_t p0 = pos0[i];
        const char* ref_kmer = seq + p0;
        const char* model_kmer;
        int64_t mk_len = k;
        if (is_b[i]) {
            model_kmer = nk_str;
        } else if (rc) {
            model_kmer = rcq + (nseq - p0 - k);
        } else {
            model_kmer = ref_kmer;
        }
        const int64_t room = end - p;
        // fast path: custom emitters (one snprintf with 6 float
        // conversions was ~1.4 us/row, ~85% of the emit stage)
        if (room > (int64_t)(len_ref + len_who + 2 * k + 160)) {
            char* q = p;
            memcpy(q, ref_name, len_ref); q += len_ref; *q++ = '\t';
            q = put_i64(q, (long long)rp[i]); *q++ = '\t';
            memcpy(q, ref_kmer, (size_t)k); q += k; *q++ = '\t';
            memcpy(q, who, len_who); q += len_who; *q++ = '\t';
            *q++ = strand_ch; *q++ = '\t';
            q = put_i64(q, (long long)ev[i]); *q++ = '\t';
            char* r1 = put_fixed(q, (double)em[i], 2, 100ULL);
            if (r1) { q = r1; *q++ = '\t';
                r1 = put_fixed(q, (double)es[i], 3, 1000ULL); }
            if (r1) { q = r1; *q++ = '\t';
                r1 = put_fixed(q, (double)ed[i], 5, 100000ULL); }
            if (r1) {
                q = r1; *q++ = '\t';
                memcpy(q, model_kmer, (size_t)mk_len); q += mk_len;
                *q++ = '\t';
                r1 = put_fixed(q, (double)mm[i], 2, 100ULL);
            }
            if (r1) { q = r1; *q++ = '\t';
                r1 = put_fixed(q, (double)ms[i], 2, 100ULL); }
            if (r1) { q = r1; *q++ = '\t';
                r1 = put_fixed(q, (double)sd[i], 2, 100ULL); }
            if (r1) {
                q = r1; *q++ = '\n';
                p = q;
                continue;
            }
        }
        const int wrote = snprintf(
            p, (size_t)(room > 0 ? room : 0),
            "%s\t%lld\t%.*s\t%s\t%c\t%lld\t%.2f\t%.3f\t%.5f\t%.*s\t"
            "%.2f\t%.2f\t%.2f\n",
            ref_name, (long long)rp[i], (int)k, ref_kmer, who, strand_ch,
            (long long)ev[i], (double)em[i], (double)es[i], (double)ed[i],
            (int)mk_len, model_kmer, (double)mm[i], (double)ms[i],
            (double)sd[i]);
        if (wrote < 0 || wrote >= room) return -1;
        p += wrote;
    }
    return p - out;
}

// Format n call-methylation TSV rows (call_methylation.cpp:532-550):
// chrom, orientation, start, end, qname, llr(.2f), ll_m(.2f), ll_u(.2f),
// strands, n_motif, sequence (= ref_seq[lo:hi]).
int64_t npt_format_methylation_rows(
    const char* chrom, char orientation, const char* qname,
    const char* ref_seq,
    const int64_t* pos, const int64_t* endp,
    const double* sum_u, const double* sum_m,
    const int64_t* strands, const int64_t* n_motif,
    const int64_t* seq_lo, const int64_t* seq_hi,
    int64_t n, char* out, int64_t out_cap) {
    char* p = out;
    char* end = out + out_cap;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t room = end - p;
        const int wrote = snprintf(
            p, (size_t)(room > 0 ? room : 0),
            "%s\t%c\t%lld\t%lld\t%s\t%.2f\t%.2f\t%.2f\t%lld\t%lld\t%.*s\n",
            chrom, orientation, (long long)pos[i], (long long)endp[i],
            qname, sum_m[i] - sum_u[i], sum_m[i], sum_u[i],
            (long long)strands[i], (long long)n_motif[i],
            (int)(seq_hi[i] - seq_lo[i]), ref_seq + seq_lo[i]);
        if (wrote < 0 || wrote >= room) return -1;
        p += wrote;
    }
    return p - out;
}

}  // extern "C"
