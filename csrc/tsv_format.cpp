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

#include <cstdint>
#include <cstdio>
#include <cstring>

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
