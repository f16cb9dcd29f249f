// Host-side counting kernels for the comparison harness.
//
// The reference's metric layer counts n-grams and run-length segments with
// Python dict loops (compare/utils.py:255-301); the numpy path in this
// framework uses sort-based np.unique (O(N*T log)). These C++ kernels do
// the same work as single linear passes with dense accumulators — the
// O(N*T) floor for 1M-agent x 288-bin populations.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in the image).
// Build: `make -C native` (or auto-built on first use by ops/native.py).

#include <cstdint>
#include <cstring>

extern "C" {

// Count n-grams of label rows into a dense table of size P^n.
// Y: (N, T) row-major int64 labels in [0, P). counts: preallocated,
// zeroed, size P^n. Codes are base-P big-endian (matches
// compare.utils.ngram_code_matrix).
void count_ngrams(const int64_t* Y, int64_t N, int64_t T, int64_t n,
                  int64_t P, int64_t* counts) {
    if (n <= 0 || n > T) return;
    // P^(n-1) for the rolling-code update
    int64_t head = 1;
    for (int64_t i = 1; i < n; ++i) head *= P;
    const int64_t mod = head * P;
    for (int64_t r = 0; r < N; ++r) {
        const int64_t* row = Y + r * T;
        int64_t code = 0;
        for (int64_t t = 0; t < n; ++t) code = code * P + row[t];
        counts[code] += 1;
        for (int64_t t = n; t < T; ++t) {
            code = (code % head) * P + row[t];
            counts[code] += 1;
        }
        (void)mod;
    }
}

// Run-length segmentation of all rows.
// Outputs arrays must have capacity N*T. Returns the segment count.
int64_t run_length_segments(const int64_t* Y, int64_t N, int64_t T,
                            int64_t* person, int64_t* purpose,
                            int64_t* length) {
    int64_t s = 0;
    for (int64_t r = 0; r < N; ++r) {
        const int64_t* row = Y + r * T;
        int64_t start = 0;
        for (int64_t t = 1; t <= T; ++t) {
            if (t == T || row[t] != row[t - 1]) {
                person[s] = r;
                purpose[s] = row[start];
                length[s] = t - start;
                ++s;
                start = t;
            }
        }
    }
    return s;
}

// Per-(time-bin, purpose) occupancy counts: counts[(t * P) + p] += 1.
// The inner loop of compute_empirical_tod / tod_marginals.
void tod_counts(const int64_t* Y, int64_t N, int64_t T, int64_t P,
                int64_t* counts) {
    for (int64_t r = 0; r < N; ++r) {
        const int64_t* row = Y + r * T;
        for (int64_t t = 0; t < T; ++t) counts[t * P + row[t]] += 1;
    }
}

// Histogram of segment-start times per n-gram-of-frames code:
// hist[(code_index_in_dense_table) * Tn + t] with dense code table P^n.
void ngram_start_hist(const int64_t* Y, int64_t N, int64_t T, int64_t n,
                      int64_t P, int64_t* hist) {
    if (n <= 0 || n > T) return;
    int64_t head = 1;
    for (int64_t i = 1; i < n; ++i) head *= P;
    const int64_t Tn = T - n + 1;
    for (int64_t r = 0; r < N; ++r) {
        const int64_t* row = Y + r * T;
        int64_t code = 0;
        for (int64_t t = 0; t < n; ++t) code = code * P + row[t];
        hist[code * Tn + 0] += 1;
        for (int64_t t = 1; t < Tn; ++t) {
            code = (code % head) * P + row[t + n - 1];
            hist[code * Tn + t] += 1;
        }
    }
}

}  // extern "C"
