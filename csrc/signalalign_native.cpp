// Native host-side kernels for signalalign_tpu.
//
// These cover the sequential, data-dependent host work that does not belong
// on the TPU: the raw-signal peak detector (event segmentation) and the
// Suzuki-Kasahara adaptive banded Viterbi used to initialize event<->kmer
// maps. Semantics mirror the reference C implementations:
//   - short_long_peak_detector: /root/reference/impl/event_detection.c:122
//   - adaptive_banded_simple_event_align2: /root/reference/impl/eventAligner.c:902
// but operate on precomputed per-position emission parameters instead of
// model lookups (the Python layer prepares m_hat / inv / const arrays).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libsignalalign_native.so
//        signalalign_native.cpp

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// Two-detector peak scan over the short/long t-statistics.
// Returns the number of peaks written to out (caller allocates n slots).
long sa_peak_detector(const float* t1, const float* t2, long n,
                      long wl1, long wl2, float th1, float th2,
                      float peak_height, long* out) {
    const float DEF_VAL = std::numeric_limits<float>::max();
    const float* sig[2] = {t1, t2};
    const long wl[2] = {wl1, wl2};
    const float th[2] = {th1, th2};
    long masked_to[2] = {0, 0};
    long peak_pos[2] = {-1, -1};
    float peak_val[2] = {DEF_VAL, DEF_VAL};
    bool valid[2] = {false, false};
    long count = 0;

    for (long i = 0; i < n; ++i) {
        for (int k = 0; k < 2; ++k) {
            if (masked_to[k] >= i) continue;
            float cur = sig[k][i];
            if (peak_pos[k] == -1) {
                if (cur < peak_val[k]) {
                    peak_val[k] = cur;
                } else if (cur - peak_val[k] > peak_height) {
                    peak_val[k] = cur;
                    peak_pos[k] = i;
                }
            } else {
                if (cur > peak_val[k]) {
                    peak_val[k] = cur;
                    peak_pos[k] = i;
                }
                if (k == 0 && peak_val[0] > th[0]) {
                    masked_to[1] = peak_pos[0] + wl[0];
                    peak_pos[1] = -1;
                    peak_val[1] = DEF_VAL;
                    valid[1] = false;
                }
                if (peak_val[k] - cur > peak_height && peak_val[k] > th[k]) {
                    valid[k] = true;
                }
                if (valid[k] && (i - peak_pos[k]) > wl[k] / 2) {
                    out[count++] = peak_pos[k];
                    peak_pos[k] = -1;
                    peak_val[k] = cur;
                    valid[k] = false;
                }
            }
        }
    }
    return count;
}

// Adaptive banded Viterbi event<->kmer alignment.
//
// ev_mean:        event means, length n_events
// m_hat/inv/cst:  per-kmer-position gaussian params (expected scaled mean,
//                 1/(var*sd), log-normalization constant), length n_kmers
// out_kmer/out_event: preallocated (n_events + n_kmers) pair buffers
// qc_out[0..3]:   avg_log_emission, spanned, max_gap, events_per_kmer
// Returns the number of aligned pairs (in forward order), or 0.
long sa_adaptive_banded_align(const double* ev_mean, long n_events,
                              const double* m_hat, const double* inv,
                              const double* cst, long n_kmers,
                              long* out_kmer, long* out_event,
                              double* qc_out) {
    const int bandwidth = 100;
    const int half_bandwidth = bandwidth / 2;
    const double NEGINF = -INFINITY;

    double events_per_kmer = (double)n_events / (double)n_kmers;
    double p_stay = 1.0 - (1.0 / (events_per_kmer + 1.0));
    double lp_skip = std::log(1e-10);
    double lp_stay = std::log(p_stay);
    double lp_step = std::log(1.0 - std::exp(lp_skip) - std::exp(lp_stay));
    double lp_trim = std::log(0.01);

    long n_rows = n_events + 1;
    long n_cols = n_kmers + 1;
    long n_bands = n_rows + n_cols;

    std::vector<double> bands((size_t)n_bands * bandwidth, NEGINF);
    std::vector<uint8_t> trace((size_t)n_bands * bandwidth, 0);
    std::vector<long> ll_event(n_bands), ll_kmer(n_bands);

    auto band_at = [&](long bi, long off) -> double& {
        return bands[(size_t)bi * bandwidth + off];
    };
    auto trace_at = [&](long bi, long off) -> uint8_t& {
        return trace[(size_t)bi * bandwidth + off];
    };
    auto event_to_offset = [&](long bi, long ei) { return ll_event[bi] - ei; };
    auto kmer_to_offset = [&](long bi, long ki) { return ki - ll_kmer[bi]; };
    auto offset_valid = [&](long off) { return off >= 0 && off < bandwidth; };
    auto emission = [&](long ki, long ei) {
        double a = (ev_mean[ei] - m_hat[ki]) * inv[ki];
        return cst[ki] - 0.5 * a * a;
    };

    ll_event[0] = half_bandwidth - 1;
    ll_kmer[0] = -1 - half_bandwidth;
    ll_event[1] = ll_event[0] + 1;  // move_down
    ll_kmer[1] = ll_kmer[0];

    long start_off = kmer_to_offset(0, -1);
    band_at(0, start_off) = 0.0;
    long first_trim_off = event_to_offset(1, 0);
    band_at(1, first_trim_off) = lp_trim;
    trace_at(1, first_trim_off) = 1;  // FROM_U

    for (long bi = 2; bi < n_bands; ++bi) {
        double ll = band_at(bi - 1, 0);
        double ur = band_at(bi - 1, bandwidth - 1);
        bool ll_ob = ll == NEGINF;
        bool ur_ob = ur == NEGINF;
        bool right = (ll_ob && ur_ob) ? (bi % 2 == 1) : (ll < ur);
        if (right) {
            ll_event[bi] = ll_event[bi - 1];
            ll_kmer[bi] = ll_kmer[bi - 1] + 1;
        } else {
            ll_event[bi] = ll_event[bi - 1] + 1;
            ll_kmer[bi] = ll_kmer[bi - 1];
        }

        long trim_off = kmer_to_offset(bi, -1);
        if (offset_valid(trim_off)) {
            long ei = ll_event[bi] - trim_off;
            if (ei >= 0 && ei < n_events) {
                band_at(bi, trim_off) = lp_trim * (ei + 1);
                trace_at(bi, trim_off) = 1;
            } else {
                band_at(bi, trim_off) = NEGINF;
            }
        }

        long kmin = kmer_to_offset(bi, 0);
        long kmax = kmer_to_offset(bi, n_kmers);
        long emin = event_to_offset(bi, n_events - 1);
        long emax = event_to_offset(bi, -1);
        long mn = std::max(std::max(kmin, emin), 0L);
        long mx = std::min(std::min(kmax, emax), (long)bandwidth);

        for (long off = mn; off < mx; ++off) {
            long ei = ll_event[bi] - off;
            long ki = ll_kmer[bi] + off;
            long off_up = event_to_offset(bi - 1, ei - 1);
            long off_left = kmer_to_offset(bi - 1, ki - 1);
            long off_diag = kmer_to_offset(bi - 2, ki - 1);

            double up = offset_valid(off_up) ? band_at(bi - 1, off_up) : NEGINF;
            double left = offset_valid(off_left) ? band_at(bi - 1, off_left) : NEGINF;
            double diag = offset_valid(off_diag) ? band_at(bi - 2, off_diag) : NEGINF;

            double lp = emission(ki, ei);
            float sd = (float)(diag + lp_step + lp);
            float su = (float)(up + lp_stay + lp);
            float sl = (float)(left + lp_skip);
            // tie behavior matches the reference max/compare sequence
            // (eventAligner.c:1095-1100)
            float best = sd;
            uint8_t from = 0;
            if (su > best) { best = su; }
            if (best == su) { from = 1; }
            if (sl > best) { best = sl; }
            if (best == sl) { from = 2; }
            band_at(bi, off) = best;
            trace_at(bi, off) = from;
        }
    }

    // backtrack
    double max_score = NEGINF;
    long curr_event = 0;
    long curr_kmer = n_kmers - 1;
    for (long ei = 0; ei < n_events; ++ei) {
        long bi = (ei + 1) + (curr_kmer + 1);
        if (bi >= n_bands) continue;
        long off = event_to_offset(bi, ei);
        if (offset_valid(off)) {
            double s = band_at(bi, off) + (n_events - ei) * lp_trim;
            if (s > max_score) {
                max_score = s;
                curr_event = ei;
            }
        }
    }

    long count = 0;
    double sum_emission = 0.0;
    long n_aligned = 0;
    long curr_gap = 0, max_gap = 0;
    while (curr_kmer >= 0 && curr_event >= 0) {
        out_kmer[count] = curr_kmer;
        out_event[count] = curr_event;
        ++count;
        sum_emission += emission(curr_kmer, curr_event);
        ++n_aligned;
        long bi = (curr_event + 1) + (curr_kmer + 1);
        long off = event_to_offset(bi, curr_event);
        uint8_t from = trace_at(bi, off);
        if (from == 0) { --curr_kmer; --curr_event; curr_gap = 0; }
        else if (from == 1) { --curr_event; curr_gap = 0; }
        else { --curr_kmer; ++curr_gap; if (curr_gap > max_gap) max_gap = curr_gap; }
    }

    // reverse in place to forward order
    for (long i = 0; i < count / 2; ++i) {
        std::swap(out_kmer[i], out_kmer[count - 1 - i]);
        std::swap(out_event[i], out_event[count - 1 - i]);
    }

    qc_out[0] = n_aligned ? sum_emission / n_aligned : NEGINF;
    bool spanned = count > 0 && out_kmer[0] == 0 && out_kmer[count - 1] == n_kmers - 1;
    qc_out[1] = spanned ? 1.0 : 0.0;
    qc_out[2] = (double)max_gap;
    qc_out[3] = events_per_kmer;
    return count;
}

}  // extern "C"
