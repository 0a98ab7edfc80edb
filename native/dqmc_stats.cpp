// Native statistics core for binned Monte-Carlo data.
//
// The reference delegates all post-processing statistics to a Python script
// (scripts/analysis.py); at production bin counts and lattice sizes the
// jackknife over unequal-time cubes is the heaviest host-side step.  This
// library implements the estimators in C++ (single pass over bins, no
// (n_bins x n_elem) temporaries) and is loaded via ctypes
// (dqmc_tpu/native.py); the Python implementations remain as fallback and
// as the parity oracle (tests/test_native.py).
//
// All arrays are C-contiguous float64 unless noted.  Complex data is
// interleaved (re, im) and handled by treating it as 2x as many doubles --
// valid because the jackknife estimator below uses direct complex
// arithmetic componentwise-linearly for the mean and squares the complex
// difference for the variance, matching analysis.py:286-296 semantics only
// when re/im are squared separately... therefore complex variance uses the
// dedicated entry point dqmc_jackknife_complex.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Delete-1 jackknife over axis 0: data (n_bins, n_elem) -> mean, err
// (n_elem).  Identical math to analysis.py:232-298:
//   theta_i = (n*mean - x_i) / (n-1)
//   err = sqrt((n-1)/n * sum_i (theta_i - mean(theta))^2)
// For the delete-1 estimator mean(theta) == mean(x), and
// theta_i - mean = (mean - x_i) / (n-1), so
//   err = sqrt( sum_i (x_i - mean)^2 / (n (n-1)) )
// computed in a single streaming pass per element.
int dqmc_jackknife(const double* data, int64_t n_bins, int64_t n_elem,
                   double* mean_out, double* err_out) {
    if (n_bins < 2) return -1;
    for (int64_t e = 0; e < n_elem; ++e) {
        double m = 0.0;
        for (int64_t b = 0; b < n_bins; ++b) m += data[b * n_elem + e];
        m /= (double)n_bins;
        double ss = 0.0;
        for (int64_t b = 0; b < n_bins; ++b) {
            const double d = data[b * n_elem + e] - m;
            ss += d * d;
        }
        mean_out[e] = m;
        err_out[e] = std::sqrt(ss / ((double)n_bins * (double)(n_bins - 1)));
    }
    return 0;
}

// Complex jackknife with the reference's direct complex arithmetic: the
// "error" is sqrt of the COMPLEX variance sum (analysis.py:295-296), i.e.
// err = csqrt( sum_i (z_i - mean)^2 / (n (n-1)) ).  data interleaved
// (re, im): (n_bins, n_elem, 2); outputs likewise.
int dqmc_jackknife_complex(const double* data, int64_t n_bins,
                           int64_t n_elem, double* mean_out,
                           double* err_out) {
    if (n_bins < 2) return -1;
    for (int64_t e = 0; e < n_elem; ++e) {
        double mr = 0.0, mi = 0.0;
        for (int64_t b = 0; b < n_bins; ++b) {
            mr += data[(b * n_elem + e) * 2 + 0];
            mi += data[(b * n_elem + e) * 2 + 1];
        }
        mr /= (double)n_bins;
        mi /= (double)n_bins;
        double sr = 0.0, si = 0.0;  // sum of complex squares
        for (int64_t b = 0; b < n_bins; ++b) {
            const double dr = data[(b * n_elem + e) * 2 + 0] - mr;
            const double di = data[(b * n_elem + e) * 2 + 1] - mi;
            sr += dr * dr - di * di;
            si += 2.0 * dr * di;
        }
        const double scale = (double)n_bins * (double)(n_bins - 1);
        sr /= scale;
        si /= scale;
        // principal complex square root
        const double r = std::hypot(sr, si);
        double re = std::sqrt((r + sr) / 2.0);
        double im = std::sqrt((r - sr) / 2.0);
        if (si < 0) im = -im;
        mean_out[e * 2 + 0] = mr;
        mean_out[e * 2 + 1] = mi;
        err_out[e * 2 + 0] = re;
        err_out[e * 2 + 1] = im;
    }
    return 0;
}

// Rebin: merge `factor` consecutive bins by averaging.
// data (n_bins, n_elem) -> out (n_bins/factor, n_elem); returns new n_bins.
int64_t dqmc_rebin(const double* data, int64_t n_bins, int64_t n_elem,
                   int64_t factor, double* out) {
    if (factor < 1) return -1;
    const int64_t n_out = n_bins / factor;
    for (int64_t o = 0; o < n_out; ++o) {
        for (int64_t e = 0; e < n_elem; ++e) {
            double acc = 0.0;
            for (int64_t f = 0; f < factor; ++f)
                acc += data[(o * factor + f) * n_elem + e];
            out[o * n_elem + e] = acc / (double)factor;
        }
    }
    return n_out;
}

// Integrated autocorrelation time of a scalar series via the standard
// windowed estimator: tau = 1 + 2 sum_{t=1..W} rho(t), with the automatic
// window W = min{t : t >= c * tau(t)} (Sokal, c = 5).
double dqmc_autocorr_time(const double* x, int64_t n) {
    if (n < 4) return 1.0;
    double m = 0.0;
    for (int64_t i = 0; i < n; ++i) m += x[i];
    m /= (double)n;
    double var = 0.0;
    for (int64_t i = 0; i < n; ++i) var += (x[i] - m) * (x[i] - m);
    var /= (double)n;
    if (var <= 0.0) return 1.0;
    double tau = 1.0;
    for (int64_t t = 1; t < n / 2; ++t) {
        double c = 0.0;
        for (int64_t i = 0; i + t < n; ++i)
            c += (x[i] - m) * (x[i + t] - m);
        c /= (double)(n - t) * var;
        tau += 2.0 * c;
        if ((double)t >= 5.0 * tau) break;
        if (c < 0.0) break;
    }
    return tau < 1.0 ? 1.0 : tau;
}

}  // extern "C"
