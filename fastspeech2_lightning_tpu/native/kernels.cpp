// Native host kernels (C++/OpenMP).
//
// The reference's only compiled code is numba-JIT MAS (fs2/attn/alignment.py)
// plus the pyworld C++ F0 dependency (SURVEY.md §2.3). Here both are plain
// C++ with an extern "C" ABI, loaded via ctypes:
//
//  - b_mas_width1: batched width-1 monotonic alignment search, OpenMP over
//    the batch. Identical recurrence to the numba kernel; serves as the
//    golden cross-check for the on-device lax.scan implementation and as the
//    fast host path for offline tools.
//  - yin_f0: YIN pitch tracker (difference function -> cumulative mean
//    normalization -> threshold + local-min descent -> parabolic
//    interpolation), OpenMP over frames. Same math as preprocessing/f0.py
//    (the NumPy implementation is the golden reference).

#include <cmath>
#include <cstring>
#include <vector>
#include <limits>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// log_attn: [B, T, L] row-major; out: [B, T, L] zero-initialized by caller.
void b_mas_width1(const float* log_attn, int B, int T, int L,
                  const int* in_lens, const int* out_lens, float* out) {
#pragma omp parallel for schedule(dynamic)
  for (int b = 0; b < B; ++b) {
    const int t_len = out_lens[b];
    const int l_len = in_lens[b];
    if (t_len <= 0 || l_len <= 0) continue;
    const float* la = log_attn + (size_t)b * T * L;
    float* o = out + (size_t)b * T * L;
    const float neg_inf = -std::numeric_limits<float>::infinity();

    std::vector<double> log_p((size_t)t_len * l_len);
    // first row: only j = 0 reachable
    log_p[0] = la[0];
    for (int j = 1; j < l_len; ++j) log_p[j] = neg_inf;
    for (int i = 1; i < t_len; ++i) {
      const double* prev = &log_p[(size_t)(i - 1) * l_len];
      double* cur = &log_p[(size_t)i * l_len];
      const float* row = la + (size_t)i * L;
      double prev_left = neg_inf;
      for (int j = 0; j < l_len; ++j) {
        double stay = prev[j];
        double best = stay > prev_left ? stay : prev_left;
        cur[j] = (double)row[j] + best;
        prev_left = stay;
      }
    }
    // backtrack from (t_len-1, l_len-1)
    int j = l_len - 1;
    for (int i = t_len - 1; i > 0; --i) {
      o[(size_t)i * L + j] = 1.0f;
      const double* prev = &log_p[(size_t)(i - 1) * l_len];
      if (j > 0 && prev[j - 1] >= prev[j]) --j;
    }
    o[j] = 1.0f;
  }
}

// audio: [n_samples]; f0_out: [n_frames]. Frames centered via reflect padding
// with frame_len = 2 * tau_max, hop-aligned with the spectrogram.
void yin_f0(const float* audio, long n_samples, int sr, int hop, int n_frames,
            float f_min, float f_max, float threshold, float* f0_out) {
  int tau_min = (int)(sr / f_max);
  if (tau_min < 2) tau_min = 2;
  const int tau_max = (int)(sr / f_min);
  const int frame_len = 2 * tau_max;
  const int W = tau_max;
  const int pad = frame_len / 2;

  // global max RMS for the silence gate (two passes like the NumPy path)
  std::vector<double> rms(n_frames, 0.0);

  auto sample_at = [&](long idx) -> float {
    // reflect padding
    long i = idx - pad;
    if (i < 0) i = -i;
    if (i >= n_samples) i = 2 * (n_samples - 1) - i;
    if (i < 0) i = 0;
    return audio[i];
  };

#pragma omp parallel for schedule(dynamic)
  for (int t = 0; t < n_frames; ++t) {
    const long start = (long)t * hop;
    std::vector<float> x(frame_len);
    for (int k = 0; k < frame_len; ++k) x[k] = sample_at(start + k);

    double energy = 0.0;
    for (int k = 0; k < W; ++k) energy += (double)x[k] * x[k];
    rms[t] = std::sqrt(energy / W);

    // difference function
    std::vector<double> d(tau_max + 1, 0.0);
    for (int tau = 1; tau <= tau_max; ++tau) {
      double acc = 0.0;
      for (int k = 0; k < W; ++k) {
        const double diff = (double)x[k] - (double)x[k + tau];
        acc += diff * diff;
      }
      d[tau] = acc;
    }
    // cumulative mean normalized difference
    std::vector<double> cmnd(tau_max + 1, 1.0);
    double cum = 0.0;
    for (int tau = 1; tau <= tau_max; ++tau) {
      cum += d[tau];
      cmnd[tau] = cum > 1e-12 ? d[tau] * tau / cum : 1.0;
    }
    // first tau under threshold (else global min)
    int tau_star = -1;
    double global_min = std::numeric_limits<double>::infinity();
    int global_arg = tau_min;
    for (int tau = tau_min; tau <= tau_max; ++tau) {
      if (cmnd[tau] < global_min) { global_min = cmnd[tau]; global_arg = tau; }
      if (tau_star < 0 && cmnd[tau] < threshold) tau_star = tau;
    }
    if (tau_star < 0) tau_star = global_arg;
    // descend to the local minimum (<= 35% past the crossing)
    {
      int limit = tau_star + (int)(tau_star * 0.35);
      if (limit - tau_star < 4) limit = tau_star + 4;
      if (limit > tau_max) limit = tau_max;
      int best = tau_star;
      for (int tau = tau_star; tau <= limit; ++tau)
        if (cmnd[tau] < cmnd[best]) best = tau;
      tau_star = best;
    }
    // parabolic interpolation
    int t0 = tau_star;
    if (t0 < tau_min + 1) t0 = tau_min + 1;
    if (t0 > tau_max - 1) t0 = tau_max - 1;
    const double d0 = cmnd[t0 - 1], d1 = cmnd[t0], d2 = cmnd[t0 + 1];
    const double denom = 2.0 * (d0 - 2.0 * d1 + d2);
    double delta = 0.0;
    if (std::fabs(denom) > 1e-12) delta = (d0 - d2) / denom;
    if (delta > 1.0) delta = 1.0;
    if (delta < -1.0) delta = -1.0;
    const double tau_refined = (double)t0 + delta;

    const double f0 = (double)sr / (tau_refined > 1e-6 ? tau_refined : 1e-6);
    const bool voiced =
        cmnd[tau_star] < threshold * 2.0 && f0 >= f_min && f0 <= f_max;
    f0_out[t] = voiced ? (float)f0 : 0.0f;
  }

  // silence gate pass
  double max_rms = 1e-12;
  for (int t = 0; t < n_frames; ++t) if (rms[t] > max_rms) max_rms = rms[t];
  const double gate = std::fmax(1e-4, 0.02 * max_rms);
  for (int t = 0; t < n_frames; ++t)
    if (rms[t] <= gate) f0_out[t] = 0.0f;
}

int fs2t_native_version() { return 1; }

}  // extern "C"
