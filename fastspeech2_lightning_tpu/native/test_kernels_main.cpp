// Sanitizer test harness for the native kernels (ASAN/UBSAN build target —
// SURVEY.md §5.2: "C++ kernels get ASAN in their own test target").
//
// Build + run:  make native-test
// Checks b_mas_width1 alignment invariants (one active text index per mel
// frame, monotonic non-decreasing path, endpoints pinned, zero outside
// lens) and yin_f0 on a synthetic 220 Hz sine (within 5% on voiced frames),
// including ragged batches so out-of-bounds reads/writes surface under ASAN.

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

extern "C" {
void b_mas_width1(const float* log_attn, int B, int T, int L,
                  const int* in_lens, const int* out_lens, float* out);
void yin_f0(const float* audio, long n_samples, int sr, int hop, int n_frames,
            float f_min, float f_max, float threshold, float* f0_out);
int fs2t_native_version();
}

static int failures = 0;
#define CHECK(cond, ...)                                   \
  do {                                                     \
    if (!(cond)) {                                         \
      std::fprintf(stderr, "FAIL %s:%d: ", __FILE__, __LINE__); \
      std::fprintf(stderr, __VA_ARGS__);                   \
      std::fprintf(stderr, "\n");                          \
      ++failures;                                          \
    }                                                      \
  } while (0)

static void test_mas() {
  const int B = 3, T = 64, L = 24;
  std::mt19937 rng(7);
  std::normal_distribution<float> gauss(0.f, 1.f);
  std::vector<float> la((size_t)B * T * L);
  for (auto& v : la) v = gauss(rng);
  // ragged lengths, incl. a degenerate 1-phone row
  int in_lens[B] = {24, 13, 1};
  int out_lens[B] = {64, 40, 8};
  std::vector<float> out((size_t)B * T * L, 0.f);
  b_mas_width1(la.data(), B, T, L, in_lens, out_lens, out.data());

  for (int b = 0; b < B; ++b) {
    int prev_j = 0;
    for (int i = 0; i < T; ++i) {
      int ones = 0, j_at = -1;
      for (int j = 0; j < L; ++j) {
        float v = out[((size_t)b * T + i) * L + j];
        CHECK(v == 0.f || v == 1.f, "b=%d i=%d j=%d v=%f", b, i, j, v);
        if (v == 1.f) { ++ones; j_at = j; }
      }
      if (i < out_lens[b]) {
        CHECK(ones == 1, "b=%d i=%d ones=%d", b, i, ones);
        CHECK(j_at >= prev_j && j_at <= prev_j + 1,
              "non-monotonic b=%d i=%d j=%d prev=%d", b, i, j_at, prev_j);
        if (i == 0) CHECK(j_at == 0, "b=%d starts at j=%d", b, j_at);
        if (i == out_lens[b] - 1)
          CHECK(j_at == in_lens[b] - 1, "b=%d ends at j=%d", b, j_at);
        prev_j = j_at;
      } else {
        CHECK(ones == 0, "b=%d i=%d writes beyond out_len", b, i);
      }
    }
  }
}

static void test_yin() {
  const int sr = 22050, hop = 256;
  const float freq = 220.f;
  const long n = sr;  // 1 second
  const int n_frames = (int)(n / hop) + 1;
  std::vector<float> audio(n);
  for (long i = 0; i < n; ++i)
    audio[i] = 0.6f * std::sin(2.0 * M_PI * freq * i / sr);
  std::vector<float> f0(n_frames, -1.f);
  yin_f0(audio.data(), n, sr, hop, n_frames, 50.f, 1000.f, 0.2f, f0.data());
  int voiced = 0;
  for (int i = 2; i < n_frames - 2; ++i) {  // skip edge frames
    if (f0[i] > 0.f) {
      ++voiced;
      CHECK(std::fabs(f0[i] - freq) < 0.05f * freq,
            "frame %d f0=%f expected ~%f", i, f0[i], freq);
    }
  }
  CHECK(voiced > n_frames / 2, "only %d/%d voiced frames", voiced, n_frames);
}

int main() {
  CHECK(fs2t_native_version() == 1, "version");
  test_mas();
  test_yin();
  if (failures) {
    std::fprintf(stderr, "%d failure(s)\n", failures);
    return 1;
  }
  std::puts("native kernel tests passed (sanitizers clean)");
  return 0;
}
