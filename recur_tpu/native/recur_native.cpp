// Native runtime helpers for recur_tpu, exposed through a plain C ABI and
// loaded with ctypes (no pybind11 in this image).
//
// These are the host-side hot paths around the TPU compute graph — the jobs
// the reference does in C (recur-rng.h, recur-nn-init.c, audio-common.h,
// charmodel-init.c) and that pure Python does 100-1000x too slowly for
// production-sized nets and streams:
//
//   * bit-exact JSF64 PRNG streams and the Irwin-Hall gaussian
//   * the FLAT weight-init family with perforation (exact RNG call order,
//     recur-nn-init.c:495-573)
//   * interleaved s16 -> per-channel half-overlapped float window framing
//     (the gstclassify ring-buffer/window path, gstclassify.c:2024-2066)
//   * byte -> symbol LUT text encoding with space collapsing
//     (charmodel-init.c:270-329)
//
// Build: recur_tpu/native/build.py (g++ -O3 -march=native -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cmath>

extern "C" {

typedef struct { uint64_t a, b, c, d; } rng_t;

static inline uint64_t rot64(uint64_t x, int k) {
  return (x << k) | (x >> (64 - k));
}

static inline uint64_t rand64(rng_t *r) {
  uint64_t e = r->a - rot64(r->b, 7);
  r->a = r->b ^ rot64(r->c, 13);
  r->b = r->c + rot64(r->d, 37);
  r->c = r->d + e;
  r->d = e + r->a;
  return r->d;
}

void rng_init(rng_t *r, uint64_t seed) {
  r->a = 0xf1ea5eed;
  r->b = r->c = r->d = seed;
  for (int i = 0; i < 20; i++) rand64(r);
}

void rng_fill_u64(rng_t *r, uint64_t *out, int64_t n) {
  for (int64_t i = 0; i < n; i++) out[i] = rand64(r);
}

static inline double rand_double(rng_t *r) {
  union { uint64_t i; double d; } x;
  x.i = (rand64(r) & 0x000fffffffffffffULL) | 0x3ff0000000000000ULL;
  return x.d - 1.0;
}

static inline float cheap_gaussian(rng_t *r) {
  int64_t acc = 0;
  for (int k = 0; k < 3; k++) {
    uint64_t i = rand64(r);
    for (int j = 0; j < 4; j++) { acc += (int64_t)(i & 0xffff); i >>= 16; }
  }
  return (float)(acc - 0xffffLL * 6) / (float)0xffff;
}

void rng_fill_gaussian(rng_t *r, float *out, int64_t n) {
  for (int64_t i = 0; i < n; i++) out[i] = cheap_gaussian(r);
}

void rng_fill_double01(rng_t *r, double *out, int64_t n) {
  for (int64_t i = 0; i < n; i++) out[i] = rand_double(r);
}

// randomise_array_flat (recur-nn-init.c:495-545): same per-element RNG call
// sequence.  shape: 1 uniform, 2 gaussian, 3 log-normal, 4 semicircle.
void init_flat(rng_t *r, float *array, int width, int height, int stride,
               int offset, float variance, int shape, double perforation) {
  float stddev = sqrtf(variance);
  for (int y = 0; y < height; y++) {
    for (int x = offset; x < width + offset; x++) {
      if (perforation != 0.0 && rand_double(r) <= perforation) continue;
      float v;
      switch (shape) {
      case 1: {  // uniform
        double range = sqrtf(12.0f * variance);
        v = (float)(range * rand_double(r) - range * 0.5);
        break;
      }
      case 3: {  // log-normal
        float a = cheap_gaussian(r) * 0.33f;
        float b = 0.9f * stddev * expf(a);
        v = (rand64(r) & 1) ? b : -b;
        break;
      }
      case 4: {  // semicircle
        double a, b;
        do {
          a = rand_double(r) * 2.0 - 1.0;
          b = rand_double(r);
        } while (a * a + b * b > 1.0);
        v = (float)(stddev * 2 * a);
        break;
      }
      default:   // gaussian
        v = stddev * cheap_gaussian(r);
      }
      array[(int64_t)y * stride + x] = v;
    }
  }
}

// rnn_scale_initial_weights (recur-nn.c:1027-1076): iteratively scale the
// ih matrix toward a target forward gain by simulating `generations` random
// ReLU activation vectors.  Same RNG call order as the Python fallback
// (ops/init.py scale_initial_weights), which at h=199 spends minutes on the
// ~2M sequential cheap_gaussian calls this does in well under a second.
void scale_weights_to_gain(rng_t *r, float *ih, int h_size, int hidden_size,
                           int64_t n_elements, float target_gain,
                           int generations) {
  float *layer_in = new float[h_size]();
  float *out = new float[h_size];
  for (int j = 1; j < generations; j++) {
    layer_in[0] = 1.0f;
    float sum_in = 1.0f;
    for (int i = 1; i < hidden_size; i++) {
      float n = cheap_gaussian(r);
      n = n > 0.0f ? n : 0.0f;
      layer_in[i] = n;
      sum_in += n * n;
    }
    for (int x = 0; x < h_size; x++) out[x] = 0.0f;
    for (int y = 0; y < hidden_size + 1; y++) {
      float in = layer_in[y];
      if (in != 0.0f) {
        const float *w = ih + (int64_t)y * h_size;
        for (int x = 0; x < h_size; x++) out[x] += in * w[x];
      }
    }
    out[0] = 1.0f;
    float sum_out = 0.0f;
    for (int x = 0; x < hidden_size; x++) {
      float h = out[x] > 0.0f ? out[x] : 0.0f;
      sum_out += h * h;
    }
    float ratio = sum_out / sum_in;
    float adj = (target_gain * 10 + j) / (ratio * 10 + j);
    for (int64_t i = 0; i < n_elements; i++) ih[i] *= adj;
  }
  delete[] layer_in;
  delete[] out;
}

// Interleaved s16 PCM -> [n_windows, n_channels, window] float frames with
// 50% overlap; `tail` is the [n_channels, window/2] carry between calls.
// Returns the number of windows produced.
int64_t frame_interleaved_s16(const int16_t *pcm, int64_t n_samples,
                              int n_channels, int window, float *tail,
                              float *out /* [n_win, C, window] */) {
  int half = window / 2;
  int64_t per_chan = n_samples / n_channels;
  int64_t n_win = per_chan / half;
  for (int64_t t = 0; t < n_win; t++) {
    for (int c = 0; c < n_channels; c++) {
      float *dst = out + (t * n_channels + c) * (int64_t)window;
      float *tl = tail + (int64_t)c * half;
      memcpy(dst, tl, half * sizeof(float));
      const int16_t *src = pcm + (t * half) * n_channels + c;
      for (int i = 0; i < half; i++) {
        float v = (float)src[(int64_t)i * n_channels];
        dst[half + i] = v;
        tl[i] = v;
      }
    }
  }
  return n_win;
}

// Encode bytes through a 256-entry LUT with optional space collapsing
// (charmodel-init.c:270-329, byte alphabets).  Returns encoded length.
int64_t encode_text(const uint8_t *text, int64_t len, const uint8_t *lut,
                    int collapse_space, uint8_t space, uint8_t *out) {
  int64_t j = 0;
  uint8_t prev = space;
  for (int64_t i = 0; i < len; i++) {
    uint8_t chr = text[i];
    if (chr == 0) break;
    uint8_t c = lut[chr];
    if (collapse_space) {
      if (c != space || prev != space) {
        prev = c;
        out[j++] = c;
      }
    } else {
      out[j++] = c;
    }
  }
  return j;
}

}  // extern "C"
