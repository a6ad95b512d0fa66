/* Micro-benchmark of the reference's audio-classify hot loop, written fresh:
 * the per-window work of gstclassify's maybe_learn/train_channel
 * (gstclassify.c:2070-2254) — Hann window → FFT → triangular log-frequency
 * bins → RNN forward (zero-row-skipping matvec) → per-group softmax error →
 * depth-D truncated BPTT → momentum weight update, once per analysis window.
 * Defaults match the classify element: window=256 @ 8kHz (62.5 windows/s per
 * channel), 40 log bins, h=199, 2 classes, BPTT depth 30.
 *
 * Compiled -O3 -march=native -ffast-math, this is the "SIMD C core" the
 * BASELINE.json north star measures the TPU classify path against.
 *
 * Usage: ./bench_classify_baseline [seconds]  — prints windows/sec on stdout.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>
#include <time.h>

#ifndef HID
#define HID 199
#endif
#ifndef NBINS
#define NBINS 40
#endif
#ifndef NCLASSES
#define NCLASSES 2
#endif
#ifndef DEPTH
#define DEPTH 30
#endif
#define WINDOW 256
#define HALF (WINDOW / 2)

#define AL4(x) (((x) + 3) & ~3)
static const int h_size = AL4(HID + 1);
static const int i_size = AL4(HID + NBINS + 1);
static const int o_size = AL4(NCLASSES);

static double now(void) {
  struct timespec t;
  clock_gettime(CLOCK_MONOTONIC, &t);
  return t.tv_sec + 1e-9 * t.tv_nsec;
}

/* iterative radix-2 complex FFT, n a power of two */
static void fft(float *re, float *im, int n) {
  for (int i = 1, j = 0; i < n; i++) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      float t = re[i]; re[i] = re[j]; re[j] = t;
      t = im[i]; im[i] = im[j]; im[j] = t;
    }
  }
  for (int len = 2; len <= n; len <<= 1) {
    float ang = -2.0f * (float)M_PI / len;
    float wr = cosf(ang), wi = sinf(ang);
    for (int i = 0; i < n; i += len) {
      float cr = 1, ci = 0;
      for (int k = 0; k < len / 2; k++) {
        int a = i + k, b = i + k + len / 2;
        float ur = re[a], ui = im[a];
        float vr = re[b] * cr - im[b] * ci;
        float vi = re[b] * ci + im[b] * cr;
        re[a] = ur + vr; im[a] = ui + vi;
        re[b] = ur - vr; im[b] = ui - vi;
        float ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
}

int main(int argc, char **argv) {
  double budget = argc > 1 ? atof(argv[1]) : 3.0;
  float *ih = calloc(i_size * h_size, sizeof(float));
  float *ho = calloc(h_size * o_size, sizeof(float));
  float *ih_m = calloc(i_size * h_size, sizeof(float));
  float *ho_m = calloc(h_size * o_size, sizeof(float));
  float *ih_d = calloc(i_size * h_size, sizeof(float));
  float *hist = calloc(DEPTH * i_size, sizeof(float));
  float *hidden = calloc(h_size, sizeof(float));
  float *out = calloc(o_size, sizeof(float));
  float *e_a = calloc(i_size, sizeof(float));
  float *e_b = calloc(i_size, sizeof(float));
  float hann[WINDOW], re[WINDOW], im[WINDOW];
  float pcm[WINDOW + HALF];
  /* triangular bins over the 129 rfft magnitudes: precomputed start/width */
  int bin_start[NBINS], bin_len[NBINS];
  unsigned rng = 12345;

  for (int i = 0; i < WINDOW; i++)
    hann[i] = 0.5f - 0.5f * cosf(2.0f * (float)M_PI * i / WINDOW);
  /* log-spaced triangle bins between fft bin 3 and 128 (≈100Hz..4kHz) */
  for (int b = 0; b < NBINS; b++) {
    float lo = 3.0f * powf(128.0f / 3.0f, (float)b / NBINS);
    float hi = 3.0f * powf(128.0f / 3.0f, (float)(b + 1) / NBINS);
    bin_start[b] = (int)lo;
    bin_len[b] = (int)hi - (int)lo + 1;
    if (bin_start[b] + bin_len[b] > 129) bin_len[b] = 129 - bin_start[b];
    if (bin_len[b] < 1) bin_len[b] = 1;
  }
  for (int i = 0; i < i_size * h_size; i++) {
    rng = rng * 1103515245 + 12345;
    ih[i] = ((rng >> 16 & 0xffff) / 65536.0f - 0.5f) * 0.2f;
    if ((rng & 7) < 5) ih[i] = 0.0f; /* ~70% perforation like default init */
  }
  for (int i = 0; i < h_size * o_size; i++) {
    rng = rng * 1103515245 + 12345;
    ho[i] = ((rng >> 16 & 0xffff) / 65536.0f - 0.5f) * 0.2f;
  }
  for (int i = 0; i < WINDOW + HALF; i++) {
    rng = rng * 1103515245 + 12345;
    pcm[i] = ((rng >> 16 & 0xffff) / 65536.0f - 0.5f);
  }

  double t0 = now();
  long windows = 0;
  int head = 0;
  const float lr = 1e-4f, mom = 0.95f, momw = 0.5f;
  while (now() - t0 < budget) {
    for (int rep = 0; rep < 20; rep++, windows++) {
      /* shift in a new half-window of "PCM" (the stream advances by HALF) */
      memmove(pcm, pcm + HALF, WINDOW * sizeof(float));
      for (int i = WINDOW; i < WINDOW + HALF; i++) {
        rng = rng * 1103515245 + 12345;
        pcm[i] = ((rng >> 16 & 0xffff) / 65536.0f - 0.5f);
      }
      /* features: window → FFT → power → triangle bins → log */
      for (int i = 0; i < WINDOW; i++) {
        re[i] = pcm[i] * hann[i];
        im[i] = 0.0f;
      }
      fft(re, im, WINDOW);
      float power[129];
      for (int i = 0; i < 129; i++) power[i] = re[i] * re[i] + im[i] * im[i];
      float feats[NBINS];
      for (int b = 0; b < NBINS; b++) {
        float s = 0;
        for (int k = 0; k < bin_len[b]; k++) s += power[bin_start[b] + k];
        feats[b] = logf(s + 1e-6f);
      }
      /* write history row: [1, hidden, features] */
      head = (head + 1) % DEPTH;
      float *row = hist + head * i_size;
      memset(row, 0, i_size * sizeof(float));
      row[0] = 1.0f;
      memcpy(row + 1, hidden + 1, HID * sizeof(float));
      memcpy(row + HID + 1, feats, NBINS * sizeof(float));
      /* forward: sparse matvec + relu, then dense out */
      memset(hidden, 0, h_size * sizeof(float));
      for (int y = 0; y < i_size; y++) {
        float in = row[y];
        if (in != 0.0f) {
          const float *w = ih + y * h_size;
          for (int x = 0; x < h_size; x++) hidden[x] += in * w[x];
        }
      }
      for (int x = 0; x < h_size; x++)
        hidden[x] = hidden[x] > 0 ? hidden[x] : 0;
      hidden[0] = 1.0f;
      memset(out, 0, o_size * sizeof(float));
      for (int y = 0; y < h_size; y++) {
        float in = hidden[y];
        if (in != 0.0f) {
          const float *w = ho + y * o_size;
          for (int x = 0; x < o_size; x++) out[x] += in * w[x];
        }
      }
      /* softmax error against a random target + top layer sgd */
      float mx = out[0];
      for (int x = 1; x < NCLASSES; x++) if (out[x] > mx) mx = out[x];
      float sum = 0, oerr[o_size];
      memset(oerr, 0, sizeof(oerr));
      for (int x = 0; x < NCLASSES; x++) {
        oerr[x] = expf(out[x] - mx);
        sum += oerr[x];
      }
      for (int x = 0; x < NCLASSES; x++) oerr[x] = -oerr[x] / sum;
      oerr[(rng >> 20) % NCLASSES] += 1.0f;
      memset(e_a, 0, i_size * sizeof(float));
      for (int y = 1; y < h_size; y++) {
        if (hidden[y] != 0.0f) {
          const float *w = ho + y * o_size;
          float *m = ho_m + y * o_size;
          float e = 0;
          float t = hidden[y] * lr;
          for (int x = 0; x < NCLASSES; x++) {
            e += w[x] * oerr[x];
            float d = oerr[x] * t;
            ho[y * o_size + x] += d + m[x] * momw;
            m[x] = (m[x] + d) * mom;
          }
          e_a[y] = e;
        }
      }
      /* BPTT over depth with row skipping */
      memset(ih_d, 0, i_size * h_size * sizeof(float));
      float *h_err = e_a, *i_err = e_b;
      int off = head;
      for (int t = DEPTH; t > 0; t--) {
        const float *inputs = hist + off * i_size;
        h_err[0] = 0;
        for (int k = HID + 1; k < h_size; k++) h_err[k] = 0;
        float es = 0;
        for (int y = 0; y < i_size; y++) {
          float in = inputs[y];
          if (in != 0.0f) {
            float *d = ih_d + y * h_size;
            const float *w = ih + y * h_size;
            float e = 0;
            for (int x = 0; x < h_size; x++) {
              float ex = h_err[x];
              d[x] += ex * in;
              e += w[x] * ex;
            }
            i_err[y] = e;
            es += e * e;
          } else {
            i_err[y] = 0;
          }
        }
        float *tmp = h_err; h_err = i_err; i_err = tmp;
        if (es < 1e-12f || es > 100.0f) break;
        off = off ? off - 1 : DEPTH - 1;
      }
      /* momentum apply on ih (once per window, like the element) */
      for (int i = 0; i < i_size * h_size; i++) {
        float t = ih_d[i] * lr;
        ih[i] += t + ih_m[i] * momw;
        ih_m[i] = (ih_m[i] + t) * mom;
      }
    }
  }
  double dt = now() - t0;
  printf("%.1f\n", windows / dt);
  fprintf(stderr, "checksum %g\n", hidden[1] + ih[1000] + ho[100] + out[0]);
  return 0;
}
