/* Micro-benchmark of the reference's training hot loop, written fresh:
 * one-hot forward (zero-row-skipping matvec), depth-D truncated BPTT with
 * row skipping, and a momentum weight update — the same per-character work
 * rnn_char_epoch does at text-predict defaults (h=199, ~42 symbols, depth
 * 30).  Compiled -O3 -march=native, this is the "SIMD C core" baseline the
 * TPU build is measured against (BASELINE.md north star).
 *
 * Usage: ./bench_baseline [seconds]   — prints chars/sec on stdout.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>
#include <time.h>

#ifndef HID
#define HID 199
#endif
#ifndef IN
#define IN 42
#endif
#ifndef OUT
#define OUT 42
#endif
#ifndef DEPTH
#define DEPTH 30
#endif

#define AL4(x) (((x) + 3) & ~3)
static const int h_size = AL4(HID + 1);
static const int i_size = AL4(HID + IN + 1);
static const int o_size = AL4(OUT);

static double now(void) {
  struct timespec t;
  clock_gettime(CLOCK_MONOTONIC, &t);
  return t.tv_sec + 1e-9 * t.tv_nsec;
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
  unsigned rng = 12345;

  for (int i = 0; i < i_size * h_size; i++) {
    rng = rng * 1103515245 + 12345;
    ih[i] = ((rng >> 16 & 0xffff) / 65536.0f - 0.5f) * 0.2f;
    if ((rng & 7) < 5) ih[i] = 0.0f; /* ~70% perforation, like the default init */
  }
  for (int i = 0; i < h_size * o_size; i++) {
    rng = rng * 1103515245 + 12345;
    ho[i] = ((rng >> 16 & 0xffff) / 65536.0f - 0.5f) * 0.2f;
  }

  double t0 = now();
  long chars = 0;
  int head = 0;
  const float lr = 1e-3f, mom = 0.95f, momw = 0.5f;
  while (now() - t0 < budget) {
    for (int rep = 0; rep < 50; rep++, chars++) {
      /* write history row: [1, hidden, onehot] */
      head = (head + 1) % DEPTH;
      float *row = hist + head * i_size;
      memset(row, 0, i_size * sizeof(float));
      row[0] = 1.0f;
      memcpy(row + 1, hidden + 1, HID * sizeof(float));
      rng = rng * 1103515245 + 12345;
      row[HID + 1 + (rng >> 16) % IN] = 1.0f;
      /* forward: sparse matvec + relu, then dense out */
      memset(hidden, 0, h_size * sizeof(float));
      for (int y = 0; y < i_size; y++) {
        float in = row[y];
        if (in != 0.0f) {
          const float *w = ih + y * h_size;
          for (int x = 0; x < h_size; x++) hidden[x] += in * w[x];
        }
      }
      for (int x = 0; x < h_size; x++) hidden[x] = hidden[x] > 0 ? hidden[x] : 0;
      hidden[0] = 1.0f;
      memset(out, 0, o_size * sizeof(float));
      for (int y = 0; y < h_size; y++) {
        float in = hidden[y];
        if (in != 0.0f) {
          const float *w = ho + y * o_size;
          for (int x = 0; x < o_size; x++) out[x] += in * w[x];
        }
      }
      /* softmax-ish top error + top layer sgd */
      float mx = out[0];
      for (int x = 1; x < OUT; x++) if (out[x] > mx) mx = out[x];
      float sum = 0, oerr[o_size];
      for (int x = 0; x < OUT; x++) { oerr[x] = expf(out[x] - mx); sum += oerr[x]; }
      for (int x = 0; x < OUT; x++) oerr[x] = -oerr[x] / sum;
      oerr[(rng >> 20) % OUT] += 1.0f;
      memset(e_a, 0, i_size * sizeof(float));
      for (int y = 1; y < h_size; y++) {
        if (hidden[y] != 0.0f) {
          const float *w = ho + y * o_size;
          float *m = ho_m + y * o_size;
          float e = 0;
          float t = hidden[y] * lr;
          for (int x = 0; x < OUT; x++) {
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
      /* momentum apply on ih */
      for (int i = 0; i < i_size * h_size; i++) {
        float t = ih_d[i] * lr;
        ih[i] += t + ih_m[i] * momw;
        ih_m[i] = (ih_m[i] + t) * mom;
      }
    }
  }
  double dt = now() - t0;
  printf("%.1f\n", chars / dt);
  /* keep the optimizer honest */
  fprintf(stderr, "checksum %g\n", hidden[1] + ih[1000] + ho[100]);
  return 0;
}
