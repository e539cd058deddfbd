/* Parity fixture generator.
 *
 * Compiles against the READ-ONLY reference sources in /root/reference/src
 * (never copied into this repo) and dumps golden outputs that the JAX
 * implementation is tested against. Build with tools/cref/build.sh.
 *
 * Modes:
 *   ulaw                 out.f32            u-law tables (lin2ulaw sweep + ulaw2lin 0..255)
 *   dct    n in.f32 out.f32                 forward DCT of n 18-vectors
 *   idct   n in.f32 out.f32                 inverse DCT of n 18-vectors
 *   lpc    n in.f32 out.f32                 lpc_from_cepstrum of n 18-vectors -> n x 16
 *   bands  n in.f32 out.f32                 window+FFT+band energy of n 320-windows -> n x 18
 *   burg   n in.f32 out.f32                 burg_cepstral_analysis of n 160-frames -> n x 36
 *   features  in.s16 out.f32                lpcnet_compute_features superframe loop (4 x 36 per 640)
 *   encode    in.s16 out.bin                lpcnet_encode superframe loop (8 bytes per 640)
 *   decode    in.bin out.f32                decode_packet loop (4 x 36 per 8 bytes)
 *   framedbg  in.s16 xc.f32 w.f32 exc.f32 feat.f32   per-frame internals
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>
#include "lpcnet.h"
#include "freq.h"
#include "lpcnet_private.h"

static void die(const char *msg) { fprintf(stderr, "%s\n", msg); exit(1); }

static FILE *xopen(const char *path, const char *mode) {
  FILE *f = fopen(path, mode);
  if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
  return f;
}

int main(int argc, char **argv) {
  if (argc < 2) die("usage: harness <mode> ...");
  const char *mode = argv[1];

  if (!strcmp(mode, "ulaw")) {
    FILE *out = xopen(argv[2], "wb");
    int i;
    for (i = -32768; i <= 32767; i += 7) {
      float v = (float)lin2ulaw((float)i);
      fwrite(&v, 4, 1, out);
    }
    for (i = 0; i < 256; i++) {
      float v = ulaw2lin((float)i);
      fwrite(&v, 4, 1, out);
    }
    fclose(out);
  } else if (!strcmp(mode, "dct") || !strcmp(mode, "idct")) {
    int n = atoi(argv[2]);
    FILE *in = xopen(argv[3], "rb"), *out = xopen(argv[4], "wb");
    float x[NB_BANDS], y[NB_BANDS];
    for (int k = 0; k < n; k++) {
      if (fread(x, 4, NB_BANDS, in) != NB_BANDS) die("short read");
      if (!strcmp(mode, "dct")) dct(y, x);
      else {
        /* idct is static in freq.c; recompute from the shared table. */
        extern const float dct_table[];
        int i, j;
        for (i = 0; i < NB_BANDS; i++) {
          float sum = 0;
          for (j = 0; j < NB_BANDS; j++) sum += x[j] * dct_table[i * NB_BANDS + j];
          y[i] = sum * sqrt(2. / NB_BANDS);
        }
      }
      fwrite(y, 4, NB_BANDS, out);
    }
    fclose(in); fclose(out);
  } else if (!strcmp(mode, "lpc")) {
    int n = atoi(argv[2]);
    FILE *in = xopen(argv[3], "rb"), *out = xopen(argv[4], "wb");
    float ceps[NB_BANDS], lpc[LPC_ORDER];
    for (int k = 0; k < n; k++) {
      if (fread(ceps, 4, NB_BANDS, in) != NB_BANDS) die("short read");
      lpc_from_cepstrum(lpc, ceps);
      fwrite(lpc, 4, LPC_ORDER, out);
    }
    fclose(in); fclose(out);
  } else if (!strcmp(mode, "bands")) {
    int n = atoi(argv[2]);
    FILE *in = xopen(argv[3], "rb"), *out = xopen(argv[4], "wb");
    float x[WINDOW_SIZE];
    kiss_fft_cpx X[FREQ_SIZE];
    float e[NB_BANDS];
    for (int k = 0; k < n; k++) {
      if (fread(x, 4, WINDOW_SIZE, in) != WINDOW_SIZE) die("short read");
      apply_window(x);
      forward_transform(X, x);
      lpcn_compute_band_energy(e, X);
      fwrite(e, 4, NB_BANDS, out);
    }
    fclose(in); fclose(out);
  } else if (!strcmp(mode, "burg")) {
    int n = atoi(argv[2]);
    FILE *in = xopen(argv[3], "rb"), *out = xopen(argv[4], "wb");
    float x[FRAME_SIZE], ceps[2 * NB_BANDS];
    for (int k = 0; k < n; k++) {
      if (fread(x, 4, FRAME_SIZE, in) != FRAME_SIZE) die("short read");
      burg_cepstral_analysis(ceps, x);
      fwrite(ceps, 4, 2 * NB_BANDS, out);
    }
    fclose(in); fclose(out);
  } else if (!strcmp(mode, "features") || !strcmp(mode, "encode")) {
    FILE *in = xopen(argv[2], "rb"), *out = xopen(argv[3], "wb");
    LPCNetEncState *st = lpcnet_encoder_create();
    short pcm[LPCNET_PACKET_SAMPLES];
    float feat[4][NB_TOTAL_FEATURES];
    unsigned char buf[LPCNET_COMPRESSED_SIZE];
    while (fread(pcm, 2, LPCNET_PACKET_SAMPLES, in) == LPCNET_PACKET_SAMPLES) {
      if (!strcmp(mode, "features")) {
        lpcnet_compute_features(st, pcm, feat);
        fwrite(feat, 4, 4 * NB_TOTAL_FEATURES, out);
      } else {
        lpcnet_encode(st, pcm, buf);
        fwrite(buf, 1, LPCNET_COMPRESSED_SIZE, out);
      }
    }
    lpcnet_encoder_destroy(st);
    fclose(in); fclose(out);
  } else if (!strcmp(mode, "decode")) {
    FILE *in = xopen(argv[2], "rb"), *out = xopen(argv[3], "wb");
    float vq_mem[NB_BANDS] = {0};
    unsigned char buf[LPCNET_COMPRESSED_SIZE];
    float feat[4][NB_TOTAL_FEATURES];
    while (fread(buf, 1, 8, in) == 8) {
      decode_packet(feat, vq_mem, buf);
      fwrite(feat, 4, 4 * NB_TOTAL_FEATURES, out);
    }
    fclose(in); fclose(out);
  } else if (!strcmp(mode, "framedbg")) {
    FILE *in = xopen(argv[2], "rb");
    FILE *fxc = xopen(argv[3], "wb"), *fw = xopen(argv[4], "wb");
    FILE *fexc = xopen(argv[5], "wb"), *ffeat = xopen(argv[6], "wb");
    LPCNetEncState *st = lpcnet_encoder_create();
    short pcm[FRAME_SIZE];
    int k = 0;
    while (fread(pcm, 2, FRAME_SIZE, in) == FRAME_SIZE) {
      float x[FRAME_SIZE];
      int i;
      for (i = 0; i < FRAME_SIZE; i++) x[i] = pcm[i];
      preemphasis(x, &st->mem_preemph, x, PREEMPHASIS, FRAME_SIZE);
      st->pcount = k & 3;
      compute_frame_features(st, x);
      fwrite(st->xc[2 + 2 * st->pcount], 4, PITCH_MAX_PERIOD, fxc);
      fwrite(st->xc[2 + 2 * st->pcount + 1], 4, PITCH_MAX_PERIOD, fxc);
      fwrite(&st->frame_weight[2 + 2 * st->pcount], 4, 2, fw);
      fwrite(st->exc_buf, 4, PITCH_BUF_SIZE, fexc);
      fwrite(st->features[st->pcount], 4, NB_TOTAL_FEATURES, ffeat);
      if ((k & 3) == 3) process_superframe(st, NULL, NULL, 0, 0);
      k++;
    }
    lpcnet_encoder_destroy(st);
    fclose(in); fclose(fxc); fclose(fw); fclose(fexc); fclose(ffeat);
  } else {
    die("unknown mode");
  }
  return 0;
}
