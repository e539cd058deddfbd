/* Neural-path parity fixture generator.
 *
 * Compiles the READ-ONLY reference neural sources (src/nnet.c, src/lpcnet.c,
 * src/lpcnet_plc.c, src/dred_rdovae_enc.c, src/dred_rdovae_dec.c) against a
 * DNNw weight blob exported by lpcnet_tpu.weights and records golden
 * synthesis PCM / internal states / PLC traces / DRED latents that the JAX
 * implementation is gated against. Build with tools/cref/build_nn.sh
 * (defines USE_WEIGHTS_FILE so no generated data arrays are required).
 *
 * Modes:
 *   tansig out.f32
 *       dump tansig_table (201) + sampling_logit_table (256)
 *   synth blob.bin nframes feats.f32 out.s16 states.f32 [preload.s16]
 *       free-running (or teacher-forced, if preload given) synthesis;
 *       states.f32 gets [gru_a | gru_b | last_sig(16) | last_exc | deemph]
 *       per frame
 *   plc blob.bin flags npackets in.s16 lost.u8 out.s16
 *       PLC trace: per 20 ms packet (320 samples), conceal if lost else
 *       update, mirroring lpcnet_demo -plc_file (src/lpcnet_demo.c:220-248)
 *       but without the non-causal skip so frames stay aligned
 *   dred blob.bin ndframes feats.f32 latents.f32 states.f32 decfeats.f32
 *       encoder dframes then decoder qframes from the last initial state
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>
#include "lpcnet.h"
#include "lpcnet_private.h"
#include "nnet.h"
#include "nnet_data.h"
#include "plc_data.h"
#include "dred_rdovae_enc.h"
#include "dred_rdovae_dec.h"
#include "dred_rdovae_enc_data.h"
#include "dred_rdovae_dec_data.h"
#include "tansig_table.h"

static void die(const char *msg) { fprintf(stderr, "%s\n", msg); exit(1); }

static FILE *xopen(const char *path, const char *mode) {
  FILE *f = fopen(path, mode);
  if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
  return f;
}

static unsigned char *read_file(const char *path, long *len) {
  FILE *f = xopen(path, "rb");
  unsigned char *data;
  fseek(f, 0, SEEK_END);
  *len = ftell(f);
  fseek(f, 0, SEEK_SET);
  data = malloc(*len);
  if (fread(data, 1, *len, f) != (size_t)*len) die("short blob read");
  fclose(f);
  return data;
}

static void dump_synth_state(const LPCNetState *st, FILE *out) {
  float v;
  fwrite(st->nnet.gru_a_state, 4, GRU_A_STATE_SIZE, out);
  fwrite(st->nnet.gru_b_state, 4, GRU_B_STATE_SIZE, out);
  fwrite(st->last_sig, 4, LPC_ORDER, out);
  v = (float)st->last_exc; fwrite(&v, 4, 1, out);
  v = st->deemph_mem; fwrite(&v, 4, 1, out);
}

int main(int argc, char **argv) {
  if (argc < 2) die("usage: harness_nn <mode> ...");
  const char *mode = argv[1];

  if (!strcmp(mode, "tansig")) {
    FILE *out = xopen(argv[2], "wb");
    LPCNetState *st = lpcnet_create();
    fwrite(tansig_table, 4, 201, out);
    fwrite(st->sampling_logit_table, 4, 256, out);
    fclose(out);
    lpcnet_destroy(st);
  } else if (!strcmp(mode, "synth")) {
    long len;
    unsigned char *data = read_file(argv[2], &len);
    int nframes = atoi(argv[3]);
    FILE *fin = xopen(argv[4], "rb");
    FILE *fpcm = xopen(argv[5], "wb");
    FILE *fst = xopen(argv[6], "wb");
    FILE *fpre = argc > 7 ? xopen(argv[7], "rb") : NULL;
    LPCNetState *st = lpcnet_create();
    if (lpcnet_load_model(st, data, len)) die("lpcnet_load_model failed");
    for (int k = 0; k < nframes; k++) {
      float feats[NB_TOTAL_FEATURES];
      short pcm[FRAME_SIZE];
      if (fread(feats, 4, NB_TOTAL_FEATURES, fin) != NB_TOTAL_FEATURES)
        die("short feature read");
      if (fpre) {
        if (fread(pcm, 2, FRAME_SIZE, fpre) != FRAME_SIZE)
          die("short preload read");
        lpcnet_synthesize_impl(st, feats, pcm, FRAME_SIZE, FRAME_SIZE);
      } else {
        lpcnet_synthesize(st, feats, pcm, FRAME_SIZE);
      }
      fwrite(pcm, 2, FRAME_SIZE, fpcm);
      dump_synth_state(st, fst);
    }
    fclose(fin); fclose(fpcm); fclose(fst);
    if (fpre) fclose(fpre);
    lpcnet_destroy(st);
    free(data);
  } else if (!strcmp(mode, "synth_trace")) {
    /* per-sample state trace of free-running synthesis:
     * [last_exc, last_sig0, deemph, pred_recon] per sample */
    long len;
    unsigned char *data = read_file(argv[2], &len);
    int nframes = atoi(argv[3]);
    FILE *fin = xopen(argv[4], "rb");
    FILE *ftr = xopen(argv[5], "wb");
    LPCNetState *st = lpcnet_create();
    if (lpcnet_load_model(st, data, len)) die("lpcnet_load_model failed");
    for (int k = 0; k < nframes; k++) {
      float feats[NB_TOTAL_FEATURES];
      if (fread(feats, 4, NB_TOTAL_FEATURES, fin) != NB_TOTAL_FEATURES)
        die("short feature read");
      run_frame_network(st, st->gru_a_condition, st->gru_b_condition,
                        st->lpc, feats);
      if (st->frame_count <= FEATURES_DELAY) continue;
      for (int i = 0; i < FRAME_SIZE; i++) {
        short one;
        float v;
        lpcnet_synthesize_tail_impl(st, &one, 1, 0);
        v = (float)st->last_exc; fwrite(&v, 4, 1, ftr);
        v = st->last_sig[0]; fwrite(&v, 4, 1, ftr);
        v = st->deemph_mem; fwrite(&v, 4, 1, ftr);
        v = (float)one; fwrite(&v, 4, 1, ftr);
      }
    }
    fclose(fin); fclose(ftr);
    lpcnet_destroy(st);
    free(data);
  } else if (!strcmp(mode, "plc")) {
    long len;
    unsigned char *data = read_file(argv[2], &len);
    int flags = atoi(argv[3]);
    int npackets = atoi(argv[4]);
    FILE *fin = xopen(argv[5], "rb");
    FILE *flost = xopen(argv[6], "rb");
    FILE *fout = xopen(argv[7], "wb");
    LPCNetPLCState *net = lpcnet_plc_create(flags);
    if (!net) die("lpcnet_plc_create failed");
    if (lpcnet_plc_load_model(net, data, len)) die("plc_load_model failed");
    for (int p = 0; p < npackets; p++) {
      unsigned char lost;
      short pcm[FRAME_SIZE];
      if (fread(&lost, 1, 1, flost) != 1) die("short loss read");
      for (int f = 0; f < 2; f++) {
        if (fread(pcm, 2, FRAME_SIZE, fin) != FRAME_SIZE) die("short pcm read");
        if (lost) lpcnet_plc_conceal(net, pcm);
        else lpcnet_plc_update(net, pcm);
        fwrite(pcm, 2, FRAME_SIZE, fout);
      }
    }
    fclose(fin); fclose(flost); fclose(fout);
    lpcnet_plc_destroy(net);
    free(data);
  } else if (!strcmp(mode, "dred")) {
    long len;
    unsigned char *data = read_file(argv[2], &len);
    int ndframes = atoi(argv[3]);
    FILE *fin = xopen(argv[4], "rb");
    FILE *flat = xopen(argv[5], "wb");
    FILE *fst = xopen(argv[6], "wb");
    FILE *fdec = xopen(argv[7], "wb");
    WeightArray *list;
    struct RDOVAEEnc enc_model;
    struct RDOVAEDec dec_model;
    RDOVAEEncState enc_state;
    RDOVAEDecState dec_state;
    float *latents = malloc(4 * ndframes * DRED_LATENT_DIM);
    float state[DRED_STATE_DIM];
    if (parse_weights(&list, data, len) < 0) die("parse_weights failed");
    if (init_rdovae_enc_model(&enc_model, list)) die("enc init failed");
    if (init_rdovae_dec_model(&dec_model, list)) die("dec init failed");
    memset(&enc_state, 0, sizeof(enc_state));
    for (int k = 0; k < ndframes; k++) {
      float dframe[2 * DRED_NUM_FEATURES];
      if (fread(dframe, 4, 2 * DRED_NUM_FEATURES, fin) != 2 * DRED_NUM_FEATURES)
        die("short dred feature read");
      dred_rdovae_encode_dframe(&enc_state, &enc_model,
                                &latents[k * DRED_LATENT_DIM], state, dframe);
      fwrite(&latents[k * DRED_LATENT_DIM], 4, DRED_LATENT_DIM, flat);
      fwrite(state, 4, DRED_STATE_DIM, fst);
    }
    /* decode every latent starting from the last initial state */
    memset(&dec_state, 0, sizeof(dec_state));
    dred_rdovae_dec_init_states(&dec_state, &dec_model, state);
    for (int k = 0; k < ndframes; k++) {
      float qframe[4 * DRED_NUM_FEATURES];
      dred_rdovae_decode_qframe(&dec_state, &dec_model, qframe,
                                &latents[k * DRED_LATENT_DIM]);
      fwrite(qframe, 4, 4 * DRED_NUM_FEATURES, fdec);
    }
    fclose(fin); fclose(flat); fclose(fst); fclose(fdec);
    free(latents); free(list); free(data);
  } else {
    die("unknown mode");
  }
  return 0;
}
