/* Weight binding for the reference DRED RDO-VAE model structs (parity
 * harness only; generated per-model by training_tf2/dump_rdovae.py in the
 * reference). Binds arrays from a blob exported by
 * lpcnet_tpu.weights.aux_arrays.save_rdovae_blob (same array names as the
 * reference export: enc_dense1..8, bits_dense, gdense1/2; state1..3,
 * dec_dense1..8, dec_final). */
#include "nnet.h"
#include "dred_rdovae_enc_data.h"
#include "dred_rdovae_dec_data.h"

#define DRED_ENC_INPUT_SIZE (2 * DRED_NUM_FEATURES)

int init_rdovae_enc_model(struct RDOVAEEnc *model, const WeightArray *arrays) {
  if (dense_init(&model->enc_dense1, arrays, "enc_dense1_bias",
                 "enc_dense1_weights", DRED_ENC_INPUT_SIZE,
                 ENC_DENSE1_OUT_SIZE, ACTIVATION_TANH)) return 1;
  if (gru_init(&model->enc_dense2, arrays, "enc_dense2_bias", "enc_dense2_subias",
               "enc_dense2_weights", "enc_dense2_weights_idx",
               "enc_dense2_recurrent_weights", ENC_DENSE1_OUT_SIZE,
               ENC_DENSE2_OUT_SIZE, ACTIVATION_TANH, 1)) return 1;
  if (dense_init(&model->enc_dense3, arrays, "enc_dense3_bias",
                 "enc_dense3_weights", ENC_DENSE2_OUT_SIZE,
                 ENC_DENSE3_OUT_SIZE, ACTIVATION_TANH)) return 1;
  if (gru_init(&model->enc_dense4, arrays, "enc_dense4_bias", "enc_dense4_subias",
               "enc_dense4_weights", "enc_dense4_weights_idx",
               "enc_dense4_recurrent_weights", ENC_DENSE3_OUT_SIZE,
               ENC_DENSE4_OUT_SIZE, ACTIVATION_TANH, 1)) return 1;
  if (dense_init(&model->enc_dense5, arrays, "enc_dense5_bias",
                 "enc_dense5_weights", ENC_DENSE4_OUT_SIZE,
                 ENC_DENSE5_OUT_SIZE, ACTIVATION_TANH)) return 1;
  if (gru_init(&model->enc_dense6, arrays, "enc_dense6_bias", "enc_dense6_subias",
               "enc_dense6_weights", "enc_dense6_weights_idx",
               "enc_dense6_recurrent_weights", ENC_DENSE5_OUT_SIZE,
               ENC_DENSE6_OUT_SIZE, ACTIVATION_TANH, 1)) return 1;
  if (dense_init(&model->enc_dense7, arrays, "enc_dense7_bias",
                 "enc_dense7_weights", ENC_DENSE6_OUT_SIZE,
                 ENC_DENSE7_OUT_SIZE, ACTIVATION_TANH)) return 1;
  if (dense_init(&model->enc_dense8, arrays, "enc_dense8_bias",
                 "enc_dense8_weights", ENC_DENSE7_OUT_SIZE,
                 ENC_DENSE8_OUT_SIZE, ACTIVATION_TANH)) return 1;
  if (conv1d_init(&model->bits_dense, arrays, "bits_dense_bias",
                  "bits_dense_weights", ENC_CONCAT_SIZE,
                  BITS_DENSE_KERNEL_SIZE, DRED_LATENT_DIM,
                  ACTIVATION_LINEAR)) return 1;
  if (dense_init(&model->gdense1, arrays, "gdense1_bias", "gdense1_weights",
                 ENC_CONCAT_SIZE, GDENSE1_OUT_SIZE, ACTIVATION_TANH)) return 1;
  if (dense_init(&model->gdense2, arrays, "gdense2_bias", "gdense2_weights",
                 GDENSE1_OUT_SIZE, DRED_STATE_DIM, ACTIVATION_TANH)) return 1;
  return 0;
}

int init_rdovae_dec_model(struct RDOVAEDec *model, const WeightArray *arrays) {
  if (dense_init(&model->state1, arrays, "state1_bias", "state1_weights",
                 DRED_STATE_DIM, DEC_DENSE2_STATE_SIZE, ACTIVATION_TANH)) return 1;
  if (dense_init(&model->state2, arrays, "state2_bias", "state2_weights",
                 DRED_STATE_DIM, DEC_DENSE4_STATE_SIZE, ACTIVATION_TANH)) return 1;
  if (dense_init(&model->state3, arrays, "state3_bias", "state3_weights",
                 DRED_STATE_DIM, DEC_DENSE6_STATE_SIZE, ACTIVATION_TANH)) return 1;
  if (dense_init(&model->dec_dense1, arrays, "dec_dense1_bias",
                 "dec_dense1_weights", DRED_LATENT_DIM,
                 DEC_DENSE1_OUT_SIZE, ACTIVATION_TANH)) return 1;
  if (gru_init(&model->dec_dense2, arrays, "dec_dense2_bias", "dec_dense2_subias",
               "dec_dense2_weights", "dec_dense2_weights_idx",
               "dec_dense2_recurrent_weights", DEC_DENSE1_OUT_SIZE,
               DEC_DENSE2_OUT_SIZE, ACTIVATION_TANH, 1)) return 1;
  if (dense_init(&model->dec_dense3, arrays, "dec_dense3_bias",
                 "dec_dense3_weights", DEC_DENSE2_OUT_SIZE,
                 DEC_DENSE3_OUT_SIZE, ACTIVATION_TANH)) return 1;
  if (gru_init(&model->dec_dense4, arrays, "dec_dense4_bias", "dec_dense4_subias",
               "dec_dense4_weights", "dec_dense4_weights_idx",
               "dec_dense4_recurrent_weights", DEC_DENSE3_OUT_SIZE,
               DEC_DENSE4_OUT_SIZE, ACTIVATION_TANH, 1)) return 1;
  if (dense_init(&model->dec_dense5, arrays, "dec_dense5_bias",
                 "dec_dense5_weights", DEC_DENSE4_OUT_SIZE,
                 DEC_DENSE5_OUT_SIZE, ACTIVATION_TANH)) return 1;
  if (gru_init(&model->dec_dense6, arrays, "dec_dense6_bias", "dec_dense6_subias",
               "dec_dense6_weights", "dec_dense6_weights_idx",
               "dec_dense6_recurrent_weights", DEC_DENSE5_OUT_SIZE,
               DEC_DENSE6_OUT_SIZE, ACTIVATION_TANH, 1)) return 1;
  if (dense_init(&model->dec_dense7, arrays, "dec_dense7_bias",
                 "dec_dense7_weights", DEC_DENSE6_OUT_SIZE,
                 DEC_DENSE7_OUT_SIZE, ACTIVATION_TANH)) return 1;
  if (dense_init(&model->dec_dense8, arrays, "dec_dense8_bias",
                 "dec_dense8_weights", DEC_DENSE7_OUT_SIZE,
                 DEC_DENSE8_OUT_SIZE, ACTIVATION_TANH)) return 1;
  if (dense_init(&model->dec_final, arrays, "dec_final_bias",
                 "dec_final_weights",
                 DEC_DENSE1_OUT_SIZE + DEC_DENSE2_OUT_SIZE + DEC_DENSE3_OUT_SIZE +
                 DEC_DENSE4_OUT_SIZE + DEC_DENSE5_OUT_SIZE + DEC_DENSE6_OUT_SIZE +
                 DEC_DENSE7_OUT_SIZE + DEC_DENSE8_OUT_SIZE,
                 4 * DRED_NUM_FEATURES, ACTIVATION_LINEAR)) return 1;
  return 0;
}
