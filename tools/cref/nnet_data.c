/* Weight binding for the reference LPCNet model struct, used ONLY by the
 * parity fixture harness (tools/cref). In the reference this function is
 * code-generated per-model by training_tf2/dump_lpcnet.py:296-330; here it
 * is written once against the default sizes in tools/cref/nnet_data.h and
 * binds arrays from a DNNw blob exported by
 * lpcnet_tpu.weights.lpcnet_arrays.save_lpcnet_blob (same array names as
 * the reference export). */
#include "lpcnet.h"
#include "nnet.h"
#include "nnet_data.h"

int init_lpcnet_model(LPCNetModel *model, const WeightArray *arrays) {
  if (embedding_init(&model->embed_pitch, arrays, "embed_pitch_weights",
                     256, EMBED_PITCH_OUT_SIZE)) return 1;
  if (embedding_init(&model->gru_a_embed_sig, arrays, "gru_a_embed_sig_weights",
                     256, 3 * GRU_A_STATE_SIZE)) return 1;
  if (embedding_init(&model->gru_a_embed_pred, arrays, "gru_a_embed_pred_weights",
                     256, 3 * GRU_A_STATE_SIZE)) return 1;
  if (embedding_init(&model->gru_a_embed_exc, arrays, "gru_a_embed_exc_weights",
                     256, 3 * GRU_A_STATE_SIZE)) return 1;
  if (conv1d_init(&model->feature_conv1, arrays, "feature_conv1_bias",
                  "feature_conv1_weights", NB_FEATURES + EMBED_PITCH_OUT_SIZE,
                  3, FEATURE_CONV1_OUT_SIZE, ACTIVATION_TANH)) return 1;
  if (conv1d_init(&model->feature_conv2, arrays, "feature_conv2_bias",
                  "feature_conv2_weights", FEATURE_CONV1_OUT_SIZE, 3,
                  FEATURE_CONV2_OUT_SIZE, ACTIVATION_TANH)) return 1;
  if (dense_init(&model->feature_dense1, arrays, "feature_dense1_bias",
                 "feature_dense1_weights", FEATURE_CONV2_OUT_SIZE,
                 FEATURE_DENSE1_OUT_SIZE, ACTIVATION_TANH)) return 1;
  if (dense_init(&model->feature_dense2, arrays, "feature_dense2_bias",
                 "feature_dense2_weights", FEATURE_DENSE1_OUT_SIZE,
                 FEATURE_DENSE2_OUT_SIZE, ACTIVATION_TANH)) return 1;
  if (dense_init(&model->gru_a_dense_feature, arrays, "gru_a_dense_feature_bias",
                 "gru_a_dense_feature_weights", FEATURE_DENSE2_OUT_SIZE,
                 3 * GRU_A_STATE_SIZE, ACTIVATION_LINEAR)) return 1;
  if (dense_init(&model->gru_b_dense_feature, arrays, "gru_b_dense_feature_bias",
                 "gru_b_dense_feature_weights", FEATURE_DENSE2_OUT_SIZE,
                 3 * GRU_B_STATE_SIZE, ACTIVATION_LINEAR)) return 1;
  if (sparse_gru_init(&model->sparse_gru_a, arrays, "sparse_gru_a_bias",
                      "sparse_gru_a_subias", "sparse_gru_a_recurrent_weights_diag",
                      "sparse_gru_a_recurrent_weights",
                      "sparse_gru_a_recurrent_weights_idx",
                      GRU_A_STATE_SIZE, ACTIVATION_TANH, 1)) return 1;
  if (gru_init(&model->gru_b, arrays, "gru_b_bias", "gru_b_subias",
               "gru_b_weights", "gru_b_weights_idx", "gru_b_recurrent_weights",
               GRU_A_STATE_SIZE, GRU_B_STATE_SIZE, ACTIVATION_TANH, 1)) return 1;
  if (mdense_init(&model->dual_fc, arrays, "dual_fc_bias", "dual_fc_weights",
                  "dual_fc_factor", GRU_B_STATE_SIZE, DUAL_FC_OUT_SIZE, 2,
                  ACTIVATION_SIGMOID)) return 1;
  return 0;
}
