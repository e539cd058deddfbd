/* Weight binding for the reference PLC model struct (parity harness only;
 * generated per-model by training_tf2/dump_plc.py:247-278 in the reference).
 * Binds arrays from a blob exported by
 * lpcnet_tpu.weights.aux_arrays.save_plc_blob. */
#include "lpcnet.h"
#include "nnet.h"
#include "plc_data.h"

/* 20 used features + 36 burg cepstra + 1 lost flag
 * (training_tf2/lpcnet_plc.py:65-101) */
#define PLC_NET_INPUT_SIZE 57

int init_plc_model(PLCModel *model, const WeightArray *arrays) {
  if (dense_init(&model->plc_dense1, arrays, "plc_dense1_bias",
                 "plc_dense1_weights", PLC_NET_INPUT_SIZE,
                 PLC_DENSE1_OUT_SIZE, ACTIVATION_TANH)) return 1;
  if (gru_init(&model->plc_gru1, arrays, "plc_gru1_bias", "plc_gru1_subias",
               "plc_gru1_weights", "plc_gru1_weights_idx",
               "plc_gru1_recurrent_weights", PLC_DENSE1_OUT_SIZE,
               PLC_GRU1_STATE_SIZE, ACTIVATION_TANH, 1)) return 1;
  if (gru_init(&model->plc_gru2, arrays, "plc_gru2_bias", "plc_gru2_subias",
               "plc_gru2_weights", "plc_gru2_weights_idx",
               "plc_gru2_recurrent_weights", PLC_GRU1_STATE_SIZE,
               PLC_GRU2_STATE_SIZE, ACTIVATION_TANH, 1)) return 1;
  if (dense_init(&model->plc_out, arrays, "plc_out_bias", "plc_out_weights",
                 PLC_GRU2_STATE_SIZE, PLC_DENSE_OUT_OUT_SIZE,
                 ACTIVATION_LINEAR)) return 1;
  return 0;
}
