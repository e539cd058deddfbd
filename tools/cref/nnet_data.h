/* Stub replacement for the generated nnet_data.h, used ONLY to compile the
 * reference encoder/decoder sources into the parity fixture generator.
 * The real reference obtains this header from training-time codegen
 * (training_tf2/dump_lpcnet.py:372-385); the synthesis model itself is never
 * exercised by the fixture harness, so the model structs are placeholders
 * with the documented default sizes. */
#ifndef RNN_DATA_H
#define RNN_DATA_H

#include "nnet.h"

#define END2END_DISABLED
#define LPC_GAMMA 1.0f
#ifndef FEATURES_DELAY
#define FEATURES_DELAY 2   /* override with -DFEATURES_DELAY=0 for the
                              non-causal-PLC (no-lookahead) harness build */
#endif

#define GRU_A_STATE_SIZE 384
#define GRU_B_STATE_SIZE 16
#define FEATURE_CONV1_OUT_SIZE 128
#define FEATURE_CONV1_STATE_SIZE (2*128)
#define FEATURE_CONV1_DELAY 1
#define FEATURE_CONV2_OUT_SIZE 128
#define FEATURE_CONV2_STATE_SIZE (2*128)
#define FEATURE_CONV2_DELAY 1
#define FEATURE_DENSE1_OUT_SIZE 128
#define FEATURE_DENSE2_OUT_SIZE 128
#define EMBED_PITCH_OUT_SIZE 64
#define DUAL_FC_OUT_SIZE 256
#define MAX_RNN_NEURONS 384
#define MAX_CONV_INPUTS 384
#define MAX_MDENSE_TMP 512

typedef struct {
  float feature_conv1_state[FEATURE_CONV1_STATE_SIZE];
  float feature_conv2_state[FEATURE_CONV2_STATE_SIZE];
  float gru_a_state[GRU_A_STATE_SIZE];
  float gru_b_state[GRU_B_STATE_SIZE];
} NNetState;

typedef struct {
  DenseLayer feature_dense1;
  DenseLayer feature_dense2;
  DenseLayer gru_a_dense_feature;
  DenseLayer gru_b_dense_feature;
  Conv1DLayer feature_conv1;
  Conv1DLayer feature_conv2;
  EmbeddingLayer embed_pitch;
  EmbeddingLayer gru_a_embed_sig;
  EmbeddingLayer gru_a_embed_pred;
  EmbeddingLayer gru_a_embed_exc;
  SparseGRULayer sparse_gru_a;
  GRULayer gru_b;
  MDenseLayer dual_fc;
} LPCNetModel;

int init_lpcnet_model(LPCNetModel *model, const WeightArray *arrays);

#endif
