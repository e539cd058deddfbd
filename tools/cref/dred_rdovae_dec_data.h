/* Stub replacement for the generated dred_rdovae_dec_data.h (see
 * tools/cref/nnet_data.h for rationale). Mirrors the encoder stub sizes
 * (training_tf2/rdovae.py:236-274). */
#ifndef DRED_RDOVAE_DEC_DATA_H
#define DRED_RDOVAE_DEC_DATA_H

#include "dred_rdovae_constants.h"
#include "nnet.h"

#define DEC_DENSE1_OUT_SIZE 256
#define DEC_DENSE2_OUT_SIZE 256
#define DEC_DENSE2_STATE_SIZE 256
#define DEC_DENSE3_OUT_SIZE 256
#define DEC_DENSE4_OUT_SIZE 256
#define DEC_DENSE4_STATE_SIZE 256
#define DEC_DENSE5_OUT_SIZE 256
#define DEC_DENSE6_OUT_SIZE 256
#define DEC_DENSE6_STATE_SIZE 256
#define DEC_DENSE7_OUT_SIZE 256
#define DEC_DENSE8_OUT_SIZE 256

struct RDOVAEDec {
  DenseLayer state1;
  DenseLayer state2;
  DenseLayer state3;
  DenseLayer dec_dense1;
  GRULayer dec_dense2;
  DenseLayer dec_dense3;
  GRULayer dec_dense4;
  DenseLayer dec_dense5;
  GRULayer dec_dense6;
  DenseLayer dec_dense7;
  DenseLayer dec_dense8;
  DenseLayer dec_final;
};

int init_rdovae_dec_model(struct RDOVAEDec *model, const WeightArray *arrays);

#endif
