/* Stub replacement for the generated dred_rdovae_enc_data.h (see
 * tools/cref/nnet_data.h for rationale). Sizes follow
 * training_tf2/rdovae.py:201-234 with cond_size = cond_size2 = 256:
 * denses 1/3/5 output cond_size2, GRUs 2/4/6 output cond_size, denses 7/8
 * output cond_size; the concat buffer feeds a k=4 causal conv (80 latents)
 * and gdense1(128)->gdense2(24) initial-state head. */
#ifndef DRED_RDOVAE_ENC_DATA_H
#define DRED_RDOVAE_ENC_DATA_H

#include "dred_rdovae_constants.h"
#include "nnet.h"

#define ENC_DENSE1_OUT_SIZE 256
#define ENC_DENSE2_OUT_SIZE 256
#define ENC_DENSE2_STATE_SIZE 256
#define ENC_DENSE3_OUT_SIZE 256
#define ENC_DENSE4_OUT_SIZE 256
#define ENC_DENSE4_STATE_SIZE 256
#define ENC_DENSE5_OUT_SIZE 256
#define ENC_DENSE6_OUT_SIZE 256
#define ENC_DENSE6_STATE_SIZE 256
#define ENC_DENSE7_OUT_SIZE 256
#define ENC_DENSE8_OUT_SIZE 256
#define GDENSE1_OUT_SIZE 128

/* concat of enc_dense1..8 outputs = 2048 */
#define ENC_CONCAT_SIZE (ENC_DENSE1_OUT_SIZE + ENC_DENSE2_OUT_SIZE + \
                         ENC_DENSE3_OUT_SIZE + ENC_DENSE4_OUT_SIZE + \
                         ENC_DENSE5_OUT_SIZE + ENC_DENSE6_OUT_SIZE + \
                         ENC_DENSE7_OUT_SIZE + ENC_DENSE8_OUT_SIZE)
#define BITS_DENSE_KERNEL_SIZE 4
#define BITS_DENSE_STATE_SIZE ((BITS_DENSE_KERNEL_SIZE - 1) * ENC_CONCAT_SIZE)

struct RDOVAEEnc {
  DenseLayer enc_dense1;
  GRULayer enc_dense2;
  DenseLayer enc_dense3;
  GRULayer enc_dense4;
  DenseLayer enc_dense5;
  GRULayer enc_dense6;
  DenseLayer enc_dense7;
  DenseLayer enc_dense8;
  Conv1DLayer bits_dense;
  DenseLayer gdense1;
  DenseLayer gdense2;
};

int init_rdovae_enc_model(struct RDOVAEEnc *model, const WeightArray *arrays);

#endif
