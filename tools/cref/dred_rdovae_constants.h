/* Stub replacement for the generated dred_rdovae_constants.h (see
 * tools/cref/nnet_data.h for rationale). Values follow the reference
 * defaults: training_tf2/dump_rdovae.py:287-303 (latent 80, state 24,
 * 16 quant levels) with cond_size = cond_size2 = 256. */
#ifndef DRED_RDOVAE_CONSTANTS_H
#define DRED_RDOVAE_CONSTANTS_H

#define DRED_NUM_FEATURES 20
#define DRED_LATENT_DIM 80
#define DRED_STATE_DIM 24
#define DRED_NUM_QUANTIZATION_LEVELS 16
#define DRED_MAX_RNN_NEURONS 256
/* max over conv layers of nb_inputs*kernel_size (dump_conv1d_layer,
 * training_tf2/keraslayerdump.py:180-189): bits_dense = 2048*4 */
#define DRED_MAX_CONV_INPUTS 8192

#endif
