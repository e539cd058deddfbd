/* Stub replacement for the generated dred_rdovae_stats_data.h (see
 * tools/cref/nnet_data.h for rationale). The fixture harness drives the
 * enc/dec compute paths directly and never touches the fixed-point
 * statistical tables, so these are declarations only (defined as zeros in
 * dred_data.c if ever linked). */
#ifndef DRED_RDOVAE_STATS_DATA_H
#define DRED_RDOVAE_STATS_DATA_H

#include "opus_types.h"
#include "dred_rdovae_constants.h"

extern const opus_uint16 dred_quant_scales_q8[DRED_NUM_QUANTIZATION_LEVELS * DRED_LATENT_DIM];
extern const opus_uint16 dred_dead_zone_q10[DRED_NUM_QUANTIZATION_LEVELS * DRED_LATENT_DIM];
extern const opus_uint16 dred_r_q15[DRED_NUM_QUANTIZATION_LEVELS * DRED_LATENT_DIM];
extern const opus_uint16 dred_p0_q15[DRED_NUM_QUANTIZATION_LEVELS * DRED_LATENT_DIM];

#endif
